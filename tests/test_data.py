"""Data layer tests, following the reference's ``tests/test_datasets.py``:
enumeration is a permutation partition, the Crescent analytic score is
correct (Langevin-stationarity oracle), and ``concat . unpack = id`` for the
restoration mask algebra.  Additionally: the jittable mask generation works
under jit (the reference's is host-only), and complements are exact.
"""
import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from fbs_tpu.data import Crescent, ImageRestore
from fbs_tpu.data.images import _complement


def test_enumeration_is_permutation_partition():
    key = jax.random.PRNGKey(0)
    xs = jax.random.normal(key, (100, 3))
    ds = ImageRestore.from_array(jax.random.uniform(key, (100, 8, 8, 1)), "inpaint-3")

    perm_inds = ds.init_enumeration(key, batch_size=8)
    all_inds = np.concatenate([np.asarray(c) for c in perm_inds])
    assert len(all_inds) == 96  # truncated to multiple of batch
    assert len(np.unique(all_inds)) == 96
    batch = ds.enumerate_subset(3)
    assert batch.shape == (8, 8, 8, 1)


def test_crescent_score_matches_joint_logpdf_grad():
    """The analytic joint score equals the autodiff gradient of the full
    joint log density written out independently."""
    import math

    crescent = Crescent()

    def joint_logpdf(xy):
        phi, y = xy[:2], xy[2]
        lp = jax.scipy.stats.multivariate_normal.logpdf(phi, crescent.m, crescent.cov)
        mean_y = phi[1] / crescent.psi + 0.5 * (phi[0] ** 2 + crescent.psi ** 2)
        ly = jax.scipy.stats.norm.logpdf(y, mean_y, math.sqrt(crescent.xi))
        return lp + ly

    for seed in range(3):
        xy = jax.random.normal(jax.random.PRNGKey(seed), (3,))
        npt.assert_allclose(crescent.score(xy), jax.grad(joint_logpdf)(xy), rtol=1e-6)


def test_crescent_score_langevin_invariance():
    """Short Langevin runs from exact samples keep the joint moments
    (a wrong score would drift them)."""
    crescent = Crescent()
    key = jax.random.PRNGKey(666)

    xs, ys = crescent.sampler(key, 20_000)
    joint = jnp.concatenate([xs, ys[:, None]], axis=-1)

    score = jax.vmap(crescent.score)

    def langevin_step(z, key_):
        eps = 2e-3
        return (z + eps * score(z)
                + jnp.sqrt(2 * eps) * jax.random.normal(key_, z.shape)), None

    keys = jax.random.split(jax.random.PRNGKey(1), 200)
    z, _ = jax.lax.scan(langevin_step, joint, keys)

    npt.assert_allclose(jnp.mean(z, axis=0), jnp.mean(joint, axis=0), atol=0.1)
    npt.assert_allclose(jnp.std(z, axis=0), jnp.std(joint, axis=0), rtol=0.15)


@pytest.mark.parametrize("task", ["inpaint-6", "supr-4"])
def test_concat_unpack_roundtrip(task):
    key = jax.random.PRNGKey(2)
    xs = jax.random.uniform(key, (4, 16, 16, 3))
    ds = ImageRestore.from_array(xs, task)

    img, y, mask = ds.sampler(jax.random.PRNGKey(3))
    x, y2 = ds.unpack(img, mask)
    npt.assert_array_equal(np.asarray(y), np.asarray(y2))
    img2 = ds.concat(x, y, mask)
    npt.assert_allclose(np.asarray(img2), np.asarray(img), atol=1e-7)

    # Batched roundtrip (the samplers unpack whole paths).
    batch = xs[:3]
    xb, yb = ds.unpack(batch, mask)
    npt.assert_allclose(np.asarray(ds.concat(xb, yb, mask)), np.asarray(batch), atol=1e-7)


@pytest.mark.parametrize("task", ["inpaint-6", "supr-4"])
def test_mask_generation_is_jittable(task):
    """gen_mask traces under jit — the reference's setdiff1d version cannot."""
    xs = jnp.zeros((2, 16, 16, 1))
    ds = ImageRestore.from_array(xs, task)

    mask = jax.jit(ds.gen_mask)(jax.random.PRNGKey(4))
    n_unobs = ds.unobs_shape[0]
    assert mask.unobs_inds_ravelled.shape == (n_unobs,)
    # The index sets partition the pixels exactly.
    combined = np.concatenate([np.asarray(mask.unobs_inds_ravelled),
                               np.asarray(mask.obs_inds_ravelled)])
    assert len(np.unique(combined)) == 16 * 16


def test_complement_matches_setdiff1d():
    present = jnp.array([3, 7, 1, 9])
    got = _complement(present, 12, 8)
    expected = np.setdiff1d(np.arange(12), np.asarray(present))
    npt.assert_array_equal(np.asarray(got), expected)


def test_image_corruptions_run():
    from fbs_tpu.data.images import Image

    class Tiny(Image):
        def __init__(self, task):
            self.task = task
            self.n = 4
            self.xs = jax.random.uniform(jax.random.PRNGKey(0), (4, 16, 16, 1))
            self.image_shape = (16, 16, 1)

    for task in ["inpaint-5", "deconv-5", "supr"]:
        ds = Tiny(task)
        x, y = ds.sampler(jax.random.PRNGKey(1))
        assert x.shape == (16, 16, 1)
        assert y.shape == (16, 16, 1)
        assert bool(jnp.all(jnp.isfinite(y)))
