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


def test_paint_zeros_one_grid_aligned_square():
    """The occlusion is exactly one rectangle^2 block at a (b+1)x(b+1)
    grid-aligned anchor (the reference observation model, images.py:60-79)."""
    from fbs_tpu.data.images import Image

    class Tiny(Image):
        def __init__(self):
            self.task = "inpaint-5"
            self.image_shape = (16, 16, 2)

    ds = Tiny()
    img = jnp.ones((16, 16, 2))
    anchors = [int((16 - 5) / 3 * i) for i in range(4)]
    seen = set()
    for s in range(24):
        out = np.asarray(ds.paint(jax.random.PRNGKey(s), img, rectangle_size=5))
        zero_rows, zero_cols = np.where(out[..., 0] == 0.0)
        assert zero_rows.size == 25  # exactly one 5x5 square, all channels
        npt.assert_array_equal(out[..., 0], out[..., 1])
        top, left = zero_rows.min(), zero_cols.min()
        assert top in anchors and left in anchors
        assert zero_rows.max() == top + 4 and zero_cols.max() == left + 4
        npt.assert_array_equal(np.unique(out), np.array([0.0, 1.0]))
        seen.add((int(top), int(left)))
    assert len(seen) > 4  # the anchor really is random


def test_blur_kernel_is_separable_gaussian():
    """Blurring a unit impulse yields (up to the norm-normalisation) a
    rank-1 separable Gaussian with variance in the reference's U[0.1, 5)."""
    from fbs_tpu.data.images import Image

    class Tiny(Image):
        def __init__(self):
            self.task = "deconv-7"
            self.image_shape = (21, 21, 1)

    ds = Tiny()
    impulse = jnp.zeros((21, 21, 1)).at[10, 10, 0].set(1.0)
    out = np.asarray(ds.conv(jax.random.PRNGKey(3), impulse, kernel_size=7))[..., 0]
    patch = out[7:14, 7:14]
    # separable: the patch is an outer product -> rank 1
    s = np.linalg.svd(patch, compute_uv=False)
    assert s[1] < 1e-5 * s[0]
    # symmetric and peaked at the centre
    npt.assert_allclose(patch, patch.T, rtol=1e-6)
    assert patch[3, 3] == patch.max() > 0


def test_downsample_is_block_constant():
    from fbs_tpu.data.images import Image

    class Tiny(Image):
        def __init__(self):
            self.task = "supr"
            self.image_shape = (16, 16, 1)

    ds = Tiny()
    img = jax.random.uniform(jax.random.PRNGKey(0), (16, 16, 1))
    for s in range(8):
        out = np.asarray(ds.downsample(jax.random.PRNGKey(s), img))[..., 0]
        blocks4 = out.reshape(4, 4, 4, 4)
        ok4 = np.all(blocks4 == blocks4[:, :1, :, :1])
        blocks8 = out.reshape(2, 8, 2, 8)
        ok8 = np.all(blocks8 == blocks8[:, :1, :, :1])
        assert ok4 or ok8  # ratio is one of {4, 8}
