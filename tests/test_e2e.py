"""End-to-end integration: train a tiny score UNet on synthetic images, then
run every conditional sampler (Gibbs / pMCMC / filter / twisted / CSGM) with
the trained score — the full train -> restore pipeline in one test.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def trained():
    from fbs_tpu.applications import RestorationSampler, train_score_model
    from fbs_tpu.data import ImageRestore
    from fbs_tpu.nn import UNet, make_st_nn
    from fbs_tpu.sdes import StationaryLinLinearSDE, make_linear_sde_law_loss

    key = jax.random.PRNGKey(0)
    # Synthetic dataset: blurry blobs at random positions.
    n = 64
    cx = jax.random.uniform(jax.random.PRNGKey(1), (n, 1, 1), minval=4, maxval=12)
    cy = jax.random.uniform(jax.random.PRNGKey(2), (n, 1, 1), minval=4, maxval=12)
    ii = jnp.arange(16)[None, :, None].astype(jnp.float32)
    jj = jnp.arange(16)[None, None, :].astype(jnp.float32)
    xs = jnp.exp(-((ii - cx) ** 2 + (jj - cy) ** 2) / 8.0)[..., None]

    dataset = ImageRestore.from_array(xs, task="inpaint-6")

    T = 1.0
    sde = StationaryLinLinearSDE(beta_min=0.02, beta_max=5.0, t0=0.0, T=T)
    unet = UNet(dt=T / 10, dim=8, dim_mults=(1, 2))
    init_param, _, nn_score = make_st_nn(key, unet, (16, 16, 1), batch_size=8)

    loss_fn = make_linear_sde_law_loss(sde, nn_score, t0=0.0, T=T, nsteps=4,
                                       random_times=True, loss_type="score")

    losses = []
    param, ema = train_score_model(jax.random.PRNGKey(3), dataset, loss_fn,
                                   init_param, batch_size=16, nepochs=3,
                                   lr=2e-3, schedule="const", log_every=1,
                                   log_fn=lambda s: losses.append(float(s.split()[-1])))
    assert losses[-1] < losses[0], "training did not reduce the DSM loss"

    sampler = RestorationSampler(dataset=dataset, sde=sde, nn_score=nn_score,
                                 param=ema, T=T, nsteps=8, nparticles=6)
    test_img, y0, mask = dataset.sampler(jax.random.PRNGKey(4))
    return sampler, dataset, test_img, y0, mask


def test_trained_gibbs_restores(trained):
    sampler, dataset, test_img, y0, mask = trained
    key = jax.random.PRNGKey(5)
    x0, us_star = sampler.gibbs_init(key, y0, mask)
    bs_star = jnp.zeros((sampler.nsteps + 1,), dtype=int)
    for i in range(3):
        key, sub = jax.random.split(key)
        x0, us_star, bs_star, _ = sampler.gibbs_step(sub, x0, y0, us_star,
                                                     bs_star, mask,
                                                     explicit_backward=True)
    restored = dataset.concat(x0, y0, mask)
    assert bool(jnp.all(jnp.isfinite(restored)))
    # Observed pixels must round-trip exactly.
    _, y_back = dataset.unpack(restored, mask)
    np.testing.assert_allclose(np.asarray(y_back), np.asarray(y0), atol=1e-6)


def test_trained_all_methods_run(trained):
    sampler, dataset, test_img, y0, mask = trained
    # pMCMC
    ys = sampler.fwd_ys_sampler(jax.random.PRNGKey(6), y0)
    x0, log_ell, ys, st = sampler.pmcmc_step(jax.random.PRNGKey(7),
                                             jnp.zeros(dataset.unobs_shape),
                                             0.0, ys, y0, mask, delta=0.1)
    assert bool(jnp.isfinite(log_ell))
    # Filter
    xf, _ = sampler.filter_init(jax.random.PRNGKey(8), y0, mask)
    assert bool(jnp.all(jnp.isfinite(xf)))
    # Twisted + CSGM
    xt = sampler.twisted_sample(jax.random.PRNGKey(9), y0, mask)
    xc = sampler.csgm_sample(jax.random.PRNGKey(10), y0, mask)
    assert bool(jnp.all(jnp.isfinite(xt))) and bool(jnp.all(jnp.isfinite(xc)))
