"""Application-layer tests: GP toy methods against the exact GP posterior
(the reference's experiments' own evaluation), Gaussian-SB ablation, and the
image-restoration sampler end to end with a tiny untrained UNet (shape and
finiteness checks, plus fused-vs-unfused equivalence of the drift split).
"""
import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from fbs_tpu.applications import GPRegressionToy, GaussianSBToy, RestorationSampler


def test_gp_toy_gibbs_recovers_posterior():
    toy = GPRegressionToy(d=5, nsteps=100, T=1.0)
    key = jax.random.PRNGKey(666)
    key, subkey = jax.random.split(key)
    _, y0 = toy.draw_data(subkey)
    post_mean, post_cov = toy.exact_posterior(y0)

    nchains = 4
    init, step = toy.make_gibbs(y0, nparticles=10, explicit_backward=True)

    key, subkey = jax.random.split(key)
    state = init(jax.random.split(subkey, nchains))

    nsamples = 1500
    burnin = 200

    def sweep(carry, key_):
        state = carry
        state, (x0s, _) = step(jax.random.split(key_, nchains), state)
        return state, x0s

    keys = jax.random.split(key, nsamples)
    _, samples = jax.lax.scan(sweep, state, keys)  # (nsamples, nchains, d)
    samples = np.asarray(samples)[burnin:].reshape(-1, toy.d)

    npt.assert_allclose(samples.mean(axis=0), post_mean, atol=0.15)
    npt.assert_allclose(samples.var(axis=0), np.diag(post_cov), rtol=0.3, atol=0.1)


def test_gp_toy_filter_and_csgm_run():
    toy = GPRegressionToy(d=4, nsteps=50)
    key = jax.random.PRNGKey(0)
    _, y0 = toy.draw_data(key)

    x_f = toy.filter_sample(jax.random.PRNGKey(1), y0, nparticles=64)
    assert x_f.shape == (4,) and bool(jnp.all(jnp.isfinite(x_f)))

    x_c = toy.csgm_sample(jax.random.PRNGKey(2), y0)
    assert x_c.shape == (4,) and bool(jnp.all(jnp.isfinite(x_c)))

    x_t = toy.twisted_sample(jax.random.PRNGKey(3), y0, nparticles=32)
    assert x_t.shape == (4,) and bool(jnp.all(jnp.isfinite(x_t)))


def test_gp_toy_pmcmc_runs():
    toy = GPRegressionToy(d=4, nsteps=50)
    key = jax.random.PRNGKey(5)
    _, y0 = toy.draw_data(key)
    kernel = toy.make_pmcmc(y0, nparticles=32, delta=0.1)

    nchains = 2
    uT = jnp.zeros((nchains, 4))
    log_ell = jnp.zeros((nchains,))
    ys = jax.vmap(lambda k: toy.fwd_ys_sampler(k, y0))(jax.random.split(key, nchains))
    uT, log_ell, ys, state = kernel(jax.random.split(jax.random.PRNGKey(6), nchains),
                                    uT, log_ell, ys)
    assert uT.shape == (nchains, 4)
    assert bool(jnp.all(jnp.isfinite(log_ell)))


def test_gaussian_sb_gibbs_tracks_posterior_mean():
    toy = GaussianSBToy(d=4, nsteps=50, integration_nsteps=4)
    key = jax.random.PRNGKey(666)
    key, subkey = jax.random.split(key)
    _, y0 = toy.draw_data(subkey)
    post_mean, post_cov = toy.exact_posterior(y0)

    init, step = toy.make_gibbs(y0, nparticles=10, explicit_backward=True)
    key, subkey = jax.random.split(key)
    state = init(subkey)

    def sweep(carry, key_):
        state = carry
        state, (x0, _) = step(key_, state)
        return state, x0

    keys = jax.random.split(key, 800)
    _, samples = jax.lax.scan(sweep, state, keys)
    samples = np.asarray(samples)[200:]

    # The separability assumption is violated by construction (that is the
    # point of the ablation); expect rough agreement only.
    npt.assert_allclose(samples.mean(axis=0), post_mean, atol=0.6)


@pytest.fixture(scope="module")
def restoration():
    from fbs_tpu.data import ImageRestore
    from fbs_tpu.nn import UNet, make_st_nn
    from fbs_tpu.sdes import StationaryLinLinearSDE

    key = jax.random.PRNGKey(0)
    xs = jax.random.uniform(key, (8, 16, 16, 1))
    dataset = ImageRestore.from_array(xs, task="inpaint-6")

    T = 1.0
    sde = StationaryLinLinearSDE(beta_min=0.02, beta_max=5.0, t0=0.0, T=T)
    unet = UNet(dt=T / 20, dim=8, dim_mults=(1, 2))
    param, _, nn_score = make_st_nn(key, unet, (16, 16, 1), batch_size=2)

    sampler = RestorationSampler(dataset=dataset, sde=sde, nn_score=nn_score,
                                 param=param, T=T, nsteps=10, nparticles=6)
    test_img, y0, mask = dataset.sampler(jax.random.PRNGKey(1))
    return sampler, dataset, test_img, y0, mask


def test_restoration_gibbs_runs(restoration):
    sampler, dataset, test_img, y0, mask = restoration
    key = jax.random.PRNGKey(2)
    x0, us_star = sampler.gibbs_init(key, y0, mask, method="smoother")
    assert x0.shape == dataset.unobs_shape
    bs_star = jnp.zeros((sampler.nsteps + 1,), dtype=int)
    x0, us_star, bs_star, acc = sampler.gibbs_step(
        jax.random.PRNGKey(3), x0, y0, us_star, bs_star, mask,
        explicit_backward=True)
    assert x0.shape == dataset.unobs_shape
    assert bool(jnp.all(jnp.isfinite(x0)))
    restored = dataset.concat(x0, y0, mask)
    assert restored.shape == dataset.image_shape


def test_restoration_pmcmc_runs(restoration):
    sampler, dataset, test_img, y0, mask = restoration
    key = jax.random.PRNGKey(4)
    ys = sampler.fwd_ys_sampler(key, y0)
    x0 = jnp.zeros(dataset.unobs_shape)
    x0, log_ell, ys, state = sampler.pmcmc_step(jax.random.PRNGKey(5), x0, 0.0,
                                                ys, y0, mask, delta=0.1)
    assert x0.shape == dataset.unobs_shape
    assert bool(jnp.isfinite(log_ell))


def test_restoration_baselines_run(restoration):
    sampler, dataset, test_img, y0, mask = restoration
    x_t = sampler.twisted_sample(jax.random.PRNGKey(6), y0, mask)
    assert x_t.shape == dataset.image_shape

    x_c = sampler.csgm_sample(jax.random.PRNGKey(7), y0, mask)
    assert x_c.shape == dataset.unobs_shape
    assert bool(jnp.all(jnp.isfinite(x_c)))


def test_restoration_filter_runs(restoration):
    sampler, dataset, test_img, y0, mask = restoration
    x0, _ = sampler.filter_init(jax.random.PRNGKey(8), y0, mask)
    assert x0.shape == dataset.unobs_shape


def test_fused_matches_split_drift(restoration):
    """The fused kernel's proposal mean/weights agree with the separate
    transition/likelihood closures (same key -> same noise draw)."""
    sampler, dataset, test_img, y0, mask = restoration
    key = jax.random.PRNGKey(9)
    us_prev = jax.random.normal(key, (6, *dataset.unobs_shape))
    v = dataset.unpack(test_img, mask)[1]
    t = 0.3

    us_fused, logw_fused = sampler.fused_kernel(us_prev, v, v, t, key, mask_=mask)
    us_split = sampler.transition_sampler(us_prev, v, t, key, mask_=mask)
    logw_split = sampler.likelihood_logpdf(v, us_prev, v, t, mask_=mask)
    npt.assert_allclose(np.asarray(us_fused), np.asarray(us_split), rtol=1e-5, atol=1e-6)
    npt.assert_allclose(np.asarray(logw_fused), np.asarray(logw_split), rtol=1e-5)


def test_restoration_conditional_systematic(restoration):
    """The conditional-systematic scheme (absent from the reference) plugs
    into the image Gibbs sampler."""
    sampler, dataset, test_img, y0, mask = restoration
    import dataclasses
    s2 = dataclasses.replace(sampler, cond_resampling="systematic")
    x0 = jnp.zeros(dataset.unobs_shape)
    us_star = jnp.zeros((s2.nsteps + 1, *dataset.unobs_shape))
    bs_star = jnp.zeros((s2.nsteps + 1,), dtype=int)
    x0, us_star, bs_star, _ = s2.gibbs_step(jax.random.PRNGKey(11), x0, y0,
                                            us_star, bs_star, mask)
    assert bool(jnp.all(jnp.isfinite(x0)))
