"""CSMC invariance test: a Gibbs chain alternating exact y|x draws with CSMC
x|y updates must leave the GP prior invariant (the reference's strategy,
``tests/test_csmc.py``).  Parametrised over both backward passes and over the
conditional resampling scheme — including the conditional systematic variant
the reference never implemented.

The 2000-sweep chain runs inside one ``lax.scan`` (the reference loops on the
host), so the whole test is a single compiled program.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest


from fbs_tpu.math import discretise_lti_sde
from fbs_tpu.samplers.csmc.csmc import csmc_kernel
from fbs_tpu.samplers.csmc.resamplings import killing, multinomial, systematic

ell, sigma = 1.0, 1.0
a, b = -1 / ell, math.sqrt(2 / ell) * sigma


def gp_cov(t1, t2):
    return sigma ** 2 * jnp.exp(-jnp.abs(t1[None, :] - t2[:, None]) / ell)


@pytest.mark.parametrize("backward", [False, True])
@pytest.mark.parametrize("cond_resampling", [killing, multinomial, systematic])
def test_csmc_gibbs_invariance(backward, cond_resampling):
    T = 10
    nsteps = 10
    ts = jnp.linspace(0, T, nsteps + 1)
    dt = T / nsteps

    nparticles = 10
    niters = 2000
    burnin = 1000

    F, Q = discretise_lti_sde(a * jnp.eye(1), b ** 2 * jnp.eye(1), dt)
    F, Q = jnp.squeeze(F), jnp.squeeze(Q)
    chol_Q = jnp.sqrt(Q)
    R = 1.0

    def emission(x):
        return jnp.tanh(x)

    def init_sampler(key_, n):
        return sigma * jax.random.normal(key_, (n,))

    def init_likelihood_logpdf(y0, x0, _):
        return jax.scipy.stats.norm.logpdf(y0, emission(x0), math.sqrt(R))

    def transition_sampler(x, v_prev, t_prev, key_):
        return x * F + jax.random.normal(key_, x.shape) * chol_Q

    def transition_logpdf(x, x_prev, v_prev, t_prev):
        return jax.scipy.stats.norm.logpdf(x, x_prev * F, chol_Q)

    def likelihood_logpdf(y, x, y_prev, t_prev):
        return jax.scipy.stats.norm.logpdf(y, emission(x), math.sqrt(R))

    def sweep(carry, key_):
        xs_star, bs_star = carry
        key_y, key_csmc = jax.random.split(key_)
        ys = emission(xs_star) + math.sqrt(R) * jax.random.normal(key_y, xs_star.shape)
        xs_star, bs_star = csmc_kernel(key_csmc, xs_star, bs_star, ys, ts,
                                       init_sampler, init_likelihood_logpdf,
                                       transition_sampler, transition_logpdf,
                                       likelihood_logpdf,
                                       cond_resampling, nparticles,
                                       backward=backward)
        return (xs_star, bs_star), xs_star

    key = jax.random.PRNGKey(666)
    key, subkey = jax.random.split(key)
    xs_star = jnp.linalg.cholesky(gp_cov(ts, ts)) @ jax.random.normal(subkey, ts.shape)
    bs_star = jnp.zeros((nsteps + 1,), dtype=int)

    keys = jax.random.split(key, niters)
    _, gibbs_samples = jax.lax.scan(sweep, (xs_star, bs_star), keys)
    gibbs_samples = np.asarray(gibbs_samples)[burnin:]

    cov_gibbs = np.cov(gibbs_samples, rowvar=False)
    npt.assert_allclose(np.mean(gibbs_samples, axis=0), np.zeros_like(ts), atol=1.5e-1)
    npt.assert_allclose(np.diag(cov_gibbs), np.diag(gp_cov(ts, ts)), rtol=1.5e-1, atol=1.5e-1)
    npt.assert_allclose(cov_gibbs, gp_cov(ts, ts), atol=2e-1)
