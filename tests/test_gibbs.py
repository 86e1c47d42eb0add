"""End-to-end Gibbs kernel test on a 2-D Gaussian: the chain must target the
exact conditional p(x0 | y0) (the reference's strategy, ``tests/test_gibbs.py``,
which runs this in f32).  Additionally checks that the fused
transition+likelihood kernel (one score evaluation per step) yields the same
posterior — the 2x-fewer-network-evals path used on TPU.

The 10k-sweep chain runs inside one ``lax.scan``.
"""
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest


from fbs_tpu.samplers import gibbs_kernel, make_separable_kernels
from fbs_tpu.sdes import make_linear_sde, StationaryConstLinearSDE


def _setup():
    m0 = jnp.array([-1.0, 1.0])
    cov0 = jnp.array([[2.0, 0.4],
                      [0.4, 0.5]])
    y0 = jnp.array([0.0])

    true_posterior_mean = m0[0] + cov0[0, 1] / cov0[1, 1] * (y0 - m0[1])
    true_posterior_var = cov0[0, 0] - cov0[0, 1] / cov0[1, 1] * cov0[1, 0]

    T = 1.0
    nsteps = 100
    dt = T / nsteps
    ts = jnp.linspace(0, T, nsteps + 1)

    sde = StationaryConstLinearSDE(a=-0.5, b=1.0)
    discretise_linear_sde, _, simulate_cond_forward = make_linear_sde(sde)

    def forward_m_cov(t):
        F_, Q_ = discretise_linear_sde(t, ts[0])
        return F_ * m0, F_ ** 2 * cov0 + Q_ * jnp.eye(2)

    def score(z, t):
        mt, covt = forward_m_cov(t)
        chol = jax.scipy.linalg.cho_factor(covt)
        return -jax.scipy.linalg.cho_solve(chol, z - mt)

    def unpack(xy):
        return xy[..., :1], xy[..., 1:]

    def reverse_drift(uv, t):
        return -sde.drift(uv, T - t) + sde.dispersion(T - t) ** 2 * score(uv, T - t)

    def reverse_dispersion(t):
        return sde.dispersion(T - t)

    def fwd_sampler(key_, x0_, y0_):
        return simulate_cond_forward(key_, jnp.concatenate([x0_, y0_]), ts)

    # Closures via the centralised builder (batched joint drift).
    def reverse_drift_batched(uvs, t):
        return jax.vmap(reverse_drift, in_axes=[0, None])(uvs, t)

    def concat(us, v):
        vs = jnp.broadcast_to(v, (us.shape[0], *v.shape))
        return jnp.concatenate([us, vs], axis=-1)

    kernels = make_separable_kernels(reverse_drift_batched, reverse_dispersion,
                                     concat, unpack, dt)
    return (sde, ts, dt, y0, fwd_sampler, unpack, kernels,
            true_posterior_mean, true_posterior_var, nsteps)


@pytest.mark.parametrize("use_fused", [False, True])
def test_gibbs_kernel_targets_conditional(use_fused):
    (sde, ts, dt, y0, fwd_sampler, unpack, kernels,
     true_mean, true_var, nsteps) = _setup()
    transition_sampler, transition_logpdf, likelihood_logpdf, fused_kernel = kernels

    nparticles = 10
    nsamples = 10_000
    burnin = 100

    def sweep(carry, key_):
        x0, us_star, bs_star = carry
        x0, us_star, bs_star, _ = gibbs_kernel(
            key_, x0, y0, us_star, bs_star,
            ts, fwd_sampler, sde, unpack, nparticles,
            transition_sampler, transition_logpdf, likelihood_logpdf,
            marg_y=False, explicit_backward=True, explicit_final=False,
            fused_kernel=fused_kernel if use_fused else None)
        return (x0, us_star, bs_star), x0[0]

    key = jax.random.PRNGKey(666)
    x0 = jnp.array([0.0])
    us_star = jnp.zeros((nsteps + 1, 1))
    bs_star = jnp.zeros((nsteps + 1,), dtype=int)

    keys = jax.random.split(key, nsamples)
    _, x0s = jax.lax.scan(sweep, (x0, us_star, bs_star), keys)
    x0s = np.asarray(x0s)[burnin:]

    npt.assert_allclose(np.mean(x0s), true_mean, rtol=5e-2)
    npt.assert_allclose(np.var(x0s), true_var, rtol=5e-2)


def test_gibbs_marg_y_runs():
    """The marg_y (Doob-bridged y-path) variant runs and keeps targeting the
    conditional (smoke-scale; the reference never uses it in the paper)."""
    (sde, ts, dt, y0, fwd_sampler, unpack, kernels,
     true_mean, true_var, nsteps) = _setup()
    transition_sampler, transition_logpdf, likelihood_logpdf, fused_kernel = kernels

    def sweep(carry, key_):
        x0, us_star, bs_star = carry
        x0, us_star, bs_star, _ = gibbs_kernel(
            key_, x0, y0, us_star, bs_star,
            ts, fwd_sampler, sde, unpack, 10,
            transition_sampler, transition_logpdf, likelihood_logpdf,
            marg_y=True, explicit_backward=True, explicit_final=False,
            fused_kernel=fused_kernel)
        return (x0, us_star, bs_star), x0[0]

    keys = jax.random.split(jax.random.PRNGKey(1), 400)
    _, x0s = jax.lax.scan(sweep, (jnp.array([0.0]),
                                  jnp.zeros((nsteps + 1, 1)),
                                  jnp.zeros((nsteps + 1,), dtype=int)), keys)
    x0s = np.asarray(x0s)[100:]
    assert np.all(np.isfinite(x0s))
    npt.assert_allclose(np.mean(x0s), true_mean, atol=0.3)
