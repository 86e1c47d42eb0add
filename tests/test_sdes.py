"""SDE layer oracles, adapted from the reference's test strategy
(``tests/test_sdes.py`` in zgbkdlm/fbs): stationarity fixed points, autodiff
score oracles, simulated-moment matching, zero-loss-at-truth, Doob bridge
pinning, OU-vs-general cross-checks, and the Gaussian SB closed form.
"""
import math

import jax
import jax.numpy as jnp
import numpy.testing as npt
import pytest


from fbs_tpu.math import discretise_lti_sde
from fbs_tpu.sdes import (
    StationaryConstLinearSDE,
    StationaryLinLinearSDE,
    StationaryExpLinearSDE,
    make_linear_sde,
    make_ou_sde,
    make_linear_sde_law_loss,
    make_gaussian_bw_sb,
    euler_maruyama,
    reverse_simulator,
    doob_bridge_simulator,
)

SDES = [
    StationaryConstLinearSDE(a=-0.8, b=math.sqrt(1.6)),
    StationaryLinLinearSDE(beta_min=0.02, beta_max=4.0, t0=0.0, T=2.0),
    StationaryExpLinearSDE(a=-0.8, b=math.sqrt(1.6), c=1.2, z=1.0),
]


@pytest.mark.parametrize("sde", SDES)
def test_discretisation_stationary_limit(sde):
    """As t -> inf, F -> 0 and Q -> stationary variance (=1 for these params)."""
    F, Q = sde.discretise(30.0, 0.0)
    npt.assert_allclose(F, 0.0, atol=1e-8)
    npt.assert_allclose(Q, 1.0, atol=1e-6)


@pytest.mark.parametrize("sde", SDES)
def test_cond_score_matches_autodiff(sde):
    """cond_score_t_0 equals grad_x log N(x; F x0, Q)."""
    _, cond_score_t_0, _ = make_linear_sde(sde)
    t, s = 1.3, 0.2
    x0 = jnp.array([0.5, -1.2])
    x = jnp.array([0.3, 0.9])

    F, Q = sde.discretise(t, s)

    def logpdf(z):
        return jnp.sum(jax.scipy.stats.norm.logpdf(z, F * x0, jnp.sqrt(Q)))

    npt.assert_allclose(cond_score_t_0(x, t, x0, s), jax.grad(logpdf)(x), rtol=1e-10)


@pytest.mark.parametrize("sde", SDES)
def test_simulated_moments(sde):
    """Monte-Carlo path moments match the closed-form (F, Q)."""
    key = jax.random.PRNGKey(666)
    _, _, simulate_cond_forward = make_linear_sde(sde)
    x0 = jnp.array([1.0, -1.0])
    ts = jnp.linspace(0.0, 1.5, 16)

    keys = jax.random.split(key, 100_000)
    paths = jax.vmap(lambda k: simulate_cond_forward(k, x0, ts, keep_path=True))(keys)

    F, Q = sde.discretise(ts[-1], ts[0])
    npt.assert_allclose(jnp.mean(paths[:, -1], axis=0), F * x0, atol=2e-2)
    npt.assert_allclose(jnp.var(paths[:, -1], axis=0), Q * jnp.ones(2), rtol=2e-2)


@pytest.mark.parametrize("sde", SDES)
def test_marginal_sampling_matches_path_sampling(sde):
    """keep_path=False (scalar-time marginal draw, as used by the save_mem
    loss) agrees with the closed-form transition law."""
    key = jax.random.PRNGKey(42)
    _, _, simulate_cond_forward = make_linear_sde(sde)
    x0 = jnp.array([0.7])
    t = jnp.asarray(1.0)

    keys = jax.random.split(key, 50_000)
    marg = jax.vmap(lambda k: simulate_cond_forward(k, x0, t, t0=0.0, keep_path=False))(keys)
    F, Q = sde.discretise(t, 0.0)
    npt.assert_allclose(jnp.mean(marg), F * x0[0], atol=2e-2)
    npt.assert_allclose(jnp.var(marg), Q, rtol=3e-2)


def test_ou_vs_general_factory_crosscheck():
    """The legacy OU factory and the general factory agree."""
    a, b = -0.7, 1.1
    sde = StationaryConstLinearSDE(a=a, b=b)
    disc_g, score_g, sim_g = make_linear_sde(sde)
    disc_o, score_o, sim_o = make_ou_sde(a, b)

    t = 0.9
    F_g, Q_g = disc_g(t, 0.0)
    F_o, Q_o = disc_o(t)
    npt.assert_allclose(F_g, F_o, rtol=1e-12)
    npt.assert_allclose(Q_g, Q_o, rtol=1e-12)

    x = jnp.array([0.2, -0.4])
    x0 = jnp.array([1.0, 1.0])
    npt.assert_allclose(score_g(x, t, x0, 0.0), score_o(x, t, x0), rtol=1e-12)

    key = jax.random.PRNGKey(0)
    ts = jnp.linspace(0.0, 1.0, 11)
    npt.assert_allclose(sim_g(key, x0, ts), sim_o(key, x0, ts), rtol=1e-10)


def test_bridge_drift_matches_autodiff():
    """Closed-form Doob bridge drift equals the autodiff h-transform."""
    for sde in SDES[:2]:
        t, T = 0.4, 1.5
        x = jnp.array([0.3, -0.8])
        target = jnp.array([1.0, 0.5])

        def log_h(tgt, z):
            F, Q = sde.discretise(T, t)
            return jnp.sum(jax.scipy.stats.norm.logpdf(tgt, F * z, jnp.sqrt(Q)))

        score_h = jax.grad(log_h, argnums=1)(target, x)
        expected = sde.drift(x, t) + sde.dispersion(t) ** 2 * score_h
        npt.assert_allclose(sde.bridge_drift(x, t, target, T), expected, rtol=1e-10)


def test_doob_bridge_hits_target():
    sde = StationaryConstLinearSDE(a=-0.5, b=1.0)
    key = jax.random.PRNGKey(7)
    ts = jnp.linspace(0.0, 1.0, 51)
    x0 = jnp.array([0.0])
    xT = jnp.array([1.3])

    keys = jax.random.split(key, 2000)
    paths = jax.vmap(lambda k: doob_bridge_simulator(k, sde, x0, xT, ts,
                                                     integration_nsteps=5, replace=False))(keys)
    # Terminal values concentrate near the target.
    npt.assert_allclose(jnp.mean(paths[:, -1]), xT[0], atol=5e-2)
    assert jnp.std(paths[:, -1]) < 0.2

    replaced = doob_bridge_simulator(key, sde, x0, xT, ts, integration_nsteps=5, replace=True)
    npt.assert_allclose(replaced[-1], xT)


def test_dsm_loss_zero_at_true_score():
    """The DSM loss vanishes when the network is the exact conditional score
    of a Dirac initial condition."""
    sde = StationaryConstLinearSDE(a=-0.5, b=1.0)
    _, cond_score_t_0, _ = make_linear_sde(sde)
    x0_fixed = jnp.array([0.7, -0.3])

    def nn_fn(x, t, param):
        # Broadcast over batch: t can be (B,) while x is (B, d).
        return cond_score_t_0(x, t[..., None] if jnp.ndim(t) > 0 else t, x0_fixed, 0.0)

    loss_fn = make_linear_sde_law_loss(sde, nn_fn, t0=0.0, T=1.0, nsteps=16,
                                       random_times=True, loss_type="score")
    key = jax.random.PRNGKey(3)
    x0s = jnp.tile(x0_fixed, (8, 1))
    loss = loss_fn(None, key, x0s)
    npt.assert_allclose(loss, 0.0, atol=1e-12)


def test_reversal_preserves_stationarity():
    """Simulating the reverse SDE from the stationary law stays stationary."""
    sde = StationaryConstLinearSDE(a=-0.5, b=1.0)
    T = 1.0
    nsteps = 100
    ts = jnp.linspace(0.0, T, nsteps + 1)

    def stationary_score(u, t):
        return -u  # N(0, 1) stationary law

    key = jax.random.PRNGKey(11)
    keys = jax.random.split(key, 20_000)
    u0s = jax.random.normal(jax.random.PRNGKey(12), (20_000, 1))
    terms = jax.vmap(lambda k, u0: reverse_simulator(k, u0, ts, stationary_score,
                                                     sde.drift, sde.dispersion))(keys, u0s)
    npt.assert_allclose(jnp.mean(terms), 0.0, atol=2e-2)
    npt.assert_allclose(jnp.var(terms), 1.0, rtol=5e-2)


def test_euler_maruyama_path_and_substeps():
    """return_path grid alignment and substep convergence for a linear SDE."""
    key = jax.random.PRNGKey(5)
    ts = jnp.linspace(0.0, 1.0, 6)
    x0 = jnp.array([1.0])

    drift = lambda x, t: -x
    disp = lambda t: 0.0  # deterministic: exact solution e^{-t}

    path = euler_maruyama(key, x0, ts, drift, disp, integration_nsteps=200, return_path=True)
    assert path.shape == (6, 1)
    npt.assert_allclose(path[:, 0], jnp.exp(-ts), rtol=1e-2)
    term = euler_maruyama(key, x0, ts, drift, disp, integration_nsteps=200, return_path=False)
    npt.assert_allclose(term, path[-1], rtol=1e-12)


def test_gaussian_sb_marginals_and_drift():
    """Closed-form Gaussian SB: correct endpoints, and EM simulation of the
    drift reproduces the marginal flow."""
    key = jax.random.PRNGKey(666)
    d = 2
    mean0 = jnp.array([0.5, -0.5])
    cov0 = jnp.array([[1.0, 0.3], [0.3, 0.8]])
    mean1 = jnp.array([-1.0, 1.0])
    cov1 = jnp.array([[0.6, -0.1], [-0.1, 1.2]])

    marginal_mean, marginal_cov, drift = make_gaussian_bw_sb(mean0, cov0, mean1, cov1, sig=1.0)

    npt.assert_allclose(marginal_mean(0.0), mean0, atol=1e-9)
    npt.assert_allclose(marginal_mean(1.0), mean1, atol=1e-9)
    npt.assert_allclose(marginal_cov(0.0), cov0, atol=1e-9)
    npt.assert_allclose(marginal_cov(1.0), cov1, atol=1e-9)

    # Simulate the SB SDE from N(mean0, cov0) to t=1; marginals should match.
    nsim = 50_000
    ts = jnp.linspace(0.0, 1.0, 101)
    chol0 = jnp.linalg.cholesky(cov0)
    x0s = mean0 + jax.random.normal(key, (nsim, d)) @ chol0.T
    keys = jax.random.split(jax.random.PRNGKey(1), nsim)
    sig = 1.0
    terms = jax.vmap(lambda k, x0: euler_maruyama(k, x0, ts, drift, lambda t: sig))(keys, x0s)
    npt.assert_allclose(jnp.mean(terms, axis=0), mean1, atol=5e-2)
    npt.assert_allclose(jnp.cov(terms, rowvar=False), cov1, atol=8e-2)


def test_discretise_lti_sde_matches_scalar():
    """Matrix-fraction LTI discretisation agrees with the scalar OU closed form."""
    a, b = -0.5, 0.9
    dt = 0.3
    F, Q = discretise_lti_sde(a * jnp.eye(1), b ** 2 * jnp.eye(1), dt)
    npt.assert_allclose(jnp.squeeze(F), math.exp(a * dt), rtol=1e-10)
    npt.assert_allclose(jnp.squeeze(Q), b ** 2 / (2 * a) * (math.exp(2 * a * dt) - 1), rtol=1e-8)


def test_heun_beats_euler_bias():
    """Stochastic Heun has smaller discretisation bias than Euler-Maruyama at
    the same (coarse) step count for an OU reversal."""
    from fbs_tpu.sdes import heun

    sde = StationaryConstLinearSDE(a=-0.5, b=1.0)
    T = 1.0
    ts = jnp.linspace(0.0, T, 9)  # deliberately coarse

    def stationary_score(u, t):
        return -u

    def reverse_drift(u, t):
        return -sde.drift(u, T - t) + sde.dispersion(T - t) ** 2 * stationary_score(u, T - t)

    def reverse_dispersion(t):
        return sde.dispersion(T - t)

    n = 200_000
    u0s = jax.random.normal(jax.random.PRNGKey(0), (n, 1))
    keys = jax.random.split(jax.random.PRNGKey(1), n)

    em = jax.vmap(lambda k, u: euler_maruyama(k, u, ts, reverse_drift, reverse_dispersion))(keys, u0s)
    hn = jax.vmap(lambda k, u: heun(k, u, ts, reverse_drift, reverse_dispersion))(keys, u0s)

    # Both should stay ~stationary N(0,1); Heun's variance bias is smaller.
    em_bias = abs(float(jnp.var(em)) - 1.0)
    hn_bias = abs(float(jnp.var(hn)) - 1.0)
    assert hn_bias < em_bias, (hn_bias, em_bias)
    npt.assert_allclose(jnp.mean(hn), 0.0, atol=2e-2)
