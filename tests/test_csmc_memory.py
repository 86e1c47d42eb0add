"""Memory-variant CSMC checks: the terminal-only forward pass matches the
full-history pass exactly, and bf16 history keeps the kernel statistically
intact."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt

from fbs_tpu.math import discretise_lti_sde
from fbs_tpu.samplers.csmc.csmc import csmc_kernel, forward_pass, forward_pass_terminal
from fbs_tpu.samplers.csmc.resamplings import killing


def _setup():
    a, b = -1.0, math.sqrt(2.0)
    T, nsteps = 5, 8
    ts = jnp.linspace(0, T, nsteps + 1)
    dt = T / nsteps
    F, Q = discretise_lti_sde(a * jnp.eye(1), b ** 2 * jnp.eye(1), dt)
    F, Q = jnp.squeeze(F), jnp.squeeze(Q)
    chol_Q = jnp.sqrt(Q)
    R = 1.0

    def init_sampler(key_, n):
        return jax.random.normal(key_, (n,))

    def init_likelihood_logpdf(y0, x0, _):
        return jax.scipy.stats.norm.logpdf(y0, jnp.tanh(x0), math.sqrt(R))

    def transition_sampler(x, v_prev, t_prev, key_):
        return x * F + jax.random.normal(key_, x.shape) * chol_Q

    def transition_logpdf(x, x_prev, v_prev, t_prev):
        return jax.scipy.stats.norm.logpdf(x, x_prev * F, chol_Q)

    def likelihood_logpdf(y, x, y_prev, t_prev):
        return jax.scipy.stats.norm.logpdf(y, jnp.tanh(x), math.sqrt(R))

    key = jax.random.PRNGKey(0)
    us_star = jax.random.normal(key, (nsteps + 1,))
    bs_star = jnp.zeros((nsteps + 1,), dtype=int)
    vs = jax.random.normal(jax.random.PRNGKey(1), (nsteps + 1,))
    return (us_star, bs_star, vs, ts, init_sampler, init_likelihood_logpdf,
            transition_sampler, transition_logpdf, likelihood_logpdf)


def test_terminal_pass_matches_full_history():
    (us_star, bs_star, vs, ts, init_sampler, init_lik,
     trans, trans_lp, lik) = _setup()
    key = jax.random.PRNGKey(7)
    nparticles = 6

    As, log_wss, uss = forward_pass(key, us_star, bs_star, vs, ts,
                                    init_sampler, init_lik, trans, lik,
                                    killing, nparticles)
    log_ws_T, us_T = forward_pass_terminal(key, us_star, bs_star, vs, ts,
                                           init_sampler, init_lik, trans, lik,
                                           killing, nparticles)
    npt.assert_allclose(np.asarray(log_wss[-1]), np.asarray(log_ws_T), rtol=1e-12)
    npt.assert_allclose(np.asarray(uss[-1]), np.asarray(us_T), rtol=1e-12)


def test_bf16_history_close_to_f32():
    (us_star, bs_star, vs, ts, init_sampler, init_lik,
     trans, trans_lp, lik) = _setup()
    key = jax.random.PRNGKey(9)
    nparticles = 6

    for backward in (False, True):
        out32 = csmc_kernel(key, us_star, bs_star, vs, ts, init_sampler, init_lik,
                            trans, trans_lp, lik, killing, nparticles,
                            backward=backward)
        out16 = csmc_kernel(key, us_star, bs_star, vs, ts, init_sampler, init_lik,
                            trans, trans_lp, lik, killing, nparticles,
                            backward=backward, history_dtype=jnp.bfloat16)
        assert out16[0].dtype == out32[0].dtype
        # Same genealogy decisions at bf16 storage precision -> trajectories
        # agree to bf16 tolerance.
        npt.assert_allclose(np.asarray(out16[0]), np.asarray(out32[0]),
                            rtol=2e-2, atol=2e-2)
        npt.assert_array_equal(np.asarray(out16[1]), np.asarray(out32[1]))