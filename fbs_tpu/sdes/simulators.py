"""SDE simulators: Euler-Maruyama, reverse-time, Doob bridge, discrete-time.

TPU-native rebuild of the reference's ``fbs/sdes/simulators.py``.  The main
structural change: the reference nests a substep ``lax.scan`` inside the
per-step ``lax.scan`` (reference ``fbs/sdes/simulators.py:83-101``); here the
fine integration grid is flattened into a single scan over
``nsteps * integration_nsteps`` elements with all Gaussian noise drawn in one
``jax.random.normal`` call — one traced loop body, better XLA pipelining, and
a single PRNG expansion instead of ``nsteps`` splits.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from fbs_tpu.sdes.linear import LinearSDE
from fbs_tpu.typing import JArray, JKey

__all__ = [
    "euler_maruyama",
    "heun",
    "reverse_simulator",
    "discrete_time_simulator",
    "doob_bridge_simulator",
]


def _fine_grid(ts: JArray, integration_nsteps: int) -> JArray:
    """Times and substep sizes of the flattened fine grid.

    For each interval ``[t_k, t_{k+1}]`` with ``ddt = |t_{k+1} - t_k| / m``,
    produces the ``m`` left-endpoints ``t_k, t_k + ddt, ..., t_{k+1} - ddt``
    (matching the substep times of reference ``simulators.py:90-92``).
    """
    dts = ts[1:] - ts[:-1]  # (K,)
    ddts = jnp.abs(dts) / integration_nsteps  # (K,)
    sub = jnp.arange(integration_nsteps)  # (m,)
    fine_ts = ts[:-1, None] + jnp.sign(dts)[:, None] * ddts[:, None] * sub[None, :]
    fine_ddts = jnp.broadcast_to(ddts[:, None], fine_ts.shape)
    return fine_ts.reshape(-1), fine_ddts.reshape(-1)


def euler_maruyama(key: JKey, x0: JArray, ts: JArray,
                   drift: Callable, dispersion: Callable,
                   integration_nsteps: int = 1,
                   return_path: bool = False) -> JArray:
    r"""Integrate ``dX = drift(X, t) dt + dispersion(t) dW`` on the grid ``ts``
    with ``integration_nsteps`` Euler substeps per interval.

    Returns the terminal state, or the coarse-grid path when
    ``return_path=True`` (reference ``fbs/sdes/simulators.py:53-106``).
    """
    nsteps = ts.shape[0] - 1
    m = integration_nsteps
    fine_ts, fine_ddts = _fine_grid(ts, m)
    rnds = jax.random.normal(key, (nsteps * m, *x0.shape))

    def substep(x, t, ddt, rnd):
        return x + drift(x, t) * ddt + dispersion(t) * jnp.sqrt(ddt) * rnd

    if return_path:
        # Nested scans so only the coarse-grid states are materialised (the
        # fine grid would cost m x the path memory; m=100 for Doob bridges).
        ts_g = fine_ts.reshape(nsteps, m)
        ddts_g = fine_ddts.reshape(nsteps, m)
        rnds_g = rnds.reshape(nsteps, m, *x0.shape)

        def outer(x, elem):
            t_row, ddt_row, rnd_row = elem

            def inner(i, xi):
                return substep(xi, t_row[i], ddt_row[i], rnd_row[i])

            x = jax.lax.fori_loop(0, m, inner, x)
            return x, x

        _, coarse = jax.lax.scan(outer, x0, (ts_g, ddts_g, rnds_g))
        return jnp.concatenate([x0[jnp.newaxis], coarse], axis=0)
    else:
        terminal, _ = jax.lax.scan(
            lambda x, e: (substep(x, *e), None), x0, (fine_ts, fine_ddts, rnds))
        return terminal


def heun(key: JKey, x0: JArray, ts: JArray,
         drift: Callable, dispersion: Callable,
         return_path: bool = False) -> JArray:
    r"""Stochastic Heun (improved Euler) integrator: strong order 1.0 for
    additive noise, so the reverse-SDE discretisation bias at a given step
    count is substantially smaller than Euler-Maruyama's — or equivalently
    the same accuracy is reached with ~half the (score-network) steps.

    Not present in the reference (Euler-Maruyama only,
    ``fbs/sdes/simulators.py:53-106``); drift is evaluated twice per step, so
    use it where accuracy-per-step, not drift evaluations, is the budget
    (e.g. CSGM-style unconditional reverse sampling).
    """
    nsteps = ts.shape[0] - 1
    rnds = jax.random.normal(key, (nsteps, *x0.shape))

    def scan_body(x, elem):
        t, t_next, rnd = elem
        dt = jnp.abs(t_next - t)
        noise = dispersion(t) * jnp.sqrt(dt) * rnd
        f0 = drift(x, t)
        x_pred = x + f0 * dt + noise
        x = x + 0.5 * (f0 + drift(x_pred, t_next)) * dt + noise
        return x, x if return_path else None

    terminal, path = jax.lax.scan(scan_body, x0, (ts[:-1], ts[1:], rnds))
    if return_path:
        return jnp.concatenate([x0[jnp.newaxis], path], axis=0)
    return terminal


def reverse_simulator(key: JKey, u0: JArray, ts: JArray,
                      score: Callable, drift: Callable, dispersion: Callable,
                      integration_nsteps: int = 1,
                      integrator: str = "euler-maruyama") -> JArray:
    r"""Simulate the time reversal of an SDE: integrates
    ``du = [-f(u, T - t) + g^2(T - t) s(u, T - t)] dt + g(T - t) dW``
    (reference ``fbs/sdes/simulators.py:8-50``)."""
    T = ts[-1]

    def reverse_drift(u, t):
        return -drift(u, T - t) + dispersion(T - t) ** 2 * score(u, T - t)

    def reverse_dispersion(t):
        return dispersion(T - t)

    if integrator == "euler-maruyama":
        return euler_maruyama(key, u0, ts, reverse_drift, reverse_dispersion,
                              integration_nsteps=integration_nsteps)
    if integrator == "heun":
        return heun(key, u0, ts, reverse_drift, reverse_dispersion)
    raise NotImplementedError(f"Integrator {integrator} not implemented.")


def discrete_time_simulator(key: JKey, x0: JArray, ts: JArray,
                            f: Callable, q: Callable) -> JArray:
    """Simulate ``X_{k+1} = f(X_k, t_{k+1}, t_k) + q(t_{k+1}, t_k) w``
    (reference ``fbs/sdes/simulators.py:109-123``)."""

    def scan_body(x, elem):
        rnd, t_next, t = elem
        return f(x, t_next, t) + q(t_next, t) * rnd, None

    rnds = jax.random.normal(key, (ts.shape[0] - 1, *x0.shape))
    return jax.lax.scan(scan_body, x0, (rnds, ts[1:], ts[:-1]))[0]


def doob_bridge_simulator(key: JKey,
                          sde: LinearSDE,
                          x0: JArray, xT: JArray, ts: JArray,
                          integration_nsteps: int = 1,
                          replace: bool = False) -> JArray:
    """Simulate the Doob h-transform bridge of a linear SDE pinned at
    ``(x0, xT)`` (reference ``fbs/sdes/simulators.py:126-160``)."""

    def bridge_drift(x, t):
        return sde.bridge_drift(x, t, xT, ts[-1])

    bridge_path = euler_maruyama(key, x0, ts, bridge_drift, sde.dispersion,
                                 integration_nsteps=integration_nsteps, return_path=True)
    return bridge_path.at[-1].set(xT) if replace else bridge_path
