"""Iterative-proportional-fitting (Schrodinger bridge) losses.

TPU-native rebuild of reference ``fbs/dsb/base.py``: the discrete-k loss, the
de Bortoli Proposition-29 mean-matching loss (scan form), and the vectorised
trajectory variant.  In ``ipf_loss_cont_v`` the parametric network is
evaluated once over the flattened ``(nsteps * batch)`` axis — a single large
MXU matmul — instead of a ``vmap`` over the time axis (reference
``fbs/dsb/base.py:138-141``).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from fbs_tpu.typing import JArray, JFloat, JKey, FloatScalar

__all__ = ["ipf_loss_disc", "ipf_loss_cont", "ipf_loss_cont_v"]


def ipf_loss_disc(param: JArray,
                  simulator_param: JArray,
                  x0s: JArray,
                  ks: JArray,
                  gammas: FloatScalar,
                  parametric_fn: Callable[[JArray, FloatScalar, JArray], JArray],
                  simulator_fn: Callable[[JArray, FloatScalar, JArray], JArray],
                  key: JKey) -> JFloat:
    """Discrete-time IPF loss (reference ``fbs/dsb/base.py:7-32``)."""
    nsamples, d = x0s.shape
    nsteps = ks.shape[0] - 1

    def scan_body(carry, elem):
        x, err = carry
        k, k_next, gamma, rnd = elem

        sim_x = simulator_fn(x, k, simulator_param)
        x_next = sim_x + jnp.sqrt(gamma) * rnd
        err = err + jnp.mean((parametric_fn(x_next, k_next, param)
                              - (x_next + sim_x - simulator_fn(x_next, k, simulator_param))) ** 2)
        return (x_next, err), None

    key, subkey = jax.random.split(key)
    rnds = jax.random.normal(subkey, (nsteps, nsamples, d))
    (_, err_final), _ = jax.lax.scan(scan_body, (x0s, 0.), (ks[:-1], ks[1:], gammas, rnds))
    return jnp.mean(err_final)


def ipf_loss_cont(key: JKey,
                  param: JArray,
                  simulator_param: JArray,
                  init_samples: JArray,
                  ts: JArray,
                  parametric_drift: Callable[[JArray, FloatScalar, JArray], JArray],
                  simulator_drift: Callable[[JArray, FloatScalar, JArray], JArray],
                  dispersion: Callable) -> JFloat:
    """Continuous-time mean-matching IPF loss, Proposition 29 of de Bortoli et
    al. 2021 (reference ``fbs/dsb/base.py:35-108``).

    Simulates with the frozen ``simulator_drift`` network and regresses the
    ``parametric_drift`` network on the mean-matching target, accumulating the
    error inside the simulation scan.
    """
    nsteps = ts.shape[0] - 1
    fn = lambda x, t, dt: x + simulator_drift(x, t, simulator_param) * dt

    def scan_body(carry, elem):
        x, err = carry
        t, t_next, rnd = elem

        dt = jnp.abs(t_next - t)
        x_next = x + simulator_drift(x, t, simulator_param) * dt + jnp.sqrt(dt) * dispersion(t) * rnd
        err = err + jnp.mean(
            (parametric_drift(x_next, t_next, param) * dt - (fn(x, t, dt) - fn(x_next, t, dt))) ** 2)
        return (x_next, err), None

    key, subkey = jax.random.split(key)
    rnds = jax.random.normal(subkey, (nsteps, *init_samples.shape))
    (_, err_final), _ = jax.lax.scan(scan_body, (init_samples, 0.), (ts[:-1], ts[1:], rnds))
    return jnp.mean(err_final / nsteps)


def ipf_loss_cont_v(key: JKey,
                    param: JArray,
                    simulator_param: JArray,
                    init_samples: JArray,
                    ts: JArray,
                    parametric_drift: Callable[[JArray, FloatScalar, JArray], JArray],
                    simulator_drift: Callable[[JArray, FloatScalar, JArray], JArray],
                    dispersion: Callable) -> JFloat:
    """Same loss as :func:`ipf_loss_cont`, but simulates the full trajectory
    first and evaluates the parametric drift over all ``(step, sample)`` pairs
    in one flattened batch (reference ``fbs/dsb/base.py:111-142``)."""
    nsteps = ts.shape[0] - 1
    fn = lambda x, t, dt: x + simulator_drift(x, t, simulator_param) * dt

    def scan_body(x, elem):
        t, t_next, rnd = elem
        dt = jnp.abs(t_next - t)
        x = x + simulator_drift(x, t, simulator_param) * dt + jnp.sqrt(dt) * dispersion(t) * rnd
        return x, x

    key, subkey = jax.random.split(key)
    rnds = jax.random.normal(subkey, (nsteps, *init_samples.shape))
    _, trajs = jax.lax.scan(scan_body, init_samples, (ts[:-1], ts[1:], rnds))
    trajs = jnp.concatenate([jnp.expand_dims(init_samples, axis=0), trajs], axis=0)

    dts = jnp.expand_dims(jnp.abs(jnp.diff(ts)),
                          axis=list(i + 1 for i in range(init_samples.ndim)))

    # One flattened network evaluation over all (step, sample) pairs.
    batch_shape = trajs.shape[1:]
    flat_x = trajs[1:].reshape(nsteps * batch_shape[0], *batch_shape[1:])
    flat_t = jnp.repeat(ts[1:], batch_shape[0])
    param_evals = parametric_drift(flat_x, flat_t, param).reshape(nsteps, *batch_shape)

    errs = param_evals * dts - (
        jax.vmap(fn, in_axes=[0, 0, 0])(trajs[:-1], ts[:-1], dts)
        - jax.vmap(fn, in_axes=[0, 0, 0])(trajs[1:], ts[:-1], dts))
    return jnp.mean(errs ** 2)
