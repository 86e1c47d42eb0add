"""Builders for the sampler closures of separable forward processes.

The reference builds ``transition_sampler`` / ``transition_logpdf`` /
``likelihood_logpdf`` by hand in every experiment script
(e.g. ``experiments/imgs/inpainting.py:102-147``), and each of the first and
third closures evaluates the *same* full-state reverse drift (one score-network
forward) before unpacking different halves — so every CSMC/filter step costs
two identical network evaluations.

This module centralises that construction and exposes the fused variant: one
drift evaluation per (particle, step), shared between the transition proposal
and the likelihood weight — a 2x algorithmic win on the sampler hot loop
(SURVEY.md section 7, hard part 4).

Closure semantics follow the reference exactly: for the discretised backward
SDE with step ``dt = t_{k} - t_{k-1}`` (uniform grids assumed by the
experiments),

- ``u_k | u_{k-1}, v_{k-1} ~ N(u_{k-1} + f_u(u_{k-1}, v_{k-1}, t_{k-1}) dt, g^2 dt)``
- ``v_k | u_{k-1}, v_{k-1} ~ N(v_{k-1} + f_v(v_{k-1}, u_{k-1}, t_{k-1}) dt, g^2 dt)``

where ``(f_u, f_v)`` are the unpacked halves of the joint reverse drift.
"""
from __future__ import annotations

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from fbs_tpu.typing import FloatScalar

__all__ = ["make_separable_kernels"]


def _gaussian_logpdf(x, mean, std, sum_axes):
    z = (x - mean) / std
    return jnp.sum(-0.5 * z ** 2 - jnp.log(std) - 0.5 * math.log(2 * math.pi), axis=sum_axes)


def make_separable_kernels(reverse_drift_joint: Callable,
                           reverse_dispersion: Callable,
                           concat: Callable,
                           unpack: Callable,
                           dt: FloatScalar,
                           microbatch: int = 1) -> Tuple[Callable, Callable, Callable, Callable]:
    """Build ``(transition_sampler, transition_logpdf, likelihood_logpdf,
    fused_kernel)`` from a joint reverse drift.

    Parameters
    ----------
    reverse_drift_joint : Callable (n, ...joint) , () -> (n, ...joint)
        Batched reverse drift of the joint (u, v) state — typically a score
        network evaluated on the re-assembled full state.
    reverse_dispersion : Callable () -> ()
        Scalar dispersion of the reverse SDE at time ``t``.
    concat : Callable (n, ...du), (...dv), **kwargs -> (n, ...joint)
        Re-assemble the joint state from the u-batch and a broadcast v.
    unpack : Callable (n, ...joint), **kwargs -> ((n, ...du), (n, ...dv))
        Split a joint-state batch back into the u and v parts.
    dt : float
        The (uniform) time step of the sampler grid.

    Extra keyword arguments given to the returned closures (e.g. a ``mask_``
    identifying per-observation index sets, as in the image-restoration
    tasks) are forwarded to ``concat``/``unpack``.

    ``microbatch > 1`` evaluates the joint drift over the particle batch in
    that many sequential chunks (``lax.map``), so only one chunk's network
    activations are live at a time — the single-chip fit knob for large
    particle counts at high resolution (256^2 N=128 needs 20.1 GB of
    activations at once on one 16 GB chip; two chunks fit).  The per-sample
    math is unchanged, so results match the unchunked kernels.

    Returns
    -------
    The three reference-API closures plus the fused kernel
    ``fused_kernel(us_prev, v, v_prev, t_prev, key) -> (us, log_ws)`` that
    evaluates the joint drift once and reuses it for both the proposal and
    the likelihood weights.
    """

    def _eval_drift(joint, t_prev):
        if microbatch <= 1:
            return reverse_drift_joint(joint, t_prev)
        n = joint.shape[0]
        if n % microbatch:
            raise ValueError(f"particle count {n} not divisible by "
                             f"microbatch {microbatch}")
        chunks = joint.reshape(microbatch, n // microbatch, *joint.shape[1:])
        out = jax.lax.map(lambda c: reverse_drift_joint(c, t_prev), chunks)
        return out.reshape(n, *out.shape[2:])

    def _joint_drift_parts(us_prev, v_prev, t_prev, kwargs):
        joint = concat(us_prev, v_prev, **kwargs)
        drift = _eval_drift(joint, t_prev)
        return unpack(drift, **kwargs)

    def transition_sampler(us_prev, v_prev, t_prev, key, **kwargs):
        drift_u, _ = _joint_drift_parts(us_prev, v_prev, t_prev, kwargs)
        g = reverse_dispersion(t_prev)
        return (us_prev + drift_u * dt
                + jnp.sqrt(dt) * g * jax.random.normal(key, us_prev.shape))

    def transition_logpdf(u, us_prev, v_prev, t_prev, **kwargs):
        drift_u, _ = _joint_drift_parts(us_prev, v_prev, t_prev, kwargs)
        g = reverse_dispersion(t_prev)
        mean = us_prev + drift_u * dt
        sum_axes = tuple(range(1, us_prev.ndim))
        return _gaussian_logpdf(u, mean, jnp.sqrt(dt) * g, sum_axes)

    def likelihood_logpdf(v, us_prev, v_prev, t_prev, **kwargs):
        _, drift_v = _joint_drift_parts(us_prev, v_prev, t_prev, kwargs)
        g = reverse_dispersion(t_prev)
        mean = v_prev + drift_v * dt
        sum_axes = tuple(range(1, mean.ndim))
        return _gaussian_logpdf(v, mean, jnp.sqrt(dt) * g, sum_axes)

    def fused_kernel(us_prev, v, v_prev, t_prev, key, **kwargs):
        """One drift evaluation shared by proposal and likelihood."""
        drift_u, drift_v = _joint_drift_parts(us_prev, v_prev, t_prev, kwargs)
        g = reverse_dispersion(t_prev)
        sqdt_g = jnp.sqrt(dt) * g

        us = us_prev + drift_u * dt + sqdt_g * jax.random.normal(key, us_prev.shape)

        mean_v = v_prev + drift_v * dt
        sum_axes = tuple(range(1, mean_v.ndim))
        log_ws = _gaussian_logpdf(v, mean_v, sqdt_g, sum_axes)
        return us, log_ws

    return transition_sampler, transition_logpdf, likelihood_logpdf, fused_kernel
