"""Sharded sampler and training wrappers (GSPMD).

Strategy: the particle axis of every sampler array is annotated with a named
sharding; XLA then runs the score-network evaluations fully sharded over chips
(the dominant cost — embarrassingly parallel over particles) and inserts
collectives only where the algorithm genuinely couples particles:

- the ``logsumexp`` weight normalisations -> all-reduce over ICI,
- the resampling ``take`` along the particle axis -> collective gather/all-to-all.

Resampling *index* computation operates on the (tiny, length-N) weight vector
and is replicated — only particle payloads move across chips.

These wrappers compose with the plain samplers in ``fbs_tpu.samplers``: they
wrap the user closures with ``with_sharding_constraint`` so the layout is
pinned at every scan step, preventing XLA from collapsing to a replicated
layout.
"""
from __future__ import annotations

from typing import Callable, Optional

from jax.lax import with_sharding_constraint
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


__all__ = [
    "shard_particle_closures",
    "shard_fused_kernel",
    "data_parallel_loss",
]


def shard_particle_closures(mesh: Mesh,
                            transition_sampler: Callable,
                            transition_logpdf: Optional[Callable] = None,
                            likelihood_logpdf: Optional[Callable] = None,
                            axis: str = "p"):
    """Wrap the sampler closures so their particle-batched inputs/outputs are
    pinned to the particle sharding.

    Returns the wrapped ``(transition_sampler, transition_logpdf,
    likelihood_logpdf)`` (None entries pass through).
    """
    s_particles = NamedSharding(mesh, P(axis))
    s_weights = NamedSharding(mesh, P(axis))

    def _pin(x, s):
        return with_sharding_constraint(x, s)

    def wrapped_transition(us_prev, v_prev, t_prev, key, **kwargs):
        us_prev = _pin(us_prev, s_particles)
        us = transition_sampler(us_prev, v_prev, t_prev, key, **kwargs)
        return _pin(us, s_particles)

    wrapped_logpdf = None
    if transition_logpdf is not None:
        def wrapped_logpdf(u, us_prev, v_prev, t_prev, **kwargs):
            us_prev = _pin(us_prev, s_particles)
            out = transition_logpdf(u, us_prev, v_prev, t_prev, **kwargs)
            return _pin(out, s_weights)

    wrapped_likelihood = None
    if likelihood_logpdf is not None:
        def wrapped_likelihood(v, us_prev, v_prev, t_prev, **kwargs):
            us_prev = _pin(us_prev, s_particles)
            out = likelihood_logpdf(v, us_prev, v_prev, t_prev, **kwargs)
            return _pin(out, s_weights)

    return wrapped_transition, wrapped_logpdf, wrapped_likelihood


def shard_fused_kernel(mesh: Mesh, fused_kernel: Callable, axis: str = "p") -> Callable:
    """Pin the fused transition+likelihood kernel's particle axes."""
    s_particles = NamedSharding(mesh, P(axis))

    def wrapped(us_prev, v, v_prev, t_prev, key, **kwargs):
        us_prev = with_sharding_constraint(us_prev, s_particles)
        us, log_ws = fused_kernel(us_prev, v, v_prev, t_prev, key, **kwargs)
        return (with_sharding_constraint(us, s_particles),
                with_sharding_constraint(log_ws, s_particles))

    return wrapped


def data_parallel_loss(mesh: Mesh, loss_fn: Callable, axis: str = "d") -> Callable:
    """Pin the batch axis of a ``loss_fn(param, key, x0s)`` to the data axis;
    under ``jit`` the gradient all-reduce then rides ICI automatically."""
    s_batch = NamedSharding(mesh, P(axis))

    def wrapped(param, key, x0s, **kwargs):
        x0s = with_sharding_constraint(x0s, s_batch)
        return loss_fn(param, key, x0s, **kwargs)

    return wrapped
