"""Sequential Monte Carlo: bootstrap filter/smoother, particle-MCMC, twisted SMC.

TPU-native rebuild of the reference's ``fbs/samplers/smc.py``.  All samplers
are ``lax.scan`` over the time axis with the particle axis leading, so the
closures' network evaluations batch over particles — the MXU-friendly layout.
Sharded (multi-chip) variants that keep the particle axis distributed live in
``fbs_tpu.parallel``.

Closure contract (identical to the reference, ``fbs/samplers/smc.py:9-19``):

- ``transition_sampler(us_prev, v_prev, t_prev, key) -> us``            (n, du)
- ``transition_logpdf(u, us_prev, v_prev, t_prev) -> (n,)``
- ``measurement_cond_pdf / likelihood_logpdf(v, us_prev, v_prev, t_prev) -> (n,)``
- ``init_sampler(key, v0, nparticles) -> (n, du)``
- ``resampling(weights, key) -> indices``
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from fbs_tpu.samplers.common import MCMCState
from fbs_tpu.typing import JArray, JFloat, JKey, FloatScalar

__all__ = [
    "bootstrap_filter",
    "bootstrap_backward_smoother",
    "pmcmc_filter_step",
    "pcn_proposal",
    "pmcmc_kernel",
    "twisted_smc",
]


def bootstrap_filter(transition_sampler: Callable[[JArray, JArray, FloatScalar, JKey], JArray],
                     measurement_cond_pdf: Callable[[JArray, JArray, JArray, FloatScalar], JArray],
                     vs: JArray,
                     ts: JArray,
                     init_sampler: Callable[[JKey, JArray, int], JArray],
                     key: JKey,
                     nparticles: int,
                     resampling: Callable[[JArray, JKey], JArray],
                     log: bool = True,
                     return_last: bool = True,
                     ess_threshold: Optional[float] = None,
                     take_fn: Optional[Callable] = None,
                     **kwargs) -> Tuple[JArray, JFloat]:
    r"""Bootstrap particle filter over the backward bridge (reference
    ``fbs/samplers/smc.py:9-88``).

    Scans over the measurement sequence ``vs``; at each step weights are
    computed from the *previous* particles (the u/v split of the separable
    forward process makes ``p(v_k | u_{k-1}, v_{k-1})`` the natural
    likelihood), and the negative log evidence accumulates via logsumexp.

    With the default ``ess_threshold=None`` the filter resamples every step —
    the reference's behaviour (its note at ``smc.py:53-55``).  Passing e.g.
    ``ess_threshold=0.5`` enables standard adaptive resampling: weights are
    carried across steps and particles resample only when
    ``ESS < threshold * n`` — fewer collective gathers on a sharded particle
    axis and lower resampling variance.

    Returns the terminal particles (or the full filtering history when
    ``return_last=False``) and the accumulated negative log likelihood.
    """
    if not log:
        raise NotImplementedError("Only the log-domain filter is supported (and used).")

    take = take_fn if take_fn is not None else lambda us, A: jnp.take(us, A, axis=0)
    nsteps = vs.shape[0] - 1
    key_init, key_steps = jax.random.split(key)
    init_samples = init_sampler(key_init, vs[0], nparticles)
    keys = jax.random.split(key_steps, num=nsteps)

    if ess_threshold is None:
        def scan_body(carry, elem):
            us_prev, log_nell = carry
            v, v_prev, t_prev, key_ = elem
            key_proposal, key_resampling = jax.random.split(key_)

            us = transition_sampler(us_prev, v_prev, t_prev, key_proposal, **kwargs)

            log_weights = measurement_cond_pdf(v, us_prev, v_prev, t_prev, **kwargs)
            _c = jax.scipy.special.logsumexp(log_weights)
            log_nell -= _c - math.log(nparticles)
            log_weights = log_weights - _c
            inds = resampling(jnp.exp(log_weights), key_resampling)
            us = take(us, inds)

            return (us, log_nell), None if return_last else us

        (last_samples, nell_ys), filtering_samples = jax.lax.scan(
            scan_body, (init_samples, 0.), (vs[1:], vs[:-1], ts[:-1], keys))
    else:
        log_uniform = -math.log(nparticles) * jnp.ones(nparticles)

        def scan_body(carry, elem):
            us_prev, log_ws_prev, log_nell = carry
            v, v_prev, t_prev, key_ = elem
            key_proposal, key_resampling = jax.random.split(key_)

            us = transition_sampler(us_prev, v_prev, t_prev, key_proposal, **kwargs)

            log_incr = measurement_cond_pdf(v, us_prev, v_prev, t_prev, **kwargs)
            log_ws = log_ws_prev + log_incr
            _c = jax.scipy.special.logsumexp(log_ws)
            log_nell -= _c
            log_ws = log_ws - _c

            ess = 1.0 / jnp.sum(jnp.exp(2.0 * log_ws))
            do_resample = ess < ess_threshold * nparticles
            inds = resampling(jnp.exp(log_ws), key_resampling)
            us = jnp.where(do_resample, take(us, inds), us)
            log_ws = jnp.where(do_resample, log_uniform, log_ws)

            return (us, log_ws, log_nell), None if return_last else us

        (last_samples, _, nell_ys), filtering_samples = jax.lax.scan(
            scan_body, (init_samples, log_uniform, 0.),
            (vs[1:], vs[:-1], ts[:-1], keys))

    if return_last:
        return last_samples, nell_ys
    filtering_samples = jnp.concatenate(
        [jnp.expand_dims(init_samples, axis=0), filtering_samples], axis=0)
    return filtering_samples, nell_ys


def bootstrap_backward_smoother(key: JKey,
                                filter_us: JArray, vs: JArray, ts: JArray,
                                transition_logpdf: Callable,
                                *args, **kwargs) -> JArray:
    """FFBS-style backward draw through the filtering history (reference
    ``fbs/samplers/smc.py:91-112``)."""

    def scan_body(u_kp1, elem):
        uf_k, v_k, t_k, key_ = elem
        log_ws = transition_logpdf(u_kp1, uf_k, v_k, t_k, *args, **kwargs)
        log_ws = log_ws - jax.scipy.special.logsumexp(log_ws)
        u_k = jax.random.choice(key_, uf_k, axis=0, p=jnp.exp(log_ws))
        return u_k, u_k

    nsteps = filter_us.shape[0] - 1
    key_last, key_smoother = jax.random.split(key, num=2)
    uT = jax.random.choice(key, filter_us[-1], axis=0)
    traj = jax.lax.scan(scan_body, uT,
                        (filter_us[-2::-1], vs[-2::-1], ts[-2::-1],
                         jax.random.split(key_smoother, num=nsteps)))[1][::-1]
    return jnp.concatenate([traj, jnp.expand_dims(uT, axis=0)], axis=0)


def pmcmc_filter_step(key: JKey, vs_bridge: JArray, u0s: JArray, ts: JArray,
                      transition_sampler: Callable[[JArray, JArray, FloatScalar, JKey], JArray],
                      likelihood_logpdf: Callable[[JArray, JArray, JArray, FloatScalar], JArray],
                      resampling: Callable,
                      nparticles: int,
                      take_fn: Optional[Callable] = None,
                      **kwargs) -> Tuple[JArray, JFloat]:
    """Inner particle filter of the pMCMC kernel (weight -> resample ->
    propagate order; reference ``fbs/samplers/smc.py:115-158``).  Returns the
    terminal particles and the log marginal-likelihood estimate.

    ``take_fn`` as in :func:`bootstrap_filter`: overrides the resampling
    payload gather (pass :func:`fbs_tpu.parallel.make_ring_take` on a
    particle-sharded mesh axis)."""
    take = take_fn if take_fn is not None else lambda us, A: jnp.take(us, A, axis=0)

    def scan_body(carry, elem):
        us_prev, log_ell = carry
        v, v_prev, t_prev, key_ = elem
        key_proposal, key_resampling = jax.random.split(key_)

        log_ws = likelihood_logpdf(v, us_prev, v_prev, t_prev, **kwargs)
        _c = jax.scipy.special.logsumexp(log_ws)
        log_ell = log_ell - math.log(nparticles) + _c
        log_ws = log_ws - _c
        inds = resampling(jnp.exp(log_ws), key_resampling)
        us_prev = take(us_prev, inds)
        us = transition_sampler(us_prev, v_prev, t_prev, key_proposal, **kwargs)

        return (us, log_ell), None

    keys = jax.random.split(key, num=ts.shape[0] - 1)
    (uT, log_ellT), _ = jax.lax.scan(scan_body, (u0s, 0.),
                                     (vs_bridge[1:], vs_bridge[:-1], ts[:-1], keys))
    return uT, log_ellT


def pcn_proposal(key: JKey, delta: float, x: JArray, mean: JArray, sampler: Callable) -> JArray:
    """Preconditioned Crank-Nicolson proposal around ``mean`` that preserves
    the path law (reference ``fbs/samplers/smc.py:161-168``)."""
    beta = 2.0 / (2.0 + delta)
    key_rnds = jax.random.split(key, num=2)
    rnds = jax.vmap(sampler)(key_rnds)
    p = x + math.sqrt(delta / 2.0) * (rnds[0] - mean)
    return beta * p + (1.0 - beta) * mean + math.sqrt(1.0 - beta) * (rnds[1] - mean)


def pmcmc_kernel(key: JKey,
                 uT: JArray, log_ell: JFloat, ys: JArray,
                 y0: JArray,
                 ts: JArray,
                 fwd_ys_sampler: Callable,
                 sde,
                 ref_sampler: Callable,
                 transition_sampler: Callable[[JArray, JArray, FloatScalar, JKey], JArray],
                 likelihood_logpdf: Callable[[JArray, JArray, JArray, FloatScalar], JArray],
                 resampling: Callable,
                 nparticles: int,
                 delta: float = None,
                 which_u: int = 0,
                 take_fn: Optional[Callable] = None,
                 **kwargs) -> Tuple[JArray, JFloat, JArray, MCMCState]:
    r"""Particle pseudo-marginal MCMC kernel targeting ``p(uT | vT = y0)``
    (reference ``fbs/samplers/smc.py:171-258``).

    Proposes a fresh y-path (or a pCN perturbation when ``delta`` is given),
    reverses it, runs the inner particle filter for a marginal-likelihood
    estimate, and Metropolis-accepts on the likelihood ratio.  ``take_fn`` is
    forwarded to the inner filter's resampling payload move (ring permute on
    a particle-sharded mesh axis).
    """
    key_prop, key_u0, key_filter, key_mh = jax.random.split(key, num=4)

    if delta is None:
        prop_ys = fwd_ys_sampler(key_prop, y0)
    else:
        mean = jax.vmap(sde.mean, in_axes=[0, None, None])(ts, ts[0], y0)
        prop_ys = pcn_proposal(key_prop, delta, ys, mean, lambda key_: fwd_ys_sampler(key_, y0))

    vs = prop_ys[::-1]

    u0s = ref_sampler(key_u0, vs[0], nparticles)
    prop_uTs, prop_log_ell = pmcmc_filter_step(key_filter, vs, u0s, ts,
                                               transition_sampler, likelihood_logpdf,
                                               resampling, nparticles,
                                               take_fn=take_fn, **kwargs)
    prop_uT = prop_uTs[which_u]

    log_acc_prob = jnp.minimum(0., prop_log_ell - log_ell)
    z = jax.random.uniform(key_mh)
    acc_flag = jnp.log(z) < log_acc_prob

    mcmc_state = MCMCState(acceptance_prob=jnp.exp(log_acc_prob),
                           is_accepted=acc_flag,
                           prop_log_ell=prop_log_ell,
                           log_ell=log_ell)
    return jax.lax.cond(acc_flag,
                        lambda _: (prop_uT, prop_log_ell, prop_ys, mcmc_state),
                        lambda _: (uT, log_ell, ys, mcmc_state),
                        None)


def twisted_smc(key: JKey, y: JArray, ts: JArray,
                init_sampler: Callable[[JKey, int], JArray],
                transition_logpdf: Callable[[JArray, JArray, JArray], JArray],
                twisting_logpdf: Callable[[JArray, JArray, FloatScalar, Optional[Any]], JArray],
                twisting_prop_sampler: Callable,
                twisting_prop_logpdf: Callable,
                resampling: Callable,
                nparticles: int,
                take_fn: Optional[Callable] = None,
                **kwargs) -> Tuple[JArray, JArray]:
    """Twisted diffusion sampler baseline (Algorithm 1 of arXiv 2306.17775;
    reference ``fbs/samplers/smc.py:261-309``).  ``take_fn`` as in
    :func:`bootstrap_filter` (applied to the particle payload; the length-N
    log-twist vector stays a plain take)."""
    take = take_fn if take_fn is not None else lambda us, A: jnp.take(us, A, axis=0)

    def scan_body(carry, elem):
        xs_prev, log_ps_prev, log_ws = carry
        key_step, t_prev = elem
        key_resampling, key_prop = jax.random.split(key_step)

        inds = resampling(jnp.exp(log_ws), key_resampling)
        xs_prev = take(xs_prev, inds)
        log_ps_prev = jnp.take(log_ps_prev, inds, axis=0)

        xs = twisting_prop_sampler(key_prop, xs_prev, t_prev, y, **kwargs)

        log_ps = twisting_logpdf(y, xs, t_prev, **kwargs)
        log_ws = (transition_logpdf(xs, xs_prev, t_prev) + log_ps
                  - twisting_prop_logpdf(xs, xs_prev, t_prev, y, **kwargs) - log_ps_prev)
        log_ws = log_ws - jax.scipy.special.logsumexp(log_ws)

        return (xs, log_ps, log_ws), None

    nsteps = ts.shape[0] - 1
    key_init, key_filter = jax.random.split(key, num=2)
    keys = jax.random.split(key_filter, num=nsteps)

    init_xs = init_sampler(key_init, nparticles)
    init_log_ps = twisting_logpdf(y, init_xs, ts[0], **kwargs)
    init_log_ws = init_log_ps - jax.scipy.special.logsumexp(init_log_ps)

    (samples, _, log_weights), _ = jax.lax.scan(
        scan_body, (init_xs, init_log_ps, init_log_ws), (keys, ts[1:]))
    return samples, log_weights
