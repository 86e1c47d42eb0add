"""Forward-backward particle Gibbs sampler — the paper's core algorithm.

TPU-native rebuild of reference ``fbs/samplers/gibbs.py``.  One Gibbs sweep:

1. forward-noise ``(x0, y0)`` into joint paths via the exact linear-SDE
   simulator;
2. reverse both paths;
3. update the x-path given the y-path with a conditional SMC pass;
4. select the next ``x0`` (forced-move on the terminal weights when
   ``explicit_backward=True``), and refresh the reference trajectory.

Performance notes vs the reference:

- The ``explicit_backward=True`` path uses
  :func:`fbs_tpu.samplers.csmc.csmc.forward_pass_terminal`, which keeps only
  the terminal particles/weights alive instead of stacking the full
  ``(K+1, N+1, du)`` history (reference ``gibbs.py:146-156`` with
  ``csmc.py:159-163``).
- Both CSMC paths accept ``fused_kernel`` so the transition proposal and the
  likelihood weights share one score-network evaluation per step (2x fewer
  UNet evals; see ``fbs_tpu.samplers.kernels``).
"""
from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from fbs_tpu.samplers.csmc.csmc import csmc_kernel, forward_pass_terminal
from fbs_tpu.samplers.csmc.resamplings import killing
from fbs_tpu.samplers.resampling import stratified
from fbs_tpu.samplers.smc import bootstrap_filter, bootstrap_backward_smoother
from fbs_tpu.sdes.linear import LinearSDE
from fbs_tpu.sdes.simulators import doob_bridge_simulator
from fbs_tpu.typing import JArray, JFloat, JInt, JKey, FloatScalar

__all__ = ["gibbs_init", "gibbs_kernel", "force_move", "bridge_sampler"]


def bridge_sampler(key: JKey, y0: JArray, yT: JArray, ts: JArray, sde: LinearSDE) -> JArray:
    """Doob h-transform bridge of the y-path (reference ``gibbs.py:17-20``)."""
    return doob_bridge_simulator(key, sde, y0, yT, ts, integration_nsteps=100, replace=True)


def gibbs_init(key: JKey, y0: JArray, x0_shape, ts: JArray,
               fwd_sampler: Callable, sde: LinearSDE, unpack: Callable,
               transition_sampler: Callable, transition_logpdf: Callable,
               likelihood_logpdf: Callable,
               nparticles: int, method: str = "smoother",
               marg_y: bool = True,
               x0: Optional[JArray] = None,
               take_fn: Optional[Callable] = None,
               **kwargs):
    """Initialise the Gibbs chain with a bootstrap filter/smoother draw
    (reference ``gibbs.py:23-65``).

    Assumes the forward noising process is separable and that the terminal
    x/y marginals are independent N(0, I).
    """
    if x0 is None:
        x0 = jnp.zeros(x0_shape)
    key_fwd, key_bridge, key_u0, key_bf, key_fwd2, key_bwd = jax.random.split(key, num=6)

    path_xy = fwd_sampler(key_fwd, x0, y0, **kwargs)
    _, path_y = unpack(path_xy, **kwargs)

    vs = bridge_sampler(key_bridge, path_y[0], path_y[-1], ts, sde)[::-1] if marg_y else path_y[::-1]

    def init_sampler(*_):
        return jax.random.normal(key_u0, (nparticles, *x0_shape))

    if method == "filter":
        approx_x0 = bootstrap_filter(transition_sampler, likelihood_logpdf, vs, ts,
                                     init_sampler, key_bf, nparticles,
                                     stratified, log=True, return_last=True,
                                     take_fn=take_fn, **kwargs)[0][0]
        approx_us_star = unpack(fwd_sampler(key_fwd2, approx_x0, y0, **kwargs), **kwargs)[0][::-1]
    elif method == "smoother":
        uss = bootstrap_filter(transition_sampler, likelihood_logpdf, vs, ts,
                               init_sampler, key_bf, nparticles,
                               stratified, log=True, return_last=False,
                               take_fn=take_fn, **kwargs)[0]
        approx_x0 = uss[-1, 0]
        approx_us_star = bootstrap_backward_smoother(key_bwd, uss, vs, ts,
                                                     transition_logpdf, **kwargs)
    elif method == "debug":
        approx_x0 = bootstrap_filter(transition_sampler, likelihood_logpdf, vs, ts,
                                     init_sampler, key_bf, nparticles,
                                     stratified, log=True, return_last=False, **kwargs)[0]
        approx_us_star = None
    else:
        raise ValueError(f"Unknown method {method}")
    return approx_x0, approx_us_star


def gibbs_kernel(key: JKey, x0: JArray, y0: JArray, us_star: JArray, bs_star: JArray,
                 ts: JArray,
                 fwd_sampler: Callable,
                 sde: LinearSDE,
                 unpack: Callable,
                 nparticles: int,
                 transition_sampler: Callable,
                 transition_logpdf: Callable,
                 likelihood_logpdf: Callable,
                 marg_y: bool = False,
                 explicit_backward: bool = True,
                 explicit_final: bool = False,
                 cond_resampling: Callable = killing,
                 fused_kernel: Optional[Callable] = None,
                 take_fn: Optional[Callable] = None,
                 gather_fn: Optional[Callable] = None,
                 **kwargs) -> Tuple[JArray, JArray, JArray, JArray]:
    """One sweep of the forward-backward Gibbs sampler
    (reference ``gibbs.py:68-168``).

    Parameters mirror the reference; additionally ``cond_resampling`` is
    pluggable (the reference hard-codes killing), ``fused_kernel`` optionally
    replaces the separate transition/likelihood closures with one shared
    score evaluation per step, and ``take_fn`` / ``gather_fn`` are the
    particle-sharded payload-move hooks (ring permute for the resampling
    index vectors, one-hot contraction for single-row selections).

    Returns ``(x0_next, us_star_next, bs_star_next, acc_flags)``.
    """
    key_fwd, key_csmc, key_bridge = jax.random.split(key, num=3)
    path_xy = fwd_sampler(key_fwd, x0, y0, **kwargs)
    path_x, path_y = unpack(path_xy, **kwargs)
    us = path_x[::-1]
    vs = bridge_sampler(key_bridge, path_y[0], path_y[-1], ts, sde)[::-1] if marg_y else path_y[::-1]

    if explicit_final:
        def init_sampler(key_, n_samples):
            return jax.random.normal(key_, (n_samples, *us.shape[1:]))

        def init_likelihood_logpdf(v0, u0s, v1, **kw):
            return likelihood_logpdf(v0, u0s, v1, ts[0], **kw)
    else:
        def init_sampler(*_, **__):
            return us[0] * jnp.ones((nparticles, *us.shape[1:]))

        def init_likelihood_logpdf(*_, **__):
            return -math.log(nparticles) * jnp.ones(nparticles)

    if explicit_backward:
        key_csmc_fwd, key_csmc_x0, key_csmc_bwd_us, key_csmc_bwd_bs = jax.random.split(key_csmc, num=4)
        log_ws_T, us_T = forward_pass_terminal(key_csmc_fwd, us, bs_star, vs, ts,
                                               init_sampler, init_likelihood_logpdf,
                                               transition_sampler, likelihood_logpdf,
                                               cond_resampling, nparticles,
                                               fused_kernel=fused_kernel,
                                               take_fn=take_fn,
                                               **kwargs)
        idx, _ = force_move(key_csmc_x0, jnp.exp(log_ws_T), bs_star[-1])
        x0 = us_T[idx] if gather_fn is None else gather_fn(us_T, idx)
        us_star_next = unpack(fwd_sampler(key_csmc_bwd_us, x0, y0, **kwargs), **kwargs)[0][::-1]
        bs_star_next = jax.random.randint(key_csmc_bwd_bs, (us.shape[0],), minval=0, maxval=nparticles)
    else:
        us_star_next, bs_star_next = csmc_kernel(key_csmc,
                                                 us, bs_star,
                                                 vs, ts,
                                                 init_sampler, init_likelihood_logpdf,
                                                 transition_sampler, transition_logpdf,
                                                 likelihood_logpdf,
                                                 cond_resampling, nparticles,
                                                 backward=False,
                                                 fused_kernel=fused_kernel,
                                                 take_fn=take_fn,
                                                 gather_fn=gather_fn,
                                                 **kwargs)
    x0_next = us_star_next[-1]
    return x0_next, us_star_next, bs_star_next, bs_star_next != bs_star


def force_move(key: JKey, weights: JArray, k: FloatScalar) -> Tuple[JInt, JFloat]:
    """Forced-move index selection away from the reference index ``k``
    (reference ``gibbs.py:171-214``, after Corenflos' particle-MALA utils).

    Proposes ``i ~ Cat(w_{-k} / (1 - w_k))`` and accepts with probability
    ``(1 - w_k) / (1 - w_i)``; returns the selected index and the average
    acceptance probability.
    """
    M = weights.shape[0]
    key_1, key_2 = jax.random.split(key, 2)

    w_k = weights[k]
    temp = 1.0 - w_k

    rest_weights = weights.at[k].set(0.0)
    threshold = jnp.maximum(1.0 - jnp.exp(-M), 1.0 - 1e-12)
    rest_weights = jax.lax.cond(w_k < threshold,
                                lambda: rest_weights / temp,
                                lambda: jnp.full((M,), 1.0 / M))

    i = jax.random.choice(key_1, M, p=rest_weights, shape=())
    u = jax.random.uniform(key_2, shape=())
    accept = u * (1.0 - weights[i]) < temp

    alpha = jnp.nansum(temp * rest_weights / (1.0 - weights))
    i = jax.lax.select(accept, i, k)

    return i, jnp.clip(alpha, 0.0, 1.0)
