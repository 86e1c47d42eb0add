"""Conditional SMC (cSMC) kernel: forward pass + backward passes.

TPU-native rebuild of reference ``fbs/samplers/csmc/csmc.py`` (the random-walk
cSMC of Finke & Thiery 2023).  Differences from the reference:

- ``forward_pass_terminal``: an O(N * du)-memory variant that carries only the
  running particles/weights through the scan instead of stacking the full
  ``(K+1, N+1, du)`` history (reference ``csmc.py:159-163``).  The flagship
  ``explicit_backward=True`` Gibbs path only consumes the *terminal* slice, so
  this removes the dominant memory term (e.g. 1001 x 101 x 12288 floats for
  CelebA-128).
- Both forward passes accept an optional ``fused_kernel`` which computes the
  transition proposal and the likelihood weights in one call.  For the image
  samplers both closures evaluate the same score network on the same inputs
  (reference ``experiments/imgs/inpainting.py:106-147``), so fusing halves the
  UNet evaluations per step — the dominant cost of a Gibbs sweep.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
from jax import numpy as jnp
from jax.scipy.special import logsumexp

from fbs_tpu.typing import JArray, JKey, FloatScalar

__all__ = [
    "csmc_kernel",
    "forward_pass",
    "forward_pass_terminal",
    "backward_sampling_pass",
    "backward_scanning_pass",
    "normalise",
    "barker_move",
]


def csmc_kernel(key: JKey,
                us_star: JArray, bs_star: JArray,
                vs: JArray, ts: JArray,
                init_sampler: Callable[[JKey, int], JArray],
                init_likelihood_logpdf: Callable[[JArray, JArray, JArray], JArray],
                transition_sampler: Callable[[JArray, JArray, FloatScalar, JKey], JArray],
                transition_logpdf: Callable[[JArray, JArray, JArray, FloatScalar], JArray],
                measurement_cond_logpdf: Callable[[JArray, JArray, JArray, FloatScalar], JArray],
                cond_resampling: Callable,
                nsamples: int,
                backward: bool = False,
                fused_kernel: Optional[Callable] = None,
                history_dtype=None,
                take_fn: Optional[Callable] = None,
                gather_fn: Optional[Callable] = None,
                **kwargs) -> Tuple[JArray, JArray]:
    r"""One cSMC sweep updating the reference trajectory ``us_star`` with
    ancestor indices ``bs_star`` (reference ``csmc.py:14-77``).

    Runs the forward pass (with the reference particle pinned at slot
    ``bs_star[k]`` each step), then either the backward-sampling pass
    (``backward=True``; FFBS reweighting by ``transition_logpdf``) or the
    ancestor-tracing backward-scanning pass.

    ``take_fn`` / ``gather_fn`` are the particle-sharded payload-move hooks:
    ``take_fn`` (e.g. :func:`fbs_tpu.parallel.make_ring_take`) serves the
    forward resampling's length-N index vectors, ``gather_fn`` (e.g.
    :func:`fbs_tpu.parallel.onehot_gather`) the backward passes' dynamic
    single-row selections from the stored (K+1, N+1, du) history — without it
    GSPMD all-gathers a history slice per backward step.
    """
    key_fwd, key_bwd = jax.random.split(key, 2)

    As, log_ws, uss = forward_pass(key_fwd,
                                   us_star, bs_star,
                                   vs, ts,
                                   init_sampler, init_likelihood_logpdf,
                                   transition_sampler, measurement_cond_logpdf,
                                   cond_resampling, nsamples,
                                   fused_kernel=fused_kernel,
                                   history_dtype=history_dtype,
                                   take_fn=take_fn,
                                   **kwargs)
    if backward:
        us_star, bs_star = backward_sampling_pass(key_bwd, transition_logpdf, vs, ts, uss, log_ws,
                                                  gather_fn=gather_fn, **kwargs)
    else:
        us_star, bs_star = backward_scanning_pass(key_bwd, As, uss, log_ws[-1],
                                                  gather_fn=gather_fn)
    return us_star, bs_star


def _make_scan_body(transition_sampler, likelihood_logpdf, cond_resampling,
                    fused_kernel, kwargs, history_dtype=None, take_fn=None):
    """Shared step body for the two forward-pass variants.

    ``history_dtype`` (e.g. ``jnp.bfloat16``) downcasts only the *stored*
    particle history; the carried working state stays full precision.  Halves
    the dominant (K, N, du) memory term of the full-history pass.

    ``take_fn(us, A) -> us[A]`` overrides the payload gather of the
    resampling step — pass :func:`fbs_tpu.parallel.resampling.make_ring_take`
    to move shard-resident particles over ``ppermute`` rings instead of a
    GSPMD all-gather when the particle axis is sharded.
    """
    take = take_fn if take_fn is not None else lambda us, A: jnp.take(us, A, axis=0)

    def scan_body(carry, inp):
        log_ws, us_prev = carry
        v, v_prev, t_prev, b_star_prev, b_star, key_, u_star = inp
        key_resampling, key_transition = jax.random.split(key_, num=2)

        # Conditional resampling pinned at (b_star_prev -> b_star).
        A = cond_resampling(key_resampling, jnp.exp(log_ws), b_star_prev, b_star, True)
        us_prev = take(us_prev, A)

        if fused_kernel is None:
            us = transition_sampler(us_prev, v_prev, t_prev, key_transition, **kwargs)
            log_ws = likelihood_logpdf(v, us_prev, v_prev, t_prev, **kwargs)
        else:
            us, log_ws = fused_kernel(us_prev, v, v_prev, t_prev, key_transition, **kwargs)
        us = us.at[b_star].set(u_star)
        log_ws = normalise(log_ws, log_space=True)

        us_hist = us if history_dtype is None else us.astype(history_dtype)
        return (log_ws, us), (log_ws, A, us_hist)

    return scan_body


def _forward_init(key, us_star, bs_star, vs, init_sampler, init_likelihood_logpdf,
                  nsamples, kwargs):
    key_init, key_scan = jax.random.split(key, num=2)
    us0 = init_sampler(key_init, nsamples + 1)
    us0 = us0.at[bs_star[0]].set(us_star[0])

    log_ws0 = init_likelihood_logpdf(vs[0], us0, vs[1], **kwargs)
    log_ws0 = normalise(log_ws0, log_space=True)
    return key_scan, us0, log_ws0


def forward_pass(key: JKey,
                 us_star: JArray, bs_star: JArray,
                 vs: JArray, ts: JArray,
                 init_sampler: Callable[[JKey, int], JArray],
                 init_likelihood_logpdf: Callable[[JArray, JArray, JArray], JArray],
                 transition_sampler: Callable[[JArray, JArray, FloatScalar, JKey], JArray],
                 likelihood_logpdf: Callable[[JArray, JArray, JArray, FloatScalar], JArray],
                 cond_resampling: Callable,
                 nsamples: int,
                 fused_kernel: Optional[Callable] = None,
                 history_dtype=None,
                 take_fn: Optional[Callable] = None,
                 **kwargs) -> Tuple[JArray, JArray, JArray]:
    r"""Forward pass storing the full history (reference ``csmc.py:80-164``).

    Returns ``(As, log_wss, uss)`` of shapes
    ``(K, n+1), (K+1, n+1), (K+1, n+1, du)``.  Pass
    ``history_dtype=jnp.bfloat16`` to halve the particle-history memory (the
    working state and weights stay full precision; backward passes upcast).
    """
    nsteps = us_star.shape[0] - 1
    scan_body = _make_scan_body(transition_sampler, likelihood_logpdf,
                                cond_resampling, fused_kernel, kwargs,
                                history_dtype=history_dtype, take_fn=take_fn)
    key_scan, us0, log_ws0 = _forward_init(key, us_star, bs_star, vs,
                                           init_sampler, init_likelihood_logpdf,
                                           nsamples, kwargs)

    keys = jax.random.split(key_scan, nsteps)
    inputs = (vs[1:], vs[:-1], ts[:-1], bs_star[:-1], bs_star[1:], keys, us_star[1:])
    _, (log_wss, As, uss) = jax.lax.scan(scan_body, (log_ws0, us0), inputs)

    log_wss = jnp.concatenate([log_ws0[jnp.newaxis], log_wss], axis=0)
    us0_hist = us0 if history_dtype is None else us0.astype(history_dtype)
    uss = jnp.concatenate([us0_hist[jnp.newaxis], uss], axis=0)

    return As, log_wss, uss


def forward_pass_terminal(key: JKey,
                          us_star: JArray, bs_star: JArray,
                          vs: JArray, ts: JArray,
                          init_sampler: Callable[[JKey, int], JArray],
                          init_likelihood_logpdf: Callable[[JArray, JArray, JArray], JArray],
                          transition_sampler: Callable,
                          likelihood_logpdf: Callable,
                          cond_resampling: Callable,
                          nsamples: int,
                          fused_kernel: Optional[Callable] = None,
                          take_fn: Optional[Callable] = None,
                          **kwargs) -> Tuple[JArray, JArray]:
    """Memory-light forward pass: identical sampling path to
    :func:`forward_pass` but only the terminal ``(log_ws, us)`` survive the
    scan — O(n * du) live memory instead of O(K * n * du).

    This is what the ``explicit_backward=True`` Gibbs kernel consumes
    (reference ``fbs/samplers/gibbs.py:146-156`` reads only ``log_ws[-1]`` and
    ``uss[-1]``).
    """
    nsteps = us_star.shape[0] - 1
    scan_body_full = _make_scan_body(transition_sampler, likelihood_logpdf,
                                     cond_resampling, fused_kernel, kwargs,
                                     take_fn=take_fn)

    def scan_body(carry, inp):
        carry, _ = scan_body_full(carry, inp)
        return carry, None

    key_scan, us0, log_ws0 = _forward_init(key, us_star, bs_star, vs,
                                           init_sampler, init_likelihood_logpdf,
                                           nsamples, kwargs)

    keys = jax.random.split(key_scan, nsteps)
    inputs = (vs[1:], vs[:-1], ts[:-1], bs_star[:-1], bs_star[1:], keys, us_star[1:])
    (log_ws_T, us_T), _ = jax.lax.scan(scan_body, (log_ws0, us0), inputs)
    return log_ws_T, us_T


def backward_sampling_pass(key: JKey, transition_logpdf: Callable,
                           vs: JArray, ts: JArray,
                           uss: JArray, log_ws: JArray,
                           *args, gather_fn: Optional[Callable] = None,
                           **kwargs) -> Tuple[JArray, JArray]:
    """FFBS backward-sampling pass: Barker-select the terminal index, then
    scan backwards reweighting by ``transition_logpdf``
    (reference ``csmc.py:167-227``).

    ``gather_fn(xs, i) -> xs[i]`` overrides the per-step single-row selection
    from the particle history — pass :func:`fbs_tpu.parallel.onehot_gather`
    when the history's particle axis is sharded, so each step moves one row
    over the mesh instead of all-gathering the (N+1, du) slice.
    """
    gather = gather_fn if gather_fn is not None else lambda xs, i: xs[i]
    K_plus_one = uss.shape[0]
    keys = jax.random.split(key, K_plus_one)

    W_T = normalise(log_ws[-1])
    B_T = barker_move(keys[-1], W_T)
    x_T = gather(uss[-1], B_T).astype(log_ws.dtype)  # upcast bf16 history if used

    def body(x_t, inp):
        op_key, xs_t_m_1, log_w_t_m_1, v_t_m_1, t_m_1 = inp
        xs_t_m_1 = xs_t_m_1.astype(x_t.dtype)  # upcast bf16 history if used
        Gamma_log_w = transition_logpdf(x_t, xs_t_m_1, v_t_m_1, t_m_1, *args, **kwargs)
        Gamma_log_w -= jnp.max(Gamma_log_w)
        w = normalise(Gamma_log_w + log_w_t_m_1)
        B_t_m_1 = jax.random.choice(op_key, w.shape[0], p=w, shape=())
        x_t_m_1 = gather(xs_t_m_1, B_t_m_1)
        return x_t_m_1, (x_t_m_1, B_t_m_1)

    inps = (keys[:-1], uss[-2::-1], log_ws[-2::-1], vs[-2::-1], ts[-2::-1])
    _, (xs, Bs) = jax.lax.scan(body, x_T, inps)

    xs = jnp.concatenate([x_T[jnp.newaxis], xs], axis=0)
    Bs = jnp.concatenate([B_T[jnp.newaxis], Bs], axis=0)
    return xs[::-1], Bs[::-1]


def backward_scanning_pass(key: JKey, As: JArray, xss: JArray,
                           log_w_T: JArray,
                           gather_fn: Optional[Callable] = None) -> Tuple[JArray, JArray]:
    """Ancestor-tracing backward pass: follow the stored genealogy, no density
    evaluations (reference ``csmc.py:230-270``).  ``gather_fn`` as in
    :func:`backward_sampling_pass` (the ancestor-index gathers are length-N
    integer rows and stay plain)."""
    gather = gather_fn if gather_fn is not None else lambda xs, i: xs[i]
    B_T = barker_move(key, normalise(log_w_T))
    x_T = gather(xss[-1], B_T).astype(log_w_T.dtype)  # upcast bf16 history if used

    def body(B_t, inp):
        xs_t_m_1, A_t = inp
        B_t_m_1 = A_t[B_t]
        x_t_m_1 = gather(xs_t_m_1, B_t_m_1).astype(log_w_T.dtype)
        return B_t_m_1, (x_t_m_1, B_t_m_1)

    _, (xs, Bs) = jax.lax.scan(body, B_T, (xss[-2::-1], As[::-1]))
    xs = jnp.concatenate([x_T[jnp.newaxis], xs], axis=0)
    Bs = jnp.concatenate([B_T[jnp.newaxis], Bs], axis=0)
    return xs[::-1], Bs[::-1]


def normalise(log_weights: JArray, log_space: bool = False) -> JArray:
    """Normalise log weights; return log weights or natural weights."""
    log_weights = log_weights - logsumexp(log_weights)
    if log_space:
        return log_weights
    return jnp.exp(log_weights)


def barker_move(key: JKey, ws: JArray) -> JArray:
    """Categorical index draw from normalised weights."""
    return jax.random.choice(key, ws.shape[0], (), p=ws)
