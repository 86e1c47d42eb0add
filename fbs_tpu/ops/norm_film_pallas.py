"""Batched fused GroupNorm(+FiLM+swish) Pallas kernel — v2.

The v1 per-image-grid GroupNorm kernel measured slower than XLA's fused norm
(see STATUS.md): per-grid-step work was tiny and it broke XLA's fusion of the
normalise with the neighbouring FiLM/swish elementwise chain.  This version:

- processes the WHOLE batch in one kernel invocation, viewing the input as
  ``(B, H*W, C)`` (a free host-side reshape; the channel/lane axis is
  untouched),
- computes per-image statistics with one vectorised reduction over the
  spatial axis and per-group statistics with tiny (C, G) one-hot matmuls,
- fuses the FiLM scale/shift and swish that follow the first GroupNorm of
  every ResBlock, so the activation makes exactly one HBM round trip for the
  whole norm+FiLM+swish chain.

Forward-only (sampling path), like the v1 kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fbs_tpu.typing import JArray

__all__ = ["fused_group_norm_film_swish"]


def _reference(x, scale, bias, film_scale, film_shift, groups, eps, swish):
    B, H, W, C = x.shape
    cg = C // groups
    xf = x.astype(jnp.float32).reshape(B, H * W, groups, cg)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=(1, 3), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(B, H, W, C)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if film_scale is not None:
        y = y * (1.0 + film_scale[:, None, None, :].astype(jnp.float32)) \
            + film_shift[:, None, None, :].astype(jnp.float32)
    if swish:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def _kernel(x_ref, scale_ref, bias_ref, fs_ref, fb_ref, o_ref,
            *, groups, eps, swish, film):
    B, HW, C = x_ref.shape
    cg = C // groups

    xf = x_ref[:].astype(jnp.float32)              # (B, HW, C)
    s_ic = jnp.sum(xf, axis=1)                     # (B, C)
    ss_ic = jnp.sum(xf * xf, axis=1)               # (B, C)

    chan_group = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 0) // cg
    group_ids = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 1)
    M = (chan_group == group_ids).astype(jnp.float32)

    count = float(HW * cg)
    mean_ig = jnp.dot(s_ic, M, preferred_element_type=jnp.float32) / count    # (B, G)
    ex2_ig = jnp.dot(ss_ic, M, preferred_element_type=jnp.float32) / count
    inv_ig = jax.lax.rsqrt(ex2_ig - mean_ig * mean_ig + eps)

    mean_ic = jnp.dot(mean_ig, M.T, preferred_element_type=jnp.float32)       # (B, C)
    inv_ic = jnp.dot(inv_ig, M.T, preferred_element_type=jnp.float32)

    y = (xf - mean_ic[:, None, :]) * inv_ic[:, None, :]
    y = y * scale_ref[0].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
    if film:
        y = (y * (1.0 + fs_ref[:].astype(jnp.float32))[:, None, :]
             + fb_ref[:].astype(jnp.float32)[:, None, :])
    if swish:
        y = y * jax.nn.sigmoid(y)
    o_ref[:] = y.astype(o_ref.dtype)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


@functools.partial(jax.jit,
                   static_argnames=("groups", "eps", "swish", "interpret"))
def fused_group_norm_film_swish(x: JArray, scale: JArray, bias: JArray,
                                film_scale: JArray = None,
                                film_shift: JArray = None,
                                groups: int = 8, eps: float = 1e-6,
                                swish: bool = False,
                                interpret: bool = False) -> JArray:
    """GroupNorm + optional per-image FiLM (``y*(1+fs)+fb``) + optional swish
    in one kernel over the whole batch.

    x: (B, H, W, C); scale/bias: (C,); film_scale/film_shift: (B, C) or None.
    """
    if not _on_tpu() and not interpret:
        return _reference(x, scale, bias, film_scale, film_shift, groups, eps, swish)

    B, H, W, C = x.shape
    HW = H * W
    film = film_scale is not None
    if not film:
        film_scale = jnp.zeros((B, C), x.dtype)
        film_shift = jnp.zeros((B, C), x.dtype)

    # Batch-chunked grid: per-image stats are independent, so the grid just
    # tiles the batch.  Chunk size bounded by the 16 MB scoped-VMEM budget
    # (chunk * HW * C f32 intermediates dominate).
    # Elements per chunk: pallas double-buffers in+out blocks and the kernel
    # materialises ~2 f32 temporaries, so total VMEM ~ 16x this in bytes;
    # keep well under the 16 MB scoped budget.
    budget = 640 * 1024
    bb = max(8, (budget // (HW * C)) // 8 * 8)  # sublane dim must be 8-aligned
    bb = min(bb, max(8, -(-B // 8) * 8))
    pad = (-B) % bb
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, H, W, C), x.dtype)], axis=0)
        film_scale = jnp.concatenate(
            [film_scale, jnp.zeros((pad, C), film_scale.dtype)], axis=0)
        film_shift = jnp.concatenate(
            [film_shift, jnp.zeros((pad, C), film_shift.dtype)], axis=0)
    Bp = B + pad

    kernel = functools.partial(_kernel, groups=groups, eps=eps,
                               swish=swish, film=film)
    out = pl.pallas_call(
        kernel,
        grid=(Bp // bb,),
        in_specs=[
            pl.BlockSpec((bb, HW, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, HW, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, HW, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret or not _on_tpu(),
    )(x.reshape(Bp, HW, C), scale.reshape(1, C), bias.reshape(1, C),
      film_scale, film_shift)
    return out[:B].reshape(B, H, W, C)
