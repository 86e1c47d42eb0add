"""Fused Pallas GroupNorm for the sampler's forward path.

The TPU profile of the UNet forward shows normalisation statistics are the
single largest cost (~35%: each flax GroupNorm re-reads the activation from
HBM for the f32 stat reduction, then again for the normalise).  This kernel
performs the whole GroupNorm — stats in f32, normalise, affine — on one VMEM
residency per image: one HBM read + one write.

Forward-only (the conditional samplers never differentiate the score net);
training keeps the standard flax GroupNorm.  Off-TPU the same math runs as
plain jnp so tests cover the exact semantics.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fbs_tpu.typing import JArray

__all__ = ["fused_group_norm"]


def _gn_reference(x, scale, bias, groups, eps):
    B, H, W, C = x.shape
    cg = C // groups
    xf = x.astype(jnp.float32).reshape(B, H * W, groups, cg)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=(1, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(B, H, W, C) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _gn_kernel(x_ref, scale_ref, bias_ref, o_ref, *, groups, eps):
    # Layout-friendly formulation: the channel (lane) axis is never split.
    # Group statistics are computed by summing per-channel statistics through
    # a one-hot (C, G) grouping matmul; per-channel mean/inv-std come back by
    # the transposed matmul.  (A direct (HW, G, C/G) reshape splits the lane
    # dimension and Mosaic rejects the shape cast.)
    x = x_ref[0]  # (H, W, C)
    H, W, C = x.shape
    cg = C // groups

    xf = x.astype(jnp.float32).reshape(H * W, C)
    s = jnp.sum(xf, axis=0, keepdims=True)          # (1, C)
    ss = jnp.sum(xf * xf, axis=0, keepdims=True)    # (1, C)

    chan_group = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 0) // cg
    group_ids = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 1)
    M = (chan_group == group_ids).astype(jnp.float32)  # (C, G) one-hot

    count = float(H * W * cg)
    mean_g = jnp.dot(s, M, preferred_element_type=jnp.float32) / count      # (1, G)
    ex2_g = jnp.dot(ss, M, preferred_element_type=jnp.float32) / count
    inv_g = jax.lax.rsqrt(ex2_g - mean_g * mean_g + eps)                    # (1, G)

    mean_c = jnp.dot(mean_g, M.T, preferred_element_type=jnp.float32)       # (1, C)
    inv_c = jnp.dot(inv_g, M.T, preferred_element_type=jnp.float32)         # (1, C)

    y = (xf - mean_c) * inv_c * scale_ref[0].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
    o_ref[0] = y.reshape(H, W, C).astype(o_ref.dtype)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


@functools.partial(jax.jit, static_argnames=("groups", "eps", "interpret"))
def fused_group_norm(x: JArray, scale: JArray, bias: JArray,
                     groups: int = 8, eps: float = 1e-6,
                     interpret: bool = False) -> JArray:
    """GroupNorm over (B, H, W, C) with per-channel affine, one VMEM pass per
    image.  Falls back to the identical plain-jnp math off-TPU."""
    if not _on_tpu() and not interpret:
        return _gn_reference(x, scale, bias, groups, eps)

    B, H, W, C = x.shape
    kernel = functools.partial(_gn_kernel, groups=groups, eps=eps)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, scale.reshape(1, C), bias.reshape(1, C))
