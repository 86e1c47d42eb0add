"""Fused Pallas linear-attention gate for the sampler's forward path.

The round-2 TPU profile of the dim-64 UNet forward (docs/roofline.md) leaves
~2.5 ms of norm/copy/elementwise time after the ResBlock interventions; the
named remaining segment is the attention gates.  XLA executes one linear
gate (reference ``fbs/nn/unet.py:209-245`` semantics) as ~10 op boundaries —
pre-LayerNorm (two f32 passes), qkv 1x1 conv, head split transposes, two
softmaxes, two small dot-generals, head merge, out projection, final
LayerNorm, residual — each a full HBM read+write of the (B, N, C)
activation.  This kernel runs the WHOLE gate on one VMEM residency per
image: x in once, y out once.

Mosaic-first layout rules (the lesson of the retired fused-ResBlock kernel,
docs/roofline.md section 3):

- The lane (channel) axis is never split.  All heads live side-by-side as a
  (N, heads*dim_head) matrix.
- The per-head q softmax subtracts the GLOBAL row max instead of the
  per-head max — algebraically identical (any per-row constant divides out
  within a segment) — and takes per-head sums via a one-hot (D, heads)
  matmul, so no lane-segmented reduction is ever needed.
- Per-head context matmuls run as ONE full-width (D, D) contraction with a
  block-diagonal mask; off-head blocks are zeroed, so q @ masked-context is
  exactly the per-head result.  The extra FLOPs are trivial (D = 128).

Forward-only (the conditional samplers never differentiate the score net);
training keeps the unfused module path.  Off-TPU the kernel runs in
interpreter mode so CPU tests cover the exact semantics.
"""
from __future__ import annotations

import functools
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fbs_tpu.typing import JArray

__all__ = ["fused_linear_attn_gate", "linear_attn_gate_reference"]


def linear_attn_gate_reference(x: JArray, ln1_scale, w_qkv, w_out, b_out,
                               ln2_scale, heads: int, dim_head: int,
                               eps: float = 1e-5) -> JArray:
    """Pure-jnp twin of the fused gate (f32 math), for parity tests.

    Mirrors ``AttnGate(linear=True)``: pre-LN -> qkv -> softmax(q, -1)/sqrt(d),
    softmax(k, pixels), v/N -> per-head context -> out proj -> LN -> +x.
    """
    B, N, C = x.shape
    D = heads * dim_head
    xf = x.astype(jnp.float32)

    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    normed = (xf - mu) * jax.lax.rsqrt(var + eps) * ln1_scale.astype(jnp.float32)

    qkv = normed @ w_qkv.astype(jnp.float32)  # (B, N, 3D)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, N, heads, dim_head)
    k = k.reshape(B, N, heads, dim_head)
    v = v.reshape(B, N, heads, dim_head)

    q = jax.nn.softmax(q, axis=-1) / math.sqrt(dim_head)
    k = jax.nn.softmax(k, axis=1)
    v = v / N

    context = jnp.einsum("bnhd,bnhe->bhde", k, v)
    out = jnp.einsum("bnhd,bhde->bnhe", q, context).reshape(B, N, D)

    proj = out @ w_out.astype(jnp.float32) + b_out.astype(jnp.float32)
    mu2 = jnp.mean(proj, axis=-1, keepdims=True)
    var2 = jnp.mean((proj - mu2) ** 2, axis=-1, keepdims=True)
    y = (proj - mu2) * jax.lax.rsqrt(var2 + eps) * ln2_scale.astype(jnp.float32)
    return (y + xf).astype(x.dtype)


def _gate_kernel(x_ref, ln1_ref, wq_ref, wk_ref, wv_ref, wo_ref, bo_ref,
                 ln2_ref, o_ref, *, heads, dim_head, eps, dot_dtype):
    x = x_ref[0].astype(jnp.float32)  # (N, C)
    N, C = x.shape
    D = heads * dim_head

    # Pre-norm LayerNorm (f32 stats, scale only).
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    normed = (x - mu) * jax.lax.rsqrt(var + eps) * ln1_ref[0].astype(jnp.float32)
    nd = normed.astype(dot_dtype)

    q = jnp.dot(nd, wq_ref[:].astype(dot_dtype),
                preferred_element_type=jnp.float32)  # (N, D)
    k = jnp.dot(nd, wk_ref[:].astype(dot_dtype),
                preferred_element_type=jnp.float32)
    v = jnp.dot(nd, wv_ref[:].astype(dot_dtype),
                preferred_element_type=jnp.float32)

    # Per-head softmax over the feature segment, via the global row max
    # (algebraically identical within each 32-lane head segment) and one-hot
    # segment sums — the lane axis is never split.
    head_of = jax.lax.broadcasted_iota(jnp.int32, (D, heads), 0) // dim_head
    head_id = jax.lax.broadcasted_iota(jnp.int32, (D, heads), 1)
    seg = (head_of == head_id).astype(jnp.float32)          # (D, heads)

    e = jnp.exp(q - jnp.max(q, axis=-1, keepdims=True))      # (N, D)
    ssum = jnp.dot(e, seg, preferred_element_type=jnp.float32)       # (N, h)
    denom = jnp.dot(ssum, seg.T, preferred_element_type=jnp.float32)  # (N, D)
    qs = e / (denom * math.sqrt(dim_head))

    # k softmax over pixels (a per-column reduce; no segmentation needed).
    ke = jnp.exp(k - jnp.max(k, axis=0, keepdims=True))
    ks = ke / jnp.sum(ke, axis=0, keepdims=True)
    vs = v / N

    # All-head context in one (D, D) contraction, masked block-diagonal.
    ctx = jax.lax.dot_general(ks.astype(dot_dtype), vs.astype(dot_dtype),
                              dimension_numbers=(((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # (D, D)
    bi = jax.lax.broadcasted_iota(jnp.int32, (D, D), 0) // dim_head
    bj = jax.lax.broadcasted_iota(jnp.int32, (D, D), 1) // dim_head
    ctx = jnp.where(bi == bj, ctx, 0.0)

    out = jnp.dot(qs.astype(dot_dtype), ctx.astype(dot_dtype),
                  preferred_element_type=jnp.float32)  # (N, D)

    proj = jnp.dot(out.astype(dot_dtype), wo_ref[:].astype(dot_dtype),
                   preferred_element_type=jnp.float32) + bo_ref[0].astype(jnp.float32)

    mu2 = jnp.mean(proj, axis=-1, keepdims=True)
    var2 = jnp.mean((proj - mu2) ** 2, axis=-1, keepdims=True)
    y = (proj - mu2) * jax.lax.rsqrt(var2 + eps) * ln2_ref[0].astype(jnp.float32)

    o_ref[0] = (y + x).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "dim_head", "eps",
                                             "dot_dtype", "interpret"))
def fused_linear_attn_gate(x: JArray, ln1_scale: JArray, w_qkv: JArray,
                           w_out: JArray, b_out: JArray, ln2_scale: JArray,
                           heads: int = 4, dim_head: int = 32,
                           eps: float = 1e-5,
                           dot_dtype: Any = jnp.float32,
                           interpret: bool = False) -> JArray:
    """Whole linear-attention gate, one VMEM residency per image.

    Args:
      x: (B, H, W, C) activations (the gate input; residual source).
      ln1_scale / ln2_scale: (C,) pre-/post-LayerNorm scales (no bias).
      w_qkv: (C, 3 * heads * dim_head) qkv projection (conv 1x1 kernel
        reshaped; column order q | k | v, heads side-by-side inside each).
      w_out: (heads * dim_head, C) output projection; b_out: (C,).
    """
    B, H, W, C = x.shape
    N = H * W
    D = heads * dim_head
    x2 = x.reshape(B, N, C)

    wq, wk, wv = jnp.split(w_qkv.astype(jnp.float32), 3, axis=-1)
    kernel = functools.partial(_gate_kernel, heads=heads, dim_head=dim_head,
                               eps=eps, dot_dtype=dot_dtype)

    vec = pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM)
    mat = lambda shape: pl.BlockSpec(shape, lambda b: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            vec, mat((C, D)), mat((C, D)), mat((C, D)), mat((D, C)), vec, vec,
        ],
        out_specs=pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
        interpret=interpret,
    )(x2, ln1_scale.reshape(1, C), wq, wk, wv,
      w_out.astype(jnp.float32), b_out.reshape(1, C), ln2_scale.reshape(1, C))
    return out.reshape(B, H, W, C)
