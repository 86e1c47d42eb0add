r"""Fused ResBlock kernel: conv3x3 + GroupNorm + FiLM + swish + conv3x3 +
GroupNorm + swish + shortcut — one Pallas program, zero HBM round-trips for
intermediates.

Motivation (round-2 TPU profile of the dim-64 UNet forward at 28x28,
batch 104, 4.04 ms): convolutions are only ~7% of time; norm statistics
(34.8%) and copies (27.5%) dominate because every op boundary writes its
(B, 28, 28, 64) activation to HBM and reads it back.  A ResBlock moves
~130 MB/forward through HBM that way; the fused kernel moves ~21 MB (inputs
+ outputs + weights).  Hand kernels that fused *less than the convolution
itself* measured slower than XLA (see ``docs/architecture.md``) — this one
swallows both convs.

Design (per grid step = one batch tile of ``bb`` samples, everything VMEM):

1. zero-pad the tile into a (bb, H+2, W+2, Cin) scratch;
2. conv1 as 9 shifted matmuls  (bb*H*W, Cin) @ (Cin, C) accumulated in f32
   on the MXU (an im2col-free formulation — no gather, static slices);
3. per-sample GroupNorm statistics + affine + time-FiLM + swish on the VPU
   (f32), written into the second padded scratch;
4. conv2 as 9 shifted matmuls;
5. GroupNorm + swish;
6. shortcut (identity or 1x1 matmul) + residual add; cast and write out.

Weight standardisation is pre-applied to the conv kernels
(``fbs_tpu.nn.unet.standardize_ws_kernels``) — parameters are frozen during
sampling.  Forward-only: use on sampling paths, not training.

Reference semantics being fused: ``fbs_tpu/nn/unet.py:ResBlock`` (itself the
rebuild of reference ``fbs/nn/unet.py:127-172``).
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_resblock", "resblock_reference"]


def _pick_batch_tile(batch: int, h: int, w: int, cin: int, cout: int,
                     max_vmem_bytes: int = 12 * 1024 * 1024) -> int:
    """Largest divisor of ``batch`` whose working set fits VMEM."""
    per_sample = (
        (h + 2) * (w + 2) * (cin + cout) * 4      # two padded scratches (f32)
        + h * w * cout * 4 * 2                    # f32 accumulators
        + h * w * (cin + cout) * 4                # in/out tiles
    )
    if per_sample > max_vmem_bytes:
        raise ValueError(
            f"fused_resblock: one sample's working set "
            f"({per_sample / 2 ** 20:.1f} MiB at {h}x{w}x{cin}->{cout}) exceeds "
            f"the VMEM budget ({max_vmem_bytes / 2 ** 20:.0f} MiB); this kernel "
            f"targets small feature maps (e.g. 28x28) — use the XLA path at "
            f"this resolution.")
    budget = max(1, max_vmem_bytes // per_sample)
    bb = 1
    for d in range(1, batch + 1):
        if batch % d == 0 and d <= budget and d <= 16:
            bb = d
    return bb


def _pool_one_hot(rows, cols, divisor, axis):
    """One-hot pooling matrix from 2-D broadcasted iotas.

    ``axis=0``: M[i, j] = 1.0 iff i // divisor == j (fine axis on rows);
    ``axis=1``: M[i, j] = 1.0 iff j // divisor == i (fine axis on cols).
    Mosaic has no gather/one_hot, but iota compares lower cleanly.
    """
    ri = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    eq = (ri // divisor == ci) if axis == 0 else (ri == ci // divisor)
    return eq.astype(jnp.float32)


def _mm(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _gn_film_swish(acc, gn_scale, gn_bias, film_scale, film_shift, groups, eps,
                   bb, hw, c):
    """acc: (bb*hw, c) f32 -> normalised+FiLM+swish, same shape/dtype.

    GroupNorm statistics are computed with one-hot pooling matmuls instead of
    a reshape to (bb, hw, groups, c//groups): Mosaic cannot shape-cast a
    vector whose lane (minormost) dim splits (observed
    ``infer-vector-layout: unsupported shape cast`` on real TPU), and the
    stats matmuls are noise next to the convs (<2% of the block's FLOPs).
    """
    cg = c // groups
    n = hw * cg
    # Pooling one-hots: channels<->groups and rows<->samples (trace-time iotas).
    ch2grp = _pool_one_hot(c, groups, cg, axis=0)   # (c, groups)
    grp2ch = _pool_one_hot(groups, c, cg, axis=1)   # (groups, c)
    row2smp = _pool_one_hot(bb * hw, bb, hw, axis=0)  # (bb*hw, bb)
    smp2row = _pool_one_hot(bb, bb * hw, hw, axis=1)  # (bb, bb*hw)

    # Two-pass statistics, all standard (1,)x(0,) matmuls on the MXU.
    mean = _mm(smp2row, _mm(acc, ch2grp)) / n      # (bb, groups)
    mean_bc = _mm(row2smp, _mm(mean, grp2ch))      # (bb*hw, c)
    centred = acc - mean_bc
    var = _mm(smp2row, _mm(centred * centred, ch2grp)) / n
    inv = jax.lax.rsqrt(var + eps)                 # (bb, groups)
    inv_bc = _mm(row2smp, _mm(inv, grp2ch))        # (bb*hw, c)

    h = centred * inv_bc * gn_scale.reshape(1, c) + gn_bias.reshape(1, c)
    if film_scale is not None:
        h = (h * (1.0 + _mm(row2smp, film_scale))
             + _mm(row2smp, film_shift))
    return h * jax.nn.sigmoid(h)


def _conv3x3_from_padded(pad_ref_read, w_kernel, bb, h, w, cin, cout, dot_dtype):
    """9 shifted matmuls over a (bb, h+2, w+2, cin) padded array."""
    acc = jnp.zeros((bb * h * w, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            window = pad_ref_read[:, dy:dy + h, dx:dx + w, :]
            lhs = window.reshape(bb * h * w, cin).astype(dot_dtype)
            rhs = w_kernel[dy, dx].astype(dot_dtype)
            acc = acc + jax.lax.dot_general(
                lhs, rhs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return acc


def _kernel(x_ref, skip_ref, film_ref,
            w1_ref, b1_ref, g1s_ref, g1b_ref,
            w2_ref, b2_ref, g2s_ref, g2b_ref,
            wsc_ref, bsc_ref,
            out_ref,
            pad1_ref, pad2_ref,
            *, bb, h, w, cin_x, cin_skip, cout, groups, eps, has_skip,
            has_shortcut, dot_dtype):
    cin = cin_x + cin_skip
    hw = h * w

    # ---- stage 0: padded input tile (joint channels: x ++ skip). ----
    pad1_ref[...] = jnp.zeros_like(pad1_ref)
    pad1_ref[:, 1:h + 1, 1:w + 1, :cin_x] = x_ref[...].astype(jnp.float32)
    if has_skip:
        pad1_ref[:, 1:h + 1, 1:w + 1, cin_x:] = skip_ref[...].astype(jnp.float32)

    # ---- conv1 (+bias) -> GN -> FiLM -> swish. ----
    acc = _conv3x3_from_padded(pad1_ref[...], w1_ref[...], bb, h, w, cin, cout,
                               dot_dtype)
    acc = acc + b1_ref[...].reshape(1, cout)
    film = film_ref[...].astype(jnp.float32)  # (bb, 2*cout)
    h1 = _gn_film_swish(acc, g1s_ref[...].astype(jnp.float32),
                        g1b_ref[...].astype(jnp.float32),
                        film[:, :cout], film[:, cout:], groups, eps, bb, hw, cout)

    # ---- conv2 (+bias) -> GN -> swish. ----
    pad2_ref[...] = jnp.zeros_like(pad2_ref)
    pad2_ref[:, 1:h + 1, 1:w + 1, :] = h1.reshape(bb, h, w, cout)
    acc2 = _conv3x3_from_padded(pad2_ref[...], w2_ref[...], bb, h, w, cout, cout,
                                dot_dtype)
    acc2 = acc2 + b2_ref[...].reshape(1, cout)
    h2 = _gn_film_swish(acc2, g2s_ref[...].astype(jnp.float32),
                        g2b_ref[...].astype(jnp.float32),
                        None, None, groups, eps, bb, hw, cout)

    # ---- shortcut + residual. ----
    if has_shortcut:
        joint = pad1_ref[:, 1:h + 1, 1:w + 1, :].reshape(bb * hw, cin)
        res = jax.lax.dot_general(
            joint.astype(dot_dtype), wsc_ref[...].astype(dot_dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        res = res + bsc_ref[...].reshape(1, cout)
    else:
        res = x_ref[...].astype(jnp.float32).reshape(bb * hw, cout)

    out_ref[...] = (res + h2).reshape(bb, h, w, cout).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "dot_dtype",
                                             "interpret"))
def fused_resblock(x, skip, film, w1, b1, g1s, g1b, w2, b2, g2s, g2b,
                   wsc=None, bsc=None, *, groups: int = 8, eps: float = 1e-6,
                   dot_dtype=jnp.bfloat16, interpret: bool = False):
    """Fused ResBlock forward.

    Parameters
    ----------
    x : (B, H, W, Cx); skip : (B, H, W, Cs) or None (channel-concatenated
        logically, never materialised); film : (B, 2*C) time-FiLM scale/shift
        (the tiny Dense on the time embedding runs outside).
    w1 : (3, 3, Cx+Cs, C) pre-standardised; b1, g1s, g1b, g2s, g2b : (C,);
    w2 : (3, 3, C, C) pre-standardised; wsc : (Cx+Cs, C) or None; bsc : (C,).

    Returns (B, H, W, C) f32.
    """
    # The kernel works in f32/bf16 regardless of an enclosing x64 context.
    f32 = jnp.float32
    x = x.astype(f32)
    skip = None if skip is None else skip.astype(f32)
    film = film.astype(f32)
    w1, b1, g1s, g1b = (a.astype(f32) for a in (w1, b1, g1s, g1b))
    w2, b2, g2s, g2b = (a.astype(f32) for a in (w2, b2, g2s, g2b))
    if wsc is not None:
        wsc, bsc = wsc.astype(f32), bsc.astype(f32)

    B, H, W, Cx = x.shape
    Cs = 0 if skip is None else skip.shape[-1]
    C = w1.shape[-1]
    has_skip = skip is not None
    has_shortcut = wsc is not None
    if (Cx + Cs != C) and not has_shortcut:
        raise ValueError("channel change requires a shortcut kernel")

    bb = _pick_batch_tile(B, H, W, Cx + Cs, C)
    grid = (B // bb,)

    if skip is None:
        skip = jnp.zeros((B, H, W, 1), x.dtype)  # placeholder ref, unread
        cs_spec = 1
    else:
        cs_spec = Cs

    kern = functools.partial(
        _kernel, bb=bb, h=H, w=W, cin_x=Cx, cin_skip=Cs, cout=C,
        groups=groups, eps=eps, has_skip=has_skip,
        has_shortcut=has_shortcut, dot_dtype=dot_dtype)

    if wsc is None:
        wsc = jnp.zeros((Cx + Cs, C), jnp.float32)
        bsc = jnp.zeros((C,), jnp.float32)

    batch_spec = lambda c: pl.BlockSpec((bb, H, W, c), lambda i: (i, 0, 0, 0))
    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))

    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            batch_spec(Cx),
            batch_spec(cs_spec),
            pl.BlockSpec((bb, 2 * C), lambda i: (i, 0)),
            const((3, 3, Cx + Cs, C)), const((C,)), const((C,)), const((C,)),
            const((3, 3, C, C)), const((C,)), const((C,)), const((C,)),
            const((Cx + Cs, C)), const((C,)),
        ],
        out_specs=batch_spec(C),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bb, H + 2, W + 2, Cx + Cs), jnp.float32),
            pltpu.VMEM((bb, H + 2, W + 2, C), jnp.float32),
        ],
        interpret=interpret,
    )(x, skip, film, w1, b1, g1s, g1b, w2, b2, g2s, g2b, wsc, bsc)


def resblock_reference(x, skip, film, w1, b1, g1s, g1b, w2, b2, g2s, g2b,
                       wsc=None, bsc=None, *, groups: int = 8, eps: float = 1e-6):
    """Plain-JAX f32 reference of the same block (for tests)."""
    parts = x if skip is None else jnp.concatenate([x, skip], axis=-1)
    B, H, W, Cin = parts.shape
    C = w1.shape[-1]

    def conv(z, w, b):
        return jax.lax.conv_general_dilated(
            z, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

    def gn(z, scale, bias):
        g = z.reshape(B, H * W, groups, C // groups)
        mean = jnp.mean(g, axis=(1, 3), keepdims=True)
        var = jnp.mean(jnp.square(g - mean), axis=(1, 3), keepdims=True)
        g = (g - mean) * jax.lax.rsqrt(var + eps)
        return g.reshape(B, H, W, C) * scale + bias

    h = gn(conv(parts.astype(jnp.float32), w1, b1), g1s, g1b)
    fs, fb = film[:, :C], film[:, C:]
    h = h * (1.0 + fs[:, None, None, :]) + fb[:, None, None, :]
    h = jax.nn.silu(h)
    h = jax.nn.silu(gn(conv(h, w2, b2), g2s, g2b))

    if wsc is not None:
        res = jnp.einsum("bhwc,cd->bhwd", parts.astype(jnp.float32), wsc) + bsc
    else:
        res = x.astype(jnp.float32)
    return res + h
