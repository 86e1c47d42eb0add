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

Design (per grid step = one batch tile of ``bb`` samples, everything VMEM,
every tensor a plain 2-D matrix in raster order):

1. read the tile as an (R, Cin) matrix, R = bb*H*W raster rows;
2. conv as 9 shifted matmuls: for each tap (dy, dx) the neighbour pixel is
   ``rows + dy*W + dx`` in raster order, realised as a static
   ``pltpu.roll`` along the sublane (row) axis plus an iota-derived
   validity mask that zeroes rows whose neighbour falls outside the image
   (this also kills the roll's wrap-around and any cross-sample bleed);
   each masked shift feeds an (R, Cin) @ (Cin, C) MXU matmul accumulated
   in f32.  No padded scratch, no strided slicing, no gather;
3. per-sample GroupNorm statistics via one-hot pooling matmuls (Mosaic has
   no grouped reshape on the lane dim), then affine + time-FiLM + swish on
   the VPU;
4. conv2 the same way; GroupNorm + swish;
5. shortcut (identity, or per-input 1x1 matmuls — the logical channel
   concat of (x, skip) is never materialised: ``conv([x; s]) =
   conv_x(x) + conv_s(s)`` with the kernel split along Cin) + residual add.

Mosaic-robustness notes (probed on the real chip, round 3): block shapes
keep their last two dims either full-size or (8, 128)-aligned — in
particular FiLM travels as (B, 1, 2C) so the batch tile never lands in the
sublane slot, and per-channel parameters travel as (1, C); the batch tile
``bb`` is chosen so R = bb*H*W is a multiple of 8 (sublane-aligned rolls).

Weight standardisation is pre-applied to the conv kernels
(``fbs_tpu.nn.unet.standardize_ws_kernels``) — parameters are frozen during
sampling.  Forward-only: use on sampling paths, not training.

Reference semantics being fused: ``fbs_tpu/nn/unet.py:ResBlock`` (itself the
rebuild of reference ``fbs/nn/unet.py:127-172``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_resblock", "resblock_reference"]


def _pick_batch_tile(batch: int, h: int, w: int, cin: int, cout: int,
                     max_vmem_bytes: int = 12 * 1024 * 1024) -> int:
    """Largest divisor of ``batch`` whose working set fits VMEM and whose
    row count bb*h*w is sublane-aligned (multiple of 8)."""
    per_sample = h * w * (cin * 3 + cout * 5) * 4   # f32 mats + shift copies
    if per_sample > max_vmem_bytes:
        raise ValueError(
            f"fused_resblock: one sample's working set "
            f"({per_sample / 2 ** 20:.1f} MiB at {h}x{w}x{cin}->{cout}) exceeds "
            f"the VMEM budget ({max_vmem_bytes / 2 ** 20:.0f} MiB); this kernel "
            f"targets small feature maps (e.g. 28x28) — use the XLA path at "
            f"this resolution.")
    budget = max(1, max_vmem_bytes // per_sample)
    bb = 0
    for d in range(1, batch + 1):
        if batch % d == 0 and d <= budget and d <= 16 and (d * h * w) % 8 == 0:
            bb = d
    if bb == 0:  # no aligned divisor — fall back to whole-batch if it fits
        if batch * h * w % 8 == 0 and batch <= budget:
            bb = batch
        else:
            raise ValueError(
                f"fused_resblock: no batch tile of {batch} gives 8-aligned "
                f"raster rows at {h}x{w}")
    return bb


def _pool_one_hot(rows, cols, divisor, axis):
    """One-hot pooling matrix from 2-D broadcasted iotas.

    ``axis=0``: M[i, j] = 1.0 iff i // divisor == j (fine axis on rows);
    ``axis=1``: M[i, j] = 1.0 iff j // divisor == i (fine axis on cols).
    Mosaic has no gather/one_hot, but iota compares lower cleanly.
    """
    ri = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    # np.int32 scalars: under x64 a Python int would promote the i32 iotas to
    # i64, and Mosaic's convert_element_type rule recurses forever on
    # i32<->i64 (observed: RecursionError through jaxpr_subcomp).
    div = np.int32(divisor)
    eq = (ri // div == ci) if axis == 0 else (ri == ci // div)
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
    ``gn_scale``/``gn_bias`` arrive as (1, c); ``film_*`` as (bb, c) or None.
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

    h = centred * inv_bc * gn_scale + gn_bias
    if film_scale is not None:
        h = (h * (1.0 + _mm(row2smp, film_scale))
             + _mm(row2smp, film_shift))
    return h * jax.nn.sigmoid(h)


def _tap_mask(rows, w, h, dy, dx):
    """(rows, 1) f32 mask: 1.0 where raster row's (dy, dx) neighbour is a
    real pixel of the same image (kills roll wrap-around and cross-sample
    bleed)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    w32, h32 = np.int32(w), np.int32(h)   # keep i32 under x64 (see _pool_one_hot)
    x = row % w32
    y = (row // w32) % h32
    ok = jnp.ones((rows, 1), jnp.bool_)
    if dx:
        ok = ok & (x + np.int32(dx) >= 0) & (x + np.int32(dx) < w32)
    if dy:
        ok = ok & (y + np.int32(dy) >= 0) & (y + np.int32(dy) < h32)
    return ok.astype(jnp.float32)


def _conv3x3_rolled(xmat, w_kernel, w, h, cout, dot_dtype):
    """3x3 same-padding conv of a raster (R, Cin) matrix as 9 masked
    roll+matmul taps; returns (R, cout) f32."""
    rows = xmat.shape[0]
    acc = jnp.zeros((rows, cout), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            dy, dx = ky - 1, kx - 1
            k = dy * w + dx
            shifted = pltpu.roll(xmat, np.int32((-k) % rows), 0) if k else xmat
            if dy or dx:
                shifted = shifted * _tap_mask(rows, w, h, dy, dx)
            acc = acc + jax.lax.dot_general(
                shifted.astype(dot_dtype), w_kernel[ky, kx].astype(dot_dtype),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return acc


def _kernel(x_ref, skip_ref, film_ref,
            w1x_ref, w1s_ref, b1_ref, g1s_ref, g1b_ref,
            w2_ref, b2_ref, g2s_ref, g2b_ref,
            wscx_ref, wscs_ref, bsc_ref,
            out_ref,
            *, bb, h, w, cin_x, cin_skip, cout, groups, eps, has_skip,
            has_shortcut, dot_dtype):
    hw = h * w
    rows = bb * hw

    xmat = x_ref[...].astype(jnp.float32).reshape(rows, cin_x)
    smat = (skip_ref[...].astype(jnp.float32).reshape(rows, cin_skip)
            if has_skip else None)

    # ---- conv1 (+bias) -> GN -> FiLM -> swish.  The logical concat of
    # (x, skip) is never materialised: the Cin-split kernel halves act on
    # each input and the partial sums add. ----
    acc = _conv3x3_rolled(xmat, w1x_ref[...], w, h, cout, dot_dtype)
    if has_skip:
        acc = acc + _conv3x3_rolled(smat, w1s_ref[...], w, h, cout, dot_dtype)
    acc = acc + b1_ref[...]
    film = film_ref[...].astype(jnp.float32).reshape(bb, 2 * cout)
    h1 = _gn_film_swish(acc, g1s_ref[...], g1b_ref[...],
                        film[:, :cout], film[:, cout:], groups, eps, bb, hw,
                        cout)

    # ---- conv2 (+bias) -> GN -> swish. ----
    acc2 = _conv3x3_rolled(h1, w2_ref[...], w, h, cout, dot_dtype)
    acc2 = acc2 + b2_ref[...]
    h2 = _gn_film_swish(acc2, g2s_ref[...], g2b_ref[...],
                        None, None, groups, eps, bb, hw, cout)

    # ---- shortcut + residual. ----
    if has_shortcut:
        res = jax.lax.dot_general(
            xmat.astype(dot_dtype), wscx_ref[...].astype(dot_dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        if has_skip:
            res = res + jax.lax.dot_general(
                smat.astype(dot_dtype), wscs_ref[...].astype(dot_dtype),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        res = res + bsc_ref[...]
    else:
        res = xmat

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
    w1 = w1.astype(f32)
    w2 = w2.astype(f32)

    B, H, W, Cx = x.shape
    Cs = 0 if skip is None else skip.shape[-1]
    C = w1.shape[-1]
    has_skip = skip is not None
    has_shortcut = wsc is not None
    if (Cx + Cs != C) and not has_shortcut:
        raise ValueError("channel change requires a shortcut kernel")

    bb = _pick_batch_tile(B, H, W, Cx + Cs, C)
    grid = (B // bb,)

    # Mosaic-friendly operand shapes: FiLM as (B, 1, 2C) so the batch tile
    # never occupies the sublane slot of a block shape; per-channel params
    # as (1, C); the Cin-concatenated kernels split per input.
    film3 = film.astype(f32).reshape(B, 1, 2 * C)
    row = lambda a: a.astype(f32).reshape(1, C)
    b1, g1s, g1b, b2, g2s, g2b = map(row, (b1, g1s, g1b, b2, g2s, g2b))
    w1x, w1s = w1[:, :, :Cx, :], w1[:, :, Cx:, :]
    if has_shortcut:
        wsc = wsc.astype(f32)
        wscx, wscs, bsc = wsc[:Cx], wsc[Cx:], row(bsc)
    else:
        wscx = jnp.zeros((Cx, C), f32)
        wscs = jnp.zeros((max(Cs, 1), C), f32)
        bsc = jnp.zeros((1, C), f32)
    if not has_skip:
        skip = jnp.zeros((B, H, W, 1), f32)   # placeholder ref, unread
        w1s = jnp.zeros((3, 3, 1, C), f32)
        wscs = jnp.zeros((1, C), f32)
    cs_spec = max(Cs, 1)

    kern = functools.partial(
        _kernel, bb=bb, h=H, w=W, cin_x=Cx, cin_skip=Cs, cout=C,
        groups=groups, eps=eps, has_skip=has_skip,
        has_shortcut=has_shortcut, dot_dtype=dot_dtype)

    batch_spec = lambda c: pl.BlockSpec((bb, H, W, c), lambda i: (i, 0, 0, 0))
    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))

    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            batch_spec(Cx),
            batch_spec(cs_spec),
            pl.BlockSpec((bb, 1, 2 * C), lambda i: (i, 0, 0)),
            const((3, 3, Cx, C)), const((3, 3, max(Cs, 1), C)),
            const((1, C)), const((1, C)), const((1, C)),
            const((3, 3, C, C)), const((1, C)), const((1, C)), const((1, C)),
            const((Cx, C)), const((max(Cs, 1), C)), const((1, C)),
        ],
        out_specs=batch_spec(C),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.float32),
        interpret=interpret,
    )(x, skip, film3, w1x, w1s, b1, g1s, g1b, w2, b2, g2s, g2b,
      wscx, wscs, bsc)


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
