"""Score/drift UNet, designed TPU-first.

Capability parity with the reference's UNet (``fbs/nn/unet.py:267-368``, a
derivative of denoising-diffusion-flax): weight-standardised 3x3 convs,
GroupNorm + time-FiLM residual blocks, linear attention at every resolution,
full attention in the bottleneck, resize or pixel-shuffle upsampling,
``dim_mults`` channel schedule, 7x7 stem, skip concatenations, and
``dt``-scaled sinusoidal time conditioning.

TPU-first choices (not in the reference):

- ``compute_dtype`` (default bfloat16 on TPU via :func:`default_compute_dtype`)
  runs convs/matmuls on the MXU in bf16 (f32 accumulation on TPU hardware)
  while keeping parameters and normalisation statistics in f32; attention
  softmax runs in f32.
- Attention is written with plain reshapes + ``jax.lax.dot_general`` (batched
  over heads) rather than einops einsum strings, so XLA sees canonical
  dot-generals it can tile onto the 128x128 systolic array.
- Skip connections are concat-free: the consuming convs split their kernels
  over the parts (identical parameters/math, no concatenated buffers).
- NHWC layout throughout (flax/XLA-TPU native).
- Unbatched inputs are detected by rank, not by ``B == 1`` (the reference
  squeezes genuine batches of one, ``fbs/nn/unet.py:365-368``).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from fbs_tpu.nn.base import sinusoidal_embedding

__all__ = ["UNet", "default_compute_dtype"]


def default_compute_dtype() -> Any:
    """bfloat16 on TPU, float32 elsewhere (keeps CPU tests exact)."""
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        platform = "cpu"
    return jnp.bfloat16 if platform == "tpu" else jnp.float32


def _standardize_kernel(kernel, eps=1e-5):
    """Weight standardisation in f32 (Qiao et al. 2019)."""
    redux = tuple(range(kernel.ndim - 1))
    mean = jnp.mean(kernel, axis=redux, keepdims=True)
    var = jnp.var(kernel, axis=redux, keepdims=True)
    return (kernel - mean) * jax.lax.rsqrt(var + eps)


def standardize_ws_kernels(params):
    """Pre-apply weight standardisation to every WSConv kernel in a param
    pytree, for use with ``UNet(ws_frozen=True)``.

    During sampling the parameters are constant for the whole program, yet
    the per-forward WS statistics (an f32 reduce + rsqrt per conv, ~17 convs
    in the dim-64 UNet) were
    re-computed at every one of the K*N score
    evaluations of a Gibbs sweep — part of the 34.8% norm-statistics time in
    the round-2 TPU profile.  Applying them once here is bitwise identical:
    the standardised f32 kernel is cast to the compute dtype at use exactly
    as the in-graph path does.
    """
    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if k.startswith("WSConv") and isinstance(v, dict) and "kernel" in v:
                v = dict(v)
                v["kernel"] = _standardize_kernel(v["kernel"])
            else:
                v = walk(v)
            out[k] = v
        return out

    return walk(dict(params))


class WSConv(nn.Module):
    """3x3 (by default) convolution with weight standardisation
    (Qiao et al. 2019); the standardisation is computed in f32 regardless of
    the compute dtype.

    Accepts either a single array or a list of arrays to be treated as a
    channel concatenation: ``conv(concat(parts), K) == sum_i conv(part_i,
    K[..., offset_i:offset_i+c_i, :])``, so skip connections never
    materialise the concatenated buffer (the TPU profile shows concat copies
    are a top cost).  The parameter layout is identical either way."""
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    padding: Any = 1
    dtype: Any = jnp.float32
    # False: the kernel parameter is assumed ALREADY standardised (see
    # standardize_ws_kernels) — skips the per-forward f32 stats, a pure win
    # on sampling paths where parameters are frozen for the whole program.
    standardize: bool = True

    @nn.compact
    def __call__(self, x):
        parts = x if isinstance(x, (list, tuple)) else [x]
        cin = sum(p.shape[-1] for p in parts)
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel_size, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        if self.standardize:
            kernel = _standardize_kernel(kernel).astype(self.dtype)
        else:
            kernel = kernel.astype(self.dtype)

        # Uniform compute dtype (no preferred_element_type: its conv VJP
        # produces mixed-dtype transposed convs, which lax rejects).  TPU
        # accumulates bf16 convs in f32 internally regardless.
        y = None
        offset = 0
        for p in parts:
            c = p.shape[-1]
            yk = jax.lax.conv_general_dilated(
                p.astype(self.dtype), kernel[:, :, offset:offset + c, :],
                window_strides=(1, 1),
                padding=[(self.padding, self.padding)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = yk if y is None else y + yk
            offset += c
        return y + bias.astype(self.dtype)


class FusedGroupNorm(nn.Module):
    """GroupNorm backed by the one-pass Pallas kernel
    (``fbs_tpu.ops.group_norm_pallas``).  Same parameters ("scale"/"bias")
    as ``nn.GroupNorm``, so checkpoints interoperate.  Forward-only — use for
    sampling, not training."""
    num_groups: int = 8
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        from fbs_tpu.ops.group_norm_pallas import fused_group_norm

        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        return fused_group_norm(x, scale, bias, groups=self.num_groups,
                                eps=self.epsilon)


class _NormParams(nn.Module):
    """Declares GroupNorm-compatible affine params for the fused-norm path."""
    features: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.features,)),
                self.param("bias", nn.initializers.zeros, (self.features,)))


class _ConvParams(nn.Module):
    """Declares WSConv-compatible (kernel, bias) params for the fused-resblock
    path — same names/shapes, so checkpoints interoperate."""
    features: int
    cin: int

    @nn.compact
    def __call__(self):
        return (self.param("kernel", nn.initializers.lecun_normal(),
                           (3, 3, self.cin, self.features)),
                self.param("bias", nn.initializers.zeros, (self.features,)))


class ResBlock(nn.Module):
    """WSConv-GroupNorm residual block with time-FiLM scale/shift.

    Activations stay in the compute dtype end to end (flax's normalisation
    layers compute mean/var in >=f32 internally regardless of ``dtype``), so
    the VPU-bound norm/FiLM/swish traffic moves at bf16 width on TPU."""
    dim: int
    groups: int = 8
    dtype: Any = jnp.float32
    fused_norms: bool = False
    ws_frozen: bool = False
    fused_resblock: bool = False

    @nn.compact
    def __call__(self, x, time_emb, skip=None):
        """``skip`` is an optional second input treated as channel-concatenated
        with ``x`` — but never materialised as a concat (see WSConv)."""
        parts = [x] if skip is None else [x, skip]
        cin = sum(p.shape[-1] for p in parts)

        if self.fused_resblock:
            # Whole-block Pallas kernel (conv+GN+FiLM+swish+conv+GN+swish+
            # shortcut, one VMEM-resident program; forward-only sampling
            # path).  Requires pre-standardised kernels (ws_frozen).
            if not self.ws_frozen:
                raise ValueError("fused_resblock requires ws_frozen=True "
                                 "(run standardize_ws_kernels on the params)")
            from fbs_tpu.ops.resblock_pallas import fused_resblock

            w1, b1 = _ConvParams(self.dim, cin, name="WSConv_0")()
            scale0, bias0 = _NormParams(self.dim, name="GroupNorm_0")()
            film = nn.Dense(2 * self.dim, dtype=self.dtype)(nn.swish(time_emb))
            w2, b2 = _ConvParams(self.dim, self.dim, name="WSConv_1")()
            scale1, bias1 = _NormParams(self.dim, name="GroupNorm_1")()
            if cin != self.dim:
                wsc = self.param("shortcut_kernel", nn.initializers.lecun_normal(),
                                 (1, 1, cin, self.dim)).reshape(cin, self.dim)
                bsc = self.param("shortcut_bias", nn.initializers.zeros, (self.dim,))
            else:
                wsc = bsc = None
            return fused_resblock(
                x, skip, film, w1, b1, scale0, bias0, w2, b2, scale1, bias1,
                wsc, bsc, groups=self.groups, eps=1e-6, dot_dtype=self.dtype,
                interpret=jax.default_backend() != "tpu")

        if self.fused_norms:
            # One-kernel GroupNorm+FiLM+swish on the sampling path
            # (fbs_tpu.ops.norm_film_pallas); parameter paths match
            # nn.GroupNorm so checkpoints interoperate.
            from fbs_tpu.ops.norm_film_pallas import fused_group_norm_film_swish

            h = WSConv(self.dim, dtype=self.dtype, standardize=not self.ws_frozen)(parts)
            scale0, bias0 = _NormParams(self.dim, name="GroupNorm_0")()
            emb = nn.Dense(2 * self.dim, dtype=self.dtype)(nn.swish(time_emb))
            fs, fb = jnp.split(emb, 2, axis=-1)
            h = fused_group_norm_film_swish(h, scale0, bias0, fs, fb,
                                            groups=self.groups, swish=True)
            h = WSConv(self.dim, dtype=self.dtype, standardize=not self.ws_frozen)(h)
            scale1, bias1 = _NormParams(self.dim, name="GroupNorm_1")()
            h = fused_group_norm_film_swish(h, scale1, bias1, None, None,
                                            groups=self.groups, swish=True)
        else:
            h = WSConv(self.dim, dtype=self.dtype, standardize=not self.ws_frozen)(parts)
            h = nn.GroupNorm(num_groups=self.groups, dtype=self.dtype,
                             name="GroupNorm_0")(h)

            emb = nn.Dense(2 * self.dim, dtype=self.dtype)(nn.swish(time_emb))
            scale, shift = jnp.split(emb[:, None, None, :], 2, axis=-1)
            h = h * (1.0 + scale) + shift
            h = nn.swish(h)

            h = WSConv(self.dim, dtype=self.dtype, standardize=not self.ws_frozen)(h)
            h = nn.swish(nn.GroupNorm(num_groups=self.groups, dtype=self.dtype,
                                      name="GroupNorm_1")(h))

        if cin != self.dim:
            # 1x1 shortcut over the (logical) concat, also split per part.
            kernel = self.param("shortcut_kernel", nn.initializers.lecun_normal(),
                                (1, 1, cin, self.dim))
            bias = self.param("shortcut_bias", nn.initializers.zeros, (self.dim,))
            res = None
            offset = 0
            for p in parts:
                c = p.shape[-1]
                rk = jax.lax.conv_general_dilated(
                    p.astype(self.dtype),
                    kernel[:, :, offset:offset + c, :].astype(self.dtype),
                    window_strides=(1, 1), padding="VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                res = rk if res is None else res + rk
                offset += c
            res = res + bias.astype(self.dtype)
        else:
            res = x.astype(self.dtype)
        return (res + h).astype(jnp.float32)


def _split_heads(t, heads):
    # (B, H, W, heads * d) -> (B, heads, H*W, d)
    B, H, W, C = t.shape
    d = C // heads
    return t.reshape(B, H * W, heads, d).transpose(0, 2, 1, 3)


def _merge_heads(t, H, W):
    # (B, heads, H*W, d) -> (B, H, W, heads * d)
    B, h, N, d = t.shape
    return t.transpose(0, 2, 1, 3).reshape(B, H, W, h * d)


class FullAttention(nn.Module):
    """l2-normalised-qk softmax attention over all pixels (reference
    ``fbs/nn/unet.py:175-206``: qk l2-norm with fixed scale 10).

    Above ``flash_threshold`` tokens the (N, N) score matrix is never
    materialised: the memory-safe flash path in
    ``fbs_tpu.ops.flash_attention`` runs instead (required for the
    CelebA-HQ-256 bottleneck, N = 4096, batch = particles)."""
    heads: int = 4
    dim_head: int = 32
    scale: float = 10.0
    dtype: Any = jnp.float32
    flash_threshold: int = 1024

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        dim = self.heads * self.dim_head
        qkv = nn.Conv(dim * 3, kernel_size=(1, 1), use_bias=False, dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (_split_heads(t, self.heads) for t in (q, k, v))

        def l2norm(t):
            return t * jax.lax.rsqrt(jnp.maximum(jnp.sum(t * t, axis=-1, keepdims=True), 1e-24))

        q, k = l2norm(q), l2norm(k)

        N = H * W
        if N > self.flash_threshold:
            from fbs_tpu.ops.flash_attention import flash_attention, flash_attention_jax

            qf, kf, vf = (t.astype(self.dtype).reshape(B * self.heads, N, self.dim_head)
                          for t in (q, k, v))
            if jax.default_backend() == "tpu":
                # Fused Pallas kernel (custom_vjp: JAX-flash recompute bwd).
                out = flash_attention(qf, kf, vf, self.scale)
            else:
                out = flash_attention_jax(qf, kf, vf, scale=self.scale)
            out = out.reshape(B, self.heads, N, self.dim_head).astype(jnp.float32)
        else:
            logits = jax.lax.dot_general(
                q.astype(self.dtype), k.astype(self.dtype),
                dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1)))
            ).astype(jnp.float32) * self.scale  # (B, h, N, N)
            attn = jax.nn.softmax(logits, axis=-1)
            out = jax.lax.dot_general(
                attn.astype(self.dtype), v.astype(self.dtype),
                dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1)))
            ).astype(jnp.float32)  # (B, h, N, d)
        out = _merge_heads(out, H, W)
        return nn.Conv(C, kernel_size=(1, 1), dtype=self.dtype)(out).astype(jnp.float32)


class LinearAttention(nn.Module):
    """Linear (kernelised) attention: softmax(q) over features, softmax(k)
    over pixels; O(N d^2) (reference ``fbs/nn/unet.py:209-245``)."""
    heads: int = 4
    dim_head: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        dim = self.heads * self.dim_head
        qkv = nn.Conv(dim * 3, kernel_size=(1, 1), use_bias=False, dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (_split_heads(t, self.heads) for t in (q, k, v))  # (B, h, N, d)

        q = jax.nn.softmax(q, axis=-1) / jnp.sqrt(self.dim_head)
        k = jax.nn.softmax(k, axis=-2)
        v = v / (H * W)

        # context = k^T v : (B, h, d, d)
        context = jax.lax.dot_general(
            k.astype(self.dtype), v.astype(self.dtype),
            dimension_numbers=(((2,), (2,)), ((0, 1), (0, 1))))
        # out = q @ context : (B, h, N, d)
        out = jax.lax.dot_general(
            q.astype(self.dtype), context,
            dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1)))
        ).astype(jnp.float32)
        out = _merge_heads(out, H, W)
        out = nn.Conv(C, kernel_size=(1, 1), dtype=self.dtype)(out)
        return nn.LayerNorm(epsilon=1e-5, use_bias=False)(out.astype(jnp.float32))


class _ScaleParam(nn.Module):
    """Declares a LayerNorm-compatible 'scale' param for the fused-gate path."""
    features: int

    @nn.compact
    def __call__(self):
        return self.param("scale", nn.initializers.ones, (self.features,))


class _Conv1x1Params(nn.Module):
    """Declares nn.Conv-compatible 1x1 (kernel, bias) params."""
    cin: int
    cout: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, self.cin, self.cout))
        bias = (self.param("bias", nn.initializers.zeros, (self.cout,))
                if self.use_bias else None)
        return kernel, bias


class _LinAttnParams(nn.Module):
    """Declares LinearAttention-compatible params (Conv_0/Conv_1/LayerNorm_0)
    for the fused-gate path — same names/shapes, so checkpoints interoperate."""
    dim: int
    cin: int

    @nn.compact
    def __call__(self):
        w_qkv, _ = _Conv1x1Params(self.cin, self.dim * 3, use_bias=False,
                                  name="Conv_0")()
        w_out, b_out = _Conv1x1Params(self.dim, self.cin, name="Conv_1")()
        ln2 = _ScaleParam(self.cin, name="LayerNorm_0")()
        return w_qkv, w_out, b_out, ln2


class AttnGate(nn.Module):
    """Pre-norm attention with residual.

    ``fused_linear`` routes the linear gate through the whole-gate Pallas
    kernel (``fbs_tpu.ops.linear_attn_pallas``): one VMEM residency per
    image instead of ~10 XLA op boundaries.  Forward-only (sampling);
    parameter paths match the module path so checkpoints interoperate.
    Above 4096 tokens (e.g. 128^2+) the activations outgrow VMEM and the
    module path runs regardless.
    """
    heads: int = 4
    dim_head: int = 32
    linear: bool = True
    dtype: Any = jnp.float32
    fused_linear: bool = False

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        if self.linear and self.fused_linear and H * W <= 4096:
            from fbs_tpu.ops.linear_attn_pallas import fused_linear_attn_gate

            dim = self.heads * self.dim_head
            ln1 = _ScaleParam(C, name="LayerNorm_0")()
            w_qkv, w_out, b_out, ln2 = _LinAttnParams(dim, C,
                                                      name="LinearAttention_0")()
            return fused_linear_attn_gate(
                x, ln1, w_qkv.reshape(C, 3 * dim), w_out.reshape(dim, C),
                b_out, ln2, heads=self.heads, dim_head=self.dim_head,
                dot_dtype=self.dtype,
                interpret=jax.default_backend() != "tpu")

        normed = nn.LayerNorm(epsilon=1e-5, use_bias=False)(x)
        if self.linear:
            out = LinearAttention(self.heads, self.dim_head, dtype=self.dtype)(normed)
        else:
            out = FullAttention(self.heads, self.dim_head, dtype=self.dtype)(normed)
        return out + x


class PixelShuffle(nn.Module):
    """Depth-to-space rearrange ``(b, h, w, s*s*c) -> (b, h*s, w*s, c)``
    (reference ``fbs/nn/utils.py:53-57``, torch PixelShuffle channel order)."""
    scale: int

    def __call__(self, x):
        B, H, W, C = x.shape
        s = self.scale
        c = C // (s * s)
        # channel index = (h2 * s + w2) * c + ch  (matches einops
        # 'b h w (h2 w2 c) -> b (h h2) (w w2) c')
        x = x.reshape(B, H, W, s, s, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(B, H * s, W * s, c)


class Downsample(nn.Module):
    dim: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = self.dim if self.dim is not None else x.shape[-1]
        return nn.Conv(dim, kernel_size=(4, 4), strides=(2, 2), padding=1, dtype=self.dtype)(x)


class Upsample(nn.Module):
    method: str = "resize"
    dim: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        dim = self.dim if self.dim is not None else C
        if self.method == "resize":
            x = jax.image.resize(x, (B, H * 2, W * 2, C), "linear")
            x = nn.Conv(dim, kernel_size=(3, 3), padding=1, dtype=self.dtype)(x)
        elif self.method == "pixel_shuffle":
            x = nn.Conv(C * 4, kernel_size=(3, 3), padding=1, dtype=self.dtype)(x)
            x = PixelShuffle(scale=2)(x)
            x = nn.Conv(dim, kernel_size=(3, 3), padding=1, dtype=self.dtype)(x)
        else:
            raise ValueError(f"Unknown upsampling method: {self.method}")
        return x


class UNet(nn.Module):
    """Score/drift network for image-shaped states.

    Args mirror the reference (``fbs/nn/unet.py:267-276``): ``dt`` scales the
    time input before the sinusoidal embedding, ``dim`` is the base channel
    count, ``dim_mults`` the per-resolution multipliers.  ``compute_dtype``
    selects the MXU compute precision (pass ``jnp.bfloat16`` on TPU).
    """
    dt: float
    dim: int
    upsampling: str = "resize"
    init_dim: Optional[int] = None
    out_dim: Optional[int] = None
    dim_mults: Tuple[int, ...] = (1, 2, 4)
    resnet_block_groups: int = 8
    fused_norms: bool = False  # one-pass Pallas GroupNorm (sampling only)
    ws_frozen: bool = False  # kernels pre-standardised (standardize_ws_kernels)
    fused_resblock: bool = False  # whole-block Pallas kernel (sampling only)
    fused_linear_attn: bool = False  # whole-gate Pallas kernel (sampling only)
    compute_dtype: Any = jnp.float32
    # Tensor parallelism: channel-shard every block's activations over this
    # mesh axis (params sharded to match by fbs_tpu.parallel.tensor).  GSPMD
    # then places the cross-channel contraction all-reduces over ICI.
    tp_mesh: Any = None
    tp_axis: str = "t"

    def _tp(self, h):
        """Pin a feature map's channel axis to the tensor-parallel sharding."""
        if self.tp_mesh is None:
            return h
        from jax.sharding import NamedSharding, PartitionSpec as P

        if h.shape[-1] % self.tp_mesh.shape[self.tp_axis] == 0:
            spec = P(*([None] * (h.ndim - 1)), self.tp_axis)
        else:
            spec = P()
        return jax.lax.with_sharding_constraint(h, NamedSharding(self.tp_mesh, spec))

    @nn.compact
    def __call__(self, x, time):
        unbatched = x.ndim < 4
        if unbatched:
            x = x[None]
        B, H, W, C = x.shape
        dtype = self.compute_dtype

        init_dim = self.dim if self.init_dim is None else self.init_dim

        h = self._tp(nn.Conv(init_dim, kernel_size=(7, 7), padding=3, dtype=dtype,
                             name="stem")(x))
        hs = [h]

        # Time conditioning MLP.
        if jnp.ndim(time) < 1:
            t_emb = jnp.broadcast_to(sinusoidal_embedding(time / self.dt, out_dim=self.dim),
                                     (B, self.dim))
        else:
            t_emb = jax.vmap(lambda z: sinusoidal_embedding(z, out_dim=self.dim))(time / self.dt)
        t_emb = nn.Dense(self.dim * 4, dtype=dtype)(t_emb)
        t_emb = nn.Dense(self.dim * 4, dtype=dtype)(nn.gelu(t_emb)).astype(jnp.float32)

        nres = len(self.dim_mults)
        for ind in range(nres):
            dim_in = h.shape[-1]
            h = self._tp(ResBlock(dim=dim_in, groups=self.resnet_block_groups, dtype=dtype,
                         fused_norms=self.fused_norms, ws_frozen=self.ws_frozen,
                         fused_resblock=self.fused_resblock)(h, t_emb))
            hs.append(h)
            h = self._tp(ResBlock(dim=dim_in, groups=self.resnet_block_groups, dtype=dtype,
                         fused_norms=self.fused_norms, ws_frozen=self.ws_frozen,
                         fused_resblock=self.fused_resblock)(h, t_emb))
            h = self._tp(AttnGate(linear=True, dtype=dtype, name=f"down_{ind}_attn",
                         fused_linear=self.fused_linear_attn)(h))
            hs.append(h)
            if ind < nres - 1:
                h = self._tp(Downsample(dim=self.dim * self.dim_mults[ind], dtype=dtype,
                               name=f"down_{ind}_ds")(h))

        mid_dim = self.dim * self.dim_mults[-1]
        h = self._tp(nn.Conv(mid_dim, kernel_size=(3, 3), padding=1, dtype=dtype,
                    name=f"down_{nres - 1}_proj")(h))
        h = self._tp(ResBlock(dim=mid_dim, groups=self.resnet_block_groups, dtype=dtype,
                         fused_norms=self.fused_norms, ws_frozen=self.ws_frozen,
                         fused_resblock=self.fused_resblock,
                     name="mid_res0")(h, t_emb))
        h = self._tp(AttnGate(linear=False, dtype=dtype, name="mid_attn")(h))
        h = self._tp(ResBlock(dim=mid_dim, groups=self.resnet_block_groups, dtype=dtype,
                         fused_norms=self.fused_norms, ws_frozen=self.ws_frozen,
                         fused_resblock=self.fused_resblock,
                     name="mid_res1")(h, t_emb))

        for ind in reversed(range(nres)):
            dim_in = self.dim * self.dim_mults[ind]
            dim_out = self.dim * self.dim_mults[ind - 1] if ind > 0 else init_dim

            # Skip connections feed the blocks as separate parts — the concat
            # buffer is never materialised (WSConv splits the kernel).
            h = self._tp(ResBlock(dim=dim_in, groups=self.resnet_block_groups, dtype=dtype,
                         fused_norms=self.fused_norms, ws_frozen=self.ws_frozen,
                         fused_resblock=self.fused_resblock,
                         name=f"up_{ind}_res0")(h, t_emb, skip=hs.pop()))
            h = self._tp(ResBlock(dim=dim_in, groups=self.resnet_block_groups, dtype=dtype,
                         fused_norms=self.fused_norms, ws_frozen=self.ws_frozen,
                         fused_resblock=self.fused_resblock,
                         name=f"up_{ind}_res1")(h, t_emb, skip=hs.pop()))
            h = self._tp(AttnGate(linear=True, dtype=dtype, name=f"up_{ind}_attn",
                         fused_linear=self.fused_linear_attn)(h))
            if ind > 0:
                h = self._tp(Upsample(dim=dim_out, method=self.upsampling, dtype=dtype,
                             name=f"up_{ind}_us")(h))

        h = self._tp(nn.Conv(init_dim, kernel_size=(3, 3), padding=1, dtype=dtype,
                             name="head_proj")(h))
        out = self._tp(ResBlock(dim=self.dim, groups=self.resnet_block_groups, dtype=dtype,
                       fused_norms=self.fused_norms, ws_frozen=self.ws_frozen,
                         fused_resblock=self.fused_resblock,
                       name="final_res")(h, t_emb, skip=hs.pop()))

        out_dim = C if self.out_dim is None else self.out_dim
        out = nn.Conv(out_dim, kernel_size=(1, 1), dtype=dtype, name="head")(out)
        out = out.astype(jnp.float32)
        return out[0] if unbatched else out
