"""Pallas kernel tests (interpreter mode on CPU): the fused resampler matches
the XLA cumsum+searchsorted reference exactly under a shared offset, and the
fused path simulator matches the closed-form moments."""
import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest


from fbs_tpu.ops import resample_indices_pallas, simulate_linear_sde_path_pallas
from fbs_tpu.samplers.resampling import _systematic_or_stratified


def test_pallas_resampler_matches_reference_semantics():
    """Same key -> the pallas kernel and the XLA reference compute the same
    CDF inversion (they share the jax.random uniform draw)."""
    key = jax.random.PRNGKey(0)
    n = 256
    w = jax.random.uniform(jax.random.PRNGKey(1), (n,)) + 0.01
    w = w / jnp.sum(w)

    w32 = w.astype(jnp.float32)
    for systematic in (True, False):
        # Shared explicit offsets so the comparison is exact regardless of
        # the ambient x64 setting (the XLA path draws default-dtype uniforms).
        u = jax.random.uniform(key, () if systematic else (n,), dtype=jnp.float32)
        idx_ref = jnp.clip(
            jnp.searchsorted(jnp.cumsum(w32),
                             (jnp.arange(n, dtype=jnp.float32) + u) / n),
            0, n - 1)
        idx_pallas = resample_indices_pallas(jnp.log(w32), systematic=systematic,
                                             u=u, interpret=True)
        npt.assert_array_equal(np.asarray(idx_pallas), np.asarray(idx_ref))


def test_pallas_path_simulator_matches_scan():
    """With explicit noise, the fused kernel reproduces the lax.scan
    reference path bit-for-bit (interpreter mode; the in-kernel PRNG path is
    validated statistically on real TPU by bench.py)."""
    d = 128
    K = 64
    key = jax.random.PRNGKey(0)
    F = 0.97
    sq = 0.2
    x0 = jnp.linspace(-1, 1, d, dtype=jnp.float32)
    Fs = jnp.full((K,), F, dtype=jnp.float32)
    sqs = jnp.full((K,), sq, dtype=jnp.float32)
    noise = jax.random.normal(key, (K, d), dtype=jnp.float32)

    path = simulate_linear_sde_path_pallas(jnp.int32(0), x0, Fs, sqs,
                                           noise=noise, interpret=True)
    assert path.shape == (K + 1, d)

    def ref_step(x, elem):
        f, s, n = elem
        x = f * x + s * n
        return x, x

    _, ref = jax.lax.scan(ref_step, x0, (Fs, sqs, noise))
    ref = jnp.concatenate([x0[None], ref], axis=0)
    npt.assert_allclose(np.asarray(path), np.asarray(ref), rtol=1e-6)


def test_fused_group_norm_matches_flax():
    """The one-pass Pallas GroupNorm matches flax nn.GroupNorm exactly
    (interpret mode), including checkpoint-compatible parameter paths."""
    import flax.linen as nn
    from fbs_tpu.ops.group_norm_pallas import fused_group_norm, _gn_reference

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (3, 8, 8, 16))
    scale = jax.random.normal(jax.random.PRNGKey(1), (16,)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(2), (16,)) * 0.1

    ref = nn.GroupNorm(num_groups=4, epsilon=1e-6).apply(
        {"params": {"scale": scale, "bias": bias}}, x)
    got_interp = fused_group_norm(x, scale, bias, groups=4, eps=1e-6, interpret=True)
    got_jnp = _gn_reference(x, scale, bias, 4, 1e-6)
    npt.assert_allclose(np.asarray(got_interp), np.asarray(ref), rtol=2e-5, atol=2e-5)
    npt.assert_allclose(np.asarray(got_jnp), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_unet_fused_norms_matches_plain():
    """UNet(fused_norms=True) reproduces the standard UNet outputs with the
    same parameters (CPU fallback path)."""
    from fbs_tpu.nn import UNet

    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 16, 16, 1))
    t = jnp.array([0.3, 0.6])

    plain = UNet(dt=0.05, dim=8, dim_mults=(1, 2))
    fused = UNet(dt=0.05, dim=8, dim_mults=(1, 2), fused_norms=True)
    variables = plain.init(jax.random.PRNGKey(4), x, t)
    out_plain = plain.apply(variables, x, t)
    out_fused = fused.apply(variables, x, t)  # same params must fit
    npt.assert_allclose(np.asarray(out_fused), np.asarray(out_plain),
                        rtol=2e-4, atol=2e-4)


def test_norm_film_swish_kernel_matches_reference():
    """v2 fused norm kernel (batch-chunked, with padding) matches the plain
    formulation exactly; exercises the non-divisible-batch padding path."""
    from fbs_tpu.ops.norm_film_pallas import fused_group_norm_film_swish, _reference

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (13, 12, 12, 16))
    scale = jax.random.normal(jax.random.PRNGKey(1), (16,)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(2), (16,)) * 0.1
    fs = jax.random.normal(jax.random.PRNGKey(3), (13, 16)) * 0.2
    fb = jax.random.normal(jax.random.PRNGKey(4), (13, 16)) * 0.2

    for film, sw in [(False, False), (True, True)]:
        got = fused_group_norm_film_swish(x, scale, bias,
                                          fs if film else None,
                                          fb if film else None,
                                          groups=4, swish=sw, interpret=True)
        ref = _reference(x, scale, bias, fs if film else None,
                         fb if film else None, 4, 1e-6, sw)
        npt.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_microbatched_kernels_match_unchunked():
    """make_separable_kernels(microbatch=k) is the single-chip HBM-fit knob
    for 256^2 N=128 (VERDICT r2 missing #3); per-sample math is unchanged so
    all four closures must agree with the unchunked build."""
    from fbs_tpu.samplers.kernels import make_separable_kernels

    d_u, d_v, n = 3, 2, 8
    W = jax.random.normal(jax.random.PRNGKey(7), (d_u + d_v, d_u + d_v))

    def drift(joint, t):
        return jnp.tanh(joint @ W.T) * (1.0 + t)

    def concat(us, v, **kw):
        return jnp.concatenate([us, jnp.broadcast_to(v, (us.shape[0], *v.shape))],
                               axis=-1)

    def unpack(joint, **kw):
        return joint[..., :d_u], joint[..., d_u:]

    disp = lambda t: 1.0 + 0.1 * t
    plain = make_separable_kernels(drift, disp, concat, unpack, 0.05)
    chunked = make_separable_kernels(drift, disp, concat, unpack, 0.05,
                                     microbatch=4)

    key = jax.random.PRNGKey(0)
    us_prev = jax.random.normal(key, (n, d_u))
    v = jnp.ones((d_v,)) * 0.3
    v_prev = jnp.ones((d_v,)) * -0.2
    u = jax.random.normal(jax.random.PRNGKey(1), (n, d_u))
    t_prev = 0.4

    npt.assert_allclose(plain[0](us_prev, v_prev, t_prev, key),
                        chunked[0](us_prev, v_prev, t_prev, key), rtol=1e-6)
    npt.assert_allclose(plain[1](u, us_prev, v_prev, t_prev),
                        chunked[1](u, us_prev, v_prev, t_prev), rtol=1e-6)
    npt.assert_allclose(plain[2](v, us_prev, v_prev, t_prev),
                        chunked[2](v, us_prev, v_prev, t_prev), rtol=1e-6)
    pu, pw = plain[3](us_prev, v, v_prev, t_prev, key)
    cu, cw = chunked[3](us_prev, v, v_prev, t_prev, key)
    npt.assert_allclose(pu, cu, rtol=1e-6)
    npt.assert_allclose(pw, cw, rtol=1e-6)


class TestFusedLinearAttnGate:
    """Whole-gate Pallas linear attention (fbs_tpu/ops/linear_attn_pallas.py)."""

    def _params(self, key, C, D):
        ks = jax.random.split(key, 5)
        return (1 + 0.1 * jax.random.normal(ks[0], (C,)),
                0.2 * jax.random.normal(ks[1], (C, 3 * D)),
                0.2 * jax.random.normal(ks[2], (D, C)),
                0.1 * jax.random.normal(ks[3], (C,)),
                1 + 0.1 * jax.random.normal(ks[4], (C,)))

    @pytest.mark.parametrize("shape", [(3, 14, 14, 64), (2, 7, 7, 32)])
    def test_kernel_matches_reference(self, shape):
        from fbs_tpu.ops.linear_attn_pallas import (fused_linear_attn_gate,
                                                    linear_attn_gate_reference)

        B, H, W, C = shape
        heads, dh = 4, 32
        x = jax.random.normal(jax.random.PRNGKey(0), shape)
        ln1, wqkv, wo, bo, ln2 = self._params(jax.random.PRNGKey(1), C, heads * dh)
        ref = linear_attn_gate_reference(x.reshape(B, H * W, C), ln1, wqkv, wo,
                                         bo, ln2, heads, dh).reshape(shape)
        got = fused_linear_attn_gate(x, ln1, wqkv, wo, bo, ln2, heads, dh,
                                     interpret=True)
        npt.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-5, atol=3e-5)

    def test_gate_module_parity_and_param_compat(self):
        """AttnGate(fused_linear=True) == AttnGate under the SAME param dict,
        and both inits produce identical param trees (checkpoint compat)."""
        from fbs_tpu.nn.unet import AttnGate

        x = jax.random.normal(jax.random.PRNGKey(0), (3, 14, 14, 64))
        plain = AttnGate(linear=True)
        fused = AttnGate(linear=True, fused_linear=True)
        params = plain.init(jax.random.PRNGKey(1), x)
        npt.assert_allclose(np.asarray(fused.apply(params, x)),
                            np.asarray(plain.apply(params, x)),
                            rtol=3e-5, atol=3e-5)
        pf = fused.init(jax.random.PRNGKey(1), x)
        assert jax.tree.structure(params) == jax.tree.structure(pf)
        assert (jax.tree.map(lambda a: a.shape, params)
                == jax.tree.map(lambda a: a.shape, pf))

    def test_unet_flag_parity(self):
        from fbs_tpu.nn.unet import UNet

        xi = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 1))
        ti = jnp.array([0.3, 0.7])
        plain = UNet(dt=0.01, dim=32, dim_mults=(1, 2))
        fused = UNet(dt=0.01, dim=32, dim_mults=(1, 2), fused_linear_attn=True)
        p = plain.init(jax.random.PRNGKey(3), xi, ti)
        r1, r2 = plain.apply(p, xi, ti), fused.apply(p, xi, ti)
        npt.assert_allclose(np.asarray(r2), np.asarray(r1), rtol=2e-4, atol=1e-5)
