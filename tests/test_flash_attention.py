"""Flash attention equivalence tests: the JAX online-softmax path and the
Pallas kernel (interpreter mode) both match plain softmax attention, and the
custom-vjp gradients match."""
import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt

from fbs_tpu.ops.flash_attention import (flash_attention, flash_attention_jax,
                                         flash_attention_pallas)


def _ref_attention(q, k, v, scale):
    s = jnp.einsum("...qd,...kd->...qk", q, k) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("...qk,...kd->...qd", p, v)


def _qkv(key, shape):
    kq, kk, kv = jax.random.split(key, 3)
    return (jax.random.normal(kq, shape), jax.random.normal(kk, shape),
            jax.random.normal(kv, shape))


def test_flash_jax_matches_reference():
    q, k, v = _qkv(jax.random.PRNGKey(0), (2, 3, 200, 32))
    out = flash_attention_jax(q, k, v, scale=0.7, block_k=64)
    ref = _ref_attention(q, k, v, 0.7)
    npt.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_pallas_matches_reference():
    q, k, v = _qkv(jax.random.PRNGKey(1), (4, 256, 32))
    out = flash_attention_pallas(q, k, v, scale=1.3, block_q=128, block_k=128,
                                 interpret=True)
    ref = _ref_attention(q, k, v, 1.3)
    npt.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_custom_vjp_grads_match():
    q, k, v = _qkv(jax.random.PRNGKey(2), (2, 64, 16))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, 0.9) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_ref_attention(q, k, v, 0.9) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        npt.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_flash_pallas_bwd_multiblock_grads_match():
    """The hand Pallas backward (dQ kernel + dKV kernel) matches dense
    attention grads on a shape that exercises multiple q and kv blocks."""
    from fbs_tpu.ops.flash_attention import _flash_bwd_pallas, _flash_fwd_pallas

    q, k, v = _qkv(jax.random.PRNGKey(5), (3, 256, 32))
    do = jax.random.normal(jax.random.PRNGKey(6), q.shape)
    scale = 0.6

    o, lse = _flash_fwd_pallas(q, k, v, scale, block_q=64, block_k=128,
                               interpret=True)
    npt.assert_allclose(np.asarray(o), np.asarray(_ref_attention(q, k, v, scale)),
                        rtol=2e-5, atol=2e-5)
    dq, dk, dv = _flash_bwd_pallas(q, k, v, o, lse, do, scale,
                                   block_q=64, block_k=128, interpret=True)

    _, vjp = jax.vjp(lambda q_, k_, v_: _ref_attention(q_, k_, v_, scale), q, k, v)
    for a, b in zip((dq, dk, dv), vjp(do)):
        npt.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_flash_pallas_bwd_bf16():
    """bf16 inputs: grads come back bf16 and close to the f32 dense grads."""
    from fbs_tpu.ops.flash_attention import _flash_bwd_pallas, _flash_fwd_pallas

    qf, kf, vf = _qkv(jax.random.PRNGKey(7), (2, 128, 16))
    q, k, v = (x.astype(jnp.bfloat16) for x in (qf, kf, vf))
    do = jax.random.normal(jax.random.PRNGKey(8), q.shape).astype(jnp.bfloat16)

    o, lse = _flash_fwd_pallas(q, k, v, 1.0, block_q=64, block_k=64, interpret=True)
    dq, dk, dv = _flash_bwd_pallas(q, k, v, o, lse, do, 1.0,
                                   block_q=64, block_k=64, interpret=True)
    assert dq.dtype == dk.dtype == dv.dtype == jnp.bfloat16

    _, vjp = jax.vjp(lambda a, b, c: _ref_attention(a, b, c, 1.0), qf, kf, vf)
    for g, gref in zip((dq, dk, dv), vjp(do.astype(qf.dtype))):
        npt.assert_allclose(np.asarray(g, np.float32), np.asarray(gref),
                            rtol=0.1, atol=0.1)


def test_flash_bwd_lowers_for_tpu():
    """Cross-platform TPU lowering gate for the fwd-with-lse and the two
    backward kernels at the CelebA-256 bottleneck shape (N=4096, d=64) —
    catches Mosaic lowering failures interpret-mode tests cannot see."""
    from fbs_tpu.ops.flash_attention import _flash_bwd_pallas, _flash_fwd_pallas

    B, N, d = 2, 4096, 64
    q = jnp.zeros((B, N, d), jnp.bfloat16)
    lse = jnp.zeros((B, N, 1), jnp.float32)

    fwd = jax.jit(lambda q_, k_, v_: _flash_fwd_pallas(q_, k_, v_, 0.125,
                                                       interpret=False))
    exported = jax.export.export(fwd, platforms=["tpu"])(q, q, q)
    assert exported.platforms == ("tpu",)

    bwd = jax.jit(lambda *a: _flash_bwd_pallas(*a, 0.125, interpret=False))
    exported = jax.export.export(bwd, platforms=["tpu"])(q, q, q, q, lse, q)
    assert exported.platforms == ("tpu",)


def test_unet_flash_path_matches_plain():
    """A UNet bottleneck over the flash threshold produces (numerically) the
    same output as the plain-attention path."""
    import flax.linen as nn
    from fbs_tpu.nn.unet import FullAttention

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 12, 12, 32))

    attn_plain = FullAttention(flash_threshold=10_000)
    attn_flash = FullAttention(flash_threshold=1)
    variables = attn_plain.init(jax.random.PRNGKey(4), x)

    out_plain = attn_plain.apply(variables, x)
    out_flash = attn_flash.apply(variables, x)
    npt.assert_allclose(np.asarray(out_flash), np.asarray(out_plain),
                        rtol=2e-4, atol=2e-4)
