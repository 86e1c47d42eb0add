"""NN layer checks: PixelShuffle parity vs torch, UNet shape/batching
semantics, and flat-parameter roundtrip (reference ``tests/test_nns.py``
covers only the torch parity)."""
import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt


from fbs_tpu.nn import UNet, PixelShuffle, make_st_nn, sinusoidal_embedding, make_simple_st_nn


def test_pixel_shuffle_matches_torch_single_channel():
    """Torch parity in the c=1 case (the only case where the reference's
    einops channel order '(h2 w2 c)' coincides with torch's '(c h2 w2)';
    the reference's own parity test also only covers c=1)."""
    import torch

    key = jax.random.PRNGKey(666)
    x = jax.random.normal(key, (3, 2, 2, 4))
    out_jax = PixelShuffle(scale=2).apply({}, x)

    x_torch = torch.tensor(np.asarray(jnp.moveaxis(x, -1, 1)))
    out_torch = torch.nn.PixelShuffle(2)(x_torch)
    npt.assert_allclose(out_jax, np.moveaxis(out_torch.numpy(), 1, -1), atol=1e-6)


def test_pixel_shuffle_matches_einops_pattern():
    """Multi-channel behavior matches the reference's einops rearrange
    'b h w (h2 w2 c) -> b (h h2) (w w2) c' (reference fbs/nn/utils.py:53-57)."""
    import einops

    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (5, 8, 8, 16))
    out = PixelShuffle(scale=2).apply({}, x)
    expected = einops.rearrange(np.asarray(x), "b h w (h2 w2 c) -> b (h h2) (w w2) c",
                                h2=2, w2=2)
    npt.assert_allclose(out, expected, atol=1e-6)


def test_unet_shapes_and_batching():
    key = jax.random.PRNGKey(0)
    unet = UNet(dt=0.01, dim=16, dim_mults=(1, 2))
    x = jnp.ones((3, 16, 16, 2))
    t = jnp.array([0.1, 0.2, 0.3])
    variables = unet.init(key, x, t)
    out = unet.apply(variables, x, t)
    assert out.shape == x.shape

    # Scalar time.
    out_scalar = unet.apply(variables, x, 0.1)
    assert out_scalar.shape == x.shape

    # Unbatched input auto-expands and squeezes back.
    out_unbatched = unet.apply(variables, x[0], 0.1)
    assert out_unbatched.shape == x.shape[1:]
    npt.assert_allclose(out_unbatched, out_scalar[0], atol=1e-5)

    # A genuine batch of one is NOT squeezed (fixes a reference quirk).
    out_b1 = unet.apply(variables, x[:1], jnp.array([0.1]))
    assert out_b1.shape == (1, *x.shape[1:])


def test_make_st_nn_flat_param_roundtrip():
    key = jax.random.PRNGKey(1)
    unet = UNet(dt=0.01, dim=8, dim_mults=(1,))
    param, array_to_dict, forward = make_st_nn(key, unet, (8, 8, 1), batch_size=2)
    assert param.ndim == 1

    x = jax.random.normal(key, (2, 8, 8, 1))
    out = forward(x, jnp.array([0.5, 0.7]), param)
    assert out.shape == x.shape

    # Ravel/unravel roundtrip is exact.
    d = array_to_dict(param)
    from jax.flatten_util import ravel_pytree
    param2, _ = ravel_pytree(d)
    npt.assert_array_equal(param, param2)


def test_sinusoidal_embedding():
    emb = sinusoidal_embedding(jnp.array(3.0), out_dim=64)
    assert emb.shape == (64,)
    npt.assert_allclose(jnp.sum(emb[:32] ** 2 + emb[32:] ** 2), 32.0, rtol=1e-5)


def test_simple_st_nn_batched_time():
    key = jax.random.PRNGKey(2)
    _, _, param, _, forward = make_simple_st_nn(key, (4,), batch_size=8)
    x = jax.random.normal(key, (8, 4))
    out_vec = forward(x, 0.3 * jnp.ones(8), param)
    out_scalar = forward(x, jnp.array(0.3), param)
    assert out_vec.shape == (8, 4)
    npt.assert_allclose(out_vec, out_scalar, atol=1e-6)


def test_unet_bf16_training_grads():
    """Gradients flow through the bf16 compute path (regression: conv VJP
    with preferred_element_type produced mixed-dtype transposed convs)."""
    unet = UNet(dt=0.05, dim=8, dim_mults=(1, 2), compute_dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, 16, 16, 1))
    t = jnp.linspace(0.1, 0.9, 4)
    variables = unet.init(key, x, t)

    def loss(v):
        return jnp.mean(unet.apply(v, x, t) ** 2)

    g = jax.grad(loss)(variables)
    leaves = jax.tree.leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)


def test_resblock_split_skip_equals_concat():
    """Feeding the skip as a separate part equals the concatenated input
    exactly (conv linearity over channel slices), with shared parameters."""
    from fbs_tpu.nn.unet import ResBlock

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8, 8, 12))
    s = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    temb = jax.random.normal(jax.random.PRNGKey(2), (2, 32))

    block = ResBlock(dim=8)
    variables = block.init(jax.random.PRNGKey(3), x, temb, skip=s)

    out_split = block.apply(variables, x, temb, skip=s)
    out_concat = block.apply(variables, jnp.concatenate([x, s], axis=-1), temb)
    npt.assert_allclose(np.asarray(out_split), np.asarray(out_concat),
                        rtol=1e-5, atol=1e-6)


def test_ws_frozen_matches_standardizing_unet():
    """UNet(ws_frozen=True) on pre-standardised params == the plain UNet
    (bitwise on CPU f32): the sampling-path WS precompute is a pure
    restructuring, not a numerics change."""
    from jax.flatten_util import ravel_pytree
    from fbs_tpu.nn import UNet, make_st_nn, standardize_ws_kernels

    key = jax.random.PRNGKey(0)
    shape = (16, 16, 2)
    plain = UNet(dt=0.01, dim=8, dim_mults=(1, 2), upsampling="pixel_shuffle")
    frozen = UNet(dt=0.01, dim=8, dim_mults=(1, 2), upsampling="pixel_shuffle",
                  ws_frozen=True)

    param, array_to_dict, fwd_plain = make_st_nn(key, plain, shape, batch_size=2)
    _, _, fwd_frozen = make_st_nn(key, frozen, shape, batch_size=2)
    param_std = ravel_pytree(standardize_ws_kernels(array_to_dict(param)))[0]

    x = jax.random.normal(jax.random.PRNGKey(1), (3, *shape))
    t = jnp.array([0.1, 0.5, 0.9])
    a = fwd_plain(x, t, param)
    b = fwd_frozen(x, t, param_std)
    npt.assert_array_equal(np.asarray(a, np.float32), np.asarray(b, np.float32))


def test_fused_resblock_unet_matches_plain():
    """UNet(fused_resblock=True) — the whole-block Pallas kernel path — matches
    the plain UNet on pre-standardised params (CPU interpret mode, f32)."""
    from jax.flatten_util import ravel_pytree
    from fbs_tpu.nn import UNet, make_st_nn, standardize_ws_kernels

    key = jax.random.PRNGKey(0)
    shape = (16, 16, 2)
    plain = UNet(dt=0.01, dim=8, dim_mults=(1, 2), upsampling="pixel_shuffle")
    fused = UNet(dt=0.01, dim=8, dim_mults=(1, 2), upsampling="pixel_shuffle",
                 ws_frozen=True, fused_resblock=True)

    param, array_to_dict, fwd_plain = make_st_nn(key, plain, shape, batch_size=2)
    _, _, fwd_fused = make_st_nn(key, fused, shape, batch_size=2)
    param_std = ravel_pytree(standardize_ws_kernels(array_to_dict(param)))[0]

    x = jax.random.normal(jax.random.PRNGKey(1), (4, *shape))
    t = jnp.array([0.1, 0.5, 0.9, 1.3])
    a = np.asarray(fwd_plain(x, t, param), np.float32)
    b = np.asarray(fwd_fused(x, t, param_std), np.float32)
    npt.assert_allclose(a, b, rtol=2e-4, atol=2e-4)
