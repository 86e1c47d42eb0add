"""Small spatio-temporal networks for toy experiments and tests
(capability parity with reference ``fbs/nn/models.py``)."""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from fbs_tpu.nn.base import sinusoidal_embedding, make_st_nn

__all__ = ["CrescentMLP", "GMSBMLP", "STMLP", "MNISTAutoEncoder",
           "MNISTConvNet", "make_simple_st_nn"]

_init = nn.initializers.xavier_normal()


def _time_embed(t, dt, out_dim=32):
    if jnp.ndim(t) < 1:
        return jnp.expand_dims(sinusoidal_embedding(t / dt, out_dim=out_dim), 0)
    return jax.vmap(lambda z: sinusoidal_embedding(z, out_dim=out_dim))(t / dt)


class CrescentMLP(nn.Module):
    """Gated MLP for the 3-D Crescent toy (reference ``models.py:23-43``)."""
    dt: float
    dim: int = 3
    hiddens: Sequence[int] = (256, 256, 128, 64, 32, 16)

    @nn.compact
    def __call__(self, x, t):
        time_emb = _time_embed(t, self.dt)
        for h in self.hiddens:
            x = nn.Dense(h, kernel_init=_init)(x)
            gate = nn.Dense(h, kernel_init=_init)(
                nn.gelu(nn.Dense(h, kernel_init=_init)(time_emb)))
            shift = nn.Dense(h, kernel_init=_init)(
                nn.gelu(nn.Dense(h, kernel_init=_init)(time_emb)))
            x = nn.gelu(x * gate + shift)
        x = nn.Dense(self.dim, kernel_init=_init)(x)
        return jnp.squeeze(x)


class GMSBMLP(nn.Module):
    """MLP drift for the Gaussian SB image-free experiments
    (reference ``models.py:63-114``)."""
    dim: int
    dt: float = 1.0

    @nn.compact
    def __call__(self, x, k):
        time_emb = _time_embed(k, self.dt)
        time_emb = nn.gelu(nn.Dense(32, kernel_init=_init)(time_emb))
        x = nn.gelu(nn.Dense(16, kernel_init=_init)(x))
        x = nn.gelu(nn.Dense(32, kernel_init=_init)(x))
        h = jnp.concatenate([x, jnp.broadcast_to(time_emb, (x.shape[0], 32))], axis=-1)
        h = nn.gelu(nn.Dense(64, kernel_init=_init)(h))
        h = nn.gelu(nn.Dense(16, kernel_init=_init)(h))
        return nn.Dense(self.dim, kernel_init=_init)(h)


class STMLP(nn.Module):
    """Generic spatio-temporal MLP used by make_simple_st_nn and tests
    (reference ``models.py:228-253``)."""
    embed_dim: int = 128

    @nn.compact
    def __call__(self, x, t):
        d = x.shape[-1]
        x = nn.relu(nn.Dense(16, kernel_init=_init)(x))
        x = nn.Dense(8, kernel_init=_init)(x)

        if jnp.ndim(t) < 1:
            t = sinusoidal_embedding(t, out_dim=self.embed_dim)
        else:
            t = jax.vmap(lambda z: sinusoidal_embedding(z, out_dim=self.embed_dim))(t)
        t = nn.relu(nn.Dense(16, kernel_init=_init)(t))
        t = nn.Dense(8, kernel_init=_init)(t)

        z = jnp.concatenate([x, jnp.broadcast_to(t, (*x.shape[:-1], 8))], axis=-1)
        z = nn.relu(nn.Dense(32, kernel_init=_init)(z))
        z = nn.relu(nn.Dense(8, kernel_init=_init)(z))
        z = nn.Dense(d, kernel_init=_init)(z)
        return jnp.squeeze(z)


class MNISTAutoEncoder(nn.Module):
    """Dense autoencoder-style score net for flattened MNIST (reference
    ``models.py:117-141``, 'preliminary experiments only')."""
    out_dim: int = 784 * 2

    @nn.compact
    def __call__(self, xy, t):
        xy = nn.relu(nn.Dense(128, kernel_init=_init)(xy))
        xy = nn.Dense(32, kernel_init=_init)(xy)

        t = sinusoidal_embedding(t, out_dim=128)
        t = nn.relu(nn.Dense(64, kernel_init=_init)(t))
        t = nn.Dense(32, kernel_init=_init)(t)

        z = jnp.concatenate([xy, jnp.broadcast_to(t, (*xy.shape[:-1], 32))], axis=-1)
        z = nn.relu(nn.Dense(128, kernel_init=_init)(z))
        z = nn.relu(nn.Dense(256, kernel_init=_init)(z))
        z = nn.Dense(self.out_dim, kernel_init=_init)(z)
        return jnp.squeeze(z)


class MNISTConvNet(nn.Module):
    """Small conv encoder/decoder with time FiLM and pixel-shuffle upsampling
    (reference ``models.py:144-214`` MNISTResConv, 'preliminary only')."""
    dt: float
    image_size: int = 28

    @nn.compact
    def __call__(self, x, t):
        from fbs_tpu.nn.unet import PixelShuffle

        s = self.image_size
        batched = x.ndim > 1 and x.shape[0] != s * s
        B = x.shape[0] if batched else 1
        x = x.reshape(B, s, s, 1)

        h = nn.silu(nn.GroupNorm(num_groups=8)(nn.Conv(32, (3, 3))(x)))
        skip1 = h
        h = nn.Conv(32, (3, 3), strides=(2, 2))(h)
        h = nn.silu(nn.GroupNorm(num_groups=8)(nn.Conv(64, (3, 3))(h)))
        skip2 = h
        h = nn.Conv(64, (3, 3), strides=(2, 2))(h)

        temb = sinusoidal_embedding(t / self.dt, out_dim=32)
        temb = nn.gelu(nn.Dense(64, kernel_init=_init)(temb))
        temb = nn.Dense(128, kernel_init=_init)(temb).reshape(1, 1, 1, -1)
        scale, shift = temb[..., :64], temb[..., 64:]
        h = h * scale + shift

        h = nn.Conv(64 * 4, (3, 3))(h)
        h = PixelShuffle(scale=2)(h)
        h = nn.silu(nn.GroupNorm(num_groups=8)(nn.Conv(64, (3, 3))(h)))
        h = h + skip2
        h = nn.Conv(32 * 4, (3, 3))(h)
        h = PixelShuffle(scale=2)(h)
        h = nn.silu(nn.GroupNorm(num_groups=8)(nn.Conv(32, (3, 3))(h)))
        h = h + skip1
        h = nn.Conv(1, (3, 3))(h)

        h = h.reshape(B, -1)
        return h if batched else jnp.squeeze(h)


def make_simple_st_nn(key, dim_in: Sequence[int], batch_size: int,
                      nn_model: nn.Module = None, embed_dim: int = 128):
    """Build a simple spatio-temporal NN with sinusoidal embedding; returns
    ``(nn_model, dict_param, array_param, array_to_dict, forward_pass)``
    (reference ``models.py:217-259``)."""
    if nn_model is None:
        nn_model = STMLP(embed_dim=embed_dim)
    dict_param = nn_model.init(key, jnp.ones((batch_size, *dim_in)), jnp.array(1.0))
    array_param, array_to_dict, forward_pass = make_st_nn(key, nn_model, dim_in, batch_size)
    return nn_model, dict_param, array_param, array_to_dict, forward_pass
