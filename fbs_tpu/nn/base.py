"""Network wrappers: flat-parameter ravel and time embeddings.

Rebuild of reference ``fbs/nn/base.py``.  The whole Flax parameter pytree is
flattened to a single 1-D vector (``ravel_pytree``) — this is what makes the
reference's checkpoints a single ``np.savez`` array, and we keep the format
(``param`` / ``ema_param`` key names) for artifact compatibility
(reference ``experiments/imgs/train.py:122-124``).
"""
from __future__ import annotations

import math
from typing import Callable, Sequence, Tuple, Union

import flax.linen as linen
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from fbs_tpu.typing import JArray, JKey, FloatScalar

__all__ = ["make_st_nn", "sinusoidal_embedding"]


def make_st_nn(key: JKey, nn: linen.Module, dim_in: Sequence[int], batch_size: int
               ) -> Tuple[JArray, Callable[[JArray], dict], Callable]:
    """Wrap a Flax module approximating a spatio-temporal function f(x, t).

    Returns ``(array_param, array_to_dict, forward_pass)`` where
    ``forward_pass(x, t, param)`` accepts a batch ``x: (B, *dim_in)`` with
    ``t: (B,)`` (or a scalar t, or an unbatched x — module-dependent), and
    ``param`` is the raveled 1-D parameter vector
    (reference ``fbs/nn/base.py:9-41``).
    """
    dict_param = nn.init(key, jnp.ones((batch_size, *dim_in)), jnp.ones((batch_size,)))
    array_param, array_to_dict = ravel_pytree(dict_param)

    def forward_pass(x: JArray, t: FloatScalar, param: JArray) -> JArray:
        return nn.apply(array_to_dict(param), x, t)

    return array_param, array_to_dict, forward_pass


def sinusoidal_embedding(t: Union[JArray, FloatScalar], out_dim: int = 64,
                         max_period: int = 10_000) -> JArray:
    """Sinusoidal positional embedding of a (discretised) time scalar
    (reference ``fbs/nn/base.py:44-77``)."""
    if out_dim % 2 == 1:
        raise NotImplementedError(f"out_dim must be even, got {out_dim}.")
    half = out_dim // 2
    fs = jnp.exp(-math.log(max_period) * jnp.arange(half) / (half - 1))
    embs = t * fs
    return jnp.concatenate([jnp.sin(embs), jnp.cos(embs)], axis=-1)
