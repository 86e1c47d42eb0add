"""Training utilities: optax step kernel, EMA, and the baby time-concat NN
(reference ``fbs/nn/utils.py``)."""
from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen
from jax.flatten_util import ravel_pytree

from fbs_tpu.typing import JArray, JKey, FloatScalar

__all__ = ["make_optax_kernel", "make_nn_with_time"]


def make_optax_kernel(optimiser, loss_fn: Callable, jit: bool = True) -> Tuple[Callable, Callable]:
    """Build ``(optax_kernel, ema_kernel)`` over flat parameter vectors
    (reference ``fbs/nn/utils.py:60-83``).

    ``optax_kernel(param, opt_state, *args)`` does one value_and_grad step;
    ``ema_kernel(ema_param, param, count, count_start, count_every, decay)``
    maintains an exponential moving average with warmup and stride.
    """

    def optax_kernel(param: JArray, opt_state, *args, **kwargs):
        loss, grad = jax.value_and_grad(loss_fn)(param, *args, **kwargs)
        updates, opt_state = optimiser.update(grad, opt_state, param)
        param = optax.apply_updates(param, updates)
        return param, opt_state, loss

    @partial(jax.jit, static_argnums=2)
    def ema_update(param: JArray, ema_param: JArray, decay: float) -> JArray:
        return decay * ema_param + (1 - decay) * param

    def ema_kernel(ema_param: JArray, param: JArray,
                   count: int, count_start: int, count_every: int,
                   decay: float) -> JArray:
        if count < count_start:
            return param
        if count % count_every == 0:
            return ema_update(param, ema_param, decay)
        return ema_param

    return (jax.jit(optax_kernel) if jit else optax_kernel), ema_kernel


def make_nn_with_time(nn: linen.Module,
                      dim_in: int,
                      batch_size: int,
                      time_scale: FloatScalar,
                      key: JKey):
    """Concatenate a scaled time to the input — the 'baby version' wrapper
    (reference ``fbs/nn/utils.py:12-50``)."""
    dict_param = nn.init(key, jnp.ones((batch_size, dim_in + 1)))
    array_param, array_to_dict = ravel_pytree(dict_param)

    def forward_pass(x: JArray, t: FloatScalar, param: JArray) -> JArray:
        return nn.apply(array_to_dict(param), jnp.hstack([x, t * time_scale]))

    return array_param, array_to_dict, forward_pass
