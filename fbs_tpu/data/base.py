"""Dataset protocol (reference ``fbs/data/base.py``)."""
from __future__ import annotations

from typing import List, Protocol

import jax
import jax.numpy as jnp

from fbs_tpu.typing import Array, JArray, JKey

__all__ = ["Dataset"]


class Dataset(Protocol):
    """Datasets either expose a generative ``sampler`` p(x, y) or a fixed
    array of samples enumerated in randomly permuted batches."""
    n: int
    xs: Array
    perm_inds: List[JArray]

    @staticmethod
    def reshape(x: Array) -> JArray:
        if x.ndim == 0:
            return jnp.reshape(x, (1, 1))
        if x.ndim == 1:
            return jnp.reshape(x, (-1, 1))
        return x

    @staticmethod
    def standardise(array: Array) -> JArray:
        return (array - jnp.mean(array, axis=0)) / jnp.std(array, axis=0)

    def draw_subset(self, key: JKey, batch_size: int) -> JArray:
        inds = jax.random.choice(key, jnp.arange(self.n), (batch_size,), replace=False)
        return self.reshape(self.xs[inds, :])

    def init_enumeration(self, key: JKey, batch_size: int) -> List[JArray]:
        """Randomly split the data into ``n // batch_size`` chunks (truncating
        the remainder)."""
        n_chunks = self.n // batch_size
        perm_inds = jnp.array_split(
            jax.random.choice(key, jnp.arange(batch_size * n_chunks),
                              (batch_size * n_chunks,), replace=False),
            n_chunks)
        self.perm_inds = perm_inds
        return perm_inds

    def enumerate_subset(self, i: int, perm_inds=None, key=None):
        if perm_inds is None:
            perm_inds = self.perm_inds
        inds = perm_inds[i]
        return self.xs[inds]

    def sampler(self, key: JKey):
        ...
