"""Unconditional resampling schemes for SMC.

Rebuild of the reference's ``fbs/samplers/resampling.py`` (itself derived from
BlackJAX).  Signature convention matches the reference:
``resampling(weights, key) -> indices`` with weights assumed normalised.

All schemes reduce to a weight cumsum + ``searchsorted`` — on TPU both lower
to an efficient parallel prefix-sum and a vectorised binary search; a fused
Pallas variant for large particle counts lives in
``fbs_tpu.ops.resampling_pallas``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from fbs_tpu.typing import JArray, JKey

__all__ = ["systematic", "stratified", "multinomial", "killing"]


def _sorted_uniforms(n: int, key: JKey) -> JArray:
    # Exponential-spacings trick: n sorted U(0,1) draws in O(n).
    us = jax.random.uniform(key, (n + 1,))
    z = jnp.cumsum(-jnp.log(us))
    return z[:-1] / z[-1]


def _systematic_or_stratified(weights: JArray, key: JKey, is_systematic: bool) -> JArray:
    n = weights.shape[0]
    if is_systematic:
        u = jax.random.uniform(key, ())
    else:
        u = jax.random.uniform(key, (n,))
    idx = jnp.searchsorted(jnp.cumsum(weights),
                           (jnp.arange(n, dtype=weights.dtype) + u) / n)
    return jnp.clip(idx, 0, n - 1)


def systematic(weights: JArray, key: JKey) -> JArray:
    """Systematic resampling: one shared uniform offset on the weight CDF."""
    return _systematic_or_stratified(weights, key, True)


def stratified(weights: JArray, key: JKey) -> JArray:
    """Stratified resampling: one uniform per stratum."""
    return _systematic_or_stratified(weights, key, False)


def multinomial(weights: JArray, key: JKey) -> JArray:
    """Multinomial resampling via sorted uniforms + CDF inversion."""
    n = weights.shape[0]
    idx = jnp.searchsorted(jnp.cumsum(weights), _sorted_uniforms(n, key))
    return jnp.clip(idx, 0, n - 1)


def killing(weights: JArray, key: JKey) -> JArray:
    """Killing resampling: keep particle ``k`` with probability
    ``w_k / max(w)``, replace killed particles by categorical draws.  Leaves
    indices in place under uniform weights (low-variance for MCMC-within-SMC).
    """
    # Three-way split mirrors the reference's killing
    # (``fbs/samplers/resampling.py``) so trajectories agree key-for-key;
    # key_3 is unused there too.
    key_1, key_2, _key_3 = jax.random.split(key, 3)
    n = weights.shape[0]
    w_max = weights.max()
    survive = jax.random.uniform(key_1, (n,)) * w_max < weights
    idx = jnp.arange(n)
    return jnp.where(survive, idx, jax.random.choice(key_2, n, (n,), p=weights))
