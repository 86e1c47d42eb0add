"""Conditional resampling schemes for conditional SMC.

Rebuild of reference ``fbs/samplers/csmc/resamplings.py`` with one addition:
a *working* conditional systematic resampling (the reference deliberately
raises ``NotImplementedError`` there, ``csmc/resamplings.py:128-129``).

Signature convention (matching the reference):
``resampling(key, weights, i, j, conditional) -> indices`` where the draw is
conditioned on the event "the ancestor at slot ``j`` equals ``i``".  Weights
are assumed normalised.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from fbs_tpu.typing import JArray, JKey

__all__ = ["multinomial", "killing", "systematic"]


def multinomial(key: JKey, weights: JArray, i: Optional[int] = 0, j: Optional[int] = 0,
                conditional: bool = True) -> JArray:
    """Conditional multinomial resampling: iid categorical draws with slot
    ``j`` pinned to ``i`` (valid because multinomial ancestors are iid;
    reference ``csmc/resamplings.py:10-37``)."""
    n = weights.shape[0]
    indices = jax.random.choice(key, n, p=weights, shape=(n,), replace=True)
    if conditional:
        indices = indices.at[j].set(i)
    return indices


def killing(key: JKey, weights: JArray, i: Optional[int] = 0, j: Optional[int] = 0,
            conditional: bool = True) -> JArray:
    """Conditional killing resampling (reference ``csmc/resamplings.py:40-88``).

    Unconditional part: keep slot ``k`` w.p. ``w_k / max(w)``, else redraw
    categorically.  Conditional part: draw the slot ``J`` whose ancestor is
    forced to survive from the survival-biased law, cyclically roll the index
    vector so that slot ``J`` lands at ``j``, and pin ``idx[j] = i``.  The
    random cyclic roll is what makes the conditional kernel leave the CSMC
    extended target invariant.
    """
    key_1, key_2, key_3 = jax.random.split(key, 3)

    n = weights.shape[0]
    w_max = weights.max()

    survive = jax.random.uniform(key_1, (n,)) * w_max < weights
    idx = jnp.arange(n)
    idx = jnp.where(survive, idx, jax.random.choice(key_2, n, (n,), p=weights))
    if not conditional:
        return idx

    # P(J = k) ∝ probability that slot k was replaced and redrew particle i,
    # with the leftover mass assigned to J = i (slot i survived).
    J_prob = (1.0 - weights / w_max) / n
    J_prob = J_prob.at[i].set(0.0)
    J_prob = J_prob.at[i].set(jnp.maximum(1.0 - jnp.sum(J_prob), 0.0))

    J = jax.random.choice(key_3, n, (), p=J_prob)
    idx = jnp.roll(idx, j - J)
    idx = idx.at[j].set(i)
    return idx


def systematic(key: JKey, weights: JArray, i: Optional[int] = 0, j: Optional[int] = 0,
               conditional: bool = True) -> JArray:
    """Systematic resampling, with a working conditional variant.

    Unconditional: the usual shared-offset CDF inversion.

    Conditional (Chopin & Singh 2015 construction): conditioned on particle
    ``i`` being selected by some slot, the selected grid point
    ``v = (k + u) / n`` is uniform on the weight-CDF cell
    ``[F_{i-1}, F_i)``.  So draw ``v`` there, recover the offset
    ``u = frac(n v)`` and the selecting slot ``k0 = floor(n v)``, run standard
    systematic resampling with that ``u``, then cyclically roll the ancestor
    vector so slot ``k0`` lands at slot ``j``.  The cyclic roll plays the same
    role as in :func:`killing`.  (The reference leaves this variant
    unimplemented: ``csmc/resamplings.py:128-129``.)
    """
    n = weights.shape[0]
    if not conditional:
        u = jax.random.uniform(key, ())
        idx = jnp.searchsorted(jnp.cumsum(weights),
                               (jnp.arange(n, dtype=weights.dtype) + u) / n)
        return jnp.clip(idx, 0, n - 1).astype(jnp.int_)

    cumw = jnp.cumsum(weights)
    # Guard the i == 0 case against negative-index wraparound under tracing.
    F_lo = jnp.where(jnp.equal(i, 0), 0.0, cumw[jnp.maximum(i - 1, 0)])
    F_hi = cumw[i]

    v = jax.random.uniform(key, (), minval=F_lo, maxval=F_hi)
    nv = n * v
    k0 = jnp.floor(nv).astype(jnp.int32)
    u = nv - k0

    idx = jnp.searchsorted(cumw, (jnp.arange(n, dtype=weights.dtype) + u) / n)
    idx = jnp.clip(idx, 0, n - 1).astype(jnp.int_)
    idx = jnp.roll(idx, j - k0)
    idx = idx.at[j].set(i)
    return idx
