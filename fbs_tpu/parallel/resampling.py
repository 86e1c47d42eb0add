"""Cross-shard resampling: move particle payloads between chips without a
full gather (SURVEY.md section 7, hard part 1).

Resampling splits into two parts with very different costs:

1. **Index computation** on the length-N weight vector (cumsum, searchsorted,
   the conditional cyclic roll of ``csmc/resamplings.py``).  N floats are
   tiny; computing them *replicated* on every chip with exactly the same ops
   as the single-device path keeps trajectories bitwise identical.
2. **Payload permutation** ``us_new[k] = us[idx[k]]`` on the (N, *d) particle
   array — the expensive part when ``d`` is an image.  GSPMD would lower a
   plain ``jnp.take`` on a sharded array to an all-gather, materialising the
   full (N, *d) payload on every chip.  :func:`ring_take` instead rotates the
   shard-resident blocks around the mesh ring with ``ppermute`` (k-1 hops);
   each chip keeps only its local block, one in-flight block, and its output
   block — peak memory O(3 N d / k) instead of O(N d), and the traffic rides
   neighbour-to-neighbour ICI links instead of an all-to-all.

Because every output row is a bit-exact copy of an input row, the result is
bitwise identical to ``jnp.take`` by construction.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8 promotes shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

__all__ = ["ring_take", "make_ring_take", "onehot_gather"]


def onehot_gather(xs: jax.Array, i) -> jax.Array:
    """``xs[i]`` for a traced scalar ``i``, as a one-hot contraction.

    On a particle-sharded leading axis a dynamic single-row gather would make
    GSPMD materialise (all-gather) the full ``(N, *d)`` payload on every chip.
    The contraction instead reduces each shard's local block against its slice
    of the one-hot vector and combines shards with a psum of ONE row — O(d)
    traffic instead of O(N d).  This is the backward-pass analogue of
    :func:`make_ring_take` (which serves the length-N index vectors of the
    forward resampling steps).

    Every output element is ``1 * x`` summed with exact zeros, so values are
    exact copies — with the one caveat that a negative-zero entry returns as
    ``+0.0``.
    """
    oh = (jnp.arange(xs.shape[0]) == i).astype(xs.dtype)
    return jnp.tensordot(oh, xs, axes=([0], [0]))


def _ring_take_local(us_local, idx, axis_name: str):
    """shard_map body: produce this shard's slice of ``us[idx]``.

    ``us_local`` is the shard-resident block of rows
    ``[me * nloc, (me+1) * nloc)``; ``idx`` is the full replicated index
    vector.  At ring step ``s`` the in-flight block holds the rows of shard
    ``(me - s) mod k``; each shard copies out the rows its targets name, then
    forwards the block to its ring neighbour.
    """
    k = jax.lax.psum(1, axis_name)
    me = jax.lax.axis_index(axis_name)
    nloc = us_local.shape[0]

    # The global rows this shard must output.
    my_targets = jax.lax.dynamic_slice_in_dim(idx, me * nloc, nloc)

    out = jnp.zeros_like(us_local)
    blk = us_local
    perm = [(i, (i + 1) % k) for i in range(k)]
    bcast = (slice(None),) + (None,) * (us_local.ndim - 1)

    for s in range(k):
        src = (me - s) % k  # owner of the rows currently in ``blk``
        local_rows = my_targets - src * nloc
        sel = (local_rows >= 0) & (local_rows < nloc)
        gathered = jnp.take(blk, jnp.clip(local_rows, 0, nloc - 1), axis=0)
        out = jnp.where(sel[bcast], gathered, out)
        if s != k - 1:
            blk = jax.lax.ppermute(blk, axis_name, perm)
    return out


def make_ring_take(mesh: Mesh, axis: str = "p") -> Callable:
    """Return ``take(us, idx) -> us[idx]`` for ``us`` sharded on axis 0 over
    ``mesh[axis]`` and a replicated ``idx``, implemented as a ppermute ring.

    Row counts that do not divide the mesh-axis size (e.g. the CSMC passes
    run N+1 particles, the reference slot included) are zero-padded up to the
    next multiple and sliced back — padded rows are only ever gathered by
    padded index entries, so results stay bit-exact."""
    fn = shard_map(partial(_ring_take_local, axis_name=axis), mesh=mesh,
                   in_specs=(P(axis), P()), out_specs=P(axis))
    k = mesh.shape[axis]

    def take(us, idx):
        n = us.shape[0]
        rem = (-n) % k
        if rem == 0:
            return fn(us, idx)
        us_p = jnp.concatenate([us, jnp.zeros((rem, *us.shape[1:]), us.dtype)])
        idx_p = jnp.concatenate([idx, jnp.zeros((rem,), idx.dtype)])
        return fn(us_p, idx_p)[:n]

    return take


def ring_take(mesh: Mesh, us, idx, axis: str = "p"):
    """One-shot form of :func:`make_ring_take`."""
    return make_ring_take(mesh, axis)(us, idx)
