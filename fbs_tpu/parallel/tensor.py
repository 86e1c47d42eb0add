"""Tensor-parallel (channel-sharded) score-network evaluation.

The one parallelism strategy SURVEY.md §2.3 left unbuilt: shard the UNet's
channel dimension over a named mesh axis so a single network evaluation
splits its weights, activations, and FLOPs across chips.  The reference has
no equivalent (single-GPU, `fbs/nn/unet.py`); at dim=64 / 28x28 it is indeed
unnecessary, but at CelebA-HQ-256 with N=128 particles the activations alone
exceed one v5e chip's HBM (20.11 GB vs 15.75 GB, docs/roofline.md), and
channel sharding is the remaining axis once particles are sharded.

Design (idiomatic GSPMD — no hand-written collectives):

- :func:`tp_shardings` maps the Flax param pytree to ``NamedSharding``s:
  every weight whose trailing (output-channel) axis divides the mesh axis
  size is sharded there; everything else is replicated.
- ``UNet(tp_mesh=mesh)`` pins each block's output activations to the same
  channel sharding (``fbs_tpu/nn/unet.py``), so XLA keeps the layout
  stationary instead of gathering weights; the contractions over sharded
  channel axes become partial sums + all-reduces over ICI, placed by GSPMD.
- Composes with the particle axis: a 2-D ``(p, t)`` mesh shards particles
  and channels independently.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["tp_shardings", "shard_params_tp", "tensor_parallel_score"]


def _leaf_spec(leaf, axis_size: int, axis: str) -> P:
    if leaf.ndim >= 1 and leaf.shape[-1] % axis_size == 0 and leaf.shape[-1] > 1:
        return P(*([None] * (leaf.ndim - 1)), axis)
    return P()


def tp_shardings(mesh: Mesh, dict_param: Any, axis: str = "t") -> Any:
    """NamedSharding pytree: trailing (out-channel) axes sharded over ``axis``.

    Conv kernels ``(kh, kw, cin, cout)``, dense kernels ``(cin, cout)`` and
    biases/scales ``(cout,)`` all shard their last axis when divisible by the
    mesh axis size; scalars and ragged leaves replicate.
    """
    axis_size = mesh.shape[axis]
    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, _leaf_spec(leaf, axis_size, axis)),
        dict_param)


def shard_params_tp(mesh: Mesh, dict_param: Any, axis: str = "t") -> Any:
    """Place a param pytree on the mesh with channel sharding (HBM split)."""
    return jax.device_put(dict_param, tp_shardings(mesh, dict_param, axis))


def tensor_parallel_score(mesh: Mesh, nn_module, dict_param: Any,
                          axis: str = "t") -> Callable:
    """Build ``fwd(x, t) -> score`` evaluating ``nn_module`` tensor-parallel.

    ``nn_module`` must be constructed with ``tp_mesh=mesh`` (and the same
    ``tp_axis``) so its activations carry the matching channel sharding.
    Parameters are placed sharded once, up front; inputs/outputs are
    replicated (the image itself is small next to the activations).
    """
    params = shard_params_tp(mesh, dict_param, axis)
    shardings = tp_shardings(mesh, dict_param, axis)

    def fwd(x, t):
        pinned = jax.tree.map(jax.lax.with_sharding_constraint, params, shardings)
        return nn_module.apply(pinned, x, t)

    return fwd
