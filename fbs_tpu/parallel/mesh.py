"""Device-mesh construction helpers.

The reference has no distribution story at all (single device, Slurm job
arrays for multi-run; SURVEY.md section 2.3).  Here parallelism is expressed
TPU-natively: named ``jax.sharding.Mesh`` axes + sharding annotations, with
XLA/GSPMD inserting the ICI collectives.

Axis conventions used across fbs_tpu:

- ``"p"``  — the particle axis of SMC/CSMC samplers,
- ``"c"``  — independent MCMC chains,
- ``"d"``  — the data/batch axis of score / IPF training.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "particle_sharding", "replicated", "P", "Mesh", "NamedSharding"]


def make_mesh(axis_sizes: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("p",),
              devices=None) -> Mesh:
    """Build a mesh over the available devices.

    With the default single axis, all devices go to the particle axis.  Pass
    e.g. ``axis_sizes=(2, 4), axis_names=("c", "p")`` for a chains x particles
    grid.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(axis_sizes)) != n:
        raise ValueError(f"axis_sizes {axis_sizes} do not tile {n} devices.")
    dev_array = np.asarray(devices).reshape(axis_sizes)
    return Mesh(dev_array, axis_names)


def particle_sharding(mesh: Mesh, axis: str = "p") -> NamedSharding:
    """Sharding that splits the leading (particle) dimension over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
