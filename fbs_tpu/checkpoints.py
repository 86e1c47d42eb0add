"""Checkpointing: reference-compatible flat-vector npz plus full training
state (orbax-backed) with mid-training resume.

The reference only saves the raveled parameter vector (+EMA) every 100
epochs (``experiments/imgs/train.py:122-124``) — no optimiser state, no RNG,
no mid-training resume (SURVEY.md section 5).  Here:

- :func:`save_params_npz` / :func:`load_params_npz` keep the reference's
  artifact format (``param`` / ``ema_param`` keys) so pretrained reference
  checkpoints interoperate,
- :class:`TrainState` + :func:`save_state` / :func:`restore_state` persist
  parameters, EMA, optimiser state, RNG key and step via orbax, enabling
  exact resume.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional

import jax
import numpy as np

from fbs_tpu.typing import JArray, JKey

__all__ = ["save_params_npz", "load_params_npz", "TrainState",
           "save_state", "restore_state"]


def save_params_npz(path: str, param: JArray, ema_param: Optional[JArray] = None) -> None:
    """Reference-format checkpoint (flat vectors, npz)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if ema_param is None:
        np.savez(path, param=np.asarray(param))
    else:
        np.savez(path, param=np.asarray(param), ema_param=np.asarray(ema_param))


def load_params_npz(path: str, use_ema: bool = False) -> JArray:
    data = np.load(path)
    key = "ema_param" if use_ema and "ema_param" in data else "param"
    return jax.numpy.asarray(data[key])


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    """Complete training state for exact resume."""
    step: JArray
    param: JArray
    ema_param: JArray
    opt_state: Any
    rng: JKey


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_state(path: str, state: TrainState) -> None:
    """Persist the full training state with orbax (atomic directory write)."""
    ckpt = _checkpointer()
    ckpt.save(os.path.abspath(path), jax.tree.map(np.asarray, dataclasses.asdict(state)),
              force=True)


def restore_state(path: str, template: TrainState) -> TrainState:
    """Restore a state saved by :func:`save_state`; ``template`` supplies the
    tree structure/dtypes (e.g. a freshly initialised state)."""
    ckpt = _checkpointer()
    restored = ckpt.restore(os.path.abspath(path),
                            item=jax.tree.map(np.asarray, dataclasses.asdict(template)))
    return TrainState(**jax.tree.map(jax.numpy.asarray, restored))
