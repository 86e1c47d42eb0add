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

__all__ = ["save_params_npz", "load_params_npz", "save_sb_params_npz",
           "load_sb_params_npz", "TrainState", "save_state", "restore_state"]


# Combined param+EMA checkpoints for the dim-64 UNet are ~99 MiB — within
# 1 MiB of common git-host blob limits.  Above this threshold the EMA vector
# is written to a sibling ``<stem>_ema.npz`` so each blob stays ~half size.
_SPLIT_BYTES = 90 * 1024 * 1024


def _ema_sibling(path: str) -> str:
    stem = path[:-4] if path.endswith(".npz") else path
    return stem + "_ema.npz"


def save_params_npz(path: str, param: JArray, ema_param: Optional[JArray] = None) -> None:
    """Reference-format checkpoint (flat vectors, npz; ``param``/``ema_param``
    keys, `/root/reference/experiments/imgs/train.py:122-124`).  When the
    combined blob would exceed ~90 MiB the EMA vector goes to a sibling
    ``<stem>_ema.npz`` instead — :func:`load_params_npz` resolves either
    layout transparently."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    param = np.asarray(param)
    if ema_param is None:
        np.savez(path, param=param)
        return
    ema_param = np.asarray(ema_param)
    if param.nbytes + ema_param.nbytes > _SPLIT_BYTES:
        np.savez(path, param=param)
        np.savez(_ema_sibling(path), ema_param=ema_param)
    else:
        np.savez(path, param=param, ema_param=ema_param)


def load_params_npz(path: str, use_ema: bool = False) -> JArray:
    """Load a flat parameter vector from either checkpoint layout: a single
    reference-format npz (``param``/``ema_param`` keys) or the split layout
    with the EMA vector in ``<stem>_ema.npz``."""
    data = np.load(path)
    if use_ema:
        if "ema_param" in data:
            return jax.numpy.asarray(data["ema_param"])
        sibling = _ema_sibling(path)
        if os.path.exists(sibling):
            return jax.numpy.asarray(np.load(sibling)["ema_param"])
    return jax.numpy.asarray(data["param"])


def _bwd_sibling(path: str) -> str:
    stem = path[:-4] if path.endswith(".npz") else path
    return stem + "_bwd.npz"


def save_sb_params_npz(path: str, param_fwd: JArray, param_bwd: JArray) -> None:
    """Schrödinger-bridge checkpoint (``param_fwd``/``param_bwd`` keys).
    Splits the backward network into ``<stem>_bwd.npz`` past ~90 MiB, same
    policy as :func:`save_params_npz`."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    param_fwd, param_bwd = np.asarray(param_fwd), np.asarray(param_bwd)
    if param_fwd.nbytes + param_bwd.nbytes > _SPLIT_BYTES:
        np.savez(path, param_fwd=param_fwd)
        np.savez(_bwd_sibling(path), param_bwd=param_bwd)
    else:
        np.savez(path, param_fwd=param_fwd, param_bwd=param_bwd)


def load_sb_params_npz(path: str):
    """Load ``(param_fwd, param_bwd)`` from either SB checkpoint layout."""
    data = np.load(path)
    param_fwd = jax.numpy.asarray(data["param_fwd"])
    if "param_bwd" in data:
        param_bwd = jax.numpy.asarray(data["param_bwd"])
    else:
        param_bwd = jax.numpy.asarray(np.load(_bwd_sibling(path))["param_bwd"])
    return param_fwd, param_bwd


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
