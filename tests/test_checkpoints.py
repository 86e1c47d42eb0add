"""Checkpoint roundtrips: reference-format npz and full orbax train state."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import optax
import pytest

from fbs_tpu.checkpoints import (TrainState, load_params_npz, restore_state,
                                 save_params_npz, save_state)


def test_npz_roundtrip(tmp_path):
    param = jnp.arange(10.0)
    ema = param * 0.5
    path = str(tmp_path / "ckpt.npz")
    save_params_npz(path, param, ema)

    npt.assert_array_equal(load_params_npz(path), np.asarray(param))
    npt.assert_array_equal(load_params_npz(path, use_ema=True), np.asarray(ema))


def test_npz_split_layout_roundtrip(tmp_path, monkeypatch):
    """Past the size threshold the EMA vector lands in <stem>_ema.npz and
    both layouts load identically (the committed run-of-record checkpoints
    use the split layout to stay clear of git-host blob limits)."""
    import fbs_tpu.checkpoints as ckpt_mod
    monkeypatch.setattr(ckpt_mod, "_SPLIT_BYTES", 16)

    param = jnp.arange(10.0)
    ema = param * 0.5
    path = str(tmp_path / "ckpt.npz")
    save_params_npz(path, param, ema)
    assert os.path.exists(str(tmp_path / "ckpt_ema.npz"))
    assert "ema_param" not in np.load(path)
    npt.assert_array_equal(load_params_npz(path), np.asarray(param))
    npt.assert_array_equal(load_params_npz(path, use_ema=True), np.asarray(ema))


def test_sb_npz_split_layout_roundtrip(tmp_path, monkeypatch):
    import fbs_tpu.checkpoints as ckpt_mod
    from fbs_tpu.checkpoints import load_sb_params_npz, save_sb_params_npz

    fwd, bwd = jnp.arange(8.0), jnp.arange(8.0) * 2.0
    path = str(tmp_path / "sb.npz")
    save_sb_params_npz(path, fwd, bwd)  # combined layout
    f, b = load_sb_params_npz(path)
    npt.assert_array_equal(f, np.asarray(fwd))
    npt.assert_array_equal(b, np.asarray(bwd))

    monkeypatch.setattr(ckpt_mod, "_SPLIT_BYTES", 16)
    save_sb_params_npz(path, fwd, bwd)  # split layout
    assert os.path.exists(str(tmp_path / "sb_bwd.npz"))
    f, b = load_sb_params_npz(path)
    npt.assert_array_equal(f, np.asarray(fwd))
    npt.assert_array_equal(b, np.asarray(bwd))


def test_orbax_state_roundtrip(tmp_path):
    opt = optax.adam(1e-3)
    param = jnp.linspace(0, 1, 7)
    state = TrainState(step=jnp.asarray(42), param=param, ema_param=param * 0.9,
                       opt_state=opt.init(param), rng=jax.random.PRNGKey(3))

    path = str(tmp_path / "state")
    save_state(path, state)

    template = TrainState(step=jnp.asarray(0), param=jnp.zeros(7),
                          ema_param=jnp.zeros(7), opt_state=opt.init(jnp.zeros(7)),
                          rng=jax.random.PRNGKey(0))
    restored = restore_state(path, template)
    assert int(restored.step) == 42
    npt.assert_allclose(np.asarray(restored.param), np.asarray(param))
    npt.assert_array_equal(np.asarray(restored.rng), np.asarray(jax.random.PRNGKey(3)))
    # Optimiser state tree matches.
    jax.tree.map(lambda a, b: npt.assert_allclose(np.asarray(a), np.asarray(b)),
                 restored.opt_state, state.opt_state)
