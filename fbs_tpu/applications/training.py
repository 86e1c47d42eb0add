"""Training loops: denoising-score-matching and DSB-IPF.

Rebuild of the loops in reference ``experiments/imgs/train.py:75-124`` and
``experiments/sb_imgs/train.py:77-210``, as reusable library functions with
TPU-first upgrades:

- data-parallel batch sharding over a mesh axis (gradient all-reduce over ICI
  via GSPMD) — the reference is single-device,
- no per-step host sync: the loss is logged every ``log_every`` steps instead
  of the reference's blocking ``print`` each iteration
  (``train.py:120-121``),
- checkpoints keep the reference's flat-vector ``np.savez`` format with
  ``param`` / ``ema_param`` keys for artifact compatibility.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fbs_tpu.checkpoints import save_params_npz, save_sb_params_npz
from fbs_tpu.nn.utils import make_optax_kernel
from fbs_tpu.typing import JArray, JKey

__all__ = ["make_lr_schedule", "make_optimiser", "train_score_model", "DSBTrainer"]


def make_lr_schedule(schedule: str, lr: float, nepochs: int, nsteps_per_epoch: int):
    """'cos' / 'exp' / 'const' schedules (reference ``train.py:92-98``)."""
    if schedule == "cos":
        # 95% of the run, like the reference — but never 0 (nepochs=1 smoke
        # runs would otherwise hit optax's positive-decay_steps check).
        until_steps = max(1, int(0.95 * nepochs) * nsteps_per_epoch)
        return optax.cosine_decay_schedule(init_value=lr, decay_steps=until_steps, alpha=1e-2)
    if schedule == "exp":
        return optax.exponential_decay(lr, nsteps_per_epoch, 0.96)
    return optax.constant_schedule(lr)


def make_optimiser(schedule, grad_clip: bool = False):
    opt = optax.adam(learning_rate=schedule)
    if grad_clip:
        opt = optax.chain(optax.clip_by_global_norm(1.0), opt)
    return opt


def train_score_model(key: JKey,
                      dataset,
                      loss_fn: Callable,
                      init_param: JArray,
                      batch_size: int,
                      nepochs: int,
                      lr: float = 2e-4,
                      schedule: str = "cos",
                      grad_clip: bool = False,
                      ema_start: int = 300,
                      ema_every: int = 2,
                      ema_decay: float = 0.99,
                      mesh=None,
                      checkpoint_every: int = 100,
                      checkpoint_path: Optional[str] = None,
                      log_every: int = 100,
                      log_fn: Callable = print,
                      init_ema_param: Optional[JArray] = None,
                      start_epoch: int = 0):
    """Epoch loop over randomly permuted batches with EMA and checkpoints.

    ``start_epoch`` warm-starts a run from a ``(param, ema_param)`` npz
    checkpoint: the LR schedule is offset to the step count already taken
    (optimiser moments restart — the reference format stores no optimiser
    state, SURVEY.md section 5), and the loop runs epochs
    ``start_epoch..nepochs-1``.  Returns ``(param, ema_param)``.
    """
    data_size = dataset.n
    nsteps_per_epoch = data_size // batch_size
    sched = make_lr_schedule(schedule, lr, nepochs, nsteps_per_epoch)
    if start_epoch:
        base_sched, offset = sched, start_epoch * nsteps_per_epoch
        sched = lambda count: base_sched(count + offset)
    optimiser = make_optimiser(sched, grad_clip)

    if mesh is not None:
        from fbs_tpu.parallel import data_parallel_loss
        loss_fn = data_parallel_loss(mesh, loss_fn)

    optax_kernel, ema_kernel = make_optax_kernel(optimiser, loss_fn, jit=True)
    param = init_param
    ema_param = param if init_ema_param is None else init_ema_param
    opt_state = optimiser.init(param)

    # Burn the per-epoch splits of the skipped epochs so a resumed run's
    # epoch-i data keys equal a fresh run's (the split chain below is the
    # only consumer of `key`).
    for _ in range(start_epoch):
        key, _ = jax.random.split(key)

    for i in range(start_epoch, nepochs):
        key, subkey = jax.random.split(key)
        perm_inds = dataset.init_enumeration(subkey, batch_size)
        for j in range(nsteps_per_epoch):
            subkey, subkey2 = jax.random.split(subkey)
            x0s = dataset.enumerate_subset(j, perm_inds, subkey)
            if isinstance(x0s, tuple):
                x0s = x0s[0]
            param, opt_state, loss = optax_kernel(param, opt_state, subkey2, x0s)
            ema_param = ema_kernel(ema_param, param, j, ema_start, ema_every, ema_decay)
            if j % log_every == 0:
                log_fn(f"epoch {i}/{nepochs} iter {j}/{nsteps_per_epoch} "
                       f"loss {float(loss):.4f}")
        if checkpoint_path is not None and (i + 1) % checkpoint_every == 0:
            save_params_npz(checkpoint_path.format(epoch=i), param, ema_param)
    return param, ema_param


@dataclasses.dataclass
class DSBTrainer:
    """Two-network Schrodinger-bridge IPF training
    (reference ``sb_imgs/train.py:108-210``).

    One ``sb_step`` = ``nepochs`` of backward-drift learning (simulating with
    the current forward net, or the analytic reference drift at the first
    iteration) followed by ``nepochs`` of forward-drift learning from
    reference samples at reversed times.
    """
    dataset: object
    sde: object
    nn_drift: Callable
    state_shape: Sequence[int]
    T: float = 0.5
    train_nsteps: int = 32
    batch_size: int = 64
    nepochs: int = 10
    lr: float = 2e-4
    schedule: str = "cos"
    grad_clip: bool = False
    vmap_loss: bool = True
    mesh: object = None
    log_every: int = 100
    log_fn: Callable = print

    def __post_init__(self):
        from fbs_tpu.dsb import ipf_loss_cont, ipf_loss_cont_v

        self._ipf_loss = ipf_loss_cont_v if self.vmap_loss else ipf_loss_cont
        self.nsteps_per_epoch = self.dataset.n // self.batch_size
        sched = make_lr_schedule(self.schedule, self.lr, self.nepochs, self.nsteps_per_epoch)
        self.optimiser = make_optimiser(sched, self.grad_clip)
        self._build_kernels()

    def _rand_ts(self, key):
        return jnp.concatenate([
            jnp.array([0.0]),
            jnp.sort(jax.random.uniform(key, (self.train_nsteps - 1,),
                                        minval=1e-5, maxval=self.T)),
            jnp.array([self.T]),
        ])

    def _build_kernels(self):
        sde, nn_drift = self.sde, self.nn_drift

        def reference_drift(x, t, _):
            return sde.drift(x, t)

        def loss_init(param_bwd, param_fwd, key, data_samples):
            key_loss, key_ts = jax.random.split(key)
            rnd_ts = self._rand_ts(key_ts)
            return self._ipf_loss(key_loss, param_bwd, param_fwd, data_samples,
                                  rnd_ts, nn_drift, reference_drift, sde.dispersion)

        def loss_bwd(param_bwd, param_fwd, key, data_samples):
            key_loss, key_ts = jax.random.split(key)
            rnd_ts = self._rand_ts(key_ts)
            return self._ipf_loss(key_loss, param_bwd, param_fwd, data_samples,
                                  rnd_ts, nn_drift, nn_drift, sde.dispersion)

        def loss_fwd(param_fwd, param_bwd, key, ref_samples):
            key_loss, key_ts = jax.random.split(key)
            rnd_ts = self._rand_ts(key_ts)
            return self._ipf_loss(key_loss, param_fwd, param_bwd, ref_samples,
                                  self.T - rnd_ts, nn_drift, nn_drift, sde.dispersion)

        if self.mesh is not None:
            from jax.lax import with_sharding_constraint
            from jax.sharding import NamedSharding, PartitionSpec as P
            s_batch = NamedSharding(self.mesh, P("d"))

            def _dp(loss):
                def wrapped(pa, pb, key, samples):
                    samples = with_sharding_constraint(samples, s_batch)
                    return loss(pa, pb, key, samples)
                return wrapped

            loss_init, loss_bwd, loss_fwd = _dp(loss_init), _dp(loss_bwd), _dp(loss_fwd)

        def make_kernel(loss):
            @jax.jit
            def kernel(param, opt_state, other_param, key, samples):
                val, grad = jax.value_and_grad(loss)(param, other_param, key, samples)
                updates, opt_state = self.optimiser.update(grad, opt_state, param)
                param = optax.apply_updates(param, updates)
                return param, opt_state, val
            return kernel

        self.kernel_init = make_kernel(loss_init)
        self.kernel_bwd = make_kernel(loss_bwd)
        self.kernel_fwd = make_kernel(loss_fwd)

    def sb_step(self, key: JKey, param_fwd, param_bwd, opt_state_fwd, opt_state_bwd,
                sb_iter: int):
        """One IPF iteration; returns updated params/states."""
        # Backward: data -> ref simulated with the (frozen) forward drift.
        for i in range(self.nepochs):
            key, subkey = jax.random.split(key)
            perm_inds = self.dataset.init_enumeration(subkey, self.batch_size)
            for j in range(self.nsteps_per_epoch):
                subkey, subkey2 = jax.random.split(subkey)
                x0s = self.dataset.enumerate_subset(j, perm_inds, subkey)
                if isinstance(x0s, tuple):
                    x0s = x0s[0]
                kern = self.kernel_init if sb_iter == 0 else self.kernel_bwd
                param_bwd, opt_state_bwd, loss = kern(param_bwd, opt_state_bwd,
                                                      param_fwd, subkey2, x0s)
                if j % self.log_every == 0:
                    self.log_fn(f"sb {sb_iter} bwd epoch {i} iter {j} loss {float(loss):.4f}")

        # Forward: ref -> data simulated with the (frozen) backward drift.
        for i in range(self.nepochs):
            key, subkey = jax.random.split(key)
            for j in range(self.nsteps_per_epoch):
                subkey, subkey2 = jax.random.split(subkey)
                xTs = jax.random.normal(subkey, (self.batch_size, *self.state_shape))
                param_fwd, opt_state_fwd, loss = self.kernel_fwd(param_fwd, opt_state_fwd,
                                                                 param_bwd, subkey2, xTs)
                if j % self.log_every == 0:
                    self.log_fn(f"sb {sb_iter} fwd epoch {i} iter {j} loss {float(loss):.4f}")

        return param_fwd, param_bwd, opt_state_fwd, opt_state_bwd

    def train(self, key: JKey, param_fwd, param_bwd, nsbs: int,
              checkpoint_path: Optional[str] = None, start_sb: int = 0):
        """Run IPF iterations ``start_sb .. nsbs-1``.

        With ``start_sb > 0``, pass the params loaded from the
        ``{sb_iter}=start_sb-1`` checkpoint: skipped iterations still advance
        the per-iteration key stream so the continued run consumes the same
        keys a continuous ``nsbs``-deep run would.  Optimiser states restart
        fresh per call (they are not checkpointed — the reference,
        ``/root/reference/experiments/sb_imgs/train.py:204-210``, has no
        resume at all; each IPF iteration retargets the regression anyway).
        """
        opt_state_fwd = self.optimiser.init(param_fwd)
        opt_state_bwd = self.optimiser.init(param_bwd)
        for sb_iter in range(nsbs):
            key, subkey = jax.random.split(key)
            if sb_iter < start_sb:
                continue
            param_fwd, param_bwd, opt_state_fwd, opt_state_bwd = self.sb_step(
                subkey, param_fwd, param_bwd, opt_state_fwd, opt_state_bwd, sb_iter)
            if checkpoint_path is not None:
                save_sb_params_npz(checkpoint_path.format(sb_iter=sb_iter),
                                   param_fwd, param_bwd)
        return param_fwd, param_bwd
