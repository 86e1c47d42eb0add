r"""CelebA-HQ-256 particle Gibbs at N=128 on an 8-device mesh — real shapes.

The BASELINE north star (100 Gibbs sweeps of 256^2 inpaint-64 at N=128) does
not fit one 16 GB chip (20.11 GB of score activations, XLA's accounting); the
multi-chip design shards the particle axis over a ``p`` mesh with the
ppermute ring-take carrying resampling payloads.  Real multi-chip hardware is
unavailable in this environment, so this runner executes the FULL config —
256x256x3 images, dim-64 UNet, N=128 particles sharded 16/device, ring-take
conditional resampling — on 8 virtual CPU devices
(``xla_force_host_platform_device_count``), proving the sharded program
compiles and executes at the north-star shapes end to end.

Reference for the config: ``/root/reference/experiments/bashes/imgs_gibbs.sh``
(the reference itself never ran 256; its data prep stops at 128,
``/root/reference/experiments/datasets/celebaHQ/convert.py:5-17``).

Runs on CPU: use --nsteps small (each step is a batch-128 256^2 UNet eval on
the host).  Prints one JSON line.
"""
import argparse
import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--nparticles", type=int, default=128)
    parser.add_argument("--nsteps", type=int, default=2)
    parser.add_argument("--dim", type=int, default=64)
    parser.add_argument("--resolution", type=int, default=256)
    parser.add_argument("--ndevices", type=int, default=8)
    args = parser.parse_args()

    from fbs_tpu.compile_cache import enable as enable_compile_cache

    enable_compile_cache()

    from functools import partial

    from fbs_tpu.data import ImageRestore
    from fbs_tpu.nn import UNet, make_st_nn
    from fbs_tpu.parallel import (make_mesh, make_ring_take,
                                  shard_fused_kernel, shard_particle_closures)
    from fbs_tpu.samplers import gibbs_kernel, make_separable_kernels
    from fbs_tpu.sdes import StationaryLinLinearSDE, make_linear_sde

    assert len(jax.devices()) >= args.ndevices, jax.devices()
    mesh = make_mesh(axis_sizes=(args.ndevices,), axis_names=("p",),
                     devices=jax.devices()[:args.ndevices])

    key = jax.random.PRNGKey(666)
    h = w = args.resolution
    xs = jax.random.uniform(key, (4, h, w, 3))
    dataset = ImageRestore.from_array(xs, task="inpaint-64")
    test_img, y0, mask = dataset.sampler(jax.random.PRNGKey(1))

    T = 2.0
    nsteps = args.nsteps
    ts = jnp.linspace(0.0, T, nsteps + 1)
    dt = T / nsteps
    sde = StationaryLinLinearSDE(beta_min=0.02, beta_max=5.0, t0=0.0, T=T)
    _, _, simulate_cond_forward = make_linear_sde(sde)

    unet = UNet(dt=T / 200, dim=args.dim, dim_mults=(1, 2, 4),
                compute_dtype=jnp.float32)
    param, _, nn_score = make_st_nn(key, unet, (h, w, 3), batch_size=2)

    def reverse_drift_joint(imgs, t):
        return (-sde.drift(imgs, T - t)
                + sde.dispersion(T - t) ** 2 * nn_score(imgs, T - t, param))

    def concat_batched(us, v):
        vs = jnp.broadcast_to(v, (us.shape[0], *v.shape))
        return dataset.concat(us, vs, mask)

    def unpack_batched(joint):
        return dataset.unpack(joint, mask)

    trans, trans_lp, lik_lp, fused = make_separable_kernels(
        reverse_drift_joint, lambda t: sde.dispersion(T - t),
        concat_batched, unpack_batched, dt)
    trans, trans_lp, lik_lp = shard_particle_closures(mesh, trans, trans_lp, lik_lp)
    fused = shard_fused_kernel(mesh, fused)

    def fwd_sampler(key_, x0_, y0_):
        return simulate_cond_forward(key_, dataset.concat(x0_, y0_, mask), ts)

    def unpack_path(path_xy):
        return dataset.unpack(path_xy, mask)

    sweep = jax.jit(partial(
        gibbs_kernel, ts=ts, fwd_sampler=fwd_sampler, sde=sde,
        unpack=unpack_path, nparticles=args.nparticles,
        transition_sampler=trans, transition_logpdf=trans_lp,
        likelihood_logpdf=lik_lp, marg_y=False, explicit_backward=True,
        explicit_final=False, fused_kernel=fused, take_fn=make_ring_take(mesh)))

    x0 = jnp.zeros(dataset.unobs_shape)
    us_star = jnp.zeros((nsteps + 1, *dataset.unobs_shape))
    bs_star = jnp.zeros((nsteps + 1,), dtype=int)

    with mesh:
        t0 = time.time()
        x0_n, us_n, bs_n, acc = sweep(jax.random.PRNGKey(2), x0, y0, us_star, bs_star)
        jax.block_until_ready(x0_n)
        elapsed = time.time() - t0

    ok = bool(jnp.all(jnp.isfinite(x0_n))) and bool(jnp.all(jnp.isfinite(us_n)))
    print(json.dumps({
        "metric": "celeba256_n128_virtual_mesh_sweep",
        "resolution": args.resolution, "nparticles": args.nparticles,
        "nsteps": nsteps, "ndevices": args.ndevices,
        "particles_per_device": args.nparticles // args.ndevices,
        "compile_plus_sweep_sec": round(elapsed, 1),
        "finite": ok, "mean_acc": float(jnp.mean(acc)),
    }))
    assert ok


if __name__ == "__main__":
    main()
