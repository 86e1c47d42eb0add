r"""CelebA-HQ-256 particle-Gibbs sweep benchmark on one chip.

BASELINE.json's north star is 100 Gibbs sweeps of 256x256 inpainting with
N=128 particles on a v4-8; the reference never ran 256 at all (it stops at
128x128, ``/root/reference/experiments/datasets/celebaHQ/convert.py``).  This
script measures the real thing on a single chip: one full Gibbs sweep
(explicit-backward, so the CSMC pass is the O(N*du) terminal-only variant —
no stored particle history) with the dim-64 score UNet in bf16 and the Pallas
flash-attention bottleneck, at the largest particle count that fits.

Prints one JSON line per configuration with sec/sweep, particle*steps/s, and
device memory stats.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import numpy as np

from fbs_tpu.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()


def _fetch(x):
    """Force a device->host value fetch.  Through the remote-TPU tunnel
    ``jax.block_until_ready`` can return at enqueue time (it once timed a
    full 256^2 sweep at 0.0 s); a scalar readback cannot lie."""
    import jax.numpy as jnp
    return float(jnp.sum(x))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--nparticles", type=int, nargs="+", default=[64])
    parser.add_argument("--nsteps", type=int, default=100,
                        help="Steps per sweep dispatch. Per-step cost is "
                             "K-independent; through the dev RPC tunnel keep "
                             "a single dispatch under ~2 min (N=64/K=100 = "
                             "51 s). N=128 at 256^2 OOMs one chip (20.1 GB "
                             "vs 15.75 GB) - that is the multi-chip config.")
    parser.add_argument("--dim", type=int, default=64)
    parser.add_argument("--resolution", type=int, default=256)
    parser.add_argument("--task", type=str, default="inpaint-64")
    parser.add_argument("--nreps", type=int, default=1)
    parser.add_argument("--microbatch", type=int, default=1,
                        help="Sequential score-eval chunks per step (fit knob: "
                             "N=128 at 256^2 needs 2 on a 16 GB chip).")
    parser.add_argument("--total_nsteps", type=int, default=0,
                        help="If > 0: run ONE full K=total_nsteps Gibbs sweep "
                             "via the time-chunked executor (bounded "
                             "dispatches of --nsteps each) — the config-of-"
                             "record length, measured, not extrapolated.")
    parser.add_argument("--data", type=str, default="./datasets/celeba_hq256.npy")
    args = parser.parse_args()

    import bench  # repo-root bench utilities

    from fbs_tpu.nn import default_compute_dtype

    xs = None
    if os.path.exists(args.data):
        xs = jax.numpy.asarray(np.load(args.data, mmap_mode="r")[:16], dtype=np.float32)
        print(f"using real data {args.data} {xs.shape}", file=sys.stderr)

    shape = (args.resolution, args.resolution, 3)

    if args.total_nsteps > 0:
        _run_timechunked(args, xs, shape)
        return

    for n in args.nparticles:
        try:
            sweep, (x0, us_star, bs_star) = bench.build_sweep(
                n, args.nsteps, args.dim, shape, default_compute_dtype(),
                task=args.task, xs=xs, microbatch=args.microbatch)
            key = jax.random.PRNGKey(0)
            t0 = time.perf_counter()
            x0_, us_, bs_, _ = sweep(key, x0, us_star, bs_star)
            _fetch(x0_)
            compile_and_first = time.perf_counter() - t0

            t0 = time.perf_counter()
            for _ in range(args.nreps):
                key, sub = jax.random.split(key)
                x0_, us_, bs_, _ = sweep(sub, x0_, us_, bs_)
            _fetch(x0_)
            sec = (time.perf_counter() - t0) / args.nreps

            stats = jax.local_devices()[0].memory_stats() or {}
            print(json.dumps({
                "metric": "celeba256_gibbs_sweep",
                "resolution": args.resolution,
                "task": args.task,
                "nparticles": n,
                "nsteps": args.nsteps,
                "microbatch": args.microbatch,
                "sec_per_sweep": round(sec, 2),
                "particle_steps_per_sec": round(n * args.nsteps / sec, 1),
                "compile_and_first_sweep_sec": round(compile_and_first, 1),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }))
        except Exception as e:  # OOM at this N: report and try the next one
            print(json.dumps({"nparticles": n, "error": str(e)[:200]}))



def _run_timechunked(args, xs, shape):
    """One full K=total_nsteps sweep through the time-chunked executor
    (RestorationSampler.gibbs_step_timechunked): bounded dispatches, real
    config-of-record length."""
    import jax.numpy as jnp

    from fbs_tpu.applications import RestorationSampler
    from fbs_tpu.data import ImageRestore
    from fbs_tpu.nn import (UNet, default_compute_dtype, make_st_nn,
                            standardize_ws_kernels)
    from fbs_tpu.sdes import StationaryLinLinearSDE
    from jax.flatten_util import ravel_pytree

    key = jax.random.PRNGKey(666)
    h, w, c = shape
    if xs is None:
        xs = jax.random.uniform(key, (8, h, w, c))
    dataset = ImageRestore.from_array(xs, task=args.task)
    test_img, y0, mask = dataset.sampler(jax.random.PRNGKey(1))

    T = 2.0
    sde = StationaryLinLinearSDE(beta_min=0.02, beta_max=5.0, t0=0.0, T=T)
    dtype = default_compute_dtype()
    unet = UNet(dt=T / 200, dim=args.dim, dim_mults=(1, 2, 4),
                compute_dtype=dtype, ws_frozen=True)
    param, array_to_dict, nn_score = make_st_nn(key, unet, shape, batch_size=2)
    param = ravel_pytree(standardize_ws_kernels(array_to_dict(param)))[0]

    for n in args.nparticles:
        sampler = RestorationSampler(
            dataset=dataset, sde=sde, nn_score=nn_score, param=param, T=T,
            nsteps=args.total_nsteps, nparticles=n,
            score_microbatch=args.microbatch)

        x0 = jnp.zeros(dataset.unobs_shape)
        us_star = jnp.zeros((args.total_nsteps + 1, *dataset.unobs_shape))
        bs_star = jnp.zeros((args.total_nsteps + 1,), dtype=int)
        try:
            t0 = time.perf_counter()
            x0n, usn, bsn, acc = sampler.gibbs_step_timechunked(
                jax.random.PRNGKey(2), x0, y0, us_star, bs_star, mask,
                steps_per_dispatch=args.nsteps)
            _fetch(x0n)
            first = time.perf_counter() - t0

            t0 = time.perf_counter()
            for _ in range(args.nreps):
                x0n, usn, bsn, acc = sampler.gibbs_step_timechunked(
                    jax.random.PRNGKey(3), x0n, y0, usn, bsn, mask,
                    steps_per_dispatch=args.nsteps)
            _fetch(x0n)
            sec = (time.perf_counter() - t0) / args.nreps

            stats = jax.local_devices()[0].memory_stats() or {}
            print(json.dumps({
                "metric": "celeba256_gibbs_full_sweep_timechunked",
                "resolution": args.resolution, "task": args.task,
                "nparticles": n, "total_nsteps": args.total_nsteps,
                "steps_per_dispatch": args.nsteps,
                "microbatch": args.microbatch,
                "sec_per_sweep": round(sec, 2),
                "particle_steps_per_sec": round(n * args.total_nsteps / sec, 1),
                "compile_and_first_sweep_sec": round(first, 1),
                "finite": bool(jnp.all(jnp.isfinite(x0n))),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }))
        except Exception as e:
            print(json.dumps({"nparticles": n, "total_nsteps": args.total_nsteps,
                              "error": str(e)[:300]}))

if __name__ == "__main__":
    main()
