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
    parser.add_argument("--data", type=str, default="./datasets/celeba_hq256.npy")
    args = parser.parse_args()

    import bench  # repo-root bench utilities

    from fbs_tpu.nn import default_compute_dtype

    xs = None
    if os.path.exists(args.data):
        xs = jax.numpy.asarray(np.load(args.data, mmap_mode="r")[:16], dtype=np.float32)
        print(f"using real data {args.data} {xs.shape}", file=sys.stderr)

    shape = (args.resolution, args.resolution, 3)
    for n in args.nparticles:
        try:
            sweep, (x0, us_star, bs_star) = bench.build_sweep(
                n, args.nsteps, args.dim, shape, default_compute_dtype(),
                task=args.task, xs=xs, microbatch=args.microbatch)
            key = jax.random.PRNGKey(0)
            t0 = time.perf_counter()
            x0_, us_, bs_, _ = sweep(key, x0, us_star, bs_star)
            jax.block_until_ready(x0_)
            compile_and_first = time.perf_counter() - t0

            t0 = time.perf_counter()
            for _ in range(args.nreps):
                key, sub = jax.random.split(key)
                x0_, us_, bs_, _ = sweep(sub, x0_, us_, bs_)
            jax.block_until_ready(x0_)
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


if __name__ == "__main__":
    main()
