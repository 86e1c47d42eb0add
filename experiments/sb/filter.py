r"""Gaussian-SB conditional sampling ablation with repeated filtering.

TPU-native counterpart of reference ``experiments/sb/filter.py``.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax

from fbs_tpu.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--d", type=int, default=10)
    parser.add_argument("--nparticles", type=int, default=10)
    parser.add_argument("--nsamples", type=int, default=1000)
    parser.add_argument("--id", type=int, default=666)
    parser.add_argument("--batch", type=int, default=50)
    args = parser.parse_args()

    from fbs_tpu.applications import GaussianSBToy

    key = jax.random.PRNGKey(args.id)
    toy = GaussianSBToy(d=args.d, obs_var=0.1, T=1.0, nsteps=100, integration_nsteps=10)

    key, subkey = jax.random.split(key)
    _, y0 = toy.draw_data(subkey)
    gp_mean, gp_cov = toy.exact_posterior(y0)

    one = jax.jit(jax.vmap(lambda k: toy.filter_sample(k, y0, args.nparticles)))

    samples = np.zeros((args.nsamples, args.d))
    done = 0
    while done < args.nsamples:
        n = min(args.batch, args.nsamples - done)
        key, subkey = jax.random.split(key)
        samples[done:done + n] = one(jax.random.split(subkey, n))
        done += n
        print(f"ID: {args.id} | SB filter | {done}/{args.nsamples}")

    os.makedirs("./sb/results", exist_ok=True)
    np.savez(f"./sb/results/filter-{args.nparticles}-{args.id}",
             samples=samples, gp_mean=gp_mean, gp_cov=gp_cov)


if __name__ == "__main__":
    main()
