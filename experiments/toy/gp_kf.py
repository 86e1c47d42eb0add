r"""Exact GP-regression posterior draws (the ground-truth baseline).

TPU-native counterpart of reference ``experiments/toy/gp_kf.py``.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp

from fbs_tpu.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--d", type=int, default=10)
    parser.add_argument("--nsamples", type=int, default=1000)
    parser.add_argument("--id", type=int, default=666)
    parser.add_argument("--nmc", type=int, default=0,
                        help="If > 0: run ids 0..nmc-1 in this one process "
                             "(per-id streams unchanged).")
    args = parser.parse_args()

    from fbs_tpu.applications import GPRegressionToy

    toy = GPRegressionToy(d=args.d, obs_var=1.0)
    os.makedirs("./toy/results", exist_ok=True)

    ids = range(args.nmc) if args.nmc > 0 else [args.id]
    for id_ in ids:
        key = jax.random.PRNGKey(id_)
        key, subkey = jax.random.split(key)
        _, y0 = toy.draw_data(subkey)
        gp_mean, gp_cov = toy.exact_posterior(y0)
        chol = jnp.linalg.cholesky(gp_cov + 1e-9 * jnp.eye(args.d))

        key, subkey = jax.random.split(key)
        samples = gp_mean + jax.random.normal(subkey, (args.nsamples, args.d)) @ chol.T

        np.savez(f"./toy/results/kf-{id_}", samples=np.asarray(samples),
                 gp_mean=gp_mean, gp_cov=gp_cov)


if __name__ == "__main__":
    main()
