r"""Gaussian-SB conditional sampling ablation with Gibbs.

TPU-native counterpart of reference ``experiments/sb/gibbs.py``: non-separable
closed-form Gaussian Schrodinger-bridge forward process.
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
    parser.add_argument("--explicit_backward", action="store_true", default=False)
    parser.add_argument("--id", type=int, default=666)
    args = parser.parse_args()

    from fbs_tpu.applications import GaussianSBToy

    key = jax.random.PRNGKey(args.id)
    toy = GaussianSBToy(d=args.d, obs_var=0.1, T=1.0, nsteps=100, integration_nsteps=10)

    key, subkey = jax.random.split(key)
    _, y0 = toy.draw_data(subkey)
    gp_mean, gp_cov = toy.exact_posterior(y0)

    init, step = toy.make_gibbs(y0, nparticles=args.nparticles,
                                explicit_backward=args.explicit_backward)

    key, subkey = jax.random.split(key)
    state = init(subkey)

    samples = np.zeros((args.nsamples, args.d))
    accs = np.zeros((args.nsamples,), dtype=bool)
    for i in range(args.nsamples):
        key, subkey = jax.random.split(key)
        state, (x0, acc) = step(subkey, state)
        samples[i] = x0
        accs[i] = acc[-1]
        if i % 100 == 0:
            print(f"ID: {args.id} | SB Gibbs | iter: {i} | acc rate: {np.mean(accs[:i + 1]):.3f}")

    os.makedirs("./sb/results", exist_ok=True)
    np.savez(f'./sb/results/gibbs{"-eb" if args.explicit_backward else ""}'
             f"-{args.nparticles}-{args.id}",
             samples=samples, gp_mean=gp_mean, gp_cov=gp_cov)


if __name__ == "__main__":
    main()
