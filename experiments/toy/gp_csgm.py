r"""GP-regression conditional sampling with the CSGM baseline.

TPU-native counterpart of reference ``experiments/toy/gp_csgm.py``.
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
    parser.add_argument("--nsamples", type=int, default=1000)
    parser.add_argument("--sde", type=str, default="const")
    parser.add_argument("--id", type=int, default=666)
    parser.add_argument("--batch", type=int, default=200)
    args = parser.parse_args()

    from fbs_tpu.applications import GPRegressionToy
    from fbs_tpu.sdes import StationaryConstLinearSDE, StationaryLinLinearSDE

    key = jax.random.PRNGKey(args.id)
    T = 1.0
    sde = (StationaryLinLinearSDE(beta_min=0.02, beta_max=4.0, t0=0.0, T=T)
           if args.sde == "lin" else StationaryConstLinearSDE(a=-0.5, b=1.0))
    toy = GPRegressionToy(d=args.d, obs_var=1.0, T=T, nsteps=200, sde=sde)

    key, subkey = jax.random.split(key)
    _, y0 = toy.draw_data(subkey)
    gp_mean, gp_cov = toy.exact_posterior(y0)

    one = jax.jit(jax.vmap(lambda k: toy.csgm_sample(k, y0)))

    samples = np.zeros((args.nsamples, args.d))
    done = 0
    while done < args.nsamples:
        n = min(args.batch, args.nsamples - done)
        key, subkey = jax.random.split(key)
        samples[done:done + n] = one(jax.random.split(subkey, n))
        done += n
        print(f"ID: {args.id} | csgm | {done}/{args.nsamples}")

    os.makedirs("./toy/results", exist_ok=True)
    np.savez(f"./toy/results/csgm-{args.sde}-{args.id}",
             samples=samples, gp_mean=gp_mean, gp_cov=gp_cov)


if __name__ == "__main__":
    main()
