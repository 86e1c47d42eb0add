r"""GP-regression conditional sampling with particle pseudo-marginal MCMC.

TPU-native counterpart of reference ``experiments/toy/gp_pmcmc.py``.
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
    parser.add_argument("--nparticles", type=int, default=10)
    parser.add_argument("--nsamples", type=int, default=1000)
    parser.add_argument("--sde", type=str, default="const")
    parser.add_argument("--delta", type=float, default=None)
    parser.add_argument("--id", type=int, default=666)
    parser.add_argument("--nchains", type=int, default=4)
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

    kernel = toy.make_pmcmc(y0, nparticles=args.nparticles, delta=args.delta)

    nchains = args.nchains
    key, subkey = jax.random.split(key)
    uT = jnp.zeros((nchains, args.d))
    log_ell = jnp.zeros((nchains,))
    ys = jax.vmap(lambda k: toy.fwd_ys_sampler(k, y0))(jax.random.split(subkey, nchains))

    samples = np.zeros((nchains, args.nsamples, args.d))
    acc_probs = np.zeros((args.nsamples,))
    for i in range(args.nsamples):
        key, subkey = jax.random.split(key)
        uT, log_ell, ys, state = kernel(jax.random.split(subkey, nchains), uT, log_ell, ys)
        samples[:, i, :] = uT
        acc_probs[i] = float(jnp.mean(state.acceptance_prob))
        if i % 100 == 0:
            print(f"ID: {args.id} | pMCMC {args.delta} | iter: {i} | "
                  f"mean acc prob: {np.mean(acc_probs[:i + 1]):.3f}")

    os.makedirs("./toy/results", exist_ok=True)
    np.savez(f"./toy/results/pmcmc-{args.delta}-{args.sde}-{args.nparticles}-{args.id}",
             samples=samples, gp_mean=gp_mean, gp_cov=gp_cov)


if __name__ == "__main__":
    main()
