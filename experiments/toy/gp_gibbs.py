r"""GP-regression conditional sampling with forward-backward Gibbs.

TPU-native counterpart of reference ``experiments/toy/gp_gibbs.py``.  Chains
are vmapped; with ``--scan`` the full sample loop also runs device-side in
one ``lax.scan`` (the reference loops on the host, one kernel call per sweep).
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


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--d", type=int, default=10)
    parser.add_argument("--nparticles", type=int, default=10)
    parser.add_argument("--nsamples", type=int, default=1000)
    parser.add_argument("--sde", type=str, default="const")
    parser.add_argument("--explicit_backward", action="store_true", default=False)
    parser.add_argument("--explicit_final", action="store_true", default=False)
    parser.add_argument("--marg", action="store_true", default=False)
    parser.add_argument("--id", type=int, default=666)
    parser.add_argument("--nchains", type=int, default=4)
    parser.add_argument("--scan", action="store_true", default=False,
                        help="Run the whole chain in one lax.scan.")
    return parser.parse_args()


def make_toy(args):
    from fbs_tpu.applications import GPRegressionToy
    from fbs_tpu.sdes import StationaryConstLinearSDE, StationaryLinLinearSDE

    T = 1.0
    if args.sde == "lin":
        sde = StationaryLinLinearSDE(beta_min=0.02, beta_max=4.0, t0=0.0, T=T)
    else:
        sde = StationaryConstLinearSDE(a=-0.5, b=1.0)
    return GPRegressionToy(d=args.d, obs_var=1.0, T=T, nsteps=200, sde=sde)


def main():
    args = parse_args()
    key = jax.random.PRNGKey(args.id)

    toy = make_toy(args)
    key, subkey = jax.random.split(key)
    _, y0 = toy.draw_data(subkey)
    gp_mean, gp_cov = toy.exact_posterior(y0)

    init, step = toy.make_gibbs(y0, nparticles=args.nparticles,
                                explicit_backward=args.explicit_backward,
                                explicit_final=args.explicit_final,
                                marg_y=args.marg)

    key, subkey = jax.random.split(key)
    state = init(jax.random.split(subkey, args.nchains))

    if args.scan:
        def sweep(carry, key_):
            st, = (carry,)
            st, (x0s, acc) = step(jax.random.split(key_, args.nchains), st)
            return st, (x0s, acc[:, -1])

        keys = jax.random.split(key, args.nsamples)
        _, (samples, accs) = jax.lax.scan(sweep, state, keys)
        gibbs_samples = np.moveaxis(np.asarray(samples), 0, 1)  # (nchains, nsamples, d)
        accs = np.asarray(accs[:, 0])
    else:
        gibbs_samples = np.zeros((args.nchains, args.nsamples, args.d))
        accs = np.zeros((args.nsamples,), dtype=bool)
        for i in range(args.nsamples):
            key, subkey = jax.random.split(key)
            state, (x0s, acc) = step(jax.random.split(subkey, args.nchains), state)
            gibbs_samples[:, i, :] = x0s
            accs[i] = acc[0, -1]
            if i % 100 == 0:
                print(f"ID: {args.id} | Gibbs | iter: {i} | acc rate: {np.mean(accs[:i + 1]):.3f}")

    os.makedirs("./toy/results", exist_ok=True)
    np.savez(f'./toy/results/gibbs{"-eb" if args.explicit_backward else ""}'
             f'{"-ef" if args.explicit_final else ""}{"-marg" if args.marg else ""}'
             f"-{args.sde}-{args.nparticles}-{args.id}",
             samples=gibbs_samples, gp_mean=gp_mean, gp_cov=gp_cov)


if __name__ == "__main__":
    main()
