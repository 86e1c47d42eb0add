r"""Gaussian-SB ablation at production scale: all MC ids vmapped on one chip.

The reference runs this as 30 tasks x 100 Slurm array ids on a CPU cluster
(``/root/reference/experiments/run_sb_all.sh:5-15``); ``sb/{gibbs,filter}.py``
here reproduce that per-id layout.  This runner executes every repetition of
a particle-count configuration as ONE vmapped, scanned device program
(chunked into bounded dispatches for the RPC tunnel), writing the same
per-id ``sb/results/{method}-{N}-{id}.npz`` artifacts.

Per-id key streams mirror ``sb/gibbs.py`` exactly (PRNGKey(id) -> data /
init / per-sweep splits), so single-id reruns reproduce production rows.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax

from fbs_tpu.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()

import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--d", type=int, default=10)
    parser.add_argument("--nparticles", type=int, nargs="+",
                        default=[4, 8, 16, 32, 64])
    parser.add_argument("--nsamples", type=int, default=10000)
    parser.add_argument("--nmc", type=int, default=100)
    parser.add_argument("--dispatch_sweeps", type=int, default=200,
                        help="Sweeps per device dispatch (tunnel-bounded).")
    parser.add_argument("--chunk", type=int, default=50,
                        help="Filter draws per dispatch step.")
    args = parser.parse_args()

    from functools import partial

    from fbs_tpu.applications import GaussianSBToy
    from fbs_tpu.samplers import (bootstrap_filter, bootstrap_backward_smoother,
                                  gibbs_kernel, stratified)

    toy = GaussianSBToy(d=args.d, obs_var=0.1, T=1.0, nsteps=100,
                        integration_nsteps=10)

    # Per-id data, with the key discipline of sb/gibbs.py.
    chain_keys, y0s, gp_means, gp_covs = [], [], [], []
    for i in range(args.nmc):
        key = jax.random.PRNGKey(i)
        key, subkey = jax.random.split(key)
        _, y0 = toy.draw_data(subkey)
        m, c = toy.exact_posterior(y0)
        chain_keys.append(key)
        y0s.append(y0)
        gp_means.append(np.asarray(m))
        gp_covs.append(np.asarray(c))
    chain_keys = jnp.stack(chain_keys)
    y0s = jnp.stack(y0s)

    os.makedirs("./sb/results", exist_ok=True)

    for nparticles in args.nparticles:
        # ---- Gibbs (explicit-backward). ----
        def init_one(key_, y0):
            key_fwd, key_bwd, key_bf = jax.random.split(key_, num=3)
            vs = toy.fwd_ys_sampler_heuristic(key_fwd, y0)[::-1]
            uss = bootstrap_filter(toy.transition_sampler, toy.likelihood_logpdf,
                                   vs, toy.ts, toy.ref_sampler, key_bf,
                                   nparticles, stratified, log=True,
                                   return_last=False)[0]
            x0 = uss[-1, 0]
            us_star = bootstrap_backward_smoother(key_bwd, uss, vs, toy.ts,
                                                  toy.transition_logpdf)
            return x0, us_star, jnp.zeros((toy.nsteps + 1,), dtype=int)

        kernel = partial(gibbs_kernel, ts=toy.ts, fwd_sampler=toy.fwd_sampler,
                         sde=None, unpack=toy.unpack, nparticles=nparticles,
                         transition_sampler=toy.transition_sampler,
                         transition_logpdf=toy.transition_logpdf,
                         likelihood_logpdf=toy.likelihood_logpdf,
                         marg_y=False, explicit_backward=True,
                         explicit_final=False, fused_kernel=toy.fused_kernel)

        def step_one(key_, y0, state):
            x0, us_star, bs_star = state
            x0, us_star, bs_star, acc = kernel(key_, x0, y0, us_star, bs_star)
            return (x0, us_star, bs_star), (x0, acc[-1])

        t0 = time.time()
        ks2 = jax.vmap(jax.random.split)(chain_keys)  # (nmc, 2, key)
        keys, subs = ks2[:, 0], ks2[:, 1]
        states = jax.jit(jax.vmap(init_one))(subs, y0s)

        @partial(jax.jit, static_argnums=2)
        def sweep_chunk(keys_, states_, nsweeps):
            def body(carry, _):
                ks, st = carry
                k2 = jax.vmap(jax.random.split)(ks)
                st, out = jax.vmap(step_one)(k2[:, 1], y0s, st)
                return (k2[:, 0], st), out

            (ks, st), (xs, accs) = jax.lax.scan(body, (keys_, states_), None,
                                                length=nsweeps)
            return ks, st, xs, accs

        samples = np.zeros((args.nmc, args.nsamples, args.d))
        acc_sum = 0.0
        for lo in range(0, args.nsamples, args.dispatch_sweeps):
            m = min(args.dispatch_sweeps, args.nsamples - lo)
            keys, states, xs, accs = sweep_chunk(keys, states, m)
            samples[:, lo:lo + m] = np.moveaxis(np.asarray(xs), 0, 1)
            acc_sum += float(jnp.sum(accs))
        for i in range(args.nmc):
            np.savez(f"./sb/results/gibbs-eb-{nparticles}-{i}",
                     samples=samples[i], gp_mean=gp_means[i], gp_cov=gp_covs[i])
        print(f"SB gibbs-eb N={nparticles}: {args.nsamples} sweeps x "
              f"{args.nmc} reps in {time.time() - t0:.1f}s, "
              f"acc {acc_sum / (args.nmc * args.nsamples):.3f}")

        # ---- One-shot SB filter baseline. ----
        # Key discipline mirrors sb/filter.py per id (PRNGKey(id) -> data
        # split -> per-batch split/fan-out), so a per-id rerun with
        # ``--batch`` equal to ``--chunk`` reproduces these rows exactly.
        t0 = time.time()

        @partial(jax.jit, static_argnums=1)
        def draw_chunk(fkeys_, n):
            k2 = jax.vmap(jax.random.split)(fkeys_)

            def per_id(sub, y0):
                return jax.vmap(lambda kk: toy.filter_sample(kk, y0, nparticles)
                                )(jax.random.split(sub, n))

            return k2[:, 0], jax.vmap(per_id)(k2[:, 1], y0s)

        fkeys = chain_keys
        fsamples = np.zeros((args.nmc, args.nsamples, args.d))
        done = 0
        while done < args.nsamples:
            n = min(args.chunk, args.nsamples - done)
            fkeys, out = draw_chunk(fkeys, n)
            fsamples[:, done:done + n] = np.asarray(out)
            done += n
        for i in range(args.nmc):
            np.savez(f"./sb/results/filter-{nparticles}-{i}",
                     samples=fsamples[i], gp_mean=gp_means[i], gp_cov=gp_covs[i])
        print(f"SB filter N={nparticles}: {args.nsamples} draws x "
              f"{args.nmc} reps in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
