r"""Production-scale toy GP table in one program: all methods, MC repetitions
vmapped across the chip.

The reference runs each MC repetition as a separate multi-hour host process
(10-20 packed per GPU, ``/root/reference/experiments/bashes/toy_gibbs.sh:20-31``);
here each method runs all repetitions as one vmapped, scanned program — the
per-rep observation ``y0`` is data, not closure structure, so the reps map
onto one batched device computation.  Artifacts are written per repetition in
the exact layout ``tabulators/tabulate_toy.py`` consumes.

Config of record: ``--d 100 --nsamples 10000 --nparticles 100 --nmc 20``.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp

from fbs_tpu.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()
import numpy as np

from fbs_tpu.samplers import (bootstrap_filter, bootstrap_backward_smoother,
                              gibbs_kernel, pmcmc_kernel, stratified)
from functools import partial


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--d", type=int, default=100)
    parser.add_argument("--nparticles", type=int, default=100)
    parser.add_argument("--nsamples", type=int, default=10000)
    parser.add_argument("--nmc", type=int, default=20)
    parser.add_argument("--sde", type=str, default="const")
    parser.add_argument("--nsteps", type=int, default=200)
    parser.add_argument("--methods", type=str,
                        default="gibbs-eb,pmcmc-0.005,pmcmc-0.001,filter,twisted,csgm")
    parser.add_argument("--chunk", type=int, default=50,
                        help="Draws per scan step for the one-shot methods.")
    parser.add_argument("--chunk_twisted", type=int, default=5,
                        help="Draws per dispatch for twisted SMC.  Each twisted "
                             "draw carries a per-particle grad of the twisting "
                             "logpdf through the 200-step scan, so a full-size "
                             "chunk exceeds the TPU tunnel's ~2min dispatch "
                             "ceiling and crashes the remote worker.")
    parser.add_argument("--skip_existing", action="store_true",
                        help="Skip a method whose last-rep artifact already "
                             "exists (crash-resume for the production queue).")
    parser.add_argument("--dispatch_sweeps", type=int, default=500,
                        help="Sweeps per device dispatch: the scan is chunked "
                             "so no single XLA execution exceeds the TPU "
                             "tunnel's RPC deadline (a 10k-sweep single "
                             "dispatch crashes the remote worker).")
    return parser.parse_args()


def make_toy(args):
    from fbs_tpu.applications import GPRegressionToy
    from fbs_tpu.sdes import StationaryConstLinearSDE, StationaryLinLinearSDE

    T = 1.0
    if args.sde == "lin":
        sde = StationaryLinLinearSDE(beta_min=0.02, beta_max=4.0, t0=0.0, T=T)
    else:
        sde = StationaryConstLinearSDE(a=-0.5, b=1.0)
    return GPRegressionToy(d=args.d, obs_var=1.0, T=T, nsteps=args.nsteps, sde=sde)


def save(args, method_tag, rep, samples, gp_mean, gp_cov):
    os.makedirs("./toy/results", exist_ok=True)
    np.savez(f"./toy/results/{method_tag}-{rep}", samples=samples,
             gp_mean=gp_mean, gp_cov=gp_cov)


def _tag_seed(tag: str) -> int:
    """Deterministic per-method seed (``hash()`` is process-salted, which
    would make the production key schedule irreproducible across runs)."""
    import zlib
    return zlib.crc32(tag.encode()) % (2 ** 31)


def main():
    args = parse_args()
    toy = make_toy(args)
    nmc, nsamples, nparticles = args.nmc, args.nsamples, args.nparticles
    methods = args.methods.split(",")

    # Per-rep data: rep i uses PRNGKey(i) exactly as the per-id scripts do.
    y0s, gp_means, gp_covs = [], [], []
    for i in range(nmc):
        key = jax.random.PRNGKey(i)
        _, sub = jax.random.split(key)
        _, y0 = toy.draw_data(sub)
        m, c = toy.exact_posterior(y0)
        y0s.append(y0), gp_means.append(m), gp_covs.append(c)
    y0s = jnp.stack(y0s)
    gp_means, gp_covs = np.stack(gp_means), np.stack(gp_covs)
    master = jax.random.PRNGKey(999)

    def done(tag):
        if args.skip_existing and os.path.exists(f"./toy/results/{tag}-{nmc - 1}.npz"):
            print(f"{tag}: results exist, skipping")
            return True
        return False

    def run_mcmc(tag, init_one, step_one):
        """Vmapped-over-reps MCMC: init once, scan sweeps in bounded chunks."""
        if done(tag):
            return
        t0 = time.time()
        keys = jax.random.split(jax.random.fold_in(master, _tag_seed(tag)), nmc)
        state = jax.jit(jax.vmap(init_one))(keys, y0s)

        def sweep(st, key_):
            st, out = jax.vmap(step_one)(jax.random.split(key_, nmc), y0s, st)
            return st, out

        scan_chunk = jax.jit(lambda st, ks: jax.lax.scan(sweep, st, ks))
        skeys = jax.random.split(jax.random.fold_in(master, 1 + _tag_seed(tag)),
                                 nsamples)
        parts = []
        for lo in range(0, nsamples, args.dispatch_sweeps):
            state, part = scan_chunk(state, skeys[lo:lo + args.dispatch_sweeps])
            parts.append(np.asarray(part))
        samples = np.moveaxis(np.concatenate(parts), 0, 1)  # (nmc, nsamples, d)
        for i in range(nmc):
            save(args, tag, i, samples[i], gp_means[i], gp_covs[i])
        print(f"{tag}: {nsamples} samples x {nmc} reps in {time.time() - t0:.1f}s")

    def run_oneshot(tag, draw_one, chunk=None):
        """Independent draws: scan over chunks of vmapped (rep, draw) grids."""
        if done(tag):
            return
        t0 = time.time()
        chunk = chunk or args.chunk
        nchunks = -(-nsamples // chunk)

        @jax.jit
        def body(key_):
            ks = jax.random.split(key_, nmc * chunk).reshape(nmc, chunk, 2)
            return jax.vmap(jax.vmap(draw_one, in_axes=(0, None)))(ks, y0s)

        ckeys = jax.random.split(jax.random.fold_in(master, 2 + _tag_seed(tag)),
                                 nchunks)
        # One bounded dispatch per chunk (see --dispatch_sweeps rationale).
        samples = np.stack([np.asarray(body(k)) for k in ckeys])
        # (nchunks, nmc, chunk, d) -> (nmc, nsamples, d)
        samples = samples.transpose(1, 0, 2, 3).reshape(nmc, -1, args.d)
        samples = samples[:, :nsamples]
        for i in range(nmc):
            save(args, tag, i, samples[i], gp_means[i], gp_covs[i])
        print(f"{tag}: {nsamples} draws x {nmc} reps in {time.time() - t0:.1f}s")

    for method in methods:
        if "gibbs" in method:
            eb = "eb" in method
            ef = "ef" in method
            kernel = partial(gibbs_kernel, ts=toy.ts, fwd_sampler=toy.fwd_sampler,
                             sde=toy.sde, unpack=toy.unpack, nparticles=nparticles,
                             transition_sampler=toy.transition_sampler,
                             transition_logpdf=toy.transition_logpdf,
                             likelihood_logpdf=toy.likelihood_logpdf,
                             marg_y=False, explicit_backward=eb, explicit_final=ef,
                             fused_kernel=toy.fused_kernel)

            def gibbs_init_one(key_, y0):
                key_fwd, key_bwd, key_bf = jax.random.split(key_, num=3)
                vs = toy.fwd_ys_sampler(key_fwd, y0)[::-1]
                uss = bootstrap_filter(toy.transition_sampler, toy.likelihood_logpdf,
                                       vs, toy.ts, toy.ref_sampler, key_bf, nparticles,
                                       stratified, log=True, return_last=False)[0]
                us_star = bootstrap_backward_smoother(key_bwd, uss, vs, toy.ts,
                                                      toy.transition_logpdf)
                return uss[-1, 0], us_star, jnp.zeros((toy.nsteps + 1,), dtype=int)

            def gibbs_step_one(key_, y0, st):
                x0, us_star, bs_star = st
                x0, us_star, bs_star, _ = kernel(key_, x0, y0, us_star, bs_star)
                return (x0, us_star, bs_star), x0

            run_mcmc(f"{method}-{args.sde}-{nparticles}", gibbs_init_one, gibbs_step_one)

        elif "pmcmc" in method:
            delta = float(method.split("-")[-1])
            kernel = partial(pmcmc_kernel, ts=toy.ts,
                             fwd_ys_sampler=toy.fwd_ys_sampler, sde=toy.sde,
                             ref_sampler=toy.ref_sampler,
                             transition_sampler=toy.transition_sampler,
                             likelihood_logpdf=toy.likelihood_logpdf,
                             resampling=stratified, nparticles=nparticles, delta=delta)

            def pmcmc_init_one(key_, y0):
                ys = toy.fwd_ys_sampler(key_, y0)
                return jnp.zeros((args.d,)), jnp.array(0.0), ys

            def pmcmc_step_one(key_, y0, st):
                uT, log_ell, ys = st
                uT, log_ell, ys, _ = kernel(key_, uT, log_ell, ys, y0=y0)
                return (uT, log_ell, ys), uT

            run_mcmc(f"pmcmc-{delta}-{args.sde}-{nparticles}",
                     pmcmc_init_one, pmcmc_step_one)

        elif method == "filter":
            run_oneshot(f"filter-{args.sde}-{nparticles}",
                        lambda k, y0: toy.filter_sample(k, y0, nparticles))
        elif method == "twisted":
            run_oneshot(f"twisted-{args.sde}-{nparticles}",
                        lambda k, y0: toy.twisted_sample(k, y0, nparticles))
        elif method == "csgm":
            run_oneshot(f"csgm-{args.sde}", toy.csgm_sample)
        else:
            raise ValueError(f"Unknown method {method}")


if __name__ == "__main__":
    main()
