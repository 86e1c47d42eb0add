r"""MCMC mixing diagnostics: autocorrelation vs lag for the toy chains.

TPU-native counterpart of reference
``experiments/tabulators/plot_autocorrs_toy.py``, using the FFT-based
autocorrelation in ``fbs_tpu.metrics`` (max over dims, mean over MC reps).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import setup as _setup, experiments_dir as _expdir  # noqa: E402
_setup()
_EXP = _expdir()

import jax.numpy as jnp
import numpy as np

from fbs_tpu.metrics import autocorr, ess


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sde", type=str, default="const")
    parser.add_argument("--max_lag", type=int, default=100)
    parser.add_argument("--max_mcs", type=int, default=100)
    parser.add_argument("--methods", type=str, nargs="+",
                        default=["gibbs-eb-const-10", "gibbs-eb-const-100",
                                 "pmcmc-0.005-const-10", "pmcmc-0.005-const-100"])
    parser.add_argument("--plot", action="store_true", default=False)
    args = parser.parse_args()

    curves = {}
    for method in args.methods:
        acs, esss = [], []
        for mc_id in range(args.max_mcs):
            path = f"{_EXP}/toy/results/{method}-{mc_id}.npz"
            cpath = f"{_EXP}/toy/results_compact/{method}-{mc_id}.npz"
            if os.path.exists(path):
                samples = np.load(path)["samples"]
                if samples.ndim == 3:
                    samples = samples[0]  # first chain
                acs.append(np.asarray(autocorr(jnp.asarray(samples),
                                               max_lag=args.max_lag)))
                esss.append(float(ess(jnp.asarray(samples))))
            elif os.path.exists(cpath):
                # Committed sufficient statistics (compact_results.py) carry
                # the per-chain curve + Geyer ESS, so the figure regenerates
                # from a fresh clone without the raw 10k-sample stacks.
                comp = np.load(cpath)
                if "autocorr" not in comp:
                    continue
                ac, es = comp["autocorr"], comp["ess"]
                acs.append(ac[0, : args.max_lag] if ac.ndim == 2
                           else ac[: args.max_lag])
                esss.append(float(es[0] if es.ndim else es))
        if not acs:
            print(f"{method}: no results")
            continue
        # Compact-stat entries store curves at max_lag=100; clamp to the
        # shortest curve so a larger --max_lag cannot make the stack ragged.
        min_lag = min(a.shape[0] for a in acs)
        if min_lag < args.max_lag:
            print(f"{method}: clamping to stored max_lag={min_lag}")
        curves[method] = np.mean(np.stack([a[:min_lag] for a in acs]), axis=0)
        print(f"{method} | mean ESS {np.mean(esss):.1f} | "
              f"autocorr@1 {curves[method][0]:.3f} | autocorr@10 {curves[method][9]:.3f}")

    if args.plot and curves:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        for method, curve in curves.items():
            plt.plot(np.arange(1, args.max_lag + 1), curve, label=method)
        plt.xlabel("lag")
        plt.ylabel("max-dim autocorrelation")
        plt.legend()
        os.makedirs(f"{_EXP}/toy/figs", exist_ok=True)
        plt.savefig(f"{_EXP}/toy/figs/autocorrs.png", dpi=150)


if __name__ == "__main__":
    main()
