r"""Autocorrelation diagnostics for the image Gibbs/pMCMC chains (reference
``experiments/tabulators/plot_autocorrs_imgs.py``): per-pixel chains from the
saved per-sweep sample stacks."""
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
    parser.add_argument("--task", type=str, default="inpainting")
    parser.add_argument("--dataset", type=str, default="mnist")
    parser.add_argument("--size", type=int, default=15)
    parser.add_argument("--sde", type=str, default="lin")
    parser.add_argument("--nparticles", type=int, default=100)
    parser.add_argument("--methods", type=str, nargs="+",
                        default=["gibbs-eb", "pmcmc-0.005"])
    parser.add_argument("--ny0s", type=int, default=100)
    parser.add_argument("--max_lag", type=int, default=100)
    args = parser.parse_args()

    for method in args.methods:
        acs, esss = [], []
        for k in range(args.ny0s):
            head = (f"{_EXP}/imgs/results_{args.task}/{args.dataset}-{args.size}"
                    f"-{args.sde}-{args.nparticles}-{k}")
            f = head + f"-{method}.npy"
            if not os.path.exists(f):
                continue
            samples = np.load(f).reshape(-1, np.prod(np.load(f).shape[1:]))
            max_lag = min(args.max_lag, samples.shape[0] - 1)
            acs.append(np.asarray(autocorr(jnp.asarray(samples), max_lag=max_lag)))
            esss.append(float(ess(jnp.asarray(samples))))
        if acs:
            mean_ac = np.mean(np.stack(acs), axis=0)
            print(f"{method} | reps {len(acs)} | mean ESS {np.mean(esss):.1f} | "
                  f"autocorr@1 {mean_ac[0]:.3f} | autocorr@10 {mean_ac[min(9, len(mean_ac)-1)]:.3f}")
        else:
            print(f"{method}: no results")


if __name__ == "__main__":
    main()
