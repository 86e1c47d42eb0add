r"""Trace plots for the pMCMC chains (reference
``experiments/tabulators/plot_pmcmc_trace.py``)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import setup as _setup, experiments_dir as _expdir  # noqa: E402
_setup()
_EXP = _expdir()

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--method", type=str, default="pmcmc-0.005-const-100")
    parser.add_argument("--id", type=int, default=0)
    parser.add_argument("--dims", type=int, nargs="+", default=[0, 1, 2])
    args = parser.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    results = np.load(f"{_EXP}/toy/results/{args.method}-{args.id}.npz")
    samples = results["samples"]
    if samples.ndim == 3:
        samples = samples[0]

    fig, axes = plt.subplots(nrows=len(args.dims), sharex=True, figsize=(8, 6))
    for ax, dim in zip(np.atleast_1d(axes), args.dims):
        ax.plot(samples[:, dim], lw=0.5)
        ax.axhline(results["gp_mean"][dim], color="k", ls="--", lw=1)
        ax.set_ylabel(f"dim {dim}")
    axes[-1].set_xlabel("MCMC iteration")
    os.makedirs(f"{_EXP}/toy/figs", exist_ok=True)
    out = f"{_EXP}/toy/figs/trace-{args.method}-{args.id}.png"
    plt.savefig(out, dpi=150)
    print(f"Saved {out}")


if __name__ == "__main__":
    main()
