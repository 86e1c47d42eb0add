r"""Posterior contour / marginal comparison plots for the toy experiments
(reference ``experiments/tabulators/plot_toy_contours.py``)."""
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
    parser.add_argument("--methods", type=str, nargs="+",
                        default=["gibbs-eb-const-100", "pmcmc-0.005-const-100"])
    parser.add_argument("--id", type=int, default=0)
    parser.add_argument("--dims", type=int, nargs=2, default=[0, 1])
    args = parser.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    i, j = args.dims
    fig, axes = plt.subplots(ncols=len(args.methods), figsize=(5 * len(args.methods), 4),
                             sharex=True, sharey=True)
    for ax, method in zip(np.atleast_1d(axes), args.methods):
        results = np.load(f"{_EXP}/toy/results/{method}-{args.id}.npz")
        samples = results["samples"]
        if samples.ndim == 3:
            samples = samples.reshape(-1, samples.shape[-1])
        gp_mean, gp_cov = results["gp_mean"], results["gp_cov"]

        ax.scatter(samples[:, i], samples[:, j], s=1, alpha=0.2)
        # Exact 2-sigma ellipse of the marginal pair.
        sub_cov = gp_cov[np.ix_([i, j], [i, j])]
        vals, vecs = np.linalg.eigh(sub_cov)
        theta = np.linspace(0, 2 * np.pi, 200)
        circ = np.stack([np.cos(theta), np.sin(theta)])
        ell = (vecs @ (2 * np.sqrt(vals)[:, None] * circ)).T + gp_mean[[i, j]]
        ax.plot(ell[:, 0], ell[:, 1], "k--", lw=1.5)
        ax.set_title(method)
    os.makedirs(f"{_EXP}/toy/figs", exist_ok=True)
    out = f"{_EXP}/toy/figs/contours-{args.id}.png"
    plt.savefig(out, dpi=150)
    print(f"Saved {out}")


if __name__ == "__main__":
    main()
