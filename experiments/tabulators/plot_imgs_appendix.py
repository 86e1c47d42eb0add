"""Appendix image grids (reference ``tabulators/plot_imgs_appendix.py``,
paper Figures 9-12): per y0, one row per method with the corrupt image, the
truth, and a random subset of posterior samples.

Adapted to this repo's flat artifact layout
(``results_<task>/<dataset>-<size>-<sde>-<nparticles>-<k>-...``).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import setup as _setup, experiments_dir as _expdir  # noqa: E402
_setup()
_EXP = _expdir()

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
from mpl_toolkits.axes_grid1 import ImageGrid

from fbs_tpu.data import normalise


def to_img(img, nchannels):
    img = np.asarray(normalise(np.asarray(img), method="clip"))
    return img[..., 0] if nchannels == 1 else img


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--task", type=str, default="inpainting")
    parser.add_argument("--dataset", type=str, default="mnist")
    parser.add_argument("--size", type=int, default=15)
    parser.add_argument("--sde", type=str, default="lin")
    parser.add_argument("--nparticles", type=int, default=100)
    parser.add_argument("--methods", type=str,
                        default="filter,gibbs-eb-ef,pmcmc-0.005,twisted,csgm")
    parser.add_argument("--ny0s", type=int, default=100)
    parser.add_argument("--nexamples", type=int, default=12)
    args = parser.parse_args()

    np.random.seed(666)
    methods = args.methods.split(",")
    nchannels = 1 if args.dataset == "mnist" else 3
    cmap = "gray" if nchannels == 1 else None

    os.makedirs(f"{_EXP}/figs", exist_ok=True)
    base = f"{_EXP}/imgs/results_{args.task}"

    for k in range(args.ny0s):
        head = f"{base}/{args.dataset}-{args.size}-{args.sde}-{args.nparticles}-{k}"
        if not os.path.exists(head + "-true.npz"):
            continue
        true_img = to_img(np.load(head + "-true.npz")["test_img"], nchannels)
        corrupt_img = plt.imread(head + "-corrupt.png")

        stacks = {}
        for method in methods:
            f = head + f"-{method}.npy"
            if os.path.exists(f):
                stacks[method] = np.load(f)
        if not stacks:
            continue
        nsamples = min(s.shape[0] for s in stacks.values())
        nex = min(args.nexamples, nsamples)
        sample_inds = np.random.choice(np.arange(nsamples), nex, replace=False)

        rows = list(stacks)
        fig = plt.figure(figsize=(1.2 * (nex + 2), 1.2 * len(rows)))
        grid = ImageGrid(fig, 111, nrows_ncols=(len(rows), nex + 2), axes_pad=0.0)
        for row, method in enumerate(rows):
            for col in range(nex + 2):
                ax = grid[row * (nex + 2) + col]
                if col == 0:
                    ax.imshow(corrupt_img, cmap=cmap)
                elif col == 1:
                    ax.imshow(true_img, cmap=cmap)
                else:
                    ax.imshow(to_img(stacks[method][sample_inds[col - 2]], nchannels),
                              cmap=cmap)
                if row == 0:
                    ax.set_title({0: "corrupt", 1: "true"}.get(col, f"sample {col - 2}"),
                                 fontsize=9)
                if col == 0:
                    ax.set_ylabel(method, fontsize=9)
                ax.set_xticks([])
                ax.set_yticks([])
        plt.tight_layout(pad=0.1)
        out = (f"{_EXP}/figs/appendix-imgs-{args.dataset}-{args.task}-{args.size}"
               f"-{args.nparticles}-{k}.png")
        plt.savefig(out, transparent=True)
        plt.close(fig)
        print(f"saved {out}")


if __name__ == "__main__":
    main()
