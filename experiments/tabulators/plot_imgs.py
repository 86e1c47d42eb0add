r"""Grid plots of restored images per method (reference
``experiments/tabulators/plot_imgs.py`` / ``plot_imgs_appendix.py``)."""
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
    parser.add_argument("--task", type=str, default="inpainting")
    parser.add_argument("--dataset", type=str, default="mnist")
    parser.add_argument("--size", type=int, default=15)
    parser.add_argument("--sde", type=str, default="lin")
    parser.add_argument("--nparticles", type=int, default=100)
    parser.add_argument("--methods", type=str, nargs="+",
                        default=["gibbs-eb", "pmcmc-0.005", "twisted", "csgm"])
    parser.add_argument("--k", type=int, default=0)
    parser.add_argument("--nshow", type=int, default=6)
    args = parser.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    head = (f"{_EXP}/imgs/results_{args.task}/{args.dataset}-{args.size}-{args.sde}"
            f"-{args.nparticles}-{args.k}")
    rows = []
    labels = []
    for method in args.methods:
        f = head + f"-{method}.npy"
        if os.path.exists(f):
            rows.append(np.load(f)[: args.nshow])
            labels.append(method)
    if not rows:
        print("No results found.")
        return

    nch = rows[0].shape[-1]
    fig, axes = plt.subplots(nrows=len(rows), ncols=args.nshow,
                             figsize=(args.nshow * 1.6, len(rows) * 1.8))
    axes = np.atleast_2d(axes)
    for r, (row, label) in enumerate(zip(rows, labels)):
        for c in range(min(args.nshow, row.shape[0])):
            img = np.clip(row[c], 0, 1)
            axes[r, c].imshow(img[..., 0] if nch == 1 else img,
                              cmap="gray" if nch == 1 else None)
            axes[r, c].axis("off")
        axes[r, 0].set_ylabel(label)
    out = head + "-grid.png"
    plt.tight_layout(pad=0.2)
    plt.savefig(out, dpi=150)
    print(f"Saved {out}")


if __name__ == "__main__":
    main()
