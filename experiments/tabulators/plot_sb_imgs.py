r"""SB super-resolution sample grids + optional animation frames (reference
``experiments/tabulators/plot_sb_imgs.py`` / ``plot_sb_imgs_anime.py``)."""
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
    parser.add_argument("--rate", type=int, default=4)
    parser.add_argument("--sde", type=str, default="lin")
    parser.add_argument("--nparticles", type=int, default=100)
    parser.add_argument("--y0_id", type=int, default=10)
    parser.add_argument("--inits", type=str, nargs="+",
                        default=["random", "blank", "interp"])
    parser.add_argument("--method", type=str, default="gibbs")
    parser.add_argument("--nshow", type=int, default=8)
    parser.add_argument("--anime", action="store_true", default=False,
                        help="Also dump per-sweep frames for a GIF.")
    args = parser.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    head = f"{_EXP}/sb_imgs/results/mnist-{args.rate}-{args.sde}-{args.nparticles}-{args.y0_id}"
    rows, labels = [], []
    for init in args.inits:
        f = head + f"-{args.method}-{init}.npy"
        if os.path.exists(f):
            rows.append(np.load(f))
            labels.append(init)
    if not rows:
        print("No results found.")
        return

    fig, axes = plt.subplots(nrows=len(rows), ncols=args.nshow,
                             figsize=(args.nshow * 1.6, len(rows) * 1.8))
    axes = np.atleast_2d(axes)
    for r, (row, label) in enumerate(zip(rows, labels)):
        step = max(1, row.shape[0] // args.nshow)
        for c in range(args.nshow):
            i = min(c * step, row.shape[0] - 1)
            axes[r, c].imshow(np.clip(row[i, ..., 0], 0, 1), cmap="gray")
            axes[r, c].axis("off")
            if r == 0:
                axes[r, c].set_title(f"sweep {i}", fontsize=7)
        axes[r, 0].set_ylabel(label)
    out = head + f"-{args.method}-grid.png"
    plt.tight_layout(pad=0.2)
    plt.savefig(out, dpi=150)
    print(f"Saved {out}")

    if args.anime:
        frames_dir = head + "-frames"
        os.makedirs(frames_dir, exist_ok=True)
        for i in range(rows[0].shape[0]):
            plt.imsave(os.path.join(frames_dir, f"{i:04d}.png"),
                       np.clip(rows[0][i, ..., 0], 0, 1), cmap="gray")
        print(f"Saved {rows[0].shape[0]} frames to {frames_dir} "
              f"(assemble with e.g. imageio or ffmpeg)")


if __name__ == "__main__":
    main()
