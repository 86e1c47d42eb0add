"""Animated Schrodinger-bridge super-resolution chains (reference
``tabulators/plot_sb_imgs_anime.py``): input / truth / particle-filter draw /
Gibbs chain, animated over MCMC iterations, saved as a GIF.

Adapted to this repo's flat artifact layout from ``experiments/sb_imgs/supr.py``.
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
from matplotlib.animation import FuncAnimation
from mpl_toolkits.axes_grid1 import ImageGrid

from fbs_tpu.data import normalise


def to_img(img):
    img = np.asarray(normalise(np.asarray(img), method="clip"))
    return img[..., 0] if img.shape[-1] == 1 else img


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, default="mnist")
    parser.add_argument("--rate", type=int, default=4)
    parser.add_argument("--sde", type=str, default="lin")
    parser.add_argument("--nparticles", type=int, default=100)
    parser.add_argument("--y0_id", type=int, default=9)
    parser.add_argument("--x0_type", type=str, default="blank")
    parser.add_argument("--gibbs_method", type=str, default="gibbs-eb-ef")
    parser.add_argument("--max_nsamples", type=int, default=30)
    parser.add_argument("--results_dir", type=str, default=f"{_EXP}/sb_imgs/results")
    args = parser.parse_args()

    head = (f"{args.results_dir}/{args.dataset}-{args.rate}-{args.sde}"
            f"-{args.nparticles}-{args.y0_id}")

    true_img = to_img(np.load(head + "-true.npz")["test_img"])
    corrupt_img = plt.imread(head + "-corrupt.png")
    suffix = f"-{args.x0_type}" if args.x0_type else ""
    filter_imgs = to_img(np.load(head + f"-filter{suffix}.npy"))
    gibbs_imgs = to_img(np.load(head + f"-{args.gibbs_method}{suffix}.npy"))
    init_file = head + "-gibbs-init.npy"
    if os.path.exists(init_file):
        gibbs_imgs = np.concatenate([to_img(np.load(init_file))[None], gibbs_imgs])

    nframes = min(args.max_nsamples, filter_imgs.shape[0], gibbs_imgs.shape[0])
    delay_frames, fps = 5, 1

    fig = plt.figure(figsize=(11, 3))
    axes = ImageGrid(fig, 111, nrows_ncols=(1, 4), axes_pad=0.0)
    for ax, img, title in zip(axes[:2], [corrupt_img, true_img], ["Input", "Truth"]):
        ax.imshow(img, cmap="gray")
        ax.set_title(title)
        ax.axis("off")
    im_pf = axes[2].imshow(filter_imgs[0], cmap="gray")
    axes[2].set_title("PF sample 0")
    axes[2].axis("off")
    im_gibbs = axes[3].imshow(gibbs_imgs[0], cmap="gray")
    axes[3].set_title("Gibbs chain sample 0")
    axes[3].axis("off")

    def update(frame):
        i = max(0, frame - delay_frames)
        im_pf.set_data(filter_imgs[i])
        im_gibbs.set_data(gibbs_imgs[i])
        axes[2].set_title(f"PF sample {i}")
        axes[3].set_title(f"Gibbs chain sample {i}")
        return im_pf, im_gibbs

    ani = FuncAnimation(fig, update, frames=np.arange(nframes + delay_frames),
                        interval=1000 // fps, blit=False)
    plt.tight_layout(pad=0.1)
    plt.subplots_adjust(top=0.905)
    os.makedirs(f"{_EXP}/figs", exist_ok=True)
    out = f"{_EXP}/figs/sb-imgs-anime-{args.y0_id}.gif"
    ani.save(out, fps=fps)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
