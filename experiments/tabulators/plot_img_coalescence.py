r"""Gibbs-chain coalescence visualisation for the image samplers (reference
``experiments/tabulators/plot_img_coalescence.py``): distance between
successive restored samples vs sweep index."""
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
    parser.add_argument("--method", type=str, default="gibbs-eb")
    parser.add_argument("--k", type=int, default=0)
    args = parser.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    head = (f"{_EXP}/imgs/results_{args.task}/{args.dataset}-{args.size}-{args.sde}"
            f"-{args.nparticles}-{args.k}")
    samples = np.load(head + f"-{args.method}.npy")
    diffs = np.sqrt(((samples[1:] - samples[:-1]) ** 2).mean(axis=(1, 2, 3)))

    plt.plot(diffs)
    plt.xlabel("Gibbs sweep")
    plt.ylabel("RMS change between successive samples")
    out = head + f"-{args.method}-coalescence.png"
    plt.savefig(out, dpi=150)
    print(f"Saved {out}")


if __name__ == "__main__":
    main()
