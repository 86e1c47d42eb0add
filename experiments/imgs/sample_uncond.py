r"""Unconditional sample grid from a trained score checkpoint.

Quick qualitative check of a trained model (counterpart of eyeballing the
reference's training logs): simulate the reverse SDE from the stationary
distribution and save an 8x8 grid.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from experiments.imgs.common import base_parser, resolve_dataset, resolve_sde, load_score_network


def main():
    parser = base_parser("Unconditional sampling.")
    parser.add_argument("--n", type=int, default=64)
    parser.add_argument("--out", type=str, default="./imgs/uncond.png")
    args = parser.parse_args()

    from fbs_tpu.sdes import reverse_simulator

    T = 2.0
    key = jax.random.PRNGKey(args.test_seed)
    key, subkey = jax.random.split(key)
    dataset, resolution, nchannels = resolve_dataset(args, subkey, "inpaint-15")
    sde = resolve_sde(args, T)
    key, subkey = jax.random.split(key)
    nn_score, param = load_score_network(args, subkey, dataset.image_shape, T)

    # Batched score: the reverse simulator integrates all n samples as one
    # batch so every UNet call is one MXU dispatch.
    def score(x, t):
        return nn_score(x, t, param)

    ts = jnp.linspace(0.0, T, args.test_nsteps + 1)

    def simulate(key_, xT):
        return reverse_simulator(key_, xT, ts, score, sde.drift, sde.dispersion)

    key, subkey = jax.random.split(key)
    xT = jax.random.normal(subkey, (args.n, *dataset.image_shape))
    key, subkey = jax.random.split(key)
    x0 = jax.jit(simulate)(subkey, xT)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    side = int(np.sqrt(args.n))
    fig, axes = plt.subplots(side, side, figsize=(side, side))
    for i, ax in enumerate(axes.ravel()):
        img = np.clip(np.asarray(x0[i]), 0, 1)
        ax.imshow(img[..., 0] if nchannels == 1 else img, cmap="gray", vmin=0, vmax=1)
        ax.axis("off")
    out_dir = os.path.dirname(args.out)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    fig.savefig(args.out, dpi=110, bbox_inches="tight")
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
