r"""Super-resolution with the twisted diffusion sampler baseline (TDS).

TPU-native counterpart of reference ``experiments/imgs/supr_twisted.py``.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from experiments.imgs.common import base_parser, build_sampler, save_image, save_true_artifacts


def main():
    parser = base_parser("Super-resolution with the twisted diffusion sampler.")
    parser.add_argument("--rate", type=int, default=4)
    args = parser.parse_args()

    task = f"supr-{args.rate}"
    sampler, dataset, (key, data_key), resolution, nchannels = build_sampler(args, task)
    nsamples = args.nsamples

    def draw_image(subkey, y0, mask):
        return sampler.twisted_sample(subkey, y0, mask)

    from experiments.imgs.common import run_oneshot_baseline
    run_oneshot_baseline(args, task, "./imgs/results_supr", args.rate, "twisted",
                         draw_image, dataset, (key, data_key), resolution,
                         nchannels)


if __name__ == "__main__":
    main()
