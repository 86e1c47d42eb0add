r"""Inpainting with the conditional-score (CSGM) baseline.

TPU-native counterpart of reference ``experiments/imgs/inpainting_csgm.py``.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import numpy as np

from experiments.imgs.common import base_parser, build_sampler, save_image, save_true_artifacts


def main():
    parser = base_parser("Inpainting with the conditional-score baseline.")
    parser.add_argument("--rect_size", type=int, default=15)
    parser.add_argument("--integrator", type=str, default="em",
                        help="em (reference parity) | heun (weak order 2)")
    args = parser.parse_args()

    task = f"inpaint-{args.rect_size}"
    sampler, dataset, (key, data_key), resolution, nchannels = build_sampler(args, task)
    nsamples = args.nsamples

    def draw_image(subkey, y0, mask):
        x0 = sampler.csgm_sample(subkey, y0, mask, integrator=args.integrator)
        return dataset.concat(x0, y0, mask)

    from experiments.imgs.common import run_oneshot_baseline
    run_oneshot_baseline(args, task, "./imgs/results_inpainting", args.rect_size, "csgm",
                         draw_image, dataset, (key, data_key), resolution,
                         nchannels)


if __name__ == "__main__":
    main()
