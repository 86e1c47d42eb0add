r"""Super-resolution with the conditional-score (CSGM) baseline.

TPU-native counterpart of reference ``experiments/imgs/supr_csgm.py``.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import numpy as np

from experiments.imgs.common import base_parser, build_sampler, save_image, save_true_artifacts


def main():
    parser = base_parser("Super-resolution with the conditional-score baseline (super-resolution).")
    parser.add_argument("--rate", type=int, default=4)
    parser.add_argument("--integrator", type=str, default="em",
                        help="em (reference parity) | heun (weak order 2)")
    args = parser.parse_args()

    task = f"supr-{args.rate}"
    sampler, dataset, (key, data_key), resolution, nchannels = build_sampler(args, task)
    nsamples = args.nsamples

    for k in range(args.ny0s):
        data_key, subkey = jax.random.split(data_key)
        if k < args.start_from:
            continue
        print(f"Running CSGM sampler for {k}-th test sample.")
        test_img, test_y0, mask = dataset.sampler(subkey)
        head = f"./imgs/results_supr/{args.dataset}-{args.rate}-{args.sde}-{args.nparticles}-{k}"
        save_true_artifacts(head, test_img, test_y0, mask, dataset, nchannels)

        restored_imgs = np.zeros((nsamples, resolution, resolution, nchannels))
        for i in range(nsamples):
            key, subkey = jax.random.split(key)
            x0 = sampler.csgm_sample(subkey, test_y0, mask, integrator=args.integrator)
            restored = dataset.concat(x0, test_y0, mask)
            restored_imgs[i] = restored
            save_image(head + f"-csgm-{i}.png", restored, nchannels)
            print(f"{task} | cSGM | iter: {i}")
        np.save(head + "-csgm", restored_imgs)


if __name__ == "__main__":
    main()
