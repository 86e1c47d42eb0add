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

    for k in range(args.ny0s):
        data_key, subkey = jax.random.split(data_key)
        if k < args.start_from:
            continue
        print(f"Running twisted sampler for {k}-th test sample.")
        test_img, test_y0, mask = dataset.sampler(subkey)
        head = f"./imgs/results_supr/{args.dataset}-{args.rate}-{args.sde}-{args.nparticles}-{k}"
        save_true_artifacts(head, test_img, test_y0, mask, dataset, nchannels)

        restored_imgs = np.zeros((nsamples, resolution, resolution, nchannels))
        for i in range(nsamples):
            key, subkey = jax.random.split(key)
            img = sampler.twisted_sample(subkey, test_y0, mask)
            restored_imgs[i] = img
            save_image(head + f"-twisted-{i}.png", img, nchannels)
            print(f"{task} | Twisted | iter: {i}")
        np.save(head + "-twisted", restored_imgs)


if __name__ == "__main__":
    main()
