r"""Convert CelebA-HQ images to npy arrays at the target resolutions.

TPU-native counterpart of reference ``experiments/datasets/celebaHQ/convert.py``
extended with the 256x256 pipeline required by the v4-8 benchmark config
(the reference stops at 128; BASELINE.json's CelebA-HQ-256 target needs it).

Expects ``celeba_hq.npy`` (30k, 256, 256, 3) uint8 or float; emits
``celeba_hq{64,128,256}.npy`` float32 in [0, 1].
"""
import argparse
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--src", type=str, default="./datasets/celeba_hq.npy")
    parser.add_argument("--resolutions", type=int, nargs="+", default=[64, 128, 256])
    args = parser.parse_args()

    import jax
    if os.environ.get("FBS_PLATFORM"):  # host-side resize; keep off the TPU
        jax.config.update("jax_platforms", os.environ["FBS_PLATFORM"])
    import jax.numpy as jnp

    data = np.load(args.src, mmap_mode="r")
    n, h, w, c = data.shape
    for res in args.resolutions:
        out_path = os.path.join(os.path.dirname(args.src), f"celeba_hq{res}.npy")
        out = np.zeros((n, res, res, c), np.float32)
        batch = 256
        resize = jax.jit(lambda x: jax.image.resize(
            x.astype(jnp.float32) / (255.0 if data.dtype == np.uint8 else 1.0),
            (x.shape[0], res, res, c), "linear"))
        for i in range(0, n, batch):
            out[i:i + batch] = np.asarray(resize(jnp.asarray(data[i:i + batch])))
        np.save(out_path, out)
        print(f"Saved {out_path}: {out.shape}")


if __name__ == "__main__":
    main()
