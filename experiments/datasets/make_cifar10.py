r"""Convert the CIFAR-10 python pickle batches into a single npz.

TPU-native counterpart of reference ``experiments/datasets/make_cifar10.py``.
Download and extract cifar-10-python.tar.gz next to this script first.
"""
import os
import pickle

import numpy as np


def load_batch(path):
    with open(path, "rb") as f:
        d = pickle.load(f, encoding="bytes")
    data = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    return data.astype(np.float32) / 255.0


def main():
    base = os.path.join(os.path.dirname(os.path.abspath(__file__)), "cifar-10-batches-py")
    train = np.concatenate([load_batch(os.path.join(base, f"data_batch_{i}"))
                            for i in range(1, 6)], axis=0)
    test = load_batch(os.path.join(base, "test_batch"))
    out = os.path.join(os.path.dirname(base), "cifar10.npz")
    np.savez(out, train_data=train, test_data=test)
    print(f"Saved {out}: train {train.shape}, test {test.shape}")


if __name__ == "__main__":
    main()
