from fbs_tpu.data.base import Dataset
from fbs_tpu.data.bayesian import Crescent
from fbs_tpu.data.images import (
    Image, MNIST, CIFAR10, CelebAHQ,
    InpaintingMask, SRMask, ImageRestore,
    MNISTRestore, CelebAHQRestore, normalise,
)
