"""Image datasets, corruption operators, and restoration mask algebra.

Rebuild of reference ``fbs/data/images.py``.  The key change is that mask
generation is fully jittable: the reference computes the observed-index
complement with ``jnp.setdiff1d`` (flagged non-jittable at
``images.py:284-302``); here the complement is derived from a stable argsort
of a boolean scatter mask, which is identical for sorted unique index sets
and traces cleanly — so mask sampling can live inside jit/scan/shard_map.

``unpack`` (image -> (x, y) gather) and ``concat`` ((x, y, mask) -> image
scatter) keep the reference's semantics exactly: they are the closures the
Gibbs samplers consume (reference ``images.py:333-363``).
"""
from __future__ import annotations

import itertools
from functools import partial
from typing import NamedTuple, Tuple, Union

import jax
import jax.numpy as jnp

from fbs_tpu.data.base import Dataset
from fbs_tpu.typing import Array, JArray, JKey

__all__ = [
    "Image", "MNIST", "CIFAR10", "CelebAHQ",
    "InpaintingMask", "SRMask", "ImageRestore",
    "MNISTRestore", "CelebAHQRestore", "normalise",
]


class Image(Dataset):
    """Dataset of (clean, corrupted) image pairs.

    The corruption *family* is the observation model of the reference
    experiments (``fbs/data/images.py:10-127``) and must match it
    distributionally and key-for-key: a Gaussian blur with a random variance
    in [0.1, 5), a square occlusion at one of 4 x 4 grid-aligned anchors, or
    a nearest-neighbour down-up-sample at a random ratio in {4, 8}.  The
    implementations below are this repo's own: the blur kernel is built as a
    separable outer product, and the occlusion mask is an analytic rank-1
    indicator evaluated at the drawn anchor rather than a gather from a
    materialised bank of full-resolution masks (which at 256^2 x 3 would be
    16 x 768 KiB of HBM traffic per draw for what is two iota comparisons).
    """
    image_shape: Tuple[int, int, int]
    task: str

    @staticmethod
    def standardise(array: Array) -> JArray:
        return array

    def downsample(self, key: JKey, img: Array) -> JArray:
        """Nearest-neighbour decimate-then-replicate at ratio 4 or 8 (drawn
        uniformly).  Both variants are two cheap resizes; computing the pair
        and selecting keeps the op trivially vmappable (a `lax.switch` would
        lower to the same select under batching)."""
        ratios = (4, 8)
        w, h, c = self.image_shape
        down_up = jnp.stack(
            [jax.image.resize(jax.image.resize(img, (w // r, h // r, c), "nearest"),
                              (w, h, c), "nearest")
             for r in ratios])
        return jax.random.choice(key, down_up)

    def conv(self, key: JKey, img: Array, kernel_size: int = 15) -> JArray:
        """Gaussian blur with variance ~ U[0.1, 5).  The 2-D kernel is the
        outer product of a 1-D Gaussian profile with itself (separable, so
        built in O(k) exps instead of O(k^2))."""
        c = self.image_shape[-1]
        variance = jax.random.uniform(key, minval=0.1, maxval=5.0)
        profile = jnp.exp(-jnp.linspace(-1.0, 1.0, kernel_size) ** 2 / variance)
        kernel = jnp.broadcast_to(profile[:, None] * profile[None, :],
                                  (c, c, kernel_size, kernel_size))
        corrupted = jax.lax.conv_general_dilated(
            img[None], kernel, (1, 1), "SAME",
            dimension_numbers=("NHWC", "IOHW", "NHWC"))[0]
        return normalise(corrupted, method="norm")

    def paint(self, key: JKey, img: Array, rectangle_size: int = 15) -> JArray:
        """Zero a rectangle_size^2 square at one of (b+1)^2 grid-aligned
        anchors, drawn uniformly.  The mask is the complement of the outer
        product of two 1-D interval indicators — no mask bank."""
        b = 3
        h, w = self.image_shape[:2]
        anchors_h = jnp.asarray([int((h - rectangle_size) / b * i) for i in range(b + 1)])
        anchors_w = jnp.asarray([int((w - rectangle_size) / b * i) for i in range(b + 1)])

        idx = jax.random.choice(key, anchors_h.shape[0] * anchors_w.shape[0])
        top, left = anchors_h[idx // anchors_w.shape[0]], anchors_w[idx % anchors_w.shape[0]]
        rows = jnp.arange(h)[:, None]
        cols = jnp.arange(w)[None, :]
        in_rect = ((rows >= top) & (rows < top + rectangle_size)
                   & (cols >= left) & (cols < left + rectangle_size))
        return img * jnp.where(in_rect, 0.0, 1.0)[..., None]

    def corrupt(self, key: JKey, img: JArray) -> JArray:
        if "inpaint" in self.task:
            return self.paint(key, img, rectangle_size=int(self.task.split("-")[-1]))
        if "deconv" in self.task:
            return self.conv(key, img, int(self.task.split("-")[-1]))
        if "supr" in self.task:
            return self.downsample(key, img)
        raise ValueError(f"Unknown task {self.task}.")

    def sampler(self, key: JKey) -> Tuple[JArray, JArray]:
        key_choice, key_corrupt = jax.random.split(key)
        x = self.xs[jax.random.choice(key_choice, self.n)]
        y = self.corrupt(key_corrupt, x)
        return x, y

    @partial(jax.jit, static_argnums=0)
    def _enumerate_jit(self, inds, key):
        xs = self.xs[inds]
        if self.task == "none":
            return xs, None
        keys = jax.random.split(key, num=inds.shape[0])
        ys = jax.vmap(self.corrupt)(keys, xs)
        return xs, ys

    def enumerate_subset(self, i: int, perm_inds=None, key=None):
        if perm_inds is None:
            perm_inds = self.perm_inds
        return self._enumerate_jit(perm_inds[i], key)

    @staticmethod
    def concat(x: JArray, y: JArray, expand: bool = False) -> JArray:
        if expand:
            return jnp.concatenate([jnp.expand_dims(x, -1), jnp.expand_dims(y, -1)], axis=-1)
        return jnp.concatenate([x, y], axis=-1)

    def unpack(self, xy: JArray) -> Tuple[JArray, JArray]:
        c = self.image_shape[-1]
        return xy[..., :c], xy[..., c:]


class MNIST(Image):
    """MNIST from an npz with ``X``/``X_test`` keys, shape (n, 784)."""

    def __init__(self, key: JKey, data_path: str, task: str = "deconv-15",
                 test: bool = False):
        data_dict = jnp.load(data_path)
        self.task = task
        xs = data_dict["X_test" if test else "X"]
        self.n = xs.shape[0]  # 10000/60000 of record; derived so subsets work
        xs = jax.random.permutation(key, xs, axis=0)
        xs = jnp.reshape(xs, (self.n, 28, 28, 1))
        self.xs = self.standardise(xs).astype("float32")
        self.image_shape = (28, 28, 1)


class CIFAR10(Image):
    def __init__(self, key: JKey, data_path: str, task: str = "supr",
                 test: bool = False):
        data_dict = jnp.load(data_path)
        self.task = task
        xs = data_dict["test_data" if test else "train_data"]
        self.n = xs.shape[0]  # 10000/50000 of record; derived so subsets work
        xs = jax.random.permutation(key, xs, axis=0)
        self.xs = self.standardise(jnp.reshape(xs, (self.n, 32, 32, 3)))
        self.image_shape = (32, 32, 3)


class CelebAHQ(Image):
    def __init__(self, key: JKey, data_path: str, resolution: int = 64,
                 task: str = "supr", test: bool = False):
        self.task = task
        data = jnp.load(data_path)
        data = jax.random.permutation(key, data, axis=0)
        data = self.standardise(data)
        ntest = min(1000, max(1, data.shape[0] // 2))
        self.xs = data[:ntest] if test else data[ntest:]
        self.n = self.xs.shape[0]
        self.image_shape = (resolution, resolution, 3)


class InpaintingMask(NamedTuple):
    """Ravelled index split of unobserved (painted) and observed pixels."""
    width: int
    height: int
    shift: JArray
    unobs_inds_ravelled: JArray
    obs_inds_ravelled: JArray


class SRMask(NamedTuple):
    rate: int
    unobs_inds_ravelled: JArray
    obs_inds_ravelled: JArray


def _complement(present_ravelled: JArray, total: int, size: int) -> JArray:
    """Sorted complement of a set of ravelled indices — jittable replacement
    for ``jnp.setdiff1d(arange(total), present, size=size)``.

    A stable argsort of the boolean membership mask lists the absent indices
    first, in ascending order.
    """
    member = jnp.zeros((total,), dtype=bool).at[present_ravelled].set(True)
    order = jnp.argsort(member, stable=True)
    return order[:size]


class ImageRestore(Dataset):
    """x = unobserved pixels, y = observed pixels — the representation all
    image experiments use (reference ``images.py:228-363``)."""
    image_shape: Tuple[int, int, int]
    task: str
    unobs_shape: Tuple[int, int]
    sr_random: bool = True

    def __init__(self, task: str, image_shape: Tuple[int, int, int], sr_random: bool = True):
        self.image_shape = image_shape
        self.task = task

        w, h, c = image_shape
        s = int(task.split("-")[-1])
        if "inpaint" in task:
            self.unobs_shape = (s ** 2, c)
        elif "supr" in task:
            self.unobs_shape = (int(w * h * (s ** 2 - 1) / s ** 2), c)
        else:
            raise ValueError(f"Unknown task {task}.")
        self.sr_random = sr_random

    @classmethod
    def from_array(cls, xs: Array, task: str, sr_random: bool = True) -> "ImageRestore":
        """Construct directly from an image array (n, w, h, c) — used by
        tests and benchmarks without data files on disk."""
        self = cls.__new__(cls)
        ImageRestore.__init__(self, task, tuple(xs.shape[1:]), sr_random)
        self.xs = jnp.asarray(xs)
        self.n = xs.shape[0]
        return self

    @staticmethod
    def standardise(array: Array) -> JArray:
        return array

    def enumerate_subset(self, i: int, perm_inds=None, key=None) -> JArray:
        if perm_inds is None:
            perm_inds = self.perm_inds
        return self.xs[perm_inds[i]]

    def _gen_supr_mask(self, key: JKey, rate: int, random: bool = True) -> SRMask:
        """One observed pixel per rate x rate block, at a random (or centre)
        in-block shift.  Fully jittable."""
        img_w, img_h = self.image_shape[:2]
        nblocks = int(img_w * img_h / rate ** 2)
        if random:
            shifts = jax.random.randint(key, (nblocks, 2), 0, rate)
        else:
            shifts = jnp.full((nblocks, 2), rate // 2, dtype=jnp.int32)

        block_origins = jnp.asarray(list(itertools.product(range(0, img_w, rate),
                                                           range(0, img_h, rate))))
        rows = jnp.clip(block_origins[:, 0] + shifts[:, 0], 0, img_w - 1)
        cols = jnp.clip(block_origins[:, 1] + shifts[:, 1], 0, img_h - 1)
        obs_inds = rows * img_h + cols
        unobs_inds = _complement(obs_inds, img_w * img_h, img_w * img_h - nblocks)
        return SRMask(rate, unobs_inds_ravelled=unobs_inds, obs_inds_ravelled=obs_inds)


    def _gen_inpaint_mask(self, key: JKey, width: int, height: int) -> InpaintingMask:
        """Random-shift square occlusion.  Fully jittable (the reference's
        version is not, ``images.py:284-302``)."""
        img_w, img_h = self.image_shape[:2]
        width, height = min(width, img_w), min(height, img_h)

        max_shift = min(img_w, img_h) - max(width, height)
        shift = jax.random.randint(key, (), 0, max_shift)

        rect = jnp.asarray(list(itertools.product(range(width), range(height))))
        rows = jnp.clip(rect[:, 0] + shift, 0, img_w - 1)
        cols = jnp.clip(rect[:, 1] + shift, 0, img_h - 1)
        unobs_inds = rows * img_h + cols
        obs_inds = _complement(unobs_inds, img_w * img_h, img_w * img_h - width * height)
        return InpaintingMask(width, height, shift,
                              unobs_inds_ravelled=unobs_inds, obs_inds_ravelled=obs_inds)

    def gen_mask(self, key: JKey) -> Union[InpaintingMask, SRMask]:
        s = int(self.task.split("-")[-1])
        if "inpaint" in self.task:
            return self._gen_inpaint_mask(key, s, s)
        if "supr" in self.task:
            return self._gen_supr_mask(key, s, random=self.sr_random)
        raise ValueError(f"Unknown task {self.task}.")

    def sampler(self, key: JKey) -> Tuple[JArray, JArray, Union[InpaintingMask, SRMask]]:
        """Draw (true image, observed part, mask)."""
        key_choice, key_corrupt = jax.random.split(key)
        x = self.xs[jax.random.choice(key_choice, self.n)]
        mask = self.gen_mask(key_corrupt)
        _, y = self.unpack(x, mask)
        return x, y, mask

    def unpack(self, xy: JArray, mask: Union[InpaintingMask, SRMask]) -> Tuple[JArray, JArray]:
        """Split an image batch into (unobserved, observed) pixel gathers
        (reference ``images.py:333-353``)."""
        img_w, img_h, img_c = self.image_shape
        xy_ravelled = jnp.reshape(xy, (*xy.shape[:-3], img_w * img_h, img_c))
        x = xy_ravelled[..., mask.unobs_inds_ravelled, :]
        y = xy_ravelled[..., mask.obs_inds_ravelled, :]
        return x, y

    def concat(self, x: JArray, y: JArray, mask: Union[InpaintingMask, SRMask]) -> JArray:
        """Scatter (x, y) back into an image — inverse of :meth:`unpack`."""
        img_w, img_h, img_c = self.image_shape
        img = jnp.zeros((*x.shape[:-2], img_w * img_h, img_c), dtype=x.dtype)
        img = img.at[..., mask.unobs_inds_ravelled, :].set(x)
        img = img.at[..., mask.obs_inds_ravelled, :].set(y)
        return img.reshape(*img.shape[:-2], img_w, img_h, img_c)


class MNISTRestore(ImageRestore):
    def __init__(self, key: JKey, data_path: str, task: str = "inpaint-15",
                 test: bool = False):
        data_dict = jnp.load(data_path)
        self.task = task
        xs = data_dict["X_test" if test else "X"]
        self.n = xs.shape[0]  # 10000/60000 of record; derived so subsets work
        xs = jax.random.permutation(key, xs, axis=0)
        xs = jnp.reshape(xs, (self.n, 28, 28, 1))
        self.xs = self.standardise(xs).astype("float32")
        super().__init__(task, (28, 28, 1))


class CelebAHQRestore(ImageRestore):
    def __init__(self, key: JKey, data_path: str, resolution: int = 64,
                 task: str = "supr-4", test: bool = False):
        self.task = task
        data = jnp.load(data_path)
        data = jax.random.permutation(key, data, axis=0)
        data = self.standardise(data).astype("float32")
        ntest = min(1000, max(1, data.shape[0] // 2))
        self.xs = data[:ntest] if test else data[ntest:]
        self.n = self.xs.shape[0]
        super().__init__(task, (resolution, resolution, 3))


def normalise(img: JArray, method: str = "clip") -> JArray:
    if method == "clip":
        return jnp.clip(img, 0.0, 1.0)
    mins = jnp.min(img, axis=[-2, -3], keepdims=True)
    maxs = jnp.max(img, axis=[-2, -3], keepdims=True)
    return (img - mins) / (maxs - mins)
