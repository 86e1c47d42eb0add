"""Shared setup for the image experiments: dataset/SDE/network loading.

Mirrors the configuration surface of the reference's
``experiments/imgs/*.py`` scripts; all sampler logic lives in
``fbs_tpu.applications.image_restore``.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--dataset", type=str, default="mnist",
                   help="mnist, celeba-64, celeba-128, or celeba-256.")
    p.add_argument("--sde", type=str, default="lin")
    p.add_argument("--test_nsteps", type=int, default=500)
    p.add_argument("--test_epoch", type=int, default=2999)
    p.add_argument("--test_ema", action="store_true", default=False)
    p.add_argument("--test_seed", type=int, default=666)
    p.add_argument("--ny0s", type=int, default=10)
    p.add_argument("--start_from", type=int, default=0)
    p.add_argument("--nparticles", type=int, default=100)
    p.add_argument("--nsamples", type=int, default=10)
    p.add_argument("--bf16", action="store_true", default=False,
                   help="Run the score UNet in bfloat16 on the MXU.")
    p.add_argument("--no_fused", action="store_true", default=False,
                   help="Disable the fused transition+likelihood kernel.")
    p.add_argument("--shard_particles", action="store_true", default=False,
                   help="Shard the particle axis over all local devices.")
    return p


def resolve_dataset(args, key, task: str, test: bool = True):
    from fbs_tpu.data import CelebAHQRestore, MNISTRestore

    name = args.dataset
    if name == "mnist":
        resolution, nchannels = 28, 1
        dataset = MNISTRestore(key, "./datasets/mnist.npz", task=task, test=test)
    elif "celeba" in name:
        resolution = int(name.split("-")[-1])
        nchannels = 3
        dataset = CelebAHQRestore(key, f"./datasets/celeba_hq{resolution}.npy",
                                  task=task, resolution=resolution, test=test)
    else:
        raise NotImplementedError(f"{name} not implemented.")
    return dataset, resolution, nchannels


def resolve_sde(args, T: float):
    from fbs_tpu.sdes import (StationaryConstLinearSDE, StationaryExpLinearSDE,
                              StationaryLinLinearSDE)

    if args.sde == "const":
        return StationaryConstLinearSDE(a=-0.5, b=1.0)
    if args.sde == "lin":
        return StationaryLinLinearSDE(beta_min=0.02, beta_max=5.0, t0=0.0, T=T)
    if args.sde == "exp":
        return StationaryExpLinearSDE(a=-0.5, b=1.0, c=1.0, z=1.0)
    raise NotImplementedError(f"SDE {args.sde} not implemented.")


def load_score_network(args, key, image_shape, T: float):
    from fbs_tpu.nn import UNet, make_st_nn, default_compute_dtype

    dtype = default_compute_dtype() if args.bf16 else jnp.float32
    unet = UNet(dt=T / 200, dim=64, upsampling="pixel_shuffle", compute_dtype=dtype)
    _, _, nn_score = make_st_nn(key, unet, image_shape, batch_size=2)

    filename = f"./checkpoints/{args.dataset}_{args.sde}_{args.test_epoch}.npz"
    param = np.load(filename)["ema_param" if args.test_ema else "param"]
    return nn_score, jnp.asarray(param)


def build_sampler(args, task: str, T: float = 2.0):
    from fbs_tpu.applications import RestorationSampler

    key = jax.random.PRNGKey(args.test_seed)
    key, data_key = jax.random.split(key)
    key, subkey = jax.random.split(key)
    dataset, resolution, nchannels = resolve_dataset(args, subkey, task)
    sde = resolve_sde(args, T)
    key, subkey = jax.random.split(key)
    nn_score, param = load_score_network(args, subkey, dataset.image_shape, T)

    mesh = None
    if args.shard_particles:
        from fbs_tpu.parallel import make_mesh
        mesh = make_mesh(axis_names=("p",))

    sampler = RestorationSampler(dataset=dataset, sde=sde, nn_score=nn_score,
                                 param=param, T=T, nsteps=args.test_nsteps,
                                 nparticles=args.nparticles,
                                 use_fused=not args.no_fused, mesh=mesh)
    return sampler, dataset, (key, data_key), resolution, nchannels


def save_image(path: str, img, nchannels: int):
    from fbs_tpu.data import normalise
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(os.path.dirname(path), exist_ok=True)
    img = normalise(img, method="clip")
    plt.imsave(path, np.asarray(img[..., 0] if nchannels == 1 else img),
               cmap="gray" if nchannels == 1 else "viridis")
