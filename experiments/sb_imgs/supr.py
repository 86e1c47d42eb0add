r"""MNIST super-resolution under a learned Schrodinger-bridge model.

TPU-native counterpart of reference ``experiments/sb_imgs/supr.py``: the
forward path is simulated with the *learned* forward drift (Euler-Maruyama),
the reverse drift is the learned backward drift, and the x0-initialisation
ablation covers random / blank / interpolated starts.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp

from fbs_tpu.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()
import numpy as np


def main():
    parser = argparse.ArgumentParser(description="SB super-resolution.")
    parser.add_argument("--rate", type=int, default=4)
    parser.add_argument("--sde", type=str, default="lin")
    parser.add_argument("--method", type=str, default="gibbs")
    parser.add_argument("--test_nsteps", type=int, default=128)
    parser.add_argument("--sb_step", type=int, default=9)
    parser.add_argument("--test_seed", type=int, default=666)
    parser.add_argument("--y0_id", type=int, default=10)
    parser.add_argument("--nparticles", type=int, default=100)
    parser.add_argument("--nsamples", type=int, default=100)
    parser.add_argument("--init_method", type=str, default="smoother")
    parser.add_argument("--bf16", action="store_true", default=False)
    args = parser.parse_args()

    from fbs_tpu.applications import RestorationSampler
    from fbs_tpu.data import MNISTRestore
    from fbs_tpu.nn import UNet, make_st_nn, default_compute_dtype
    from fbs_tpu.sdes import StationaryConstLinearSDE, StationaryLinLinearSDE, euler_maruyama

    resolution, nchannels = 28, 1
    T = 0.5
    nsteps = args.test_nsteps
    ts = jnp.linspace(0, T, nsteps + 1)

    key = jax.random.PRNGKey(args.test_seed)
    key, data_key = jax.random.split(key)

    key, subkey = jax.random.split(key)
    dataset = MNISTRestore(subkey, "./datasets/mnist.npz",
                           task=f"supr-{args.rate}", test=True)
    dataset.sr_random = False

    sde = (StationaryLinLinearSDE(beta_min=0.02, beta_max=5.0, t0=0.0, T=T)
           if args.sde == "lin" else StationaryConstLinearSDE(a=-0.5, b=1.0))

    dtype = default_compute_dtype() if args.bf16 else jnp.float32
    key, subkey = jax.random.split(key)
    unet = UNet(dt=0.5 / 200, dim=64, upsampling="pixel_shuffle", compute_dtype=dtype)
    _, _, nn_drift = make_st_nn(subkey, unet, (resolution, resolution, nchannels),
                                batch_size=2)

    from fbs_tpu.checkpoints import load_sb_params_npz

    param_fwd, param_bwd = load_sb_params_npz(
        f"./checkpoints/sb_mnist_{args.sde}_{args.sb_step}.npz")

    def reverse_drift(uv, t):
        return nn_drift(uv, T - t, param_bwd)

    def fwd_path_sampler(key_, xy0):
        return euler_maruyama(key_, xy0, ts,
                              lambda x, t: nn_drift(x, t, param_fwd),
                              sde.dispersion, integration_nsteps=1, return_path=True)

    sampler = RestorationSampler(dataset=dataset, sde=sde, nn_score=nn_drift,
                                 param=param_bwd, T=T, nsteps=nsteps,
                                 nparticles=args.nparticles,
                                 reverse_drift_override=reverse_drift,
                                 fwd_path_sampler_override=fwd_path_sampler)

    x_shape = dataset.unobs_shape
    low_res = resolution // args.rate

    def random_x0(key_, y0_, mask_):
        return jax.random.uniform(key_, x_shape)

    def blank_x0(key_, y0_, mask_):
        return jnp.zeros(x_shape)

    def interp_x0(key_, y0_, mask_):
        img = jax.image.resize(jnp.reshape(y0_, (low_res, low_res, nchannels)),
                               (resolution, resolution, nchannels), method="linear")
        return dataset.unpack(img, mask_)[0]

    from experiments.imgs.common import save_image

    data_key, subkey = jax.random.split(data_key)
    for _ in range(args.y0_id):
        data_key, subkey = jax.random.split(data_key)
    test_img, test_y0, mask = dataset.sampler(subkey)
    # Artifacts from deeper IPF models carry the depth tag so they never
    # overwrite the committed depth-0 stacks (round-4 naming kept for those).
    depth_tag = f"-sb{args.sb_step}" if args.sb_step > 0 else ""
    head = (f"./sb_imgs/results/mnist-{args.rate}-{args.sde}-"
            f"{args.nparticles}{depth_tag}-{args.y0_id}")
    save_image(head + "-true.png", test_img, nchannels)
    save_image(head + "-corrupt-lr.png",
               jnp.reshape(test_y0, (low_res, low_res, nchannels)), nchannels)

    restored_imgs = np.zeros((args.nsamples, resolution, resolution, nchannels))
    for x0_sampler, name in zip([random_x0, blank_x0, interp_x0],
                                ["random", "blank", "interp"]):
        if args.method == "filter":
            for i in range(args.nsamples):
                key, subkey = jax.random.split(key)
                x0 = x0_sampler(subkey, test_y0, mask)
                key, subkey = jax.random.split(key)
                x0, _ = sampler.gibbs_init(subkey, test_y0, mask, method="filter", x0=x0)
                restored = dataset.concat(x0, test_y0, mask)
                restored_imgs[i] = restored
                save_image(head + f"-filter-{name}-{i}.png", restored, nchannels)
                print(f"SB supr-{args.rate} | filter | {name} | iter: {i}")
            np.save(head + f"-filter-{name}", restored_imgs)
        elif "gibbs" in args.method:
            key, subkey = jax.random.split(key)
            x0 = x0_sampler(subkey, test_y0, mask)
            key, subkey = jax.random.split(key)
            x0, us_star = sampler.gibbs_init(subkey, test_y0, mask,
                                             method=args.init_method, x0=x0)
            bs_star = jnp.zeros((nsteps + 1,), dtype=int)
            for i in range(args.nsamples):
                key, subkey = jax.random.split(key)
                x0, us_star, bs_star, acc = sampler.gibbs_step(
                    subkey, x0, test_y0, us_star, bs_star, mask,
                    explicit_backward=True, explicit_final=True)
                restored = dataset.concat(x0, test_y0, mask)
                restored_imgs[i] = restored
                save_image(head + f"-gibbs-{name}-{i}.png", restored, nchannels)
                print(f"SB supr-{args.rate} | Gibbs | {name} | iter: {i}")
            np.save(head + f"-gibbs-{name}", restored_imgs)
        else:
            raise ValueError(f"Unknown method {args.method}")


if __name__ == "__main__":
    main()
