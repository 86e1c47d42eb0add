r"""Score-model training for the image experiments.

TPU-native counterpart of reference ``experiments/imgs/train.py``: DSM loss
over random time grids, cosine/exp LR schedule, optional grad clipping and
EMA, flat-vector npz checkpoints — plus data-parallel sharding over all local
devices (``--dp``) and bf16 MXU compute (``--bf16``).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from experiments.imgs.common import resolve_dataset, resolve_sde


def main():
    parser = argparse.ArgumentParser(description="Training the forward noising model.")
    parser.add_argument("--dataset", type=str, default="mnist")
    parser.add_argument("--sde", type=str, default="lin")
    parser.add_argument("--upsampling", type=str, default="pixel_shuffle")
    parser.add_argument("--loss_type", type=str, default="score")
    parser.add_argument("--lr", type=float, default=2e-4)
    parser.add_argument("--batch_size", type=int, default=256)
    parser.add_argument("--nsteps", type=int, default=256)
    parser.add_argument("--schedule", type=str, default="cos")
    parser.add_argument("--nepochs", type=int, default=3000)
    parser.add_argument("--save_mem", action="store_true", default=False)
    parser.add_argument("--remat", action="store_true", default=False,
                        help="Recompute activations in backward (jax.checkpoint).")
    parser.add_argument("--grad_clip", action="store_true", default=False)
    parser.add_argument("--bf16", action="store_true", default=False)
    parser.add_argument("--dp", action="store_true", default=False,
                        help="Data-parallel over all local devices.")
    parser.add_argument("--init_from", type=str, default=None,
                        help="Warm-start from a (param, ema_param) npz checkpoint.")
    parser.add_argument("--start_epoch", type=int, default=0,
                        help="Epoch to resume from (offsets the LR schedule).")
    parser.add_argument("--checkpoint_every", type=int, default=100,
                        help="Save a (param, ema_param) npz every this many epochs.")
    args = parser.parse_args()

    from fbs_tpu.applications import train_score_model
    from fbs_tpu.nn import UNet, make_st_nn, default_compute_dtype
    from fbs_tpu.sdes import make_linear_sde_law_loss

    key = jax.random.PRNGKey(666)

    T = 2.0
    key, subkey = jax.random.split(key)
    dataset, resolution, nchannels = resolve_dataset(args, subkey, "inpaint-15", test=False)
    sde = resolve_sde(args, T)

    dtype = default_compute_dtype() if args.bf16 else jnp.float32
    key, subkey = jax.random.split(key)
    unet = UNet(dt=T / 200, dim=64, upsampling=args.upsampling, compute_dtype=dtype)
    init_param, _, nn_score = make_st_nn(subkey, unet, dataset.image_shape,
                                         batch_size=args.batch_size)

    loss_fn = make_linear_sde_law_loss(sde, nn_score, t0=0.0, T=T,
                                       nsteps=args.nsteps, random_times=True,
                                       loss_type=args.loss_type, save_mem=args.save_mem,
                                       remat=args.remat)

    mesh = None
    if args.dp:
        from fbs_tpu.parallel import make_mesh
        mesh = make_mesh(axis_names=("d",))

    init_ema_param = None
    if args.init_from is not None:
        from fbs_tpu.checkpoints import load_params_npz
        init_param = load_params_npz(args.init_from)
        init_ema_param = load_params_npz(args.init_from, use_ema=True)
        print(f"Warm-started from {args.init_from} at epoch {args.start_epoch}.")

    os.makedirs("./checkpoints", exist_ok=True)
    key, subkey = jax.random.split(key)
    param, ema_param = train_score_model(
        subkey, dataset, loss_fn, init_param,
        batch_size=args.batch_size, nepochs=args.nepochs,
        lr=args.lr, schedule=args.schedule, grad_clip=args.grad_clip,
        mesh=mesh, checkpoint_every=args.checkpoint_every,
        checkpoint_path="./checkpoints/" + args.dataset + "_" + args.sde + "_{epoch}.npz",
        init_ema_param=init_ema_param, start_epoch=args.start_epoch)

    np.savez(f"./checkpoints/{args.dataset}_{args.sde}_{args.nepochs - 1}.npz",
             param=param, ema_param=ema_param)
    print("Training done.")


if __name__ == "__main__":
    main()
