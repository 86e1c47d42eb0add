r"""Schrodinger-bridge (DSB-IPF) training for images.

TPU-native counterpart of reference ``experiments/sb_imgs/train.py``: two
UNet drifts trained by alternating IPF mean-matching regressions; checkpoints
keep the reference's ``(param_fwd, param_bwd)`` npz format.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from imgs.common import resolve_dataset, resolve_sde  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description="Training a Schrodinger bridge for images.")
    parser.add_argument("--dataset", type=str, default="mnist")
    parser.add_argument("--T", type=float, default=0.5)
    parser.add_argument("--sde", type=str, default="lin", help="The reference SDE.")
    parser.add_argument("--vmap_loss", action="store_true", default=False)
    parser.add_argument("--upsampling", type=str, default="pixel_shuffle")
    parser.add_argument("--lr", type=float, default=2e-4)
    parser.add_argument("--nn_dim", type=int, default=64)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--nsteps", type=int, default=32)
    parser.add_argument("--schedule", type=str, default="cos")
    parser.add_argument("--nepochs", type=int, default=10)
    parser.add_argument("--nsbs", type=int, default=10)
    parser.add_argument("--grad_clip", action="store_true", default=False)
    parser.add_argument("--bf16", action="store_true", default=False)
    parser.add_argument("--dp", action="store_true", default=False)
    parser.add_argument("--start_sb", type=int, default=0,
                        help="Warm-start: load the {start_sb-1} checkpoint and "
                             "continue IPF from iteration start_sb.")
    args = parser.parse_args()

    from fbs_tpu.applications import DSBTrainer
    from fbs_tpu.nn import UNet, make_st_nn, default_compute_dtype

    key = jax.random.PRNGKey(666)
    key, key_sb = jax.random.split(key)

    key, subkey = jax.random.split(key)
    dataset, resolution, nchannels = resolve_dataset(args, subkey, "inpaint-15", test=False)
    sde = resolve_sde(args, args.T)

    dtype = default_compute_dtype() if args.bf16 else jnp.float32
    key, subkey = jax.random.split(key)
    unet = UNet(dt=0.5 / 200, dim=args.nn_dim, upsampling=args.upsampling,
                compute_dtype=dtype)
    param_fwd, _, nn_drift = make_st_nn(subkey, unet, dataset.image_shape,
                                        batch_size=args.batch_size)
    param_bwd, _, _ = make_st_nn(subkey, unet, dataset.image_shape,
                                 batch_size=args.batch_size)

    mesh = None
    if args.dp:
        from fbs_tpu.parallel import make_mesh
        mesh = make_mesh(axis_names=("d",))

    trainer = DSBTrainer(dataset=dataset, sde=sde, nn_drift=nn_drift,
                         state_shape=dataset.image_shape, T=args.T,
                         train_nsteps=args.nsteps, batch_size=args.batch_size,
                         nepochs=args.nepochs, lr=args.lr, schedule=args.schedule,
                         grad_clip=args.grad_clip, vmap_loss=args.vmap_loss,
                         mesh=mesh)

    os.makedirs("./checkpoints", exist_ok=True)
    checkpoint_path = ("./checkpoints/sb_" + args.dataset + "_" + args.sde
                       + "_{sb_iter}.npz")
    if args.start_sb > 0:
        from fbs_tpu.checkpoints import load_sb_params_npz
        resume_from = checkpoint_path.format(sb_iter=args.start_sb - 1)
        param_fwd, param_bwd = load_sb_params_npz(resume_from)
        print(f"warm-started from {resume_from}")
    trainer.train(key_sb, param_fwd, param_bwd, nsbs=args.nsbs,
                  checkpoint_path=checkpoint_path, start_sb=args.start_sb)
    print("SB training done.")


if __name__ == "__main__":
    main()
