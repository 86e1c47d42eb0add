"""Validation DSM loss across committed CelebA-64 checkpoints (CPU).

Round 5 samples the CelebA-64 table rows from a pinned epoch rather than the
reference's 2999 (`/root/reference/experiments/bashes/imgs_gibbs.sh:37` pins
`test_epoch=2999` after a 42-h A100 run).  This script produces the committed
quality justification: the held-out denoising-score-matching loss (the
training objective, fixed keys, fixed test batch) as a function of epoch.
If the curve is flat at the pin, later epochs change the score model little
and the table rows are representative.

Runs on CPU so it never competes with the chip queue.
"""
import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.append(os.path.join(os.path.dirname(__file__), ".."))
sys.path.append(os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    os.environ.setdefault("FBS_PLATFORM", "cpu")
    from fbs_tpu.compile_cache import enable as enable_compile_cache
    enable_compile_cache()

    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, default="celeba-64")
    parser.add_argument("--sde", type=str, default="lin")
    parser.add_argument("--epoch_stride", type=int, default=100)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--nkeys", type=int, default=2,
                        help="MC keys per checkpoint (same keys for all).")
    parser.add_argument("--out", type=str, default=None)
    args = parser.parse_args()

    from common import resolve_dataset, resolve_sde
    from fbs_tpu.checkpoints import load_params_npz
    from fbs_tpu.nn import UNet, make_st_nn
    from fbs_tpu.sdes import make_linear_sde_law_loss

    T = 2.0
    key = jax.random.PRNGKey(999)
    key, subkey = jax.random.split(key)
    dataset, resolution, nchannels = resolve_dataset(args, subkey, "inpaint-15",
                                                     test=True)
    sde = resolve_sde(args, T)

    key, subkey = jax.random.split(key)
    unet = UNet(dt=T / 200, dim=64, upsampling="pixel_shuffle",
                compute_dtype=jnp.float32)
    _, _, nn_score = make_st_nn(subkey, unet, dataset.image_shape,
                                batch_size=args.batch_size)
    loss_fn = jax.jit(make_linear_sde_law_loss(
        sde, nn_score, t0=0.0, T=T, nsteps=256, random_times=True,
        loss_type="score", save_mem=True))

    # One fixed held-out batch + fixed loss keys => comparable across epochs.
    x0s = dataset.draw_subset(jax.random.PRNGKey(4), args.batch_size)
    loss_keys = jax.random.split(jax.random.PRNGKey(5), args.nkeys)

    ck_dir = os.path.join(os.path.dirname(__file__), "..", "checkpoints")
    prefix = f"{args.dataset}_{args.sde}_"
    epochs = sorted(int(f[len(prefix):-4]) for f in os.listdir(ck_dir)
                    if f.startswith(prefix) and f.endswith(".npz")
                    and not f.endswith("_ema.npz") and not f.endswith("_full.npz")
                    and f[len(prefix):-4].isdigit())
    picked = [e for i, e in enumerate(epochs)
              if (e + 1) % args.epoch_stride == 0 or i == len(epochs) - 1]

    rows = []
    for ep in picked:
        param = load_params_npz(os.path.join(ck_dir, f"{prefix}{ep}.npz"),
                                use_ema=True)
        losses = [float(loss_fn(param, k, x0s)) for k in loss_keys]
        rows.append((ep, float(np.mean(losses))))
        print(f"epoch {ep:4d}: val DSM loss {np.mean(losses):.4f}", flush=True)

    out = args.out or os.path.join(os.path.dirname(__file__), "..", "..",
                                   "docs", "measurements",
                                   f"{args.dataset}_epoch_pin.md")
    best = min(rows, key=lambda r: r[1])
    last = rows[-1]
    with open(out, "w") as f:
        f.write(f"# {args.dataset} checkpoint quality vs epoch\n\n"
                "Held-out DSM loss (training objective; fixed batch of "
                f"{args.batch_size} test images, {args.nkeys} fixed keys, EMA "
                "params) per committed checkpoint — the quality justification "
                "for pinning the table-row sampling epoch below the "
                "reference's 2999.\n\n| epoch | val DSM loss |\n|---|---|\n")
        for ep, l in rows:
            f.write(f"| {ep} | {l:.4f} |\n")
        f.write(f"\nBest: epoch {best[0]} ({best[1]:.4f}); latest: epoch "
                f"{last[0]} ({last[1]:.4f}).\n")
    print(json.dumps({"rows": rows, "out": out}))


if __name__ == "__main__":
    main()
