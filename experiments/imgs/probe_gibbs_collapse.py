"""Isolate the CelebA-64 supr-2 Gibbs-chain collapse (round 5).

Observed on chip (bf16, K=1000, multi-y0 path): the Gibbs chain's first
sweep restores ~31 dB, every later sweep is ~8 dB uniform noise
(`results_supr/celeba-64-2-lin-10-*-gibbs-eb-ef.npy`).  On CPU in f32 the
SAME model/config at K=100 is stable and improving for both the sequential
and the vmapped multi-y0 paths (init 27.4/27.2 -> sweep2 29.0/28.7).

This probe runs the production configuration (K=1000, N=10, multi-y0 path)
on the chip with the compute dtype as the ONE axis: --bf16 on or off.
If f32 is stable and bf16 collapses, the fix for the CelebA tables is to
sample the 64^2 Gibbs rows in f32 (2x cost, still far inside the envelope).

Writes to its own artifact dir so the committed table rows are untouched.
"""
import argparse
import sys
import os
import types

import jax
import jax.numpy as jnp
import numpy as np

sys.path.append(os.path.join(os.path.dirname(__file__)))
sys.path.append(os.path.join(os.path.dirname(__file__), ".."))
sys.path.append(os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    from fbs_tpu.compile_cache import enable as enable_compile_cache
    enable_compile_cache()

    parser = argparse.ArgumentParser()
    parser.add_argument("--bf16", action="store_true", default=False)
    parser.add_argument("--test_nsteps", type=int, default=1000)
    parser.add_argument("--ny0s", type=int, default=2)
    parser.add_argument("--nsweeps", type=int, default=5)
    parser.add_argument("--nparticles", type=int, default=10)
    args_cli = parser.parse_args()

    from common import resolve_dataset, resolve_sde, load_score_network
    from fbs_tpu.applications import RestorationSampler

    args = types.SimpleNamespace(dataset="celeba-64", sde="lin",
                                 test_nsteps=args_cli.test_nsteps,
                                 test_epoch=949, test_ema=True, test_seed=996,
                                 bf16=args_cli.bf16,
                                 nparticles=args_cli.nparticles, unet_dim=64,
                                 fused_resblock=False, fused_linear_attn=False,
                                 fused_norms=False)
    T = 2.0
    key = jax.random.PRNGKey(args.test_seed)
    key, subkey = jax.random.split(key)
    dataset, res, nch = resolve_dataset(args, subkey, "supr-2", test=True)
    sde = resolve_sde(args, T)
    key, subkey = jax.random.split(key)
    nn_score, param = load_score_network(args, subkey, (res, res, nch), T)
    sampler = RestorationSampler(dataset=dataset, sde=sde, nn_score=nn_score,
                                 param=param, T=T, nsteps=args.test_nsteps,
                                 nparticles=args.nparticles)

    V = args_cli.ny0s
    data_key = jax.random.PRNGKey(7)
    batch = []
    for _ in range(V):
        data_key, subkey = jax.random.split(data_key)
        batch.append(dataset.sampler(subkey))
    y0s = jnp.stack([b[1] for b in batch])
    masks = sampler.stack_masks([b[2] for b in batch])
    trues = [b[0] for b in batch]

    key, subkey = jax.random.split(key)
    x0s, us_stars = sampler.gibbs_init_multi(subkey, y0s, masks,
                                             method="smoother")
    bs_stars = jnp.zeros((V, args.test_nsteps + 1), dtype=int)

    def psnrs(x0s_):
        out = []
        for j in range(V):
            img = dataset.concat(x0s_[j], y0s[j], batch[j][2])
            out.append(float(-10 * jnp.log10(
                jnp.mean((jnp.clip(img, 0, 1) - trues[j]) ** 2))))
        return np.round(out, 2)

    tag = "bf16" if args_cli.bf16 else "f32"
    print(f"[{tag}] init PSNRs: {psnrs(x0s)}", flush=True)
    for sweep in range(args_cli.nsweeps):
        key, x0s, us_stars, bs_stars, draws, accs = sampler.gibbs_sweeps_multi(
            key, x0s, y0s, us_stars, bs_stars, masks, 1,
            explicit_backward=True, explicit_final=True)
        print(f"[{tag}] sweep {sweep}: PSNRs {psnrs(x0s)} "
              f"acc={np.asarray(accs).mean():.3f}", flush=True)


if __name__ == "__main__":
    main()
