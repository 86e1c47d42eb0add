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

from fbs_tpu.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()


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
    p.add_argument("--unet_dim", type=int, default=64,
                   help="Base channel count of the score UNet (64 of record).")
    p.add_argument("--bf16", action="store_true", default=False,
                   help="Run the score UNet in bfloat16 on the MXU.")
    p.add_argument("--no_fused", action="store_true", default=False,
                   help="Disable the fused transition+likelihood kernel.")
    p.add_argument("--no_ws_frozen", action="store_true", default=False,
                   help="Recompute weight standardisation per forward instead "
                        "of pre-applying it to the frozen sampling params.")
    p.add_argument("--fused_linear_attn", action="store_true", default=False,
                   help="Whole-gate Pallas linear attention (sampling only).")
    p.add_argument("--fused_resblock", action="store_true", default=False,
                   help="Whole-ResBlock Pallas kernel on the score forward "
                        "(sampling only; requires ws_frozen).")
    p.add_argument("--shard_particles", action="store_true", default=False,
                   help="Shard the particle axis over all local devices.")
    p.add_argument("--sweeps_per_dispatch", type=int, default=10,
                   help="MCMC iterations per device dispatch (lax.scan chunk). "
                        "Keeps the host loop off the hot path; key sequence "
                        "is identical to one-iteration dispatches.")
    p.add_argument("--save_png_every", type=int, default=10,
                   help="Save a per-iteration PNG every this many iterations "
                        "(0: only the final one). The npy sample stack always "
                        "contains every iteration.")
    p.add_argument("--y0s_per_dispatch", type=int, default=1,
                   help="Run this many y0 chains vmapped in one device "
                        "program (batch per score eval = y0s * particles; "
                        "the throughput knob for small particle counts).")
    p.add_argument("--samples_per_dispatch", type=int, default=1,
                   help="One-shot baselines (twisted/csgm): draw this many "
                        "independent samples vmapped per dispatch.")
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
    from fbs_tpu.nn import (UNet, make_st_nn, default_compute_dtype,
                            standardize_ws_kernels)

    dtype = default_compute_dtype() if args.bf16 else jnp.float32
    # Parameters are frozen for the whole sampling program, so weight
    # standardisation is pre-applied once (bitwise identical; skips the
    # per-forward f32 kernel statistics on every one of the K*N score evals).
    ws_frozen = not getattr(args, "no_ws_frozen", False)
    fused_rb = getattr(args, "fused_resblock", False)
    fused_la = getattr(args, "fused_linear_attn", False)
    unet = UNet(dt=T / 200, dim=args.unet_dim, upsampling="pixel_shuffle",
                compute_dtype=dtype, ws_frozen=ws_frozen,
                fused_resblock=fused_rb, fused_linear_attn=fused_la)
    _, array_to_dict, nn_score = make_st_nn(key, unet, image_shape, batch_size=2)

    from fbs_tpu.checkpoints import load_params_npz

    filename = f"./checkpoints/{args.dataset}_{args.sde}_{args.test_epoch}.npz"
    param = load_params_npz(filename, use_ema=args.test_ema)
    if ws_frozen:
        from jax.flatten_util import ravel_pytree

        param = ravel_pytree(standardize_ws_kernels(array_to_dict(param)))[0]
    return nn_score, param


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


def save_true_artifacts(head: str, test_img, test_y0, mask, dataset, nchannels) -> None:
    """Write the per-y0 truth artifacts the tabulators consume: ``-true.png``,
    ``-true.npz`` (``test_img`` + mask arrays, reference
    ``experiments/imgs/inpainting.py:215-216``) and ``-corrupt.png``."""
    save_image(head + "-true.png", test_img, nchannels)
    np.savez(head + "-true", *[np.asarray(m) for m in mask],
             test_img=np.asarray(test_img))
    save_image(head + "-corrupt.png",
               dataset.concat(jnp.zeros(dataset.unobs_shape), test_y0, mask),
               nchannels)


def run_restoration(args, task: str, results_dir: str, size_tag) -> None:
    """Shared conditional-sampling loop for inpainting and super-resolution.

    Mirrors the reference's per-y0 artifact contract
    (``/root/reference/experiments/imgs/inpainting.py:205-264``): per-iteration
    PNGs, a ``<head>-true.npz`` with the clean image under ``test_img`` plus
    the mask arrays (positional), a ``<head>-gibbs-init`` npy+png, and the
    ``<head>-<method>.npy`` sample stack consumed by
    ``tabulators/tabulate_imgs.py``.
    """
    sampler, dataset, (key, data_key), resolution, nchannels = build_sampler(args, task)
    if getattr(args, "sr_random", None) is not None:
        dataset.sr_random = args.sr_random
    nsteps = args.test_nsteps
    nsamples = args.nsamples

    delta = None
    if "pmcmc" in args.method and len(args.method.split("-")) > 1:
        delta = float(args.method.split("-")[-1])
    eb = "eb" in args.method
    ef = "ef" in args.method

    if getattr(args, "y0s_per_dispatch", 1) > 1:
        return _run_restoration_multi(args, task, results_dir, size_tag,
                                      sampler, dataset,
                                      (key, data_key), resolution, nchannels,
                                      delta, eb, ef)

    for k in range(args.ny0s):
        data_key, subkey = jax.random.split(data_key)
        if k < args.start_from:
            continue
        print(f"Running conditional sampler for {k}-th test sample.")
        test_img, test_y0, mask = dataset.sampler(subkey)
        head = f"{results_dir}/{args.dataset}-{size_tag}-{args.sde}-{args.nparticles}-{k}"
        save_true_artifacts(head, test_img, test_y0, mask, dataset, nchannels)

        restored_imgs = np.zeros((nsamples, resolution, resolution, nchannels))
        chunk = max(1, args.sweeps_per_dispatch)
        png_every = args.save_png_every

        def flush(i0, x0s, tag):
            """Write the chunk's draws into the stack + periodic PNGs."""
            imgs = np.asarray(jax.vmap(lambda x: dataset.concat(x, test_y0, mask))(x0s))
            restored_imgs[i0:i0 + imgs.shape[0]] = imgs
            for i in range(i0, i0 + imgs.shape[0]):
                if (png_every and i % png_every == 0) or i == nsamples - 1:
                    save_image(head + f"-{tag}-{i}.png", imgs[i - i0], nchannels)

        if args.method == "filter":
            for i0 in range(0, nsamples, chunk):
                m = min(chunk, nsamples - i0)
                key, x0s = sampler.filter_draws(key, test_y0, mask, m,
                                                marg_y=args.marg)
                flush(i0, x0s, "filter")
                print(f"{task} | filter | iters {i0}..{i0 + m - 1}")
            np.save(head + "-filter", restored_imgs)
        elif "gibbs" in args.method:
            key, subkey = jax.random.split(key)
            x0, us_star = sampler.gibbs_init(subkey, test_y0, mask,
                                             method=args.init_method, marg_y=args.marg)
            bs_star = jnp.zeros((nsteps + 1,), dtype=int)
            restored = dataset.concat(x0, test_y0, mask)
            save_image(head + "-gibbs-init.png", restored, nchannels)
            np.save(head + "-gibbs-init", np.asarray(restored))
            for i0 in range(0, nsamples, chunk):
                m = min(chunk, nsamples - i0)
                key, x0, us_star, bs_star, x0s, accs = sampler.gibbs_sweeps(
                    key, x0, test_y0, us_star, bs_star, mask, m,
                    explicit_backward=eb, explicit_final=ef, marg_y=args.marg)
                flush(i0, x0s, args.method)
                print(f"{task} | Gibbs | iters {i0}..{i0 + m - 1}, "
                      f"acc: {float(jnp.mean(accs)):.3f}")
            np.save(head + f"-{args.method}", restored_imgs)
        elif "pmcmc" in args.method:
            key, subkey = jax.random.split(key)
            x0, log_ell = jnp.zeros(dataset.unobs_shape), 0.0
            ys = sampler.fwd_ys_sampler(subkey, test_y0)
            for i0 in range(0, nsamples, chunk):
                m = min(chunk, nsamples - i0)
                key, x0, log_ell, ys, x0s, acc_probs = sampler.pmcmc_sweeps(
                    key, x0, log_ell, ys, test_y0, mask, m, delta=delta)
                flush(i0, x0s, f"pmcmc-{delta}")
                print(f"{task} | pMCMC {delta} | iters {i0}..{i0 + m - 1}, "
                      f"mean acc_prob: {float(jnp.mean(acc_probs)):.3f}")
            np.save(head + f"-pmcmc-{delta}", restored_imgs)
        else:
            raise ValueError(f"Unknown method {args.method}")


def _run_restoration_multi(args, task, results_dir, size_tag, sampler, dataset,
                           keys, resolution, nchannels, delta, eb, ef):
    """Vmapped-over-y0 restoration loop: V chains advance together in one
    device program per chunk (``RestorationSampler.*_multi``).

    Same y0/mask sequence as the sequential path (data keys split per y0 id);
    the MCMC key streams differ from the sequential path (one stream per
    chain) but the targets/configs are identical.  Artifact contract is
    unchanged: per-y0 ``-true.npz`` / ``-<method>.npy`` / periodic PNGs.
    """
    key, data_key = keys
    nsteps = args.test_nsteps
    nsamples = args.nsamples
    V = args.y0s_per_dispatch
    chunk = max(1, args.sweeps_per_dispatch)
    png_every = args.save_png_every

    # Draw the y0 sequence exactly as the sequential loop would.
    todo = []  # (k, test_img, y0, mask)
    for k in range(args.ny0s):
        data_key, subkey = jax.random.split(data_key)
        if k < args.start_from:
            continue
        todo.append((k, *dataset.sampler(subkey)))

    for b0 in range(0, len(todo), V):
        batch = todo[b0:b0 + V]
        v = len(batch)
        ks = [b[0] for b in batch]
        heads = [f"{results_dir}/{args.dataset}-{size_tag}-{args.sde}-"
                 f"{args.nparticles}-{k}" for k in ks]
        for head, (k, test_img, y0, mask) in zip(heads, batch):
            save_true_artifacts(head, test_img, y0, mask, dataset, nchannels)
        y0s = jnp.stack([b[2] for b in batch])
        masks = sampler.stack_masks([b[3] for b in batch])
        print(f"Running conditional sampler for y0s {ks} (vmapped).")

        stacks = np.zeros((v, nsamples, resolution, resolution, nchannels))

        def flush(i0, draws, tag):
            # draws: (m, v, *x_shape) -> per-y0 restored images.
            m = draws.shape[0]
            for j, (head, (k, _, y0_j, mask_j)) in enumerate(zip(heads, batch)):
                imgs = np.asarray(jax.vmap(
                    lambda x: dataset.concat(x, y0_j, mask_j))(draws[:, j]))
                stacks[j, i0:i0 + m] = imgs
                for i in range(i0, i0 + m):
                    if (png_every and i % png_every == 0) or i == nsamples - 1:
                        save_image(head + f"-{tag}-{i}.png", imgs[i - i0],
                                   nchannels)

        if args.method == "filter":
            for i0 in range(0, nsamples, chunk):
                m = min(chunk, nsamples - i0)
                key, draws = sampler.filter_draws_multi(key, y0s, masks, m,
                                                        marg_y=args.marg)
                flush(i0, np.asarray(draws), "filter")
                print(f"{task} | filter x{v} | iters {i0}..{i0 + m - 1}")
            tag = "filter"
        elif "gibbs" in args.method:
            key, subkey = jax.random.split(key)
            x0s, us_stars = sampler.gibbs_init_multi(subkey, y0s, masks,
                                                     method=args.init_method,
                                                     marg_y=args.marg)
            bs_stars = jnp.zeros((v, nsteps + 1), dtype=int)
            for j, (head, (k, _, y0_j, mask_j)) in enumerate(zip(heads, batch)):
                restored = dataset.concat(x0s[j], y0_j, mask_j)
                save_image(head + "-gibbs-init.png", restored, nchannels)
                np.save(head + "-gibbs-init", np.asarray(restored))
            for i0 in range(0, nsamples, chunk):
                m = min(chunk, nsamples - i0)
                key, x0s, us_stars, bs_stars, draws, accs = \
                    sampler.gibbs_sweeps_multi(key, x0s, y0s, us_stars,
                                               bs_stars, masks, m,
                                               explicit_backward=eb,
                                               explicit_final=ef,
                                               marg_y=args.marg)
                flush(i0, np.asarray(draws), args.method)
                print(f"{task} | Gibbs x{v} | iters {i0}..{i0 + m - 1}, "
                      f"acc: {float(jnp.mean(accs)):.3f}")
            tag = args.method
        elif "pmcmc" in args.method:
            key, subkey = jax.random.split(key)
            x0s = jnp.zeros((v, *dataset.unobs_shape))
            log_ells = jnp.zeros((v,))
            yss = jax.jit(jax.vmap(sampler.fwd_ys_sampler))(
                jax.random.split(subkey, v), y0s)
            for i0 in range(0, nsamples, chunk):
                m = min(chunk, nsamples - i0)
                key, x0s, log_ells, yss, draws, acc_probs = \
                    sampler.pmcmc_sweeps_multi(key, x0s, log_ells, yss, y0s,
                                               masks, m, delta=delta)
                flush(i0, np.asarray(draws), f"pmcmc-{delta}")
                print(f"{task} | pMCMC {delta} x{v} | iters {i0}..{i0 + m - 1}, "
                      f"mean acc_prob: {float(jnp.mean(acc_probs)):.3f}")
            tag = f"pmcmc-{delta}"
        else:
            raise ValueError(f"Unknown method {args.method} for vmapped y0s")

        for j, head in enumerate(heads):
            np.save(head + f"-{tag}", stacks[j])


def run_oneshot_baseline(args, task: str, results_dir: str, size_tag, tag: str,
                         draw_image_fn, dataset, keys, resolution, nchannels):
    """Shared loop for the one-shot baselines (twisted SMC / CSGM).

    ``draw_image_fn(subkey, y0, mask) -> (H, W, C) image``.  Samples are
    independent, so ``--samples_per_dispatch`` of them run vmapped in one
    device program (the reference evaluates the score on a batch of ONE per
    sample, ``/root/reference/experiments/imgs/inpainting_csgm.py:104-116``).
    Per-sample key sequence matches the sequential loop.
    """
    key, data_key = keys
    nsamples = args.nsamples
    spb = max(1, getattr(args, "samples_per_dispatch", 1))
    png_every = getattr(args, "save_png_every", 10)
    draw_many = jax.jit(jax.vmap(draw_image_fn, in_axes=(0, None, None)))

    for k in range(args.ny0s):
        data_key, subkey = jax.random.split(data_key)
        if k < args.start_from:
            continue
        print(f"Running {tag} sampler for {k}-th test sample.")
        test_img, test_y0, mask = dataset.sampler(subkey)
        head = f"{results_dir}/{args.dataset}-{size_tag}-{args.sde}-{args.nparticles}-{k}"
        save_true_artifacts(head, test_img, test_y0, mask, dataset, nchannels)

        restored_imgs = np.zeros((nsamples, resolution, resolution, nchannels))
        for i0 in range(0, nsamples, spb):
            m = min(spb, nsamples - i0)
            subs = []
            for _ in range(m):
                key, sub = jax.random.split(key)
                subs.append(sub)
            imgs = np.asarray(draw_many(jnp.stack(subs), test_y0, mask))
            restored_imgs[i0:i0 + m] = imgs
            for i in range(i0, i0 + m):
                if (png_every and i % png_every == 0) or i == nsamples - 1:
                    save_image(head + f"-{tag}-{i}.png", imgs[i - i0], nchannels)
            print(f"{task} | {tag} | iters {i0}..{i0 + m - 1}")
        np.save(head + f"-{tag}", restored_imgs)
