r"""PSNR/SSIM/LPIPS statistics for the image restoration experiments
(paper Tables 2-3).

TPU-native counterpart of reference ``experiments/tabulators/tabulate_imgs.py``,
with PSNR/SSIM computed by the native JAX implementations in
``fbs_tpu.metrics`` (batched on device) instead of per-image scikit-image
calls.  LPIPS (AlexNet) is optional: it needs the torch ``lpips`` package and
pretrained weights; absent those it is skipped with a note.
"""
import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import setup as _setup, experiments_dir as _expdir  # noqa: E402
_setup()
_EXP = _expdir()

import jax
import jax.numpy as jnp
import numpy as np

from fbs_tpu.data.images import normalise
from fbs_tpu.metrics import psnr, ssim


def _try_lpips():
    """Return ``(label, compute)`` — official torch lpips if importable, else
    the JAX port with converted official weights if the user dropped them at
    ``experiments/weights/lpips_alexnet.npz``, else the documented
    random-feature substitute (``fbs_tpu/metrics_lpips.py``)."""
    try:
        import lpips  # noqa: F401
        import torch

        net = lpips.LPIPS(net="alex")

        def compute(ref, img):
            def to_t(x):
                x = np.moveaxis(np.asarray(x, np.float32), -1, 0) * 2 - 1
                if x.shape[0] == 1:
                    x = np.repeat(x, 3, axis=0)
                return torch.tensor(x[None])

            with torch.no_grad():
                return float(net(to_t(ref), to_t(img)))

        return "LPIPS", compute
    except Exception:
        pass

    from fbs_tpu.metrics_lpips import lpips_distance, random_params

    weights_file = os.path.join(_EXP, "weights", "lpips_alexnet.npz")
    if os.path.exists(weights_file):
        loaded = np.load(weights_file)
        params = {k: jnp.asarray(loaded[k]) for k in loaded.files}
        label = "LPIPS"
    else:
        params = random_params(seed=0)
        label = "lpips-rand"  # NOT comparable to published LPIPS numbers

    def compute(ref, img):
        return float(lpips_distance(params, jnp.asarray(ref), jnp.asarray(img)))

    return label, compute


_TABLE_METHODS = ("gibbs-eb-ef", "gibbs-eb", "filter", "pmcmc-0.005", "twisted", "csgm")
_TABLE_NPARTICLES = (10, 100)

# Default table blocks, one per dataset: task -> corruption size, plus the
# particle-count column set.  Mirrors the reference's sweep
# (/root/reference/experiments/bashes/imgs_gibbs.sh:21-39): MNIST at
# inpaint-15/supr-4 with N in {10, 100}; CelebA-HQ-{64,128} at
# inpaint-{32,64}/supr-2 with N in {2, 10}.
_TABLE_BLOCKS = {
    "mnist": {"inpainting": 15, "supr": 4, "nparticles": (10, 100)},
    "celeba-64": {"inpainting": 32, "supr": 2, "nparticles": (2, 10)},
    "celeba-128": {"inpainting": 64, "supr": 2, "nparticles": (2, 10)},
}


def _cell(args, nparticles, method, psnr_j, ssim_j, lpips_fn):
    """Gather one (method, N) table cell; returns None when no artifacts exist."""
    psnrs, ssims, lpipss = [], [], []
    base = args.results_dir or f"{_EXP}/imgs/results_{args.task}"
    ny0s = args.ny0s
    if ny0s is None:
        pat = f"{base}/{args.dataset}-{args.size}-{args.sde}-{nparticles}-*-{method}.npy"
        suffix = f"-{method}.npy"
        ids = sorted(int(os.path.basename(p)[:-len(suffix)].split("-")[-1])
                     for p in glob.glob(pat))
        ny0s = (max(ids) + 1) if ids else 0
    for k in range(ny0s):
        head = f"{base}/{args.dataset}-{args.size}-{args.sde}-{nparticles}-{k}"
        truth_file = head + "-true.npz"
        sample_file = head + f"-{method}.npy"
        if not (os.path.exists(sample_file)):
            continue
        true_img = np.load(truth_file)["test_img"] if os.path.exists(truth_file) else None
        samples = np.load(sample_file)
        if true_img is None:
            continue
        # The reference clips both the truth and the restored samples to
        # [0, 1] before computing the metrics
        # (/root/reference/experiments/tabulators/tabulate_imgs.py:15-17,58-62)
        # — match that table definition.
        true_img = np.asarray(normalise(jnp.asarray(true_img), method="clip"))
        samples = np.clip(np.asarray(samples), 0.0, 1.0)
        psnrs.append(np.asarray(psnr_j(jnp.asarray(true_img), jnp.asarray(samples))))
        ssims.append(np.asarray(ssim_j(jnp.asarray(true_img), jnp.asarray(samples))))
        # The AlexNet trunk degenerates below ~32 px; the reference computes
        # LPIPS for the non-MNIST datasets only (BASELINE.md) — same here.
        if lpips_fn is not None and min(true_img.shape[:2]) >= 32:
            lpipss.extend(lpips_fn(true_img, s) for s in samples)
    if not psnrs:
        return None
    return len(psnrs), np.concatenate(psnrs), np.concatenate(ssims), lpipss


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--task", type=str, default="all",
                        help="inpainting, supr, or 'all' for both tables")
    parser.add_argument("--dataset", type=str, default="all",
                        help="mnist, celeba-64, celeba-128, or 'all' for "
                             "every table block with committed artifacts")
    parser.add_argument("--size", type=int, default=None,
                        help="rect size or SR rate (default: 15 inpainting / 4 supr)")
    parser.add_argument("--sde", type=str, default="lin")
    parser.add_argument("--nparticles", type=str, default="all",
                        help="particle count, or 'all' for the full table column set")
    parser.add_argument("--method", type=str, default="all",
                        help="method tag, or 'all' for every committed method row")
    parser.add_argument("--ny0s", type=int, default=None,
                        help="y0 count; default: every committed y0 id found on disk")
    parser.add_argument("--results_dir", type=str, default=None,
                        help="Artifact root (default: experiments/imgs/"
                             "results_<task> next to this script)")
    args = parser.parse_args()
    lpips_label, lpips_fn = _try_lpips()
    psnr_j = jax.jit(jax.vmap(psnr, in_axes=[None, 0]))
    ssim_j = jax.jit(jax.vmap(ssim, in_axes=[None, 0]))

    methods = _TABLE_METHODS if args.method == "all" else (args.method,)
    tasks = ("inpainting", "supr") if args.task == "all" else (args.task,)
    datasets = (tuple(_TABLE_BLOCKS) if args.dataset == "all"
                else (args.dataset,))
    # An explicit dataset outside the known table blocks (e.g. celeba-256)
    # would silently inherit the MNIST geometry and die with a misleading
    # "no results" error — require --size so the glob is intentional.
    if (args.dataset != "all" and args.dataset not in _TABLE_BLOCKS
            and args.size is None):
        parser.error(f"unknown dataset {args.dataset!r} (known table blocks: "
                     f"{', '.join(_TABLE_BLOCKS)}); pass --size explicitly "
                     "to tabulate a non-table geometry")
    requested_dataset = args.dataset
    user_size = args.size
    printed = 0
    for dataset in datasets:
        args.dataset = dataset
        block = _TABLE_BLOCKS.get(dataset,
                                  {"inpainting": 15, "supr": 4,
                                   "nparticles": _TABLE_NPARTICLES})
        particle_counts = (block["nparticles"] if args.nparticles == "all"
                           else (int(args.nparticles),))
        for task in tasks:
            args.task = task
            args.size = user_size if user_size is not None else block[task]
            for method in methods:
                for nparticles in particle_counts:
                    out = _cell(args, nparticles, method, psnr_j, ssim_j, lpips_fn)
                    if out is None:
                        continue
                    ny0s, psnrs, ssims, lpipss = out
                    # Total count, not y0s x per-y0: sample stacks can have mixed
                    # lengths (resumed rows), so an integer-divided average would
                    # misstate the per-y0 count.
                    msg = (f"{args.dataset} {args.task}-{args.size} {method} N={nparticles} "
                           f"({ny0s} y0s, {psnrs.size} samples) | "
                           f"PSNR {psnrs.mean():.3f} +- {psnrs.std():.3f} | "
                           f"SSIM {ssims.mean():.4f} +- {ssims.std():.4f}")
                    if lpipss:
                        lp = np.asarray(lpipss)
                        msg += f" | {lpips_label} {lp.mean():.4f} +- {lp.std():.4f}"
                    else:
                        msg += (" | LPIPS skipped (resolution < 32; reference computes "
                                "it for non-MNIST only)")
                    print(msg)
                    printed += 1

    from _common import fail_if_empty
    fail_if_empty(printed, f"{'/'.join(tasks)} ({requested_dataset}, {args.method}, "
                           f"N={args.nparticles}) "
                           f"results under {args.results_dir or f'{_EXP}/imgs'}")


if __name__ == "__main__":
    main()
