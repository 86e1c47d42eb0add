r"""Compact raw toy/SB sample artifacts into sufficient statistics.

The raw production artifacts (``toy/results/{tag}-{rep}.npz`` and
``sb/results/{tag}-{rep}.npz``, written by ``toy/gp_production.py`` and
``sb/sb_production.py``) hold the full 10k-sample stacks — gigabytes across
100 repetitions, too large to track in git.  Every metric the tabulators
report (KL, Bures–Wasserstein, mean/var error, |skew|, |kurtosis| — see
``tabulators/tabulate_toy.py`` and the reference
``/root/reference/experiments/tabulators/tabulate_toy.py``) is a function of
the per-chain first four moments, so this tool rewrites each artifact as
those moments into ``results_compact/`` (tracked in git).  The tabulators
fall back to the compact form when the raw stack is absent, so the committed
tables regenerate on a fresh clone.

Usage: python compact_results.py [--root toy/results sb/results]
"""
import argparse
import glob
import os

import numpy as np
import scipy.stats


def compact_file(src: str, dst: str) -> None:
    raw = np.load(src)
    samples = raw["samples"]
    out = {"gp_mean": raw["gp_mean"].astype(np.float32),
           "gp_cov": raw["gp_cov"].astype(np.float32),
           "nsamples": np.int64(samples.shape[-2])}
    if samples.ndim == 3:  # (chains, nsamples, d) — gibbs/pmcmc multi-chain
        out["means"] = np.stack([s.mean(axis=0) for s in samples]).astype(np.float32)
        out["covs"] = np.stack([np.cov(s, rowvar=False) for s in samples]).astype(np.float32)
        out["skews"] = scipy.stats.skew(samples, axis=1).astype(np.float32)
        out["kurts"] = scipy.stats.kurtosis(samples, axis=1).astype(np.float32)
    else:  # (nsamples, d)
        out["means"] = samples.mean(axis=0).astype(np.float32)
        out["covs"] = np.cov(samples, rowvar=False).astype(np.float32)
        out["skews"] = scipy.stats.skew(samples, axis=0).astype(np.float32)
        out["kurts"] = scipy.stats.kurtosis(samples, axis=0).astype(np.float32)
    np.savez_compressed(dst, **out)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--roots", type=str, nargs="+",
                        default=["toy/results", "sb/results"])
    parser.add_argument("--force", action="store_true",
                        help="recompact even if the target exists")
    args = parser.parse_args()

    here = os.path.dirname(os.path.abspath(__file__))
    n = 0
    for root in args.roots:
        src_dir = os.path.join(here, root)
        dst_dir = os.path.join(os.path.dirname(src_dir),
                               os.path.basename(src_dir).replace(
                                   "results", "results_compact"))
        if not os.path.isdir(src_dir):
            continue
        os.makedirs(dst_dir, exist_ok=True)
        for src in sorted(glob.glob(os.path.join(src_dir, "*.npz"))):
            dst = os.path.join(dst_dir, os.path.basename(src))
            if os.path.exists(dst) and not args.force:
                continue
            compact_file(src, dst)
            n += 1
    print(f"compacted {n} artifacts")


if __name__ == "__main__":
    main()
