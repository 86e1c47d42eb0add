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


def _autocorr_np(x: np.ndarray, max_lag: int = 100) -> np.ndarray:
    """Numpy twin of ``fbs_tpu.metrics.autocorr`` (max-over-dims normalised
    autocorrelation per lag, unbiased counts).  Kept jax-free on purpose:
    this tool runs inside the chip queue where importing jax would open a
    second TPU-tunnel client under the running experiment."""
    n = x.shape[0]
    x = x.reshape(n, -1) - x.reshape(n, -1).mean(axis=0)
    f = np.fft.rfft(x, n=2 * n, axis=0)
    acov = np.fft.irfft(f * np.conj(f), n=2 * n, axis=0)[: max_lag + 1].real
    acov /= np.arange(n, n - max_lag - 1, -1)[:, None]
    rho = acov[1:] / np.maximum(acov[0], 1e-12)
    return rho.max(axis=1)


def _ess_np(x: np.ndarray, max_lag: int = 200) -> float:
    """Numpy twin of ``fbs_tpu.metrics.ess`` (Geyer initial-monotone, min
    over dims)."""
    n = x.shape[0]
    x = x.reshape(n, -1).astype(np.float64)
    x = x - x.mean(axis=0)
    max_lag = min(max_lag, n - 2)
    f = np.fft.rfft(x, n=2 * n, axis=0)
    acov = np.fft.irfft(f * np.conj(f), n=2 * n, axis=0)[: max_lag + 1].real / n
    rho = acov / np.maximum(acov[:1], 1e-30)
    npairs = (max_lag + 1) // 2
    pairs = rho[: 2 * npairs].reshape(npairs, 2, -1).sum(axis=1)
    positive = np.cumprod(pairs > 0.0, axis=0).astype(bool)
    monotone = np.minimum.accumulate(np.where(positive, pairs, 0.0), axis=0)
    tau = -1.0 + 2.0 * np.where(positive, monotone, 0.0).sum(axis=0)
    return float(np.min(n / np.maximum(tau, 1.0)))


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
        out["autocorr"] = np.stack([_autocorr_np(s) for s in samples]).astype(np.float32)
        out["ess"] = np.array([_ess_np(s) for s in samples], np.float32)
    else:  # (nsamples, d)
        out["means"] = samples.mean(axis=0).astype(np.float32)
        out["covs"] = np.cov(samples, rowvar=False).astype(np.float32)
        out["skews"] = scipy.stats.skew(samples, axis=0).astype(np.float32)
        out["kurts"] = scipy.stats.kurtosis(samples, axis=0).astype(np.float32)
        out["autocorr"] = _autocorr_np(samples).astype(np.float32)
        out["ess"] = np.float32(_ess_np(samples))
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
