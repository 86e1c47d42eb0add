r"""Error statistics for the toy GP experiments (paper Table 1).

TPU-native counterpart of reference ``experiments/tabulators/tabulate_toy.py``:
KL, Bures-Wasserstein, absolute mean/variance errors, |skew| and |kurtosis|
against the closed-form GP posterior, averaged over MC repetitions.
"""
import argparse
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
import scipy.stats
from functools import partial

from fbs_tpu.math import kl, bures_dist


def _load_moments(results_dir: str, method: str, file_id):
    """Per-rep first-four-moment record: ``(means, covs, skews, kurts,
    gp_mean, gp_cov)`` with a leading chains axis when present.

    Reads the raw sample stack when available; falls back to the compact
    moment artifact written by ``experiments/compact_results.py`` (the form
    tracked in git — raw 10k-sample stacks are too large to commit).
    """
    raw_path = os.path.join(results_dir, f"{method}-{file_id}.npz")
    compact_dir = os.path.join(
        os.path.dirname(results_dir),
        os.path.basename(results_dir).replace("results", "results_compact"))
    compact_path = os.path.join(compact_dir, f"{method}-{file_id}.npz")
    if os.path.exists(raw_path):
        results = np.load(raw_path)
        samples, gp_mean, gp_cov = (results["samples"], results["gp_mean"],
                                    results["gp_cov"])
        if samples.ndim == 3:  # chains axis first (gibbs/pmcmc)
            means = np.asarray(jax.vmap(partial(jnp.mean, axis=0))(samples))
            covs = np.asarray(jax.vmap(partial(jnp.cov, rowvar=False))(samples))
            skews = scipy.stats.skew(samples, axis=1)
            kurts = scipy.stats.kurtosis(samples, axis=1)
        else:
            means = np.mean(samples, axis=0)
            covs = np.cov(samples, rowvar=False)
            skews = scipy.stats.skew(samples, axis=0)
            kurts = scipy.stats.kurtosis(samples, axis=0)
        return means, covs, skews, kurts, gp_mean, gp_cov
    if os.path.exists(compact_path):
        r = np.load(compact_path)
        return (r["means"], r["covs"], r["skews"], r["kurts"],
                r["gp_mean"], r["gp_cov"])
    raise FileNotFoundError(f"{raw_path} (nor compact {compact_path})")


def _list_mc_ids(results_dir: str, method: str):
    import glob
    ids = set()
    for d in (results_dir,
              os.path.join(os.path.dirname(results_dir),
                           os.path.basename(results_dir).replace(
                               "results", "results_compact"))):
        for p in glob.glob(os.path.join(d, f"{method}-*.npz")):
            tail = os.path.basename(p)[len(method) + 1:-4]
            if tail.isdigit():
                ids.add(int(tail))
    return sorted(ids)


def tabulate(method: str, max_mcs=None, results_dir: str = f"{_EXP}/toy/results"):
    if max_mcs is None:  # default to every committed repetition on disk
        mc_ids = _list_mc_ids(results_dir, method)
        if not mc_ids:
            raise FileNotFoundError(f"no {method}-*.npz under {results_dir}")
    else:
        mc_ids = list(range(max_mcs))
    max_mcs = len(mc_ids)
    errs = {k: np.zeros((max_mcs,)) for k in
            ("m", "var", "kl", "bures", "skew", "kurt")}

    for mc_id, file_id in enumerate(mc_ids):
        means, covs, skews, kurts, gp_mean, gp_cov = _load_moments(
            results_dir, method, file_id)

        if means.ndim == 2:  # chains axis first (gibbs/pmcmc)
            errs["m"][mc_id] = np.mean(np.abs(means - gp_mean[None, :]))
            errs["var"][mc_id] = np.mean(np.abs(
                np.diagonal(covs - gp_cov[None], axis1=1, axis2=2)))
            errs["kl"][mc_id] = np.mean(jax.vmap(kl, in_axes=[None, None, 0, 0])(
                gp_mean, gp_cov, means, covs))
            errs["bures"][mc_id] = np.mean(jax.vmap(bures_dist, in_axes=[None, None, 0, 0])(
                gp_mean, gp_cov, means, covs))
            errs["skew"][mc_id] = np.mean(np.abs(skews))
            errs["kurt"][mc_id] = np.mean(np.abs(kurts))
        else:
            errs["m"][mc_id] = np.mean(np.abs(means - gp_mean))
            errs["var"][mc_id] = np.mean(np.abs(np.diag(covs) - np.diag(gp_cov)))
            errs["kl"][mc_id] = float(kl(gp_mean, gp_cov, means, covs))
            errs["bures"][mc_id] = float(bures_dist(gp_mean, gp_cov, means, covs))
            errs["skew"][mc_id] = np.mean(np.abs(skews))
            errs["kurt"][mc_id] = np.mean(np.abs(kurts))

    print(f"Method {method} | "
          f"KL | {errs['kl'].mean():.4f} {errs['kl'].std():.4f} | "
          f"Bures | {errs['bures'].mean():.4f} {errs['bures'].std():.4f} | "
          f"Mean {errs['m'].mean():.4f} {errs['m'].std():.4f} | "
          f"Var {errs['var'].mean():.4f} {errs['var'].std():.4f} | "
          f"Skew {errs['skew'].mean():.4f} | Kurt {errs['kurt'].mean():.4f}")
    return errs


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sde", type=str, default="const")
    parser.add_argument("--nparticles", type=int, default=100)
    parser.add_argument("--max_mcs", type=int, default=None,
                        help="MC repetitions; default: every committed rep found on disk")
    args = parser.parse_args()

    methods = [f"filter-{args.sde}-{args.nparticles}",
               f"gibbs-eb-{args.sde}-{args.nparticles}",
               f"pmcmc-0.005-{args.sde}-{args.nparticles}",
               f"pmcmc-0.001-{args.sde}-{args.nparticles}",
               f"twisted-{args.sde}-{args.nparticles}",
               f"csgm-{args.sde}",
               "kf"]
    n_ok = 0
    for method in methods:
        try:
            tabulate(method, args.max_mcs)
            n_ok += 1
        except FileNotFoundError as e:
            print(f"Method {method} | missing results ({e})")
    from _common import fail_if_empty
    fail_if_empty(n_ok, f"toy result files under {_EXP}/toy/results")


if __name__ == "__main__":
    main()
