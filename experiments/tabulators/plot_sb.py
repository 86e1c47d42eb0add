r"""Gaussian-SB ablation summary (reference ``experiments/tabulators/plot_sb.py``):
posterior-moment errors of the SB Gibbs/filter samplers vs particle count."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import setup as _setup, experiments_dir as _expdir  # noqa: E402
_setup()
_EXP = _expdir()

import numpy as np

from fbs_tpu.math import bures_dist, kl


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--nparticles", type=int, nargs="+", default=[4, 8, 16, 32, 64])
    parser.add_argument("--max_mcs", type=int, default=100)
    parser.add_argument("--method", type=str, default="gibbs-eb")
    args = parser.parse_args()

    for np_ in args.nparticles:
        kls, bures = [], []
        for mc_id in range(args.max_mcs):
            # Raw sample stack if present; else the compact moment artifact
            # tracked in git (experiments/compact_results.py).
            path = f"{_EXP}/sb/results/{args.method}-{np_}-{mc_id}.npz"
            cpath = f"{_EXP}/sb/results_compact/{args.method}-{np_}-{mc_id}.npz"
            if os.path.exists(path):
                r = np.load(path)
                samples, gp_mean, gp_cov = r["samples"], r["gp_mean"], r["gp_cov"]
                m, c = samples.mean(axis=0), np.cov(samples, rowvar=False)
            elif os.path.exists(cpath):
                r = np.load(cpath)
                m, c, gp_mean, gp_cov = (r["means"], r["covs"],
                                         r["gp_mean"], r["gp_cov"])
            else:
                continue
            kls.append(float(kl(gp_mean, gp_cov, m, c)))
            bures.append(float(bures_dist(gp_mean, gp_cov, m, c)))
        if kls:
            print(f"N={np_}: KL {np.mean(kls):.4f} +- {np.std(kls):.4f} | "
                  f"Bures {np.mean(bures):.4f} +- {np.std(bures):.4f} "
                  f"({len(kls)} reps)")
        else:
            print(f"N={np_}: no results")


if __name__ == "__main__":
    main()
