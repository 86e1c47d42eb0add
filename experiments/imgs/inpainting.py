r"""Inpainting conditional sampling (Gibbs / pMCMC / filter).

TPU-native counterpart of reference ``experiments/imgs/inpainting.py``.
Methods: ``filter``, ``gibbs``, ``gibbs-eb``, ``gibbs-eb-ef``, ``pmcmc``,
``pmcmc-<delta>``.  Run from the ``experiments`` folder.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from experiments.imgs.common import base_parser, run_restoration


def main():
    parser = base_parser("Inpainting.")
    parser.add_argument("--rect_size", type=int, default=15)
    parser.add_argument("--method", type=str, default="gibbs",
                        help="filter | gibbs[-eb][-ef] | pmcmc[-delta]")
    parser.add_argument("--init_method", type=str, default="smoother")
    parser.add_argument("--marg", action="store_true", default=False)
    args = parser.parse_args()

    run_restoration(args, task=f"inpaint-{args.rect_size}",
                    results_dir="./imgs/results_inpainting",
                    size_tag=args.rect_size)


if __name__ == "__main__":
    main()
