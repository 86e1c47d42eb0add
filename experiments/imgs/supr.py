r"""Super-resolution conditional sampling (Gibbs / pMCMC / filter).

TPU-native counterpart of reference ``experiments/imgs/supr.py`` — identical
to the inpainting entry point with a ``supr-<rate>`` task and optional
random-offset SR masks.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from experiments.imgs.common import base_parser, run_restoration


def main():
    parser = base_parser("Super-resolution.")
    parser.add_argument("--rate", type=int, default=4)
    parser.add_argument("--sr_random", action="store_true", default=False,
                        help="Random in-block offsets for the observed pixels.")
    parser.add_argument("--method", type=str, default="gibbs")
    parser.add_argument("--init_method", type=str, default="smoother")
    parser.add_argument("--marg", action="store_true", default=False)
    args = parser.parse_args()

    run_restoration(args, task=f"supr-{args.rate}",
                    results_dir="./imgs/results_supr",
                    size_tag=args.rate)


if __name__ == "__main__":
    main()
