#!/bin/bash
# Gaussian-SB ablation sweep over particle counts and MC ids
# (counterpart of reference run_sb_all.sh / bashes/sb_gibbs_dardel.sh:
# 30 tasks x 100 Slurm array ids there; one vmapped device program per
# particle count here — see sb/sb_production.py).
set -euo pipefail
cd "$(dirname "$0")"

NMC=${1:-100}
D=${2:-10}
NSAMPLES=${3:-10000}

python sb/sb_production.py --d "$D" --nmc "$NMC" --nsamples "$NSAMPLES" \
  --nparticles 4 8 16 32 64

python tabulators/plot_sb.py --max_mcs "$NMC"
