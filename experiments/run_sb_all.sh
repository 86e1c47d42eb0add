#!/bin/bash
# Gaussian-SB ablation sweep over particle counts and MC ids
# (counterpart of reference run_sb_all.sh / bashes/sb_gibbs_dardel.sh).
set -euo pipefail
cd "$(dirname "$0")"

NMC=${1:-100}
D=${2:-10}

for np in 4 8 16 32 64; do
  for id in $(seq 0 $((NMC - 1))); do
    python sb/gibbs.py --d "$D" --nparticles "$np" --nsamples 10000 \
      --explicit_backward --id "$id"
    python sb/filter.py --d "$D" --nparticles "$np" --nsamples 10000 --id "$id"
  done
done

python tabulators/plot_sb.py --max_mcs "$NMC"
