#!/bin/bash
# Run the full toy GP suite (counterpart of the reference's Slurm drivers in
# experiments/bashes/toy_*.sh, without the scheduler dependency).
# Usage: ./run_toy_all.sh [nmc] [d] [nparticles]
set -euo pipefail
cd "$(dirname "$0")"

NMC=${1:-100}
D=${2:-100}
NP=${3:-100}

for id in $(seq 0 $((NMC - 1))); do
  python toy/gp_gibbs.py --d "$D" --nparticles "$NP" --nsamples 10000 \
    --explicit_backward --scan --id "$id"
  python toy/gp_pmcmc.py --d "$D" --nparticles "$NP" --nsamples 10000 \
    --delta 0.005 --id "$id"
  python toy/gp_pmcmc.py --d "$D" --nparticles "$NP" --nsamples 10000 \
    --delta 0.001 --id "$id"
  python toy/gp_filter.py --d "$D" --nparticles "$NP" --nsamples 10000 --id "$id"
  python toy/gp_twisted.py --d "$D" --nparticles "$NP" --nsamples 10000 --id "$id"
  python toy/gp_csgm.py --d "$D" --nsamples 10000 --id "$id"
done

python tabulators/tabulate_toy.py --nparticles "$NP" --max_mcs "$NMC"
