#!/bin/bash
# Paper Table 1 at the reference's production scale, on one TPU chip.
#
# Counterpart of the reference's toy_{gibbs,pmcmc,filter,twisted,csgm}.sh
# Slurm sweeps (each MC repetition a separate multi-hour host process,
# 10-20 packed per GPU): here every method runs all repetitions vmapped in
# one device program (toy/gp_production.py), plus the exact-posterior "kf"
# floor, then tabulates.
#
# Usage: ./run_toy_table.sh [d] [nsamples] [nmc] [nparticles...]
set -euo pipefail
cd "$(dirname "$0")"

D=${1:-100}
NSAMPLES=${2:-10000}
NMC=${3:-20}
shift || true; shift || true; shift || true
NPARTICLES=("${@:-100}")
[ ${#NPARTICLES[@]} -eq 0 ] && NPARTICLES=(100)

for N in "${NPARTICLES[@]}"; do
  python toy/gp_production.py --d "$D" --nparticles "$N" \
    --nsamples "$NSAMPLES" --nmc "$NMC" --sde const
done

for i in $(seq 0 $((NMC - 1))); do
  python toy/gp_kf.py --d "$D" --nsamples "$NSAMPLES" --id "$i"
done

for N in "${NPARTICLES[@]}"; do
  echo "=== Table 1, d=$D, N=$N, $NSAMPLES samples, $NMC reps"
  python tabulators/tabulate_toy.py --sde const --nparticles "$N" --max_mcs "$NMC"
done
