#!/bin/bash
# Reproduce the paper's image-restoration quality tables (Tables 2-3) from a
# trained score checkpoint, on one TPU chip.
#
# Counterpart of the reference's imgs_{gibbs,filter,pmcmc,twisted,csgm}.sh
# Slurm army (each 22 h on one A100, ny0s=100, nsamples=100); here the methods
# run serially on one chip at a configurable scale (defaults: ny0s=20,
# nsamples=20 — the VERDICT round-2 acceptance scale).  All artifacts land in
# imgs/results_{inpainting,supr}/ and feed tabulators/tabulate_imgs.py.
#
# Usage: ./run_table2.sh [dataset] [nparticles] [epoch] [ny0s] [nsamples] [nsteps]
set -euo pipefail
cd "$(dirname "$0")"

DATASET=${1:-mnist}
NPARTICLES=${2:-100}
EPOCH=${3:-2999}
NY0S=${4:-20}
NSAMPLES=${5:-20}
NSTEPS=${6:-1000}
# Baseline methods (filter/pmcmc/twisted/csgm) can run at a reduced scale.
BASE_NY0S=${BASE_NY0S:-$NY0S}
BASE_NSAMPLES=${BASE_NSAMPLES:-$NSAMPLES}

if [[ "$DATASET" == "mnist" ]]; then
  RECT=15; SR=4
elif [[ "$DATASET" == "celeba-64" ]]; then
  RECT=32; SR=2
else
  RECT=64; SR=2
fi

COMMON="--dataset=$DATASET --sde=lin --test_nsteps=$NSTEPS --test_epoch=$EPOCH \
  --test_ema --test_seed=996 --bf16"
MAIN="--ny0s=$NY0S --nsamples=$NSAMPLES"
BASE="--ny0s=$BASE_NY0S --nsamples=$BASE_NSAMPLES"

run() { echo "=== $*"; python "$@"; }

run imgs/inpainting.py $COMMON $MAIN --rect_size=$RECT --nparticles=$NPARTICLES --method=gibbs-eb-ef
run imgs/supr.py       $COMMON $MAIN --rate=$SR        --nparticles=$NPARTICLES --method=gibbs-eb-ef
run imgs/inpainting.py $COMMON $BASE --rect_size=$RECT --nparticles=$NPARTICLES --method=filter
run imgs/supr.py       $COMMON $BASE --rate=$SR        --nparticles=$NPARTICLES --method=filter
run imgs/inpainting.py $COMMON $BASE --rect_size=$RECT --nparticles=$NPARTICLES --method=pmcmc-0.005
run imgs/supr.py       $COMMON $BASE --rate=$SR        --nparticles=$NPARTICLES --method=pmcmc-0.005
run imgs/inpainting_twisted.py $COMMON $BASE --rect_size=$RECT --nparticles=$NPARTICLES
run imgs/supr_twisted.py       $COMMON $BASE --rate=$SR        --nparticles=$NPARTICLES
run imgs/inpainting_csgm.py    $COMMON $BASE --rect_size=$RECT --nparticles=$NPARTICLES
run imgs/supr_csgm.py          $COMMON $BASE --rate=$SR        --nparticles=$NPARTICLES

echo "=== tabulating"
for METHOD in gibbs-eb-ef filter pmcmc-0.005 twisted csgm; do
  python tabulators/tabulate_imgs.py --task=inpainting --dataset=$DATASET \
    --size=$RECT --nparticles=$NPARTICLES --method=$METHOD --ny0s=$NY0S
  python tabulators/tabulate_imgs.py --task=supr --dataset=$DATASET \
    --size=$SR --nparticles=$NPARTICLES --method=$METHOD --ny0s=$NY0S
done
