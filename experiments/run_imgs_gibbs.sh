#!/bin/bash
# Image Gibbs conditional sampling of record (counterpart of
# reference bashes/imgs_gibbs.sh).
set -euo pipefail
cd "$(dirname "$0")"

DATASET=${1:-mnist}
NP=${2:-100}
TASKSIZE=${3:-15}

python imgs/inpainting.py --dataset "$DATASET" --rect_size "$TASKSIZE" \
  --sde lin --method gibbs-eb --test_nsteps 1000 --test_epoch 2999 --test_ema \
  --test_seed 996 --ny0s 100 --nsamples 100 --nparticles "$NP" --bf16
