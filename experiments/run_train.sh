#!/bin/bash
# Production score-model training (counterpart of reference run_train.sh).
set -euo pipefail
cd "$(dirname "$0")"

DATASET=${1:-mnist}
python imgs/train.py --dataset "$DATASET" --sde lin --upsampling pixel_shuffle \
  --batch_size 256 --nsteps 256 --nepochs 3000 --schedule cos --grad_clip \
  --save_mem --bf16 --dp
