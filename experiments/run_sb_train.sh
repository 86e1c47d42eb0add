#!/bin/bash
# Production Schrodinger-bridge training (counterpart of reference run_sb_train.sh).
set -euo pipefail
cd "$(dirname "$0")"

DATASET=${1:-mnist}
python sb_imgs/train.py --dataset "$DATASET" --sde lin --T 0.5 \
  --batch_size 64 --nsteps 32 --nepochs 10 --nsbs 20 --schedule cos \
  --grad_clip --vmap_loss --bf16 --dp
