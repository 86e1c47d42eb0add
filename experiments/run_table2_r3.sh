#!/bin/bash
# Paper Tables 2-3 regeneration at scale, on one chip, with the round-3
# throughput machinery: vmapped multi-y0 chains (small-N rows), device-side
# sweep chunking, vmapped sample batches for the one-shot baselines.
#
# Usage: ./run_table2_r3.sh [epoch] [ny0s] [nsamples_n10] [nsamples_n100] [stage]
#   stage: a = N=10 rows (all five methods, both tasks)
#          b = N=100 rows (gibbs + pmcmc + filter, both tasks)
#          ab = both (default)
#
# Reference scale: 100 y0s x 100 samples, N in {10,100}
# (/root/reference/experiments/bashes/imgs_gibbs.sh:21-39).
set -euo pipefail
cd "$(dirname "$0")"

EPOCH=${1:-2999}
NY=${2:-100}
NS10=${3:-100}
NS100=${4:-20}
STAGE=${5:-ab}

COMMON="--dataset=mnist --sde=lin --test_nsteps=1000 --test_epoch=$EPOCH \
  --test_ema --test_seed=996 --bf16 --save_png_every=25"

run() { echo "=== $(date +%H:%M:%S) $*"; python "$@"; }

if [[ "$STAGE" == *a* ]]; then
  # ---- N=10 rows: 10 y0 chains vmapped -> ~110-image score batches. ----
  M10="--nparticles=10 --ny0s=$NY --nsamples=$NS10 --y0s_per_dispatch=20 --sweeps_per_dispatch=5"
  run imgs/inpainting.py $COMMON $M10 --rect_size=15 --method=gibbs-eb-ef
  run imgs/supr.py       $COMMON $M10 --rate=4       --method=gibbs-eb-ef
  run imgs/inpainting.py $COMMON $M10 --rect_size=15 --method=filter
  run imgs/supr.py       $COMMON $M10 --rate=4       --method=filter
  run imgs/inpainting.py $COMMON $M10 --rect_size=15 --method=pmcmc-0.005
  run imgs/supr.py       $COMMON $M10 --rate=4       --method=pmcmc-0.005
  B10="--nparticles=10 --ny0s=$NY --nsamples=$NS10 --samples_per_dispatch=10"
  run imgs/inpainting_twisted.py $COMMON $B10 --rect_size=15
  run imgs/supr_twisted.py       $COMMON $B10 --rate=4
  C10="--nparticles=10 --ny0s=$NY --nsamples=$NS10 --samples_per_dispatch=50"
  run imgs/inpainting_csgm.py    $COMMON $C10 --rect_size=15
  run imgs/supr_csgm.py          $COMMON $C10 --rate=4
fi

if [[ "$STAGE" == *b* ]]; then
  # ---- N=100 rows: score batch is already >=100; chunk sweeps only. ----
  M100="--nparticles=100 --ny0s=$NY --nsamples=$NS100 --y0s_per_dispatch=4 --sweeps_per_dispatch=2"
  run imgs/inpainting.py $COMMON $M100 --rect_size=15 --method=gibbs-eb-ef
  run imgs/supr.py       $COMMON $M100 --rate=4       --method=gibbs-eb-ef
  run imgs/inpainting.py $COMMON $M100 --rect_size=15 --method=pmcmc-0.005
  run imgs/supr.py       $COMMON $M100 --rate=4       --method=pmcmc-0.005
  run imgs/inpainting.py $COMMON $M100 --rect_size=15 --method=filter
  run imgs/supr.py       $COMMON $M100 --rate=4       --method=filter
fi

echo "=== $(date +%H:%M:%S) tabulating (auto-detected scale)"
for METHOD in gibbs-eb-ef filter pmcmc-0.005 twisted csgm; do
  for NP in 10 100; do
    python tabulators/tabulate_imgs.py --task=inpainting --dataset=mnist \
      --size=15 --nparticles=$NP --method=$METHOD || true
    python tabulators/tabulate_imgs.py --task=supr --dataset=mnist \
      --size=4 --nparticles=$NP --method=$METHOD || true
  done
done
