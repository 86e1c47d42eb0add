#!/bin/bash
# Round-4 queue, part 3 (r4d): spends whatever chip time r4c leaves on the
# remaining VERDICT r3 cells, in judge priority order:
#   1. MNIST N=100 filter rows (Tables 2-3) — item 4
#   2. MNIST N=100 pMCMC rows (tunnel-safe 2x1 geometry) — item 3
#   3. SB-IPF deepening (warm start, commit per iteration) — item 5
#   4. toy Table 1 twisted N=100 (~68 min) — item 7
# Waits for r4c to exit; same CHIP_DEADLINE discipline.
set -u
cd "$(dirname "$0")"
LOG=${LOG:-/tmp/r4}
OUT=../docs/measurements
mkdir -p "$LOG" "$OUT"
CHIP_DEADLINE=${CHIP_DEADLINE:-09:30}

if [ -f /tmp/r4d_wait.pid ]; then
  P=$(head -1 /tmp/r4d_wait.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 60; done
fi
echo "r4c gone; r4d starting at $(date -u +%H:%M:%S)"

past_deadline() {
  local now target
  now=$(date -u +%s)
  target=$(date -u -d "today $CHIP_DEADLINE" +%s)
  [ "$target" -lt $((now - 43200)) ] && target=$((target + 86400))
  [ "$now" -ge "$target" ]
}
seconds_left() {
  local now target
  now=$(date -u +%s)
  target=$(date -u -d "today $CHIP_DEADLINE" +%s)
  [ "$target" -lt $((now - 43200)) ] && target=$((target + 86400))
  echo $((target - now))
}
budget() {
  local cap=$1 left
  left=$(seconds_left)
  [ "$left" -lt 60 ] && left=60
  [ "$left" -gt "$cap" ] && left=$cap
  echo "$left"
}
stage() { echo "=== $(date -u +%H:%M:%S) $*"; }

done_count() {
  local dir=$1 prefix=$2 tag=$3 k=0
  while [ -f "imgs/$dir/$prefix-$k-$tag.npy" ]; do k=$((k + 1)); done
  echo "$k"
}

unit() {
  local cap=$1 dir=$2 prefix=$3 tag=$4 ny=$5 msg=$6; shift 6
  if past_deadline; then stage "deadline; skipping: $msg"; return 0; fi
  local done
  done=$(done_count "$dir" "$prefix" "$tag")
  if [ "$done" -ge "$ny" ]; then
    stage "complete ($done/$ny): $msg"; ./commit_stage.sh "$msg"; return 0
  fi
  stage "[resume from $done] $*"
  timeout "$(budget "$cap")" python "$@" --start_from="$done" >> "$LOG/tables.log" 2>&1 \
    || { echo "unit rc=$? (timeout or error): $msg"; tail -3 "$LOG/tables.log"; }
  ./commit_stage.sh "$msg"
}

EPOCH=2999
MCOMMON="--dataset=mnist --sde=lin --test_nsteps=1000 --test_epoch=$EPOCH \
  --test_ema --test_seed=996 --bf16 --save_png_every=25"
M100="--nparticles=100 --ny0s=100 --nsamples=5 --y0s_per_dispatch=4 --sweeps_per_dispatch=1"
P100="--nparticles=100 --ny0s=100 --nsamples=5 --y0s_per_dispatch=2 --sweeps_per_dispatch=1"

stage "1/4 MNIST N=100 filter rows"
unit 4500 results_inpainting mnist-15-lin-100 filter 100 \
  "Table 2 N=100 filter rows (r4d)" \
  imgs/inpainting.py $MCOMMON $M100 --rect_size=15 --method=filter
unit 4500 results_supr mnist-4-lin-100 filter 100 \
  "Table 3 N=100 filter rows (r4d)" \
  imgs/supr.py $MCOMMON $M100 --rate=4 --method=filter

stage "2/4 MNIST N=100 pMCMC rows (2x1 dispatches)"
unit 7200 results_inpainting mnist-15-lin-100 pmcmc-0.005 100 \
  "Table 2 N=100 pMCMC rows (r4d)" \
  imgs/inpainting.py $MCOMMON $P100 --rect_size=15 --method=pmcmc-0.005
unit 7200 results_supr mnist-4-lin-100 pmcmc-0.005 100 \
  "Table 3 N=100 pMCMC rows (r4d)" \
  imgs/supr.py $MCOMMON $P100 --rate=4 --method=pmcmc-0.005

stage "3/4 SB-IPF deepening (warm start, commit per iteration)"
latest_sb() {
  ls checkpoints/sb_mnist_lin_*.npz 2>/dev/null | grep -v _bwd \
    | sed 's/.*_\([0-9]*\)\.npz/\1/' | sort -n | tail -1
}
while :; do
  LEFT=$(seconds_left)
  [ "$LEFT" -lt 4500 ] && { stage "only ${LEFT}s left; no more SB iterations"; break; }
  CUR=$(latest_sb)
  [ -z "$CUR" ] && { stage "no SB checkpoint to warm-start from"; break; }
  NEXT=$((CUR + 1))
  [ "$NEXT" -gt 10 ] && { stage "SB depth 10 reached"; break; }
  stage "SB-IPF iteration $NEXT (warm start from $CUR)"
  timeout "$(budget 3600)" \
    python sb_imgs/train.py --dataset mnist --sde lin --T 0.5 \
    --batch_size 64 --nsteps 32 --nepochs 2 --nsbs $((NEXT + 1)) \
    --start_sb "$NEXT" --schedule cos --grad_clip --vmap_loss --bf16 \
    > "$LOG/sb_train_$NEXT.log" 2>&1
  rc=$?
  tail -2 "$LOG/sb_train_$NEXT.log" || true
  if [ -f "checkpoints/sb_mnist_lin_${NEXT}.npz" ]; then
    ./commit_stage.sh "SB-IPF iteration $NEXT (r4d)" \
      "checkpoints/sb_mnist_lin_${NEXT}.npz" "checkpoints/sb_mnist_lin_${NEXT}_bwd.npz"
  else
    stage "iteration $NEXT produced no checkpoint (rc=$rc); stopping"
    break
  fi
done

stage "4/4 toy Table 1 twisted N=100 (the last Table-1 hole)"
if ! past_deadline && [ "$(seconds_left)" -gt 5400 ]; then
  timeout "$(budget 6000)" python toy/gp_production.py --d 100 --nparticles 100 \
    --nsamples 10000 --nmc 100 --sde const --methods twisted \
    --skip_existing > "$LOG/toy_twisted100.log" 2>&1 \
    || { echo "twisted-100 rc=$?"; tail -3 "$LOG/toy_twisted100.log"; }
  python compact_results.py --roots toy/results
  ./commit_stage.sh "Toy Table 1: twisted N=100 cell (100 MC reps) - table complete"
else
  stage "not enough margin for twisted N=100; leaving for round 5"
fi

stage "final tabulation (CPU)"
FBS_PLATFORM=cpu JAX_PLATFORMS=cpu python tabulators/tabulate_imgs.py \
  > "$OUT/tables23_r4.txt" 2>/dev/null || true
./commit_stage.sh "r4d final tabulation"
stage "r4d done"
touch "$LOG/DONE_r4d"
