#!/bin/bash
# Tail of the r3f queue: once r3f finishes (touch of /tmp/r3f/DONE), use the
# chip time left before DEADLINE to (1) fill any holes the r3f stage timeouts
# left in the toy/SB-ablation tables — gp_production's --skip_existing makes
# this a cheap no-op for completed methods — then (2) deepen the SB-IPF image
# model one IPF iteration per invocation (--start_sb warm start), committing
# each checkpoint, and refresh the SB supr comparison from the deepest one.
set -u
cd "$(dirname "$0")"
LOG=${LOG:-/tmp/r3f_tail}
mkdir -p "$LOG"
DEADLINE=${DEADLINE:-13:00}

seconds_left() {
  local now target
  now=$(date -u +%s)
  target=$(date -u -d "today $DEADLINE" +%s)
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

stage "waiting for r3f queue"
while [ ! -f /tmp/r3f/DONE ]; do
  [ "$(seconds_left)" -lt 60 ] && { stage "deadline while waiting; exiting"; exit 0; }
  sleep 60
done
stage "r3f done; $(seconds_left)s left until $DEADLINE"

# ---- 1. Fill toy-table holes (stage timeouts kill mid-method; results for
# ----    finished methods are on disk and --skip_existing skips them). ----
toy_missing() {  # toy_missing <nparticles> -> count of missing method tags
  local np=$1 miss=0 tag
  for tag in "gibbs-eb-const-$np" "pmcmc-0.005-const-$np" "pmcmc-0.001-const-$np" \
             "filter-const-$np" "twisted-const-$np" csgm-const; do
    [ -f "toy/results/$tag-99.npz" ] || miss=$((miss + 1))
  done
  echo "$miss"
}

for NP in 100 10; do
  M=$(toy_missing "$NP")
  if [ "$M" -gt 0 ] && [ "$(seconds_left)" -gt 1500 ]; then
    stage "toy N=$NP: $M methods missing; resuming with --skip_existing"
    DS=$([ "$NP" -eq 100 ] && echo 100 || echo 500)
    timeout "$(budget 9000)" python toy/gp_production.py --d 100 --nparticles "$NP" \
      --nsamples 10000 --nmc 100 --sde const --dispatch_sweeps "$DS" \
      --skip_existing >> "$LOG/toy$NP.log" 2>&1
    tail -4 "$LOG/toy$NP.log" || true
  fi
done
if [ ! -f toy/results/kf-99.npz ] && [ "$(seconds_left)" -gt 900 ]; then
  stage "kf floor missing; running"
  timeout "$(budget 2400)" python toy/gp_kf.py --d 100 --nsamples 10000 --nmc 100 \
    > "$LOG/kf100.log" 2>&1 || tail -3 "$LOG/kf100.log"
fi
python compact_results.py --roots toy/results
./commit_stage.sh "Toy Table 1: fill method rows the stage timeout cut (compacted moments)"

# SB ablation: one program over all N; only rerun if its artifacts are absent.
if [ ! -f sb/results/gibbs-64-99.npz ] && [ "$(seconds_left)" -gt 3600 ]; then
  stage "SB ablation artifacts missing; running"
  timeout "$(budget 9000)" python sb/sb_production.py --d 10 --nmc 100 --nsamples 10000 \
    --nparticles 4 8 16 32 64 --dispatch_sweeps 100 > "$LOG/sb_abl.log" 2>&1
  tail -8 "$LOG/sb_abl.log" || true
  python compact_results.py --roots sb/results
  ./commit_stage.sh "Gaussian-SB ablation artifacts at 100 reps (tail fill)"
fi

# ---- 2. Deepen the SB-IPF image model. ----
latest_sb() {
  ls checkpoints/sb_mnist_lin_*.npz 2>/dev/null | grep -v _bwd \
    | sed 's/.*_\([0-9]*\)\.npz/\1/' | sort -n | tail -1
}

while :; do
  LEFT=$(seconds_left)
  [ "$LEFT" -lt 2700 ] && { stage "only ${LEFT}s left; no more SB iterations"; break; }
  CUR=$(latest_sb)
  [ -z "$CUR" ] && { stage "no SB checkpoint to warm-start from"; break; }
  NEXT=$((CUR + 1))
  stage "SB-IPF iteration $NEXT (warm start from $CUR)"
  timeout "$(budget 3000)" \
    python sb_imgs/train.py --dataset mnist --sde lin --T 0.5 \
    --batch_size 64 --nsteps 32 --nepochs 2 --nsbs $((NEXT + 1)) \
    --start_sb "$NEXT" --schedule cos --grad_clip --vmap_loss --bf16 \
    > "$LOG/sb_train_$NEXT.log" 2>&1
  rc=$?
  tail -2 "$LOG/sb_train_$NEXT.log" || true
  if [ -f "checkpoints/sb_mnist_lin_${NEXT}.npz" ]; then
    ./commit_stage.sh "Deepen the SB-IPF image model: IPF iteration $NEXT (warm-started)" \
      "checkpoints/sb_mnist_lin_${NEXT}.npz" "checkpoints/sb_mnist_lin_${NEXT}_bwd.npz"
  else
    stage "iteration $NEXT did not produce a checkpoint (rc=$rc); stopping"
    break
  fi
done

SBCKPT=$(latest_sb)
if [ -n "${SBCKPT:-}" ] && [ "$SBCKPT" -gt 0 ] && [ "$(seconds_left)" -gt 1200 ]; then
  stage "SB supr refresh from iteration $SBCKPT"
  for Y0 in 10 11; do
    [ "$(seconds_left)" -lt 600 ] && break
    timeout 1700 python sb_imgs/supr.py --sde lin --sb_step "$SBCKPT" \
      --rate 4 --test_nsteps 64 --nparticles 100 --y0_id "$Y0" --nsamples 20 \
      --method gibbs --bf16 > "$LOG/sb_supr_gibbs_$Y0.log" 2>&1 || true
    timeout 1700 python sb_imgs/supr.py --sde lin --sb_step "$SBCKPT" \
      --rate 4 --test_nsteps 64 --nparticles 100 --y0_id "$Y0" --nsamples 20 \
      --method filter --bf16 > "$LOG/sb_supr_filter_$Y0.log" 2>&1 || true
  done
  ./commit_stage.sh "SB super-resolution from the deepened SB model (IPF iter $SBCKPT)"
fi

stage "tail done"
touch "$LOG/DONE"
