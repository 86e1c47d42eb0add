#!/bin/bash
# Tail of the r3f queue: once r3f finishes (touch of /tmp/r3f/DONE), spend any
# chip time left before DEADLINE deepening the SB-IPF image model — one IPF
# iteration per invocation via the new --start_sb warm start, committing each
# per-iteration checkpoint — then refresh the SB super-resolution comparison
# from the deepest checkpoint.  Addresses round-3 known-gap #2 (the committed
# SB model is reduced-depth; quality improves with more IPF iterations).
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
stage() { echo "=== $(date -u +%H:%M:%S) $*"; }

stage "waiting for r3f queue"
while [ ! -f /tmp/r3f/DONE ]; do
  [ "$(seconds_left)" -lt 60 ] && { stage "deadline while waiting; exiting"; exit 0; }
  sleep 60
done
stage "r3f done; $(seconds_left)s left until $DEADLINE"

latest_sb() {
  ls checkpoints/sb_mnist_lin_*.npz 2>/dev/null | grep -v _bwd \
    | sed 's/.*_\([0-9]*\)\.npz/\1/' | sort -n | tail -1
}

# Each IPF iteration (nepochs=2 per direction, the recipe of the committed
# iter-0 checkpoint) took ~25 min on the chip in r3d; require 45 min of
# headroom before starting another.
while :; do
  LEFT=$(seconds_left)
  [ "$LEFT" -lt 2700 ] && { stage "only ${LEFT}s left; no more SB iterations"; break; }
  CUR=$(latest_sb)
  [ -z "$CUR" ] && { stage "no SB checkpoint to warm-start from"; break; }
  NEXT=$((CUR + 1))
  stage "SB-IPF iteration $NEXT (warm start from $CUR)"
  timeout $((LEFT - 600 < 3000 ? LEFT - 600 : 3000)) \
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
