#!/bin/bash
# Round-4 queue, part 5 (r4f): post-deadline insurance.  Waits for r4e to
# finish (DONE_r4e, or its deadline + slack), then:
#   1. re-captures the bench probe JSONs with generous timeouts — the r4e
#      probe budget (30 min/run) was too tight for a cold post-restart
#      compile cache on this 1-vCPU host, and a warmed persistent cache also
#      protects the driver's end-of-round bench.py run;
#   2. continues CelebA-64 training toward epoch 2999 in resumable units,
#      committing checkpoints, until killed or complete.
# ROUND-5 NOTE: stop this queue before launching new chip work —
#   kill $(cat /tmp/r4f.pid) and the train PID in /tmp/r4f_train.pid;
# two concurrent TPU clients wedge the tunnel (see .claude/skills/verify).
set -u
cd "$(dirname "$0")"
echo $$ > /tmp/r4f.pid
LOG=${LOG:-/tmp/r4}
OUT="$PWD/../docs/measurements"
mkdir -p "$LOG" "$OUT"

# Wait for r4e (marker file, or its persisted deadline + 30 min slack).
# Absolute cap: after a VM restart /tmp is wiped, so BOTH files can be
# missing forever (ADVICE r4) — never wait more than WAIT_CAP from launch.
WAIT_START=$(date +%s)
WAIT_CAP=${WAIT_CAP:-21600}
while [ ! -f "$LOG/DONE_r4e" ]; do
  if [ -f /tmp/r4e_deadline ] && [ "$(date +%s)" -gt $(( $(cat /tmp/r4e_deadline) + 1800 )) ]; then
    echo "r4e deadline long past without DONE marker; proceeding"
    break
  fi
  if [ "$(date +%s)" -gt $(( WAIT_START + WAIT_CAP )) ]; then
    echo "waited ${WAIT_CAP}s without any r4e marker; proceeding"
    break
  fi
  sleep 120
done
echo "r4f starting at $(date -u +%H:%M:%S)"

bench_ok() {  # non-empty file containing a metric line
  [ -s "$1" ] && grep -q '"metric"' "$1"
}

cd ..
if ! bench_ok "$OUT/bench_r4_plain.json"; then
  timeout 7200 python bench.py > "$OUT/bench_r4_plain.json" 2>"$LOG/bench_plain.err" \
    || echo "plain bench rc=$?"
  tail -1 "$OUT/bench_r4_plain.json" || true
fi
if ! bench_ok "$OUT/bench_r4_fusedattn.json"; then
  timeout 7200 python bench.py --fused_linear_attn \
    > "$OUT/bench_r4_fusedattn.json" 2>"$LOG/bench_fusedattn.err" \
    || echo "fused-attn bench rc=$?"
  tail -1 "$OUT/bench_r4_fusedattn.json" || true
fi
cd experiments
./commit_stage.sh "Bench probe re-capture with warm-cache timeouts (r4f)"

latest_ck() {
  ls checkpoints/celeba-64_lin_*[0-9].npz 2>/dev/null | grep -v _ema \
    | sed 's/.*_\([0-9]*\)\.npz/\1/' | sort -n | tail -1
}
while :; do
  CUR=$(latest_ck)
  [ "${CUR:-0}" -ge 2999 ] 2>/dev/null && { echo "celeba-64 training complete"; break; }
  RESUME=()
  [ -n "${CUR:-}" ] && RESUME=(--init_from "checkpoints/celeba-64_lin_${CUR}.npz" \
                               --start_epoch $((CUR + 1)))
  ( while sleep 600; do ./commit_stage.sh "celeba-64 training progress (r4f)" \
      checkpoints/celeba-64_lin_*.npz >/dev/null 2>&1; done ) &
  CPID=$!
  python imgs/train.py \
    --dataset celeba-64 --sde lin --upsampling pixel_shuffle \
    --batch_size 256 --nsteps 256 --nepochs 3000 --schedule cos --grad_clip \
    --save_mem --bf16 --dp --checkpoint_every 50 "${RESUME[@]}" \
    >> "$LOG/celeba_train.log" 2>&1 &
  TPID=$!
  echo "$TPID" > /tmp/r4f_train.pid
  wait "$TPID"
  rc=$?
  kill "$CPID" 2>/dev/null
  ./commit_stage.sh "celeba-64 training checkpoints (r4f, rc=$rc)" checkpoints/celeba-64_lin_*.npz
  NEW=$(latest_ck)
  # Break on no progress regardless of rc (ADVICE r4): an rc=0 run that
  # writes no checkpoint otherwise respawns in a tight loop against the TPU.
  if [ "${NEW:-0}" = "${CUR:-0}" ]; then
    echo "training made no progress (rc=$rc); stopping"
    tail -5 "$LOG/celeba_train.log"
    break
  fi
done

# ---- chain: CelebA-HQ-128 score model (VERDICT r3 item 2) --------------
# Reference recipe is dataset-independent (run_train.sh: batch 256, nsteps
# 256, cos, 3000 epochs, grad_clip, save_mem).  At 128^2x3 on a 16 GB v5e
# chip batch 256 may not fit even with save_mem+bf16; the fallback halves
# the batch and doubles steps/epoch (same images/epoch, documented
# deviation) — artifacts record which geometry ran via the train log.
latest_128() {
  ls checkpoints/celeba-128_lin_*[0-9].npz 2>/dev/null | grep -v _ema \
    | sed 's/.*_\([0-9]*\)\.npz/\1/' | sort -n | tail -1
}
if [ "$( latest_ck )" -ge 2999 ] 2>/dev/null; then
  GEOM="--batch_size 256 --nsteps 256"
  [ -f /tmp/r4f_128_fallback ] && GEOM="--batch_size 128 --nsteps 512"
  while :; do
    CUR=$(latest_128)
    [ "${CUR:-0}" -ge 2999 ] 2>/dev/null && { echo "celeba-128 training complete"; break; }
    RESUME=()
    [ -n "${CUR:-}" ] && RESUME=(--init_from "checkpoints/celeba-128_lin_${CUR}.npz" \
                                 --start_epoch $((CUR + 1)))
    ( while sleep 600; do ./commit_stage.sh "celeba-128 training progress (r4f)" \
        checkpoints/celeba-128_lin_*.npz >/dev/null 2>&1; done ) &
    CPID=$!
    python imgs/train.py \
      --dataset celeba-128 --sde lin --upsampling pixel_shuffle \
      $GEOM --nepochs 3000 --schedule cos --grad_clip \
      --save_mem --remat --bf16 --dp --checkpoint_every 50 "${RESUME[@]}" \
      >> "$LOG/celeba128_train.log" 2>&1 &
    TPID=$!
    echo "$TPID" > /tmp/r4f_train.pid
    wait "$TPID"
    rc=$?
    kill "$CPID" 2>/dev/null
    ./commit_stage.sh "celeba-128 training checkpoints (r4f, rc=$rc)" \
      checkpoints/celeba-128_lin_*.npz
    NEW=$(latest_128)
    # No-progress break applies regardless of rc (ADVICE r4), with the OOM
    # geometry fallback still taken first when applicable.
    if [ "${NEW:-0}" = "${CUR:-0}" ]; then
      if [ "$GEOM" = "--batch_size 256 --nsteps 256" ] \
         && grep -qi "resource_exhausted\|out of memory\|oom" "$LOG/celeba128_train.log"; then
        echo "batch 256 OOM at 128^2; retrying at batch 128 x 512 steps"
        touch /tmp/r4f_128_fallback
        GEOM="--batch_size 128 --nsteps 512"
        continue
      fi
      echo "celeba-128 training made no progress (rc=$rc); stopping"
      tail -5 "$LOG/celeba128_train.log"
      break
    fi
  done
fi
echo "r4f done at $(date -u +%H:%M:%S)"
