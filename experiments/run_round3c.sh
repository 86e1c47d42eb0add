#!/bin/bash
# Post-queue chip work for round 3: runs when run_round3b_queue.sh finishes
# (touches /tmp/r3b/DONE).  Measures the Mosaic-fixed fused_resblock kernel
# (per-shape probe, then the end-to-end bench pair), then spends whatever
# chip time remains on the round-3 tail (toy Table 1 N=10 at 100 reps,
# Gaussian-SB ablation at all five particle counts).
#
# DEADLINE (HH:MM UTC, default 04:00): no new stage starts after it, so the
# chip is free for the driver's end-of-round bench.
set -u
cd "$(dirname "$0")"
LOG=${LOG:-/tmp/r3c}
mkdir -p "$LOG"
DEADLINE=${DEADLINE:-04:00}

past_deadline() {
  local now target
  now=$(date -u +%s)
  target=$(date -u -d "today $DEADLINE" +%s)
  # If the deadline clock time is earlier than now-12h, it means tomorrow.
  [ "$target" -lt $((now - 43200)) ] && target=$((target + 86400))
  [ "$now" -ge "$target" ]
}

# Kill a process and all descendants by walking /proc parent links
# (explicit PIDs only — never pattern-based).
kill_tree() {
  local pid=$1 child
  for child in $(ps -o pid= --ppid "$pid" 2>/dev/null); do
    kill_tree "$child"
  done
  kill "$pid" 2>/dev/null
}

stage() { echo "=== $(date -u +%H:%M:%S) $*"; }

stage "waiting for /tmp/r3b/DONE"
while [ ! -f /tmp/r3b/DONE ]; do
  if past_deadline; then
    stage "deadline $DEADLINE hit while waiting; killing queue by pid"
    QPID=${QUEUE_PID:-$(cat /tmp/r3b_queue.pid 2>/dev/null || true)}
    if [ -n "${QPID:-}" ]; then
      kill_tree "$QPID"
      sleep 10
    fi
    break
  fi
  sleep 60
done
stage "queue finished or deadline; chip free"
sleep 15

stage "1/4 fused_resblock per-shape probe (Mosaic fix 42a87f1)"
timeout 2400 python imgs/probe_fused_resblock.py > "$LOG/probe.log" 2>&1
cat "$LOG/probe.log" || true

past_deadline && { stage "deadline; stop"; touch "$LOG/DONE"; exit 0; }

stage "2/4 bench --fused_resblock"
(cd ..; timeout 2100 python bench.py --fused_resblock) \
  > "$LOG/bench_fused.json" 2> "$LOG/bench_fused.err"
cat "$LOG/bench_fused.json" || true

past_deadline && { stage "deadline; stop"; touch "$LOG/DONE"; exit 0; }

stage "3/4 toy Table 1, N=10, 100 MC reps"
timeout 5400 python toy/gp_production.py --d 100 --nparticles 10 \
  --nsamples 10000 --nmc 100 --sde const --dispatch_sweeps 500 \
  --skip_existing > "$LOG/toy10.log" 2>&1
tail -4 "$LOG/toy10.log" || true

past_deadline && { stage "deadline; stop"; touch "$LOG/DONE"; exit 0; }

stage "4/4 Gaussian-SB ablation, N in {4,8,16,32,64} x 100 reps"
timeout 7200 python sb/sb_production.py --d 10 --nmc 100 --nsamples 10000 \
  --nparticles 4 8 16 32 64 --dispatch_sweeps 100 > "$LOG/sb_abl.log" 2>&1
tail -12 "$LOG/sb_abl.log" || true

stage "r3c done"
touch "$LOG/DONE"
