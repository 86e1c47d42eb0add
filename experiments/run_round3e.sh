#!/bin/bash
# Round-3 queue, part 2 (takes over from run_round3d.sh at the stage-5
# boundary).  Two things changed since r3d was written:
#   - the fused-ResBlock kernel was rewritten (roll-based shifted matmuls,
#     no padded scratch / unaligned sublane ops) after the r3d probe showed
#     every shape failing Pallas lowering or Mosaic compile -> re-probe it
#     and, if all six UNet shapes compile, measure the end-to-end bench;
#   - r3d's stage 4 (the 256^2 executions) crashed on a mid-write
#     celeba_hq256.npy (dataset regen finished minutes later) -> redo it.
# Then continue with r3d's stages 6-9 unchanged (SB, stage 5, completed
# under r3d).  Same hard deadline discipline: no new stage starts after
# DEADLINE so the chip is free for the driver's end-of-round bench.
set -u
cd "$(dirname "$0")"
LOG=${LOG:-/tmp/r3e}
OUT=../docs/measurements
mkdir -p "$LOG" "$OUT"
DEADLINE=${DEADLINE:-04:30}

past_deadline() {
  local now target
  now=$(date -u +%s)
  target=$(date -u -d "today $DEADLINE" +%s)
  [ "$target" -lt $((now - 43200)) ] && target=$((target + 86400))
  [ "$now" -ge "$target" ]
}

stage() { echo "=== $(date -u +%H:%M:%S) $*"; }
bail() { stage "deadline $DEADLINE; stopping before: $*"; touch "$LOG/DONE"; exit 0; }

# Seconds left until DEADLINE, capped at $1 — so a long stage started late is
# cut AT the deadline instead of straddling it (timeout 12600 from a 02:00
# start would hold the chip until 05:30, through the driver's bench window).
budget() {
  local cap=$1 now target left
  now=$(date -u +%s)
  target=$(date -u -d "today $DEADLINE" +%s)
  [ "$target" -lt $((now - 43200)) ] && target=$((target + 86400))
  left=$((target - now))
  [ "$left" -lt 60 ] && left=60
  [ "$left" -gt "$cap" ] && left=$cap
  echo "$left"
}

EPOCH=2999

stage "1/7 fused_resblock probe (rewritten kernel) + TPU parity"
timeout 2700 python imgs/probe_fused_resblock.py > "$OUT/probe_fused_resblock.log" 2>&1
grep -E ': (OK|FAIL)' "$OUT/probe_fused_resblock.log" || true
./commit_stage.sh "Re-probe the rewritten fused-ResBlock kernel on the chip (compile + parity per UNet shape)"

past_deadline && bail "bench fused"
NOK=$(grep -c ': OK' "$OUT/probe_fused_resblock.log" 2>/dev/null || echo 0)
if [ "$NOK" -eq 6 ]; then
  stage "2/7 bench --fused_resblock"
  (cd ..; timeout 2400 python bench.py --fused_resblock) \
    > "$OUT/bench_r3d_fused.json" 2> "$LOG/bench_fused.err"
  cat "$OUT/bench_r3d_fused.json" || true
  tail -3 "$LOG/bench_fused.err" || true
  ./commit_stage.sh "Measure the end-to-end bench with the fused ResBlock kernel"
else
  stage "2/7 skipped: probe shows $NOK/6 working shapes"
fi

past_deadline && bail "256^2"
stage "3/7 256^2 redo: dataset sanity, then K=1000 N=64 + N=128 microbatch"
FBS_PLATFORM=cpu python - <<'EOF' || exit 1
import numpy as np
a = np.load("datasets/celeba_hq256.npy", mmap_mode="r")
assert a.shape == (3000, 256, 256, 3), a.shape
print("celeba_hq256 ok:", a.shape, a.dtype)
EOF
timeout "$(budget 3600)" python imgs/bench_celeba256.py --nparticles 64 --total_nsteps 1000 \
  --nsteps 50 > "$OUT/celeba256_k1000_n64.json" 2> "$LOG/celeba256_k1000.err"
cat "$OUT/celeba256_k1000_n64.json" || true
tail -3 "$LOG/celeba256_k1000.err" || true
./commit_stage.sh "Measure the full K=1000 N=64 Gibbs sweep at 256^2 (time-chunked dispatches)"

past_deadline && bail "256^2 N=128"
timeout "$(budget 3600)" python imgs/bench_celeba256.py --nparticles 128 --microbatch 2 \
  --nsteps 25 --nreps 2 > "$OUT/celeba256_n128_microbatch.json" 2> "$LOG/celeba256_n128.err"
cat "$OUT/celeba256_n128_microbatch.json" || true
tail -3 "$LOG/celeba256_n128.err" || true
./commit_stage.sh "Measure N=128 256^2 Gibbs on one chip via microbatched score evaluation"

past_deadline && bail "table stage a"
stage "4/7 Tables 2-3 stage a: N=10 rows, five methods, ny0s=100"
timeout "$(budget 12600)" ./run_table2_r3.sh "$EPOCH" 100 20 10 a > "$LOG/table2_a.log" 2>&1
echo "stage a rc=$?"; grep '===' "$LOG/table2_a.log" | tail -15
./commit_stage.sh "Tables 2-3 stage a artifacts: N=10 rows at 100 y0s (all five methods, both tasks)"

past_deadline && bail "toy N=100"
stage "5/7 toy Table 1, N=100, 100 MC reps"
timeout "$(budget 10800)" python toy/gp_production.py --d 100 --nparticles 100 \
  --nsamples 10000 --nmc 100 --sde const --dispatch_sweeps 100 \
  --skip_existing > "$LOG/toy100.log" 2>&1
tail -6 "$LOG/toy100.log" || true
timeout 2400 python toy/gp_kf.py --d 100 --nsamples 10000 --nmc 100 \
  > "$LOG/kf100.log" 2>&1 || true
python compact_results.py --roots toy/results
./commit_stage.sh "Toy Table 1 artifacts at 100 MC reps, N=100 (compacted moments)"

past_deadline && bail "table stage b"
stage "6/7 Tables 2-3 stage b: N=100 rows, ny0s=100"
timeout "$(budget 12600)" ./run_table2_r3.sh "$EPOCH" 100 20 10 b > "$LOG/table2_b.log" 2>&1
echo "stage b rc=$?"; grep '===' "$LOG/table2_b.log" | tail -10
./commit_stage.sh "Tables 2-3 stage b artifacts: N=100 rows at 100 y0s"

past_deadline && bail "toy N=10 + SB ablation"
stage "7/7 toy N=10 at 100 reps, then SB ablation"
timeout "$(budget 7200)" python toy/gp_production.py --d 100 --nparticles 10 \
  --nsamples 10000 --nmc 100 --sde const --dispatch_sweeps 500 \
  --skip_existing > "$LOG/toy10.log" 2>&1
tail -4 "$LOG/toy10.log" || true
python compact_results.py --roots toy/results
./commit_stage.sh "Toy Table 1 artifacts at 100 MC reps, N=10 (compacted moments)"

past_deadline && bail "SB ablation"
timeout "$(budget 10000)" python sb/sb_production.py --d 10 --nmc 100 --nsamples 10000 \
  --nparticles 4 8 16 32 64 --dispatch_sweeps 100 > "$LOG/sb_abl.log" 2>&1
tail -12 "$LOG/sb_abl.log" || true
python compact_results.py --roots sb/results
./commit_stage.sh "Gaussian-SB ablation artifacts at 100 reps, N in {4,8,16,32,64} (compacted moments)"

stage "queue done"
touch "$LOG/DONE"
