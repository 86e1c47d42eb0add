#!/bin/bash
# Round-3 recovery queue.  The dev VM restarted and wiped everything outside
# git: the compile cache, the synthetic datasets, and every experiment
# artifact produced by the earlier round-3 queues (they lived in gitignored
# results dirs).  This queue re-executes the chip work in judge-value order
# and — the lesson learned — COMMITS each stage's artifacts the moment they
# land (commit_stage.sh; results dirs are now tracked via .gitignore
# negations, large raw sample stacks are compacted to sufficient statistics
# first).
#
# Stage order (single-client chip, strictly serial):
#   1. bench plain                 -> BENCH number + warms the driver-bench program
#   2. fused_resblock probe        -> per-shape kernel timing (roofline measured section)
#   3. bench --fused_resblock      -> kernel verdict end to end
#   4. 256^2: K=1000 N=64 chunked; N=128 microbatched single-chip
#   5. SB-IPF training (reduced) + SB super-resolution -> last missing family
#   6. Tables 2-3 stage a: N=10 rows, 100 y0s, all five methods
#   7. toy Table 1 N=100 at 100 MC reps + exact-posterior floor
#   8. Tables 2-3 stage b: N=100 rows
#   9. toy N=10 + Gaussian-SB ablation (almost certainly cut)
#
# DEADLINE (HH:MM UTC): no new stage starts after it so the chip is free for
# the driver's end-of-round bench.
set -u
cd "$(dirname "$0")"
LOG=${LOG:-/tmp/r3d}
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

EPOCH=2999

stage "1/9 bench plain"
(cd ..; timeout 2400 python bench.py) > "$OUT/bench_r3d_plain.json" 2> "$LOG/bench_plain.err"
cat "$OUT/bench_r3d_plain.json" || true
./commit_stage.sh "Record round-3 bench (plain) measurement"

past_deadline && bail "fused probe"
stage "2/9 fused_resblock per-shape probe"
timeout 2700 python imgs/probe_fused_resblock.py > "$OUT/probe_fused_resblock.log" 2>&1
tail -20 "$OUT/probe_fused_resblock.log" || true
./commit_stage.sh "Record fused-ResBlock per-shape probe results"

past_deadline && bail "bench fused"
if grep -q ': OK' "$OUT/probe_fused_resblock.log" 2>/dev/null; then
  stage "3/9 bench --fused_resblock"
  (cd ..; timeout 2400 python bench.py --fused_resblock) \
    > "$OUT/bench_r3d_fused.json" 2> "$LOG/bench_fused.err"
  cat "$OUT/bench_r3d_fused.json" || true
  ./commit_stage.sh "Record round-3 bench (fused ResBlock) measurement"
else
  stage "3/9 skipped: probe shows no working fused shape"
fi

past_deadline && bail "256^2"
stage "4/9 waiting for regenerated datasets (celeba_hq256.npy)"
for _ in $(seq 60); do
  [ -f datasets/celeba_hq256.npy ] && break
  sleep 30
done
[ -f datasets/celeba_hq256.npy ] || stage "WARNING: celeba_hq256.npy still missing"
stage "4/9 256^2 full K=1000 sweep, N=64, time-chunked"
timeout 3600 python imgs/bench_celeba256.py --nparticles 64 --total_nsteps 1000 \
  --nsteps 50 > "$OUT/celeba256_k1000_n64.json" 2> "$LOG/celeba256_k1000.err"
cat "$OUT/celeba256_k1000_n64.json" || true
tail -3 "$LOG/celeba256_k1000.err" || true
./commit_stage.sh "Measure the full K=1000 N=64 Gibbs sweep at 256^2 (time-chunked dispatches)"

past_deadline && bail "256^2 N=128"
stage "4/9 256^2 N=128 microbatched single-chip"
timeout 3600 python imgs/bench_celeba256.py --nparticles 128 --microbatch 2 \
  --nsteps 25 --nreps 2 > "$OUT/celeba256_n128_microbatch.json" 2> "$LOG/celeba256_n128.err"
cat "$OUT/celeba256_n128_microbatch.json" || true
tail -3 "$LOG/celeba256_n128.err" || true
./commit_stage.sh "Measure N=128 256^2 Gibbs on one chip via microbatched score evaluation"

past_deadline && bail "SB train"
stage "5/9 SB-IPF image training (reduced: nsbs=6 x nepochs=2)"
timeout 7200 python sb_imgs/train.py --dataset mnist --sde lin --T 0.5 \
  --batch_size 64 --nsteps 32 --nepochs 2 --nsbs 6 --schedule cos \
  --grad_clip --vmap_loss --bf16 > "$LOG/sb_train.log" 2>&1
echo "sb_train rc=$?"; tail -5 "$LOG/sb_train.log"; ls checkpoints/sb_mnist_* 2>/dev/null || true
SBCKPT=$(ls checkpoints/sb_mnist_lin_*.npz 2>/dev/null | sed 's/.*_\([0-9]*\)\.npz/\1/' | sort -n | tail -1)
if [ -n "${SBCKPT:-}" ]; then
  ./commit_stage.sh "Train the SB-IPF image model (reduced recipe) and commit the final checkpoint" \
    "checkpoints/sb_mnist_lin_${SBCKPT}.npz"
fi

if [ -n "${SBCKPT:-}" ] && ! past_deadline; then
  stage "5/9 SB super-resolution (Gibbs + filter, x0-init ablations)"
  for Y0 in 10 11; do
    past_deadline && break
    timeout 1800 python sb_imgs/supr.py --sde lin --sb_step "$SBCKPT" \
      --rate 4 --test_nsteps 64 --nparticles 100 --y0_id "$Y0" --nsamples 20 \
      --method gibbs --bf16 > "$LOG/sb_supr_gibbs_$Y0.log" 2>&1 || true
    timeout 1800 python sb_imgs/supr.py --sde lin --sb_step "$SBCKPT" \
      --rate 4 --test_nsteps 64 --nparticles 100 --y0_id "$Y0" --nsamples 20 \
      --method filter --bf16 > "$LOG/sb_supr_filter_$Y0.log" 2>&1 || true
  done
  ./commit_stage.sh "SB super-resolution results (Gibbs vs one-shot filter) from the trained SB model"
fi

past_deadline && bail "table stage a"
stage "6/9 Tables 2-3 stage a: N=10 rows, five methods, ny0s=100"
timeout 12600 ./run_table2_r3.sh "$EPOCH" 100 20 10 a > "$LOG/table2_a.log" 2>&1
echo "stage a rc=$?"; grep '===' "$LOG/table2_a.log" | tail -15
./commit_stage.sh "Tables 2-3 stage a artifacts: N=10 rows at 100 y0s (all five methods, both tasks)"

past_deadline && bail "toy N=100"
stage "7/9 toy Table 1, N=100, 100 MC reps"
timeout 10800 python toy/gp_production.py --d 100 --nparticles 100 \
  --nsamples 10000 --nmc 100 --sde const --dispatch_sweeps 100 \
  --skip_existing > "$LOG/toy100.log" 2>&1
tail -6 "$LOG/toy100.log" || true
timeout 2400 python toy/gp_kf.py --d 100 --nsamples 10000 --nmc 100 \
  > "$LOG/kf100.log" 2>&1 || true
python compact_results.py --roots toy/results
./commit_stage.sh "Toy Table 1 artifacts at 100 MC reps, N=100 (compacted moments)"

past_deadline && bail "table stage b"
stage "8/9 Tables 2-3 stage b: N=100 rows, ny0s=100"
timeout 12600 ./run_table2_r3.sh "$EPOCH" 100 20 10 b > "$LOG/table2_b.log" 2>&1
echo "stage b rc=$?"; grep '===' "$LOG/table2_b.log" | tail -10
./commit_stage.sh "Tables 2-3 stage b artifacts: N=100 rows at 100 y0s"

past_deadline && bail "toy N=10 + SB ablation"
stage "9/9 toy N=10 at 100 reps, then SB ablation"
timeout 7200 python toy/gp_production.py --d 100 --nparticles 10 \
  --nsamples 10000 --nmc 100 --sde const --dispatch_sweeps 500 \
  --skip_existing > "$LOG/toy10.log" 2>&1
tail -4 "$LOG/toy10.log" || true
python compact_results.py --roots toy/results
./commit_stage.sh "Toy Table 1 artifacts at 100 MC reps, N=10 (compacted moments)"

past_deadline && bail "SB ablation"
timeout 10000 python sb/sb_production.py --d 10 --nmc 100 --nsamples 10000 \
  --nparticles 4 8 16 32 64 --dispatch_sweeps 100 > "$LOG/sb_abl.log" 2>&1
tail -12 "$LOG/sb_abl.log" || true
python compact_results.py --roots sb/results
./commit_stage.sh "Gaussian-SB ablation artifacts at 100 reps, N in {4,8,16,32,64} (compacted moments)"

stage "queue done"
touch "$LOG/DONE"
