#!/bin/bash
# Round-3 post-training chip queue: runs the measurement/production stages
# serially (the chip is single-client).  Each stage logs to /tmp/queue_r3 and
# a failure does not block later stages.
#
# Usage: ./run_round3_queue.sh   (after imgs/train.py finishes)
set -u
cd "$(dirname "$0")"
LOG=${LOG:-/tmp/queue_r3}
mkdir -p "$LOG"

stage() { echo "=== $(date +%H:%M:%S) $1"; }

stage "1/6 bench (ws_frozen path)"
(cd ..; timeout 3000 python bench.py) > "$LOG/bench_plain.json" 2> "$LOG/bench_plain.err"
cat "$LOG/bench_plain.json" || true

stage "2/6 bench (fused_resblock kernel)"
(cd ..; timeout 3000 python bench.py --fused_resblock) > "$LOG/bench_fused.json" 2> "$LOG/bench_fused.err"
cat "$LOG/bench_fused.json" || true

stage "3/6 256^2: full K=1000 sweep at N=64 (time-chunked) + N=128 microbatched"
timeout 3600 python imgs/bench_celeba256.py --nparticles 64 --total_nsteps 1000 \
  --nsteps 50 > "$LOG/celeba256_k1000.json" 2> "$LOG/celeba256_k1000.err"
cat "$LOG/celeba256_k1000.json" || true
timeout 3000 python imgs/bench_celeba256.py --nparticles 128 --microbatch 2 \
  --nsteps 25 > "$LOG/celeba256_n128.json" 2> "$LOG/celeba256_n128.err"
cat "$LOG/celeba256_n128.json" || true

stage "4/6 toy Table 1 at 100 MC reps (N=100 then N=10) + kf floor"
timeout 16000 python toy/gp_production.py --d 100 --nparticles 100 \
  --nsamples 10000 --nmc 100 --sde const --dispatch_sweeps 100 \
  > "$LOG/toy100.log" 2>&1
tail -8 "$LOG/toy100.log" || true
timeout 6000 python toy/gp_production.py --d 100 --nparticles 10 \
  --nsamples 10000 --nmc 100 --sde const --dispatch_sweeps 500 \
  > "$LOG/toy10.log" 2>&1
tail -8 "$LOG/toy10.log" || true
timeout 1200 python toy/gp_kf.py --d 100 --nsamples 10000 --nmc 100 \
  > "$LOG/kf.log" 2>&1

stage "5/6 Gaussian-SB ablation, N in {4,8,16,32,64} x 100 reps"
timeout 10000 python sb/sb_production.py --d 10 --nmc 100 --nsamples 10000 \
  --nparticles 4 8 16 32 64 --dispatch_sweeps 100 > "$LOG/sb_abl.log" 2>&1
tail -12 "$LOG/sb_abl.log" || true

stage "6/6 tabulate what we have"
python tabulators/tabulate_toy.py > "$LOG/table1.txt" 2>&1 || true
cat "$LOG/table1.txt" || true

stage "queue done"
