#!/bin/bash
# Optional tail of the round-3 queue (launch manually if chip time remains
# after run_round3b_queue.sh): toy Table 1 N=10 at 100 reps, the Gaussian-SB
# ablation at all five particle counts, and tabulation.
set -u
cd "$(dirname "$0")"
LOG=${LOG:-/tmp/r3b}
mkdir -p "$LOG"

stage() { echo "=== $(date +%H:%M:%S) $*"; }

stage "tail 1/3 toy Table 1, N=10, 100 MC reps"
timeout 7200 python toy/gp_production.py --d 100 --nparticles 10 \
  --nsamples 10000 --nmc 100 --sde const --dispatch_sweeps 500 \
  --skip_existing > "$LOG/toy10.log" 2>&1
tail -4 "$LOG/toy10.log" || true

stage "tail 2/3 Gaussian-SB ablation, N in {4,8,16,32,64} x 100 reps"
timeout 10000 python sb/sb_production.py --d 10 --nmc 100 --nsamples 10000 \
  --nparticles 4 8 16 32 64 --dispatch_sweeps 100 > "$LOG/sb_abl.log" 2>&1
tail -12 "$LOG/sb_abl.log" || true

stage "tail 3/3 tabulate toy"
FBS_PLATFORM=cpu python tabulators/tabulate_toy.py > "$LOG/table1.txt" 2>&1 || true
cat "$LOG/table1.txt" || true

touch "$LOG/TAIL_DONE"
