#!/bin/bash
# Round-3 final chip queue (single-client chip; runs after imgs/train.py
# completes).  Ordered by VERDICT-round-2 priority with the binary
# "component exists" items first and the scale increments last, so an early
# round cut costs the least:
#   1. bench pair (plain vs fused_resblock)      -> BENCH_r03 + roofline fill
#   2. 256^2 executions (K=1000 N=64 chunked; N=128 microbatched) -> no
#      extrapolation left in the CelebA-256 claims
#   3. SB-IPF image training + SB super-resolution -> last missing family
#   4. Tables 2-3 stage a (N=10 rows, 100 y0s)   -> SE < 1
#   5. Tables 2-3 stage b (N=100 rows)
#   6. toy Table 1 at 100 MC reps (likely cut)
# Every stage has a timeout, continues on failure, and logs to /tmp/r3b.
#
# Usage: run_round3b_queue.sh [train_pid]
set -u
cd "$(dirname "$0")"
LOG=${LOG:-/tmp/r3b}
mkdir -p "$LOG"

if [ $# -ge 1 ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
  echo "=== training (pid $1) finished at $(date)"
fi

stage() { echo "=== $(date +%H:%M:%S) $*"; }

EPOCH=2999
[ -f checkpoints/mnist_lin_2999.npz ] || EPOCH=$(ls checkpoints/mnist_lin_*.npz \
  | sed 's/.*_\([0-9]*\)\.npz/\1/' | sort -n | tail -1)
echo "using score checkpoint epoch $EPOCH"

stage "1/6 bench plain"
(cd ..; timeout 2100 python bench.py) > "$LOG/bench_plain.json" 2> "$LOG/bench_plain.err"
cat "$LOG/bench_plain.json" || true

stage "1/6 bench fused_resblock"
(cd ..; timeout 2100 python bench.py --fused_resblock) > "$LOG/bench_fused.json" 2> "$LOG/bench_fused.err"
cat "$LOG/bench_fused.json" || true

stage "2/6 256^2 full K=1000 sweep, N=64, time-chunked"
timeout 2700 python imgs/bench_celeba256.py --nparticles 64 --total_nsteps 1000 \
  --nsteps 50 > "$LOG/celeba256_k1000.json" 2> "$LOG/celeba256_k1000.err"
cat "$LOG/celeba256_k1000.json" || true

stage "2/6 256^2 N=128 microbatched single-chip probe"
timeout 2700 python imgs/bench_celeba256.py --nparticles 128 --microbatch 2 \
  --nsteps 25 --nreps 2 > "$LOG/celeba256_n128.json" 2> "$LOG/celeba256_n128.err"
cat "$LOG/celeba256_n128.json" || true

stage "3/6 uncond sample grid from epoch $EPOCH"
timeout 1200 python imgs/sample_uncond.py --test_epoch "$EPOCH" --test_ema \
  --test_nsteps 500 --bf16 --out "../docs/uncond_mnist_ep$EPOCH.png" \
  > "$LOG/uncond.log" 2>&1 || true

stage "3/6 SB-IPF image training (reduced: nsbs=6 x nepochs=2; reference runs 20x10 for 24 h on an A100 - run_sb_train.sh)"
timeout 5400 python sb_imgs/train.py --dataset mnist --sde lin --T 0.5 \
  --batch_size 64 --nsteps 32 --nepochs 2 --nsbs 6 --schedule cos \
  --grad_clip --vmap_loss --bf16 > "$LOG/sb_train.log" 2>&1
echo "sb_train rc=$? ; checkpoints:"; ls checkpoints/sb_mnist_* 2>/dev/null || true

stage "3/6 SB super-resolution (Gibbs + filter, 3 x0-init ablations each)"
SBCKPT=$(ls checkpoints/sb_mnist_lin_*.npz 2>/dev/null | sed 's/.*_\([0-9]*\)\.npz/\1/' | sort -n | tail -1)
if [ -n "${SBCKPT:-}" ]; then
  for Y0 in 10 11 12; do
    timeout 1500 python sb_imgs/supr.py --sde lin --sb_step "$SBCKPT" \
      --rate 4 --test_nsteps 64 --nparticles 100 --y0_id "$Y0" --nsamples 20 \
      --method gibbs --bf16 > "$LOG/sb_supr_gibbs_$Y0.log" 2>&1 || true
    timeout 1500 python sb_imgs/supr.py --sde lin --sb_step "$SBCKPT" \
      --rate 4 --test_nsteps 64 --nparticles 100 --y0_id "$Y0" --nsamples 20 \
      --method filter --bf16 > "$LOG/sb_supr_filter_$Y0.log" 2>&1 || true
  done
fi

stage "4/6 Tables 2-3 stage a: N=10 rows, all five methods, ny0s=100"
timeout 10800 ./run_table2_r3.sh "$EPOCH" 100 20 10 a > "$LOG/table2_a.log" 2>&1
echo "stage a rc=$?"

stage "5/6 Tables 2-3 stage b: N=100 rows, ny0s=100"
timeout 12600 ./run_table2_r3.sh "$EPOCH" 100 20 10 b > "$LOG/table2_b.log" 2>&1
echo "stage b rc=$?"

stage "6/6 toy Table 1 at 100 MC reps (if time remains)"
timeout 10000 python toy/gp_production.py --d 100 --nparticles 100 \
  --nsamples 10000 --nmc 100 --sde const --dispatch_sweeps 100 \
  --skip_existing > "$LOG/toy100.log" 2>&1
tail -4 "$LOG/toy100.log" || true
timeout 3600 python toy/gp_kf.py --d 100 --nsamples 10000 --nmc 100 \
  > "$LOG/kf100.log" 2>&1 || true

stage "queue done"
touch "$LOG/DONE"
