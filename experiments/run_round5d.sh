#!/bin/bash
# Round-5 final chip window (r5d): after r5c's SB iteration was cut by its
# 1800s cap mid-training.  Order: the f32 Gibbs-collapse probe (short,
# informs the round's analysis of the CelebA gibbs anomaly), then one full
# SB-IPF iteration with the whole remaining window, then tabulate.
set -u
cd "$(dirname "$0")"
LOG=${LOG:-/tmp/r5}
OUT="$PWD/../docs/measurements"
mkdir -p "$LOG" "$OUT"
END=$(( $(date +%s) + ${HORIZON:-4200} ))
left() { echo $(( END - $(date +%s) )); }
stage() { echo "=== $(date -u +%H:%M:%S) $*"; }

stage "1/3 f32 vs bf16 Gibbs-collapse probe (production K=1000, 2 y0s)"
if [ ! -s "$OUT/gibbs_collapse_probe.txt" ]; then
  timeout 1500 python imgs/probe_gibbs_collapse.py --ny0s 2 --nsweeps 4 \
    > "$OUT/gibbs_collapse_probe.txt.tmp" 2>"$LOG/probe_f32.err" \
    && mv "$OUT/gibbs_collapse_probe.txt.tmp" "$OUT/gibbs_collapse_probe.txt" \
    || { echo "f32 probe rc=$?"; tail -3 "$LOG/probe_f32.err"; rm -f "$OUT/gibbs_collapse_probe.txt.tmp"; }
  cat "$OUT/gibbs_collapse_probe.txt" 2>/dev/null || true
  ./commit_stage.sh "Probe result: CelebA-64 Gibbs sweeps in f32 at production K (r5)"
fi

stage "2/4 one SB-IPF iteration at nepochs=1 (a 2-epoch pass needs ~52 min and was twice cut)"
latest_sb() {
  ls checkpoints/sb_mnist_lin_*.npz 2>/dev/null | grep -v _bwd \
    | sed 's/.*_\([0-9]*\)\.npz/\1/' | sort -n | tail -1
}
CUR=$(latest_sb)
NEXT=$((CUR + 1))
if [ "$(left)" -gt 2400 ] && [ "$NEXT" -le 10 ]; then
  timeout 2100 \
    python sb_imgs/train.py --dataset mnist --sde lin --T 0.5 \
    --batch_size 64 --nsteps 32 --nepochs 1 --nsbs $((NEXT + 1)) \
    --start_sb "$NEXT" --schedule cos --grad_clip --vmap_loss --bf16 \
    > "$LOG/sb_train_$NEXT.log" 2>&1
  rc=$?
  tail -2 "$LOG/sb_train_$NEXT.log" || true
  if [ -f "checkpoints/sb_mnist_lin_${NEXT}.npz" ]; then
    ./commit_stage.sh "SB-IPF iteration $NEXT (nepochs=1, r5)" \
      "checkpoints/sb_mnist_lin_${NEXT}.npz" "checkpoints/sb_mnist_lin_${NEXT}_bwd.npz"
  else
    stage "SB iteration $NEXT did not complete (rc=$rc)"
  fi
fi

stage "3/4 finish the MNIST supr twisted cell with the remainder"
done_count() {
  local k=0
  while [ -f "imgs/results_supr/mnist-4-lin-10-$k-twisted.npy" ]; do k=$((k + 1)); done
  echo "$k"
}
DONE=$(done_count)
if [ "$DONE" -lt 100 ] && [ "$(left)" -gt 600 ]; then
  stage "[resume from $DONE] mnist supr twisted"
  timeout $(( $(left) - 420 )) python imgs/supr_twisted.py --dataset=mnist \
    --sde=lin --test_nsteps=1000 --test_epoch=2999 --test_ema --test_seed=996 \
    --bf16 --save_png_every=25 --nparticles=10 --ny0s=100 --nsamples=20 \
    --samples_per_dispatch=5 --rate=4 --start_from="$DONE" \
    >> "$LOG/tables.log" 2>&1 || true
  ./commit_stage.sh "Table 3 N=10 twisted rows: supr-4 toward 100 y0s (r5d)"
fi

stage "4/4 final tabulation"
FBS_PLATFORM=cpu python tabulators/tabulate_imgs.py \
  > "$OUT/tables23_r5.txt" 2>/dev/null || true
./commit_stage.sh "r5d final tabulation"
stage "r5d done"
touch "$LOG/DONE_r5"
