#!/bin/bash
# Round-5 queue, part c: split the CelebA methods around SB/toy.  run_round5.sh's stage
# order would starve SB-IPF deepening and the toy twisted N=100 cell (both
# explicit VERDICT r4 items) behind ~4h of MNIST N=100 rows; this
# continuation interleaves them.  All units are the same file-guarded
# idempotent stages — safe to run after killing r5 at any point.
set -u
cd "$(dirname "$0")"
LOG=${LOG:-/tmp/r5}
OUT="$PWD/../docs/measurements"
mkdir -p "$LOG" "$OUT"
DEADLINE_FILE=/tmp/r5_deadline
if [ -f "$DEADLINE_FILE" ]; then DEADLINE=$(cat "$DEADLINE_FILE"); else
  DEADLINE=$(( $(date +%s) + ${HORIZON:-18000} )); echo "$DEADLINE" > "$DEADLINE_FILE"; fi
echo "r5c starting at $(date -u +%H:%M:%S); deadline $(date -u -d @"$DEADLINE" +%m-%dT%H:%M)"

past_deadline() { [ "$(date +%s)" -ge "$DEADLINE" ]; }
seconds_left() { echo $(( DEADLINE - $(date +%s) )); }
budget() {
  local cap=$1 left
  left=$(seconds_left); [ "$left" -lt 60 ] && left=60
  [ "$left" -gt "$cap" ] && left=$cap; echo "$left"
}
stage() { echo "=== $(date -u +%H:%M:%S) $*"; }
done_count() {
  local dir=$1 prefix=$2 tag=$3 k=0
  while [ -f "imgs/$dir/$prefix-$k-$tag.npy" ]; do k=$((k + 1)); done
  echo "$k"
}
unit() {  # unit <cap> <dir> <prefix> <tag> <ny> <msg> <cmd...>
  local cap=$1 dir=$2 prefix=$3 tag=$4 ny=$5 msg=$6; shift 6
  if past_deadline; then stage "deadline; skipping: $msg"; return 0; fi
  local done
  done=$(done_count "$dir" "$prefix" "$tag")
  if [ "$done" -ge "$ny" ]; then
    stage "complete ($done/$ny): $msg"; ./commit_stage.sh "$msg"; return 0
  fi
  stage "[resume from $done] $*"
  timeout "$(budget "$cap")" python "$@" --start_from="$done" >> "$LOG/tables.log" 2>&1 \
    || { echo "unit rc=$? (timeout or error): $msg"; tail -3 "$LOG/tables.log"; }
  ./commit_stage.sh "$msg"
}

EPOCH=2999
MCOMMON="--dataset=mnist --sde=lin --test_nsteps=1000 --test_epoch=$EPOCH \
  --test_ema --test_seed=996 --bf16 --save_png_every=25"
B10="--nparticles=10 --ny0s=100 --nsamples=20 --samples_per_dispatch=5"
M100="--nparticles=100 --ny0s=100 --nsamples=5 --y0s_per_dispatch=4 --sweeps_per_dispatch=1"
T100="--nparticles=100 --ny0s=100 --nsamples=5 --samples_per_dispatch=2"
P100="--nparticles=100 --ny0s=100 --nsamples=5 --y0s_per_dispatch=2 --sweeps_per_dispatch=1"

latest_ck() {
  ls checkpoints/celeba-64_lin_*[0-9].npz 2>/dev/null | grep -v _ema \
    | sed 's/.*_\([0-9]*\)\.npz/\1/' | sort -n | tail -1
}
EPFILE=imgs/celeba64_rows_epoch.txt
if [ -f "$EPFILE" ]; then EP=$(cat "$EPFILE"); else
  EP=$(latest_ck); echo "$EP" > "$EPFILE"
fi
CCOMMON="--dataset=celeba-64 --sde=lin --test_nsteps=1000 --test_epoch=$EP \
  --test_ema --test_seed=996 --bf16 --save_png_every=25"
C10="--nparticles=10 --nsamples=5 --y0s_per_dispatch=4 --sweeps_per_dispatch=1"
C2="--nparticles=2 --nsamples=5 --y0s_per_dispatch=8 --sweeps_per_dispatch=1"
CB="--nparticles=10 --nsamples=5 --samples_per_dispatch=1"

celeba_rows() {  # celeba_rows <ny0s> <gibbs_cap> <other_cap>
  local NY=$1 GCAP=$2 OCAP=$3
  unit "$GCAP" results_inpainting celeba-64-32-lin-10 gibbs-eb-ef "$NY" \
    "CelebA-64 Table 2 N=10 gibbs rows ($NY y0s, epoch $EP)" \
    imgs/inpainting.py $CCOMMON $C10 --ny0s=$NY --rect_size=32 --method=gibbs-eb-ef
  unit "$GCAP" results_supr celeba-64-2-lin-10 gibbs-eb-ef "$NY" \
    "CelebA-64 Table 3 N=10 gibbs rows ($NY y0s, epoch $EP)" \
    imgs/supr.py $CCOMMON $C10 --ny0s=$NY --rate=2 --method=gibbs-eb-ef
  unit "$OCAP" results_inpainting celeba-64-32-lin-10 filter "$NY" \
    "CelebA-64 Table 2 N=10 filter rows ($NY y0s, epoch $EP)" \
    imgs/inpainting.py $CCOMMON $C10 --ny0s=$NY --rect_size=32 --method=filter
  unit "$OCAP" results_supr celeba-64-2-lin-10 filter "$NY" \
    "CelebA-64 Table 3 N=10 filter rows ($NY y0s, epoch $EP)" \
    imgs/supr.py $CCOMMON $C10 --ny0s=$NY --rate=2 --method=filter
  unit "$OCAP" results_inpainting celeba-64-32-lin-10 csgm "$NY" \
    "CelebA-64 Table 2 csgm rows ($NY y0s, epoch $EP)" \
    imgs/inpainting_csgm.py $CCOMMON $CB --ny0s=$NY --rect_size=32
  unit "$OCAP" results_supr celeba-64-2-lin-10 csgm "$NY" \
    "CelebA-64 Table 3 csgm rows ($NY y0s, epoch $EP)" \
    imgs/supr_csgm.py $CCOMMON $CB --ny0s=$NY --rate=2
  unit "$OCAP" results_inpainting celeba-64-32-lin-10 twisted "$NY" \
    "CelebA-64 Table 2 twisted rows ($NY y0s, epoch $EP)" \
    imgs/inpainting_twisted.py $CCOMMON $CB --ny0s=$NY --rect_size=32
  unit "$OCAP" results_supr celeba-64-2-lin-10 twisted "$NY" \
    "CelebA-64 Table 3 twisted rows ($NY y0s, epoch $EP)" \
    imgs/supr_twisted.py $CCOMMON $CB --ny0s=$NY --rate=2
  unit "$OCAP" results_inpainting celeba-64-32-lin-2 gibbs-eb-ef "$NY" \
    "CelebA-64 Table 2 N=2 gibbs rows ($NY y0s, epoch $EP)" \
    imgs/inpainting.py $CCOMMON $C2 --ny0s=$NY --rect_size=32 --method=gibbs-eb-ef
  unit "$OCAP" results_supr celeba-64-2-lin-2 gibbs-eb-ef "$NY" \
    "CelebA-64 Table 3 N=2 gibbs rows ($NY y0s, epoch $EP)" \
    imgs/supr.py $CCOMMON $C2 --ny0s=$NY --rate=2 --method=gibbs-eb-ef
}

stage "a0: CelebA-64 twisted rows, 1-sample dispatches (the 5-sample dispatch crashed the worker)"
unit 3000 results_inpainting celeba-64-32-lin-10 twisted 30 \
  "CelebA-64 Table 2 twisted rows (30 y0s, epoch $EP)" \
  imgs/inpainting_twisted.py $CCOMMON $CB --ny0s=30 --rect_size=32
unit 3000 results_supr celeba-64-2-lin-10 twisted 30 \
  "CelebA-64 Table 3 twisted rows (30 y0s, epoch $EP)" \
  imgs/supr_twisted.py $CCOMMON $CB --ny0s=30 --rate=2

stage "d-first: one SB-IPF iteration before the MNIST leftovers"
latest_sb() {
  ls checkpoints/sb_mnist_lin_*.npz 2>/dev/null | grep -v _bwd \
    | sed 's/.*_\([0-9]*\)\.npz/\1/' | sort -n | tail -1
}
CUR=$(latest_sb)
if [ -n "$CUR" ] && [ "$(seconds_left)" -gt 2400 ] && ! past_deadline; then
  NEXT=$((CUR + 1))
  if [ "$NEXT" -le 10 ]; then
    stage "SB-IPF iteration $NEXT (warm start from $CUR)"
    timeout "$(budget 1800)" \
      python sb_imgs/train.py --dataset mnist --sde lin --T 0.5 \
      --batch_size 64 --nsteps 32 --nepochs 2 --nsbs $((NEXT + 1)) \
      --start_sb "$NEXT" --schedule cos --grad_clip --vmap_loss --bf16 \
      > "$LOG/sb_train_$NEXT.log" 2>&1
    if [ -f "checkpoints/sb_mnist_lin_${NEXT}.npz" ]; then
      ./commit_stage.sh "SB-IPF iteration $NEXT (r5)" \
        "checkpoints/sb_mnist_lin_${NEXT}.npz" "checkpoints/sb_mnist_lin_${NEXT}_bwd.npz"
    fi
  fi
fi

stage "a: leftover repairs (no-ops if r5 finished them)"
unit 5400 results_supr mnist-4-lin-10 twisted 100 \
  "Table 3 N=10 twisted rows: supr-4, 100 y0s (r5)" \
  imgs/supr_twisted.py $MCOMMON $B10 --rate=4

stage "b: CelebA-64 essential rows, 30 y0s (gibbs N=10/filter done by r5; N=2 here)"
unit 3600 results_inpainting celeba-64-32-lin-2 gibbs-eb-ef 30 \
  "CelebA-64 Table 2 N=2 gibbs rows (30 y0s, epoch $EP)" \
  imgs/inpainting.py $CCOMMON $C2 --ny0s=30 --rect_size=32 --method=gibbs-eb-ef
unit 3600 results_supr celeba-64-2-lin-2 gibbs-eb-ef 30 \
  "CelebA-64 Table 3 N=2 gibbs rows (30 y0s, epoch $EP)" \
  imgs/supr.py $CCOMMON $C2 --ny0s=30 --rate=2 --method=gibbs-eb-ef

stage "d: SB-IPF deepening, up to 3 iterations this pass"
latest_sb() {
  ls checkpoints/sb_mnist_lin_*.npz 2>/dev/null | grep -v _bwd \
    | sed 's/.*_\([0-9]*\)\.npz/\1/' | sort -n | tail -1
}
SB_DONE=0
while :; do
  LEFT=$(seconds_left)
  [ "$LEFT" -lt 2400 ] && { stage "only ${LEFT}s left; no more SB iterations"; break; }
  [ "$SB_DONE" -ge 2 ] && { stage "2 SB iterations this pass; moving on"; break; }
  CUR=$(latest_sb)
  [ -z "$CUR" ] && { stage "no SB checkpoint to warm-start from"; break; }
  NEXT=$((CUR + 1))
  [ "$NEXT" -gt 10 ] && { stage "SB depth 10 reached"; break; }
  stage "SB-IPF iteration $NEXT (warm start from $CUR)"
  timeout "$(budget 1800)" \
    python sb_imgs/train.py --dataset mnist --sde lin --T 0.5 \
    --batch_size 64 --nsteps 32 --nepochs 2 --nsbs $((NEXT + 1)) \
    --start_sb "$NEXT" --schedule cos --grad_clip --vmap_loss --bf16 \
    > "$LOG/sb_train_$NEXT.log" 2>&1
  rc=$?
  tail -2 "$LOG/sb_train_$NEXT.log" || true
  if [ -f "checkpoints/sb_mnist_lin_${NEXT}.npz" ]; then
    SB_DONE=$((SB_DONE + 1))
    ./commit_stage.sh "SB-IPF iteration $NEXT (r5)" \
      "checkpoints/sb_mnist_lin_${NEXT}.npz" "checkpoints/sb_mnist_lin_${NEXT}_bwd.npz"
  else
    stage "iteration $NEXT produced no checkpoint (rc=$rc); stopping"
    break
  fi
done

stage "e: toy Table 1 twisted N=100 (the last Table-1 hole)"
# Threshold lowered to 3000s: gp_production writes per-rep artifacts, so a
# timeout leaves a partial-but-real cell (rep count recorded by the tabulator)
# rather than the empty cell of rounds 3-4.
if [ ! -f toy/results/COMPACT_twisted_100.done ] && ! past_deadline \
   && [ "$(seconds_left)" -gt 1800 ]; then
  timeout "$(budget 5400)" python toy/gp_production.py --d 100 --nparticles 100 \
    --nsamples 10000 --nmc 100 --sde const --methods twisted \
    --skip_existing > "$LOG/toy_twisted100.log" 2>&1 \
    || { echo "twisted-100 rc=$?"; tail -3 "$LOG/toy_twisted100.log"; }
  python compact_results.py --roots toy/results
  touch toy/results/COMPACT_twisted_100.done
  ./commit_stage.sh "Toy Table 1: twisted N=100 cell (100 MC reps)"
fi

stage "h2: re-measure the SB Gibbs-vs-filter gap from the deepest model"
SBDEPTH=$(latest_sb)
if [ -n "$SBDEPTH" ] && [ "$SBDEPTH" -ge 2 ] && ! past_deadline \
   && [ "$(seconds_left)" -gt 3600 ]; then
  for Y0 in 10 11; do
    for M in gibbs filter; do
      OUTF="sb_imgs/results/mnist-4-lin-100-sb${SBDEPTH}-${Y0}-${M}-random.npy"
      [ -f "$OUTF" ] && continue
      past_deadline && break 2
      stage "SB supr re-measure: depth $SBDEPTH y0 $Y0 $M"
      timeout "$(budget 2700)" python sb_imgs/supr.py --rate 4 --sde lin \
        --sb_step "$SBDEPTH" --y0_id "$Y0" --method "$M" --nparticles 100 \
        --nsamples 20 --test_nsteps 64 --bf16 \
        >> "$LOG/sb_supr.log" 2>&1 \
        || { echo "sb supr rc=$? (y0 $Y0 $M)"; tail -3 "$LOG/sb_supr.log"; }
    done
  done
  python - <<EOF >> sb_imgs/results/SB_SUPR_NUMBERS.md || true
import os
import numpy as np
depth = "$SBDEPTH"
rows = []
for y0 in (10, 11):
    # PSNR against the committed true image (same y0 enumeration as r4).
    import imageio.v2 as iio
    true = iio.imread(f"sb_imgs/results/mnist-4-lin-100-{y0}-true.png") / 255.0
    if true.ndim == 2:
        true = true[..., None]
    for init in ("random", "blank", "interp"):
        cells = {}
        for m in ("gibbs", "filter"):
            f = f"sb_imgs/results/mnist-4-lin-100-sb{depth}-{y0}-{m}-{init}.npy"
            if not os.path.exists(f):
                continue
            s = np.clip(np.load(f), 0, 1)
            mse = ((s - true[None]) ** 2).reshape(s.shape[0], -1).mean(axis=1)
            psnr = -10 * np.log10(mse)
            cells[m] = (psnr.mean(), psnr.std())
        if cells:
            rows.append((y0, init, cells))
if rows:
    print(f"\n## Re-measured at IPF depth {depth} (r5)\n")
    print("| y0 | init | Gibbs PSNR | filter PSNR |")
    print("|----|------|-----------|-------------|")
    for y0, init, cells in rows:
        g = cells.get("gibbs"); f_ = cells.get("filter")
        gs = f"{g[0]:.2f} ± {g[1]:.2f}" if g else "—"
        fs = f"{f_[0]:.2f} ± {f_[1]:.2f}" if f_ else "—"
        print(f"| {y0} | {init} | {gs} | {fs} |")
EOF
  ./commit_stage.sh "SB supr Gibbs-vs-filter gap re-measured at depth $SBDEPTH (r5)"
fi

stage "b2: CelebA-64 baseline rows, 30 y0s (csgm + twisted + any leftovers)"
celeba_rows 30 5400 3600

stage "c: MNIST N=100 filter rows (both tasks)"
unit 5400 results_inpainting mnist-15-lin-100 filter 100 \
  "Table 2 N=100 filter rows (r5)" \
  imgs/inpainting.py $MCOMMON $M100 --rect_size=15 --method=filter
unit 5400 results_supr mnist-4-lin-100 filter 100 \
  "Table 3 N=100 filter rows (r5)" \
  imgs/supr.py $MCOMMON $M100 --rate=4 --method=filter

stage "f: MNIST N=100 twisted + pMCMC rows"
unit 5400 results_inpainting mnist-15-lin-100 twisted 100 \
  "Table 2 N=100 twisted rows (r5)" \
  imgs/inpainting_twisted.py $MCOMMON $T100 --rect_size=15
unit 5400 results_supr mnist-4-lin-100 twisted 100 \
  "Table 3 N=100 twisted rows (r5)" \
  imgs/supr_twisted.py $MCOMMON $T100 --rate=4
unit 5400 results_inpainting mnist-15-lin-100 pmcmc-0.005 100 \
  "Table 2 N=100 pMCMC rows (r5)" \
  imgs/inpainting.py $MCOMMON $P100 --rect_size=15 --method=pmcmc-0.005
unit 5400 results_supr mnist-4-lin-100 pmcmc-0.005 100 \
  "Table 3 N=100 pMCMC rows (r5)" \
  imgs/supr.py $MCOMMON $P100 --rate=4 --method=pmcmc-0.005

stage "g: CelebA-64 rows 30 -> 100 y0s"
celeba_rows 100 7200 5400

stage "h: SB-IPF second pass with any remaining room"
while :; do
  LEFT=$(seconds_left)
  [ "$LEFT" -lt 4500 ] && break
  CUR=$(latest_sb); [ -z "$CUR" ] && break
  NEXT=$((CUR + 1)); [ "$NEXT" -gt 10 ] && break
  stage "SB-IPF iteration $NEXT (warm start from $CUR)"
  timeout "$(budget 2700)" \
    python sb_imgs/train.py --dataset mnist --sde lin --T 0.5 \
    --batch_size 64 --nsteps 32 --nepochs 2 --nsbs $((NEXT + 1)) \
    --start_sb "$NEXT" --schedule cos --grad_clip --vmap_loss --bf16 \
    > "$LOG/sb_train_$NEXT.log" 2>&1
  if [ -f "checkpoints/sb_mnist_lin_${NEXT}.npz" ]; then
    ./commit_stage.sh "SB-IPF iteration $NEXT (r5)" \
      "checkpoints/sb_mnist_lin_${NEXT}.npz" "checkpoints/sb_mnist_lin_${NEXT}_bwd.npz"
  else
    stage "iteration $NEXT produced no checkpoint; stopping"; break
  fi
done

stage "i: CelebA-64 training with the remaining chip time"
NOPROG=0
while :; do
  LEFT=$(seconds_left)
  CUR=$(latest_ck)
  [ "${CUR:-0}" -ge 2999 ] 2>/dev/null && { stage "celeba-64 training complete (epoch $CUR)"; break; }
  if [ "$LEFT" -lt 1500 ]; then
    stage "only ${LEFT}s left; stopping training at epoch ${CUR:-none}"; break
  fi
  RESUME=()
  [ -n "${CUR:-}" ] && RESUME=(--init_from "checkpoints/celeba-64_lin_${CUR}.npz" --start_epoch $((CUR + 1)))
  ( while sleep 600; do ./commit_stage.sh "celeba-64 training progress (r5)" \
      checkpoints/celeba-64_lin_*.npz >/dev/null 2>&1; done ) &
  CPID=$!
  timeout $((LEFT - 1200)) python imgs/train.py \
    --dataset celeba-64 --sde lin --upsampling pixel_shuffle \
    --batch_size 256 --nsteps 256 --nepochs 3000 --schedule cos --grad_clip \
    --save_mem --bf16 --dp --checkpoint_every 50 "${RESUME[@]}" \
    >> "$LOG/celeba_train.log" 2>&1
  rc=$?
  kill "$CPID" 2>/dev/null
  ./commit_stage.sh "celeba-64 training checkpoints (r5, rc=$rc)" checkpoints/celeba-64_lin_*.npz
  NEW=$(latest_ck)
  if [ "${NEW:-0}" = "${CUR:-0}" ]; then
    NOPROG=$((NOPROG + 1))
    stage "no new checkpoint (rc=$rc, attempt $NOPROG)"; tail -5 "$LOG/celeba_train.log"
    [ "$NOPROG" -ge 2 ] && break
    sleep 120
  else
    NOPROG=0
  fi
done

stage "j: final tabulation on CPU"
FBS_PLATFORM=cpu python tabulators/tabulate_imgs.py \
  > "$OUT/tables23_r5.txt" 2>/dev/null || true
tail -40 "$OUT/tables23_r5.txt" || true
./commit_stage.sh "r5 queue final tabulation"
stage "r5c queue done"
touch "$LOG/DONE_r5"
