#!/bin/bash
# Round-4 queue, part 4 (r4e): post-VM-restart recovery queue.  The restart
# killed r4c mid-CelebA-training (last committed checkpoint: epoch 949) and
# r4d never ran.  Lessons applied: fill table cells BEFORE long training so
# another restart cannot leave the round with trained weights but no rows.
# Order (VERDICT r3 priorities, re-hedged):
#   0. wait for the regenerated synthetic datasets (deterministic seeds)
#   1. bench probe: plain vs --fused_linear_attn (decides the bench default)
#   2. finish the supr twisted N=10 row (63 -> 100)
#   3. CelebA-64 table rows, 30 y0s, from the committed epoch-949 model:
#      gibbs N in {2,10}, filter, csgm, twisted; both tasks
#   4. MNIST N=100 filter + twisted rows (Tables 2-3)
#   5. MNIST N=100 pMCMC rows (tunnel-safe 2x1 geometry)
#   6. CelebA-64 rows 30 -> 100 y0s (same epoch pin)
#   7. SB-IPF deepening (warm start, commit per iteration)
#   8. toy Table 1 twisted N=100 (the last Table-1 hole)
#   9. resume CelebA-64 training with the remaining chip time
#  10. tabulate on CPU
# Deadline is absolute (start + HORIZON seconds, persisted to a file) so it
# survives queue restarts and midnight — the old today-HH:MM helper skipped
# everything when the clock passed the mark by < 12 h.
set -u
cd "$(dirname "$0")"
LOG=${LOG:-/tmp/r4}
# Absolute (cwd-independent) measurements dir: stage 1 runs bench.py from the
# repo root, where a relative ../docs would resolve OUTSIDE the repo.
OUT="$PWD/../docs/measurements"
mkdir -p "$LOG" "$OUT"
DEADLINE_FILE=/tmp/r4e_deadline
if [ -f "$DEADLINE_FILE" ]; then
  DEADLINE=$(cat "$DEADLINE_FILE")
else
  DEADLINE=$(( $(date +%s) + ${HORIZON:-64800} ))
  echo "$DEADLINE" > "$DEADLINE_FILE"
fi
echo "r4e starting at $(date -u +%H:%M:%S); deadline $(date -u -d @"$DEADLINE" +%m-%dT%H:%M)"

past_deadline() { [ "$(date +%s)" -ge "$DEADLINE" ]; }
seconds_left() { echo $(( DEADLINE - $(date +%s) )); }
budget() {
  local cap=$1 left
  left=$(seconds_left)
  [ "$left" -lt 60 ] && left=60
  [ "$left" -gt "$cap" ] && left=$cap
  echo "$left"
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

stage "0/10 waiting for regenerated datasets"
for i in $(seq 1 240); do
  [ -f datasets/mnist.npz ] && [ -f datasets/celeba_hq64.npy ] && break
  sleep 30
done
[ -f datasets/mnist.npz ] || { stage "mnist.npz never appeared; aborting"; exit 1; }
python - <<'EOF' || exit 1
import numpy as np
d = np.load("datasets/mnist.npz")
assert d["X"].shape == (60000, 784), d["X"].shape
c = np.load("datasets/celeba_hq64.npy", mmap_mode="r")
assert c.shape[1:] == (64, 64, 3), c.shape
print("datasets ok:", d["X"].shape, c.shape)
EOF

stage "1/10 bench probe: plain vs fused linear-attention gate"
# Content-checked guard (ADVICE r4): a timeout/kill must not leave a 0-byte
# file that permanently marks the probe done.  Write to a temp file and mv
# on success.
if ! { [ -s "$OUT/bench_r4_fusedattn.json" ] \
       && grep -q '"metric"' "$OUT/bench_r4_fusedattn.json"; } && ! past_deadline; then
  cd ..
  for VARIANT in plain fusedattn; do
    EXTRA=""; [ "$VARIANT" = fusedattn ] && EXTRA="--fused_linear_attn"
    timeout "$(budget 1800)" python bench.py $EXTRA \
      > "$OUT/bench_r4_$VARIANT.json.tmp" 2>"$LOG/bench_$VARIANT.err" \
      || { echo "$VARIANT bench rc=$?"; tail -3 "$LOG/bench_$VARIANT.err"; }
    if [ -s "$OUT/bench_r4_$VARIANT.json.tmp" ] \
       && grep -q '"metric"' "$OUT/bench_r4_$VARIANT.json.tmp"; then
      mv "$OUT/bench_r4_$VARIANT.json.tmp" "$OUT/bench_r4_$VARIANT.json"
      tail -1 "$OUT/bench_r4_$VARIANT.json"
    else
      rm -f "$OUT/bench_r4_$VARIANT.json.tmp"
    fi
  done
  cd experiments
  ./commit_stage.sh "Probe: fused linear-attention gate bench (r4e)"
fi

EPOCH=2999
MCOMMON="--dataset=mnist --sde=lin --test_nsteps=1000 --test_epoch=$EPOCH \
  --test_ema --test_seed=996 --bf16 --save_png_every=25"
B10="--nparticles=10 --ny0s=100 --nsamples=20 --samples_per_dispatch=5"
M100="--nparticles=100 --ny0s=100 --nsamples=5 --y0s_per_dispatch=4 --sweeps_per_dispatch=1"
T100="--nparticles=100 --ny0s=100 --nsamples=5 --samples_per_dispatch=2"
P100="--nparticles=100 --ny0s=100 --nsamples=5 --y0s_per_dispatch=2 --sweeps_per_dispatch=1"

stage "2/10 finish the supr twisted N=10 row (63 -> 100)"
unit 5400 results_supr mnist-4-lin-10 twisted 100 \
  "Table 3 N=10 twisted rows: supr-4, 100 y0s (r4e)" \
  imgs/supr_twisted.py $MCOMMON $B10 --rate=4

# ---- CelebA-64 rows: pin the sampling epoch so later training cannot mix
# checkpoints within one row (artifact names carry no epoch).
latest_ck() {
  ls checkpoints/celeba-64_lin_*[0-9].npz 2>/dev/null | grep -v _ema \
    | sed 's/.*_\([0-9]*\)\.npz/\1/' | sort -n | tail -1
}
EPFILE=imgs/celeba64_rows_epoch.txt
if [ -f "$EPFILE" ]; then EP=$(cat "$EPFILE"); else
  EP=$(latest_ck); echo "$EP" > "$EPFILE"
fi
stage "CelebA-64 rows sample from pinned epoch $EP"
CCOMMON="--dataset=celeba-64 --sde=lin --test_nsteps=1000 --test_epoch=$EP \
  --test_ema --test_seed=996 --bf16 --save_png_every=25"
C10="--nparticles=10 --nsamples=5 --y0s_per_dispatch=4 --sweeps_per_dispatch=1"
C2="--nparticles=2 --nsamples=5 --y0s_per_dispatch=8 --sweeps_per_dispatch=1"
CB="--nparticles=10 --nsamples=5 --samples_per_dispatch=5"

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

stage "3/10 CelebA-64 table rows, 30 y0s (epoch $EP)"
celeba_rows 30 7200 5400

stage "4/10 MNIST N=100 filter + twisted rows"
unit 6300 results_inpainting mnist-15-lin-100 filter 100 \
  "Table 2 N=100 filter rows (r4e)" \
  imgs/inpainting.py $MCOMMON $M100 --rect_size=15 --method=filter
unit 6300 results_supr mnist-4-lin-100 filter 100 \
  "Table 3 N=100 filter rows (r4e)" \
  imgs/supr.py $MCOMMON $M100 --rate=4 --method=filter
unit 6300 results_inpainting mnist-15-lin-100 twisted 100 \
  "Table 2 N=100 twisted rows (r4e)" \
  imgs/inpainting_twisted.py $MCOMMON $T100 --rect_size=15
unit 6300 results_supr mnist-4-lin-100 twisted 100 \
  "Table 3 N=100 twisted rows (r4e)" \
  imgs/supr_twisted.py $MCOMMON $T100 --rate=4

stage "5/10 MNIST N=100 pMCMC rows (2x1 dispatches)"
unit 7200 results_inpainting mnist-15-lin-100 pmcmc-0.005 100 \
  "Table 2 N=100 pMCMC rows (r4e)" \
  imgs/inpainting.py $MCOMMON $P100 --rect_size=15 --method=pmcmc-0.005
unit 7200 results_supr mnist-4-lin-100 pmcmc-0.005 100 \
  "Table 3 N=100 pMCMC rows (r4e)" \
  imgs/supr.py $MCOMMON $P100 --rate=4 --method=pmcmc-0.005

stage "6/10 CelebA-64 rows 30 -> 100 y0s"
celeba_rows 100 7200 5400

stage "7/10 SB-IPF deepening (warm start, commit per iteration)"
latest_sb() {
  ls checkpoints/sb_mnist_lin_*.npz 2>/dev/null | grep -v _bwd \
    | sed 's/.*_\([0-9]*\)\.npz/\1/' | sort -n | tail -1
}
while :; do
  LEFT=$(seconds_left)
  [ "$LEFT" -lt 9000 ] && { stage "only ${LEFT}s left; no more SB iterations"; break; }
  CUR=$(latest_sb)
  [ -z "$CUR" ] && { stage "no SB checkpoint to warm-start from"; break; }
  NEXT=$((CUR + 1))
  [ "$NEXT" -gt 10 ] && { stage "SB depth 10 reached"; break; }
  stage "SB-IPF iteration $NEXT (warm start from $CUR)"
  timeout "$(budget 3600)" \
    python sb_imgs/train.py --dataset mnist --sde lin --T 0.5 \
    --batch_size 64 --nsteps 32 --nepochs 2 --nsbs $((NEXT + 1)) \
    --start_sb "$NEXT" --schedule cos --grad_clip --vmap_loss --bf16 \
    > "$LOG/sb_train_$NEXT.log" 2>&1
  rc=$?
  tail -2 "$LOG/sb_train_$NEXT.log" || true
  if [ -f "checkpoints/sb_mnist_lin_${NEXT}.npz" ]; then
    ./commit_stage.sh "SB-IPF iteration $NEXT (r4e)" \
      "checkpoints/sb_mnist_lin_${NEXT}.npz" "checkpoints/sb_mnist_lin_${NEXT}_bwd.npz"
  else
    stage "iteration $NEXT produced no checkpoint (rc=$rc); stopping"
    break
  fi
done

stage "8/10 toy Table 1 twisted N=100 (the last Table-1 hole)"
if [ ! -f toy/results/COMPACT_twisted_100.done ] && ! past_deadline \
   && [ "$(seconds_left)" -gt 7200 ]; then
  timeout "$(budget 6000)" python toy/gp_production.py --d 100 --nparticles 100 \
    --nsamples 10000 --nmc 100 --sde const --methods twisted \
    --skip_existing > "$LOG/toy_twisted100.log" 2>&1 \
    || { echo "twisted-100 rc=$?"; tail -3 "$LOG/toy_twisted100.log"; }
  python compact_results.py --roots toy/results
  touch toy/results/COMPACT_twisted_100.done
  ./commit_stage.sh "Toy Table 1: twisted N=100 cell (100 MC reps)"
fi

stage "9/10 resume CelebA-64 training with the remaining chip time"
while :; do
  LEFT=$(seconds_left)
  CUR=$(latest_ck)
  [ "${CUR:-0}" -ge 2999 ] 2>/dev/null && { stage "celeba-64 training complete (epoch $CUR)"; break; }
  if [ "$LEFT" -lt 1200 ]; then
    stage "only ${LEFT}s left; stopping training at epoch ${CUR:-none}"
    break
  fi
  RESUME=()
  if [ -n "${CUR:-}" ]; then
    RESUME=(--init_from "checkpoints/celeba-64_lin_${CUR}.npz" --start_epoch $((CUR + 1)))
    stage "training resumes from epoch $CUR"
  else
    stage "training starts fresh"
  fi
  ( while sleep 600; do ./commit_stage.sh "celeba-64 training progress (r4e)" \
      checkpoints/celeba-64_lin_*.npz >/dev/null 2>&1; done ) &
  CPID=$!
  timeout $((LEFT - 900)) python imgs/train.py \
    --dataset celeba-64 --sde lin --upsampling pixel_shuffle \
    --batch_size 256 --nsteps 256 --nepochs 3000 --schedule cos --grad_clip \
    --save_mem --bf16 --dp --checkpoint_every 50 "${RESUME[@]}" \
    >> "$LOG/celeba_train.log" 2>&1
  rc=$?
  kill "$CPID" 2>/dev/null
  ./commit_stage.sh "celeba-64 training checkpoints (r4e, rc=$rc)" checkpoints/celeba-64_lin_*.npz
  NEW=$(latest_ck)
  if [ "${NEW:-0}" = "${CUR:-0}" ] && [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ]; then
    stage "training made no progress (rc=$rc); see $LOG/celeba_train.log"
    tail -5 "$LOG/celeba_train.log"
    break
  fi
done

stage "10/10 tabulating on CPU (always runs)"
FBS_PLATFORM=cpu JAX_PLATFORMS=cpu python tabulators/tabulate_imgs.py \
  > "$OUT/tables23_r4.txt" 2>/dev/null || true
tail -40 "$OUT/tables23_r4.txt" || true
./commit_stage.sh "r4e queue final tabulation"
stage "r4e queue done"
touch "$LOG/DONE_r4e"
