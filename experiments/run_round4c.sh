#!/bin/bash
# Round-4 queue, part 2 (r4c): successor to run_round4.sh, adding the
# on-chip probe of the fused linear-attention gate between CelebA training
# and the CelebA table rows:
#   1. finish the supr pMCMC N=10 row (in flight at takeover; resumes)
#   2. finish the supr gibbs N=100 row (92 -> 100)
#   3. CelebA-HQ-64 training (3000-epoch reference recipe, resumable)
#   4. PROBE: bench.py with / without --fused_linear_attn -> JSON artifacts
#      (decides whether the fused gate becomes the bench default)
#   5. CelebA-64 table rows, breadth-first (30 y0s then 100)
#   6. tabulate (CPU)
# Commits after every unit.  CHIP_DEADLINE leaves the tunnel free for the
# driver's bench.py run at round end (~11:07 UTC).
set -u
cd "$(dirname "$0")"
LOG=${LOG:-/tmp/r4}
OUT=../docs/measurements
mkdir -p "$LOG" "$OUT"
CHIP_DEADLINE=${CHIP_DEADLINE:-09:30}   # UTC
TRAIN_CUTOFF=${TRAIN_CUTOFF:-10800}     # stop training when < this many s left

if [ -f /tmp/r4c_wait.pid ]; then
  P=$(head -1 /tmp/r4c_wait.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 30; done
fi
echo "tunnel free; r4c starting at $(date -u +%H:%M:%S)"

past_deadline() {
  local now target
  now=$(date -u +%s)
  target=$(date -u -d "today $CHIP_DEADLINE" +%s)
  [ "$target" -lt $((now - 43200)) ] && target=$((target + 86400))
  [ "$now" -ge "$target" ]
}
seconds_left() {
  local now target
  now=$(date -u +%s)
  target=$(date -u -d "today $CHIP_DEADLINE" +%s)
  [ "$target" -lt $((now - 43200)) ] && target=$((target + 86400))
  echo $((target - now))
}
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
  if past_deadline; then stage "deadline $CHIP_DEADLINE; skipping: $msg"; return 0; fi
  local done
  done=$(done_count "$dir" "$prefix" "$tag")
  if [ "$done" -ge "$ny" ]; then
    stage "complete ($done/$ny): $msg"
    ./commit_stage.sh "$msg"
    return 0
  fi
  stage "[resume from $done] $*"
  timeout "$(budget "$cap")" python "$@" --start_from="$done" >> "$LOG/tables.log" 2>&1 \
    || { echo "unit rc=$? (timeout or error): $msg"; tail -3 "$LOG/tables.log"; }
  ./commit_stage.sh "$msg"
}

EPOCH=2999
MCOMMON="--dataset=mnist --sde=lin --test_nsteps=1000 --test_epoch=$EPOCH \
  --test_ema --test_seed=996 --bf16 --save_png_every=25"
P10="--nparticles=10 --ny0s=100 --nsamples=20 --y0s_per_dispatch=4 --sweeps_per_dispatch=1"
M100="--nparticles=100 --ny0s=100 --nsamples=5 --y0s_per_dispatch=4 --sweeps_per_dispatch=1"

stage "1/6 finish the supr pMCMC N=10 row"
unit 6600 results_supr mnist-4-lin-10 pmcmc-0.005 100 \
  "Table 3 N=10 pMCMC rows: supr-4, 100 y0s x 20 samples" \
  imgs/supr.py $MCOMMON $P10 --rate=4 --method=pmcmc-0.005

stage "2/6 finish the supr gibbs N=100 row (92 -> 100)"
unit 1800 results_supr mnist-4-lin-100 gibbs-eb-ef 100 \
  "Table 3 N=100 gibbs rows: supr-4, 100/100 y0s" \
  imgs/supr.py $MCOMMON $M100 --rate=4 --method=gibbs-eb-ef

stage "3/6 CelebA-HQ-64 score-model training (3000-epoch reference recipe)"
latest_ck() {
  ls checkpoints/celeba-64_lin_*.npz 2>/dev/null \
    | sed 's/.*_\([0-9]*\)\.npz/\1/' | sort -n | tail -1
}
while :; do
  LEFT=$(seconds_left)
  CUR=$(latest_ck)
  [ "${CUR:-0}" -ge 2999 ] 2>/dev/null && { stage "celeba-64 training complete (epoch $CUR)"; break; }
  if [ "$LEFT" -lt "$TRAIN_CUTOFF" ]; then
    stage "only ${LEFT}s left (< TRAIN_CUTOFF=$TRAIN_CUTOFF); stopping training at epoch ${CUR:-none}"
    break
  fi
  RESUME=()
  if [ -n "${CUR:-}" ]; then
    RESUME=(--init_from "checkpoints/celeba-64_lin_${CUR}.npz" --start_epoch $((CUR + 1)))
    stage "training resumes from epoch $CUR"
  else
    stage "training starts fresh"
  fi
  ( while sleep 600; do ./commit_stage.sh "celeba-64 training progress (r4)" \
      checkpoints/celeba-64_lin_*.npz >/dev/null 2>&1; done ) &
  CPID=$!
  timeout $((LEFT - TRAIN_CUTOFF + 60)) python imgs/train.py \
    --dataset celeba-64 --sde lin --upsampling pixel_shuffle \
    --batch_size 256 --nsteps 256 --nepochs 3000 --schedule cos --grad_clip \
    --save_mem --bf16 --dp --checkpoint_every 50 "${RESUME[@]}" \
    >> "$LOG/celeba_train.log" 2>&1
  rc=$?
  kill "$CPID" 2>/dev/null
  ./commit_stage.sh "celeba-64 training checkpoints (r4, rc=$rc)" checkpoints/celeba-64_lin_*.npz
  NEW=$(latest_ck)
  if [ "${NEW:-0}" = "${CUR:-0}" ] && [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ]; then
    stage "training made no progress (rc=$rc); see $LOG/celeba_train.log"
    tail -5 "$LOG/celeba_train.log"
    break
  fi
done

stage "4/6 probe: fused linear-attention gate on the config of record"
if ! past_deadline; then
  cd ..
  timeout "$(budget 2700)" python bench.py > "$OUT/bench_r4_plain.json" 2>"$LOG/bench_plain.err" \
    || { echo "plain bench rc=$?"; tail -3 "$LOG/bench_plain.err"; }
  tail -1 "$OUT/bench_r4_plain.json" || true
  timeout "$(budget 2700)" python bench.py --fused_linear_attn \
    > "$OUT/bench_r4_fusedattn.json" 2>"$LOG/bench_fusedattn.err" \
    || { echo "fused-attn bench rc=$?"; tail -3 "$LOG/bench_fusedattn.err"; }
  tail -1 "$OUT/bench_r4_fusedattn.json" || true
  cd experiments
  ./commit_stage.sh "Probe: fused linear-attention gate bench (r4)"
fi

stage "5/6 CelebA-64 table rows (inpaint-32 + supr-2)"
EP=$(latest_ck)
if [ -z "${EP:-}" ]; then
  stage "no celeba-64 checkpoint; skipping table rows"
else
  stage "sampling from celeba-64 epoch $EP"
  CCOMMON="--dataset=celeba-64 --sde=lin --test_nsteps=1000 --test_epoch=$EP \
    --test_ema --test_seed=996 --bf16 --save_png_every=25"
  C10="--nparticles=10 --nsamples=5 --y0s_per_dispatch=4 --sweeps_per_dispatch=1"
  C2="--nparticles=2 --nsamples=5 --y0s_per_dispatch=8 --sweeps_per_dispatch=1"
  CB="--nparticles=10 --nsamples=5 --samples_per_dispatch=5"
  for NY in 30 100; do
    unit 5400 results_inpainting celeba-64-32-lin-10 gibbs-eb-ef $NY \
      "CelebA-64 Table 2 N=10 gibbs rows ($NY y0s, epoch $EP)" \
      imgs/inpainting.py $CCOMMON $C10 --ny0s=$NY --rect_size=32 --method=gibbs-eb-ef
    unit 5400 results_supr celeba-64-2-lin-10 gibbs-eb-ef $NY \
      "CelebA-64 Table 3 N=10 gibbs rows ($NY y0s, epoch $EP)" \
      imgs/supr.py $CCOMMON $C10 --ny0s=$NY --rate=2 --method=gibbs-eb-ef
    unit 3600 results_inpainting celeba-64-32-lin-10 filter $NY \
      "CelebA-64 Table 2 N=10 filter rows ($NY y0s, epoch $EP)" \
      imgs/inpainting.py $CCOMMON $C10 --ny0s=$NY --rect_size=32 --method=filter
    unit 3600 results_supr celeba-64-2-lin-10 filter $NY \
      "CelebA-64 Table 3 N=10 filter rows ($NY y0s, epoch $EP)" \
      imgs/supr.py $CCOMMON $C10 --ny0s=$NY --rate=2 --method=filter
    unit 3600 results_inpainting celeba-64-32-lin-10 csgm $NY \
      "CelebA-64 Table 2 csgm rows ($NY y0s, epoch $EP)" \
      imgs/inpainting_csgm.py $CCOMMON $CB --ny0s=$NY --rect_size=32
    unit 3600 results_supr celeba-64-2-lin-10 csgm $NY \
      "CelebA-64 Table 3 csgm rows ($NY y0s, epoch $EP)" \
      imgs/supr_csgm.py $CCOMMON $CB --ny0s=$NY --rate=2
    unit 3600 results_inpainting celeba-64-32-lin-2 gibbs-eb-ef $NY \
      "CelebA-64 Table 2 N=2 gibbs rows ($NY y0s, epoch $EP)" \
      imgs/inpainting.py $CCOMMON $C2 --ny0s=$NY --rect_size=32 --method=gibbs-eb-ef
    unit 3600 results_supr celeba-64-2-lin-2 gibbs-eb-ef $NY \
      "CelebA-64 Table 3 N=2 gibbs rows ($NY y0s, epoch $EP)" \
      imgs/supr.py $CCOMMON $C2 --ny0s=$NY --rate=2 --method=gibbs-eb-ef
  done
fi

stage "6/6 tabulating on CPU (always runs)"
FBS_PLATFORM=cpu JAX_PLATFORMS=cpu python tabulators/tabulate_imgs.py \
  > "$OUT/tables23_r4.txt" 2>/dev/null || true
tail -40 "$OUT/tables23_r4.txt" || true
./commit_stage.sh "r4c queue final tabulation"
stage "r4c queue done"
touch "$LOG/DONE_r4c"
