#!/bin/bash
# Round-4 queue: judge priority order from VERDICT r3.
#   1. Finish the pMCMC N=10 rows of Tables 2-3 (VERDICT item 3) — the
#      inpainting half was in flight when this queue took over from r3k;
#      both units resume from committed artifacts.
#   2. Finish the supr gibbs N=100 row (92/100 at r3j's deadline; item 4).
#   3. Train the CelebA-HQ-64 score model (VERDICT item 1) — the full
#      3000-epoch reference recipe (/root/reference/experiments/run_train.sh),
#      resumable from the latest committed npz checkpoint, committed every
#      checkpoint interval so a VM restart loses at most a few minutes.
#   4. Fill CelebA-64 table rows (inpaint-32, supr-2; reference
#      bashes/imgs_gibbs.sh:21-39): breadth-first at 30 y0s across
#      gibbs/filter/csgm at N in {2,10}, then resume the same units toward
#      100 y0s until the chip deadline.
#   5. Tabulate on CPU.
# Commits after every unit (commit_stage.sh).  CHIP_DEADLINE leaves the
# tunnel free for the driver's bench.py run at round end (~11:07 UTC).
set -u
cd "$(dirname "$0")"
LOG=${LOG:-/tmp/r4}
OUT=../docs/measurements
mkdir -p "$LOG" "$OUT"
CHIP_DEADLINE=${CHIP_DEADLINE:-09:30}   # UTC
TRAIN_CUTOFF=${TRAIN_CUTOFF:-10800}     # stop training when < this many s left

# ---- wait for the previous tunnel holder (never two processes on it) ----
if [ -f /tmp/r4_wait.pid ]; then
  P=$(head -1 /tmp/r4_wait.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 30; done
fi
echo "tunnel free; r4 starting at $(date -u +%H:%M:%S)"

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

done_count() {  # done_count <dir> <prefix> <tag> -> consecutive finished y0s
  local dir=$1 prefix=$2 tag=$3 k=0
  while [ -f "imgs/$dir/$prefix-$k-$tag.npy" ]; do k=$((k + 1)); done
  echo "$k"
}

unit() {  # unit <cap> <dir> <prefix> <tag> <ny> <msg> <cmd...>
  local cap=$1 dir=$2 prefix=$3 tag=$4 ny=$5 msg=$6; shift 6
  if past_deadline; then stage "deadline $CHIP_DEADLINE; skipping: $msg"; return 0; fi
  local done
  done=$(done_count "$dir" "$prefix" "$tag")
  if [ "$done" -ge "$ny" ]; then stage "complete ($done/$ny), skipping: $msg"; return 0; fi
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

stage "1/5 pMCMC N=10 rows of Tables 2-3 (tunnel-safe 4x1 dispatches)"
unit 5400 results_inpainting mnist-15-lin-10 pmcmc-0.005 100 \
  "Table 2 N=10 pMCMC rows (r4)" \
  imgs/inpainting.py $MCOMMON $P10 --rect_size=15 --method=pmcmc-0.005
unit 6600 results_supr mnist-4-lin-10 pmcmc-0.005 100 \
  "Table 3 N=10 pMCMC rows (r4)" \
  imgs/supr.py $MCOMMON $P10 --rate=4 --method=pmcmc-0.005

stage "2/5 finish the supr gibbs N=100 row (resume from r3j's 92/100)"
unit 1800 results_supr mnist-4-lin-100 gibbs-eb-ef 100 \
  "Table 3 N=100 gibbs rows: 100/100 y0s (r4)" \
  imgs/supr.py $MCOMMON $M100 --rate=4 --method=gibbs-eb-ef

stage "3/5 CelebA-HQ-64 score-model training (3000-epoch reference recipe)"
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
  # Background committer: persist checkpoints against a VM restart.
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

stage "4/5 CelebA-64 table rows (inpaint-32 + supr-2)"
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

stage "5/5 tabulating on CPU (always runs)"
FBS_PLATFORM=cpu JAX_PLATFORMS=cpu python tabulators/tabulate_imgs.py \
  > "$OUT/tables23_r4.txt" 2>/dev/null || true
tail -40 "$OUT/tables23_r4.txt" || true
./commit_stage.sh "r4 queue final tabulation"
stage "r4 queue done"
touch "$LOG/DONE"
