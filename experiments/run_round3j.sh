#!/bin/bash
# Round-3 queue, part 7 (r3j): successor to r3h, launched when r3h exits.
#
# Differences from r3h, in priority order learned from the measured pacing
# (~9 min fixed cost/unit, ~23 s per vmapped N=10 sweep dispatch, ~30 s per
# vmapped 4-way N=100 sweep dispatch):
#   1. Resume-aware: each unit counts its consecutive completed per-y0
#      ``-<tag>.npy`` stacks from k=0 and passes --start_from, so units that
#      r3h finished are skipped outright (saving the fixed cost) and units
#      its per-unit timeout cut mid-run restart at the first missing y0.
#   2. A COMPLETE five-method comparison at N=10 (the paper's
#      method-ordering claim, Tables 2-3) outranks a deeper N sweep of
#      fewer methods: csgm + twisted run before any N=100 unit.
#   3. N=100 rows use nsamples=5: across-y0 PSNR SD (~10) dominates the
#      within-chain SD (~2-3), so the table SE is set by ny0s=100, not by
#      chain length; 5 sweeps/y0 costs ~nothing statistically and halves
#      chip time per unit (r3i's analysis).
#   4. sweeps_per_dispatch=2 for N=10 gibbs/pmcmc (~16 s/dispatch, inside
#      the tunnel's measured 8-21 s safe window; toys ran 100+ 21 s
#      dispatches) — halves the per-dispatch overhead tax.
#   5. The deadline only gates *device* units; tabulation is CPU-side and
#      ALWAYS runs (r3h's bail exited before it).
set -u
cd "$(dirname "$0")"
LOG=${LOG:-/tmp/r3j}
OUT=../docs/measurements
mkdir -p "$LOG" "$OUT"
DEADLINE=${DEADLINE:-22:45}   # UTC; frees the chip for the end-of-round bench

past_deadline() {
  local now target
  now=$(date -u +%s)
  target=$(date -u -d "today $DEADLINE" +%s)
  [ "$target" -lt $((now - 43200)) ] && target=$((target + 86400))
  [ "$now" -ge "$target" ]
}
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
stage() { echo "=== $(date -u +%H:%M:%S) $*"; }

EPOCH=2999
NY=100

COMMON="--dataset=mnist --sde=lin --test_nsteps=1000 --test_epoch=$EPOCH \
  --test_ema --test_seed=996 --bf16 --save_png_every=25"
M10="--nparticles=10 --ny0s=$NY --nsamples=20 --y0s_per_dispatch=20 --sweeps_per_dispatch=2"
B10="--nparticles=10 --ny0s=$NY --nsamples=20 --samples_per_dispatch=10"
M100="--nparticles=100 --ny0s=$NY --nsamples=5 --y0s_per_dispatch=4 --sweeps_per_dispatch=1"

# done_count <results_dir> <np> <size> <tag>: consecutive completed y0 stacks.
done_count() {
  local dir=$1 np=$2 size=$3 tag=$4 k=0
  while [ -f "imgs/$dir/mnist-$size-lin-$np-$k-$tag.npy" ]; do k=$((k + 1)); done
  echo "$k"
}

# unit <cap> <dir> <np> <size> <tag> <msg> <cmd...>
unit() {
  local cap=$1 dir=$2 np=$3 size=$4 tag=$5 msg=$6; shift 6
  if past_deadline; then stage "deadline $DEADLINE; skipping device unit: $msg"; return 0; fi
  local done
  done=$(done_count "$dir" "$np" "$size" "$tag")
  if [ "$done" -ge "$NY" ]; then stage "complete ($done/$NY), skipping: $msg"; return 0; fi
  stage "[resume from $done] $*"
  timeout "$(budget "$cap")" python "$@" --start_from="$done" >> "$LOG/tables.log" 2>&1 \
    || { echo "unit rc=$? (timeout or error): $msg"; tail -3 "$LOG/tables.log"; }
  ./commit_stage.sh "$msg"
}

stage "1/4 complete the N=10 gibbs/filter/pmcmc rows (resume r3h leftovers)"
unit 3600 results_inpainting 10 15 gibbs-eb-ef "Table 2 N=10 gibbs rows (r3j resume)"  imgs/inpainting.py $COMMON $M10 --rect_size=15 --method=gibbs-eb-ef
unit 3600 results_supr       10 4  gibbs-eb-ef "Table 3 N=10 gibbs rows (r3j resume)"  imgs/supr.py       $COMMON $M10 --rate=4       --method=gibbs-eb-ef
unit 3000 results_inpainting 10 15 filter      "Table 2 N=10 filter rows (r3j resume)" imgs/inpainting.py $COMMON $M10 --rect_size=15 --method=filter
unit 3000 results_supr       10 4  filter      "Table 3 N=10 filter rows (r3j resume)" imgs/supr.py       $COMMON $M10 --rate=4       --method=filter
unit 3600 results_inpainting 10 15 pmcmc-0.005 "Table 2 N=10 pMCMC rows (r3j resume)"  imgs/inpainting.py $COMMON $M10 --rect_size=15 --method=pmcmc-0.005
unit 3600 results_supr       10 4  pmcmc-0.005 "Table 3 N=10 pMCMC rows (r3j resume)"  imgs/supr.py       $COMMON $M10 --rate=4       --method=pmcmc-0.005

stage "2/4 one-shot baselines at N=10 -> complete five-method coverage"
unit 2400 results_inpainting 10 15 csgm    "Table 2 N=10 CSGM rows"    imgs/inpainting_csgm.py    $COMMON $B10 --rect_size=15
unit 2400 results_supr       10 4  csgm    "Table 3 N=10 CSGM rows"    imgs/supr_csgm.py          $COMMON $B10 --rate=4
unit 5400 results_inpainting 10 15 twisted "Table 2 N=10 twisted rows" imgs/inpainting_twisted.py $COMMON $B10 --rect_size=15
unit 5400 results_supr       10 4  twisted "Table 3 N=10 twisted rows" imgs/supr_twisted.py       $COMMON $B10 --rate=4

stage "3/4 N=100 rows (gibbs first, then filter, then pmcmc; nsamples=5)"
unit 7200 results_inpainting 100 15 gibbs-eb-ef "Table 2 N=100 gibbs rows: inpaint-15, 100 y0s" imgs/inpainting.py $COMMON $M100 --rect_size=15 --method=gibbs-eb-ef
unit 7200 results_supr       100 4  gibbs-eb-ef "Table 3 N=100 gibbs rows: supr-4, 100 y0s"     imgs/supr.py       $COMMON $M100 --rate=4       --method=gibbs-eb-ef
unit 7200 results_inpainting 100 15 filter      "Table 2 N=100 filter rows"                     imgs/inpainting.py $COMMON $M100 --rect_size=15 --method=filter
unit 7200 results_supr       100 4  filter      "Table 3 N=100 filter rows"                     imgs/supr.py       $COMMON $M100 --rate=4       --method=filter
unit 7200 results_inpainting 100 15 pmcmc-0.005 "Table 2 N=100 pMCMC rows"                      imgs/inpainting.py $COMMON $M100 --rect_size=15 --method=pmcmc-0.005
unit 7200 results_supr       100 4  pmcmc-0.005 "Table 3 N=100 pMCMC rows"                      imgs/supr.py       $COMMON $M100 --rate=4       --method=pmcmc-0.005

stage "4/4 tabulating on CPU (always runs) -> $OUT/tables23_r3.txt"
{
  for METHOD in gibbs-eb-ef filter pmcmc-0.005 twisted csgm; do
    for NP in 10 100; do
      FBS_PLATFORM=cpu python tabulators/tabulate_imgs.py --task=inpainting --dataset=mnist \
        --size=15 --nparticles=$NP --method=$METHOD || true
      FBS_PLATFORM=cpu python tabulators/tabulate_imgs.py --task=supr --dataset=mnist \
        --size=4 --nparticles=$NP --method=$METHOD || true
    done
  done
} > "$OUT/tables23_r3.txt" 2>&1
{
  FBS_PLATFORM=cpu python tabulators/tabulate_toy.py --nparticles 100 || true
  FBS_PLATFORM=cpu python tabulators/tabulate_toy.py --nparticles 10 || true
} > "$OUT/table1_r3.txt" 2>&1
{
  FBS_PLATFORM=cpu python tabulators/plot_sb.py --method gibbs-eb || true
  FBS_PLATFORM=cpu python tabulators/plot_sb.py --method filter || true
} > "$OUT/table_sb_r3.txt" 2>&1
./commit_stage.sh "Tabulated Tables 1-3 + SB ablation from the committed round-3 artifacts"

stage "queue done"
touch "$LOG/DONE"
