#!/bin/bash
# Round-3 queue, part 5 (r3h): the Tables 2-3 stages, re-parameterised from
# on-chip probes after r3g's units crashed the remote worker.
#
# What the probes established (see STATUS "operational caveat"):
#   - per-dispatch execution ceiling: ~40 s dispatches get the worker killed;
#     ~8-17 s dispatches are reliably safe (the morning's toy stages ran 100+
#     21 s dispatches).  r3f/r3g's sweeps_per_dispatch=5 at 20-way y0 vmap
#     (~40-50 s) died on the first sweep dispatch, reproducibly (same crash
#     killed r3e's table stages last night).
#   - each CLI invocation pays ~6-7 min fixed: imports + checkpoint/dataset
#     load + upload of the ~120 MB compiled executable (or its compile) and
#     ~100 MB params through the tunnel.  Dispatches after that are ~8 s.
# Hence: sweeps_per_dispatch=1 everywhere (the fixed cost dominates, so
# shorter dispatches cost ~nothing); one-shot baselines at
# samples_per_dispatch=10.  Cheap+critical units first
# (gibbs, filter, pmcmc at both N), twisted last (its per-y0 serial loop
# costs ~40 min/unit regardless of chunking).
set -u
cd "$(dirname "$0")"
LOG=${LOG:-/tmp/r3h}
OUT=../docs/measurements
mkdir -p "$LOG" "$OUT"
DEADLINE=${DEADLINE:-17:15}   # UTC

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
bail() { stage "deadline $DEADLINE; stopping before: $*"; touch "$LOG/DONE"; exit 0; }

EPOCH=2999
NY=100

COMMON="--dataset=mnist --sde=lin --test_nsteps=1000 --test_epoch=$EPOCH \
  --test_ema --test_seed=996 --bf16 --save_png_every=25"
M10="--nparticles=10 --ny0s=$NY --nsamples=20 --y0s_per_dispatch=20 --sweeps_per_dispatch=1"
B10="--nparticles=10 --ny0s=$NY --nsamples=20 --samples_per_dispatch=10"
C10="--nparticles=10 --ny0s=$NY --nsamples=20 --samples_per_dispatch=10"
M100="--nparticles=100 --ny0s=$NY --nsamples=10 --y0s_per_dispatch=4 --sweeps_per_dispatch=1"

unit() {  # unit <cap-seconds> <commit-msg> <cmd...>
  local cap=$1 msg=$2; shift 2
  past_deadline && bail "$msg"
  stage "$*"
  timeout "$(budget "$cap")" python "$@" >> "$LOG/tables.log" 2>&1 \
    || { echo "unit FAILED (rc=$?): $*"; tail -5 "$LOG/tables.log"; }
  ./commit_stage.sh "$msg"
}

stage "1/3 Tables 2-3: gibbs/filter/pmcmc rows, N=10 then N=100, ny0s=$NY"
unit 3600 "Table 2 N=10 gibbs rows: inpaint-15, 100 y0s"  imgs/inpainting.py $COMMON $M10 --rect_size=15 --method=gibbs-eb-ef
unit 3600 "Table 3 N=10 gibbs rows: supr-4, 100 y0s"      imgs/supr.py       $COMMON $M10 --rate=4       --method=gibbs-eb-ef
unit 2700 "Table 2 N=10 filter rows"                      imgs/inpainting.py $COMMON $M10 --rect_size=15 --method=filter
unit 2700 "Table 3 N=10 filter rows"                      imgs/supr.py       $COMMON $M10 --rate=4       --method=filter
unit 3600 "Table 2 N=10 pMCMC rows"                       imgs/inpainting.py $COMMON $M10 --rect_size=15 --method=pmcmc-0.005
unit 3600 "Table 3 N=10 pMCMC rows"                       imgs/supr.py       $COMMON $M10 --rate=4       --method=pmcmc-0.005
unit 3600 "Table 2 N=100 gibbs rows: inpaint-15, 100 y0s" imgs/inpainting.py $COMMON $M100 --rect_size=15 --method=gibbs-eb-ef
unit 3600 "Table 3 N=100 gibbs rows: supr-4, 100 y0s"     imgs/supr.py       $COMMON $M100 --rate=4       --method=gibbs-eb-ef
unit 2700 "Table 2 N=100 filter rows"                     imgs/inpainting.py $COMMON $M100 --rect_size=15 --method=filter
unit 2700 "Table 3 N=100 filter rows"                     imgs/supr.py       $COMMON $M100 --rate=4       --method=filter
unit 3600 "Table 2 N=100 pMCMC rows"                      imgs/inpainting.py $COMMON $M100 --rect_size=15 --method=pmcmc-0.005
unit 3600 "Table 3 N=100 pMCMC rows"                      imgs/supr.py       $COMMON $M100 --rate=4       --method=pmcmc-0.005

stage "2/3 one-shot baselines: csgm (fast), then twisted (slow, per-y0 serial)"
unit 2400 "Table 2 N=10 CSGM rows"                        imgs/inpainting_csgm.py    $COMMON $C10 --rect_size=15
unit 2400 "Table 3 N=10 CSGM rows"                        imgs/supr_csgm.py          $COMMON $C10 --rate=4
unit 3600 "Table 2 N=10 twisted rows"                     imgs/inpainting_twisted.py $COMMON $B10 --rect_size=15
unit 3600 "Table 3 N=10 twisted rows"                     imgs/supr_twisted.py       $COMMON $B10 --rate=4

stage "3/3 tabulating (CPU, auto-detected scale) -> $OUT/tables23_r3.txt"
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
