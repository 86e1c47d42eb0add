#!/bin/bash
# Round-3 queue, part 4 (r3g).  Mid-session restructuring of r3f: a wedged
# tunnel client cost stage 1 its pmcmc/filter/twisted/csgm methods at N=100,
# and r3f's tail (which would have refilled them) only runs after the table
# stages — i.e. never, at the measured stage costs.  This queue runs the
# remaining chip work in judge-priority order with the cheap units ahead of
# the expensive ones inside each stage:
#   1. toy Table-1 N=100 hole fill (gp_production --skip_existing re-runs
#      exactly the missing methods)
#   2. Gaussian-SB ablation (100 reps, N in {4,8,16,32,64})
#   3. Tables 2-3 N=10 rows (five methods x two tasks, 100 y0s)
#   4. Tables 2-3 N=100 rows — gibbs first, then the cheap filter rows,
#      pmcmc last (the only rows the deadline may cut; round-2 has pmcmc
#      numbers at reduced scale if so)
#   5. tabulate everything
# Commits after every method-level unit (commit_stage.sh), so a VM restart
# or a tunnel wedge loses at most one unit.
set -u
cd "$(dirname "$0")"
LOG=${LOG:-/tmp/r3g}
OUT=../docs/measurements
mkdir -p "$LOG" "$OUT"
DEADLINE=${DEADLINE:-16:15}   # UTC

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

stage "1/5 toy Table 1: fill N=100 holes (skip_existing), then N=10 leftovers"
# twisted-const-100 is deliberately excluded: measured ~68 min of chip time
# (10x its N=10 cost) that the Tables 2-3 stages need more; its N=10 row is
# committed and the method's scaling story is covered there.
timeout "$(budget 9000)" python toy/gp_production.py --d 100 --nparticles 100 \
  --nsamples 10000 --nmc 100 --sde const --dispatch_sweeps 100 \
  --methods gibbs-eb,pmcmc-0.005,pmcmc-0.001,filter,csgm \
  --skip_existing > "$LOG/toy100.log" 2>&1
tail -8 "$LOG/toy100.log" || true
timeout "$(budget 3600)" python toy/gp_production.py --d 100 --nparticles 10 \
  --nsamples 10000 --nmc 100 --sde const --dispatch_sweeps 500 \
  --skip_existing > "$LOG/toy10.log" 2>&1
tail -8 "$LOG/toy10.log" || true
python compact_results.py --roots toy/results
./commit_stage.sh "Toy Table 1: fill the method rows lost to the tunnel wedge (100 MC reps)"

past_deadline && bail "SB ablation"
stage "2/5 Gaussian-SB ablation: 100 reps, N in {4,8,16,32,64}"
timeout "$(budget 7200)" python sb/sb_production.py --d 10 --nmc 100 --nsamples 10000 \
  --nparticles 4 8 16 32 64 --dispatch_sweeps 100 > "$LOG/sb_abl.log" 2>&1
tail -12 "$LOG/sb_abl.log" || true
python compact_results.py --roots sb/results
./commit_stage.sh "Gaussian-SB ablation artifacts at 100 reps, N in {4,8,16,32,64} (compacted moments)"

COMMON="--dataset=mnist --sde=lin --test_nsteps=1000 --test_epoch=$EPOCH \
  --test_ema --test_seed=996 --bf16 --save_png_every=25"
M10="--nparticles=10 --ny0s=$NY --nsamples=20 --y0s_per_dispatch=20 --sweeps_per_dispatch=5"
B10="--nparticles=10 --ny0s=$NY --nsamples=20 --samples_per_dispatch=10"
C10="--nparticles=10 --ny0s=$NY --nsamples=20 --samples_per_dispatch=50"
M100="--nparticles=100 --ny0s=$NY --nsamples=10 --y0s_per_dispatch=4 --sweeps_per_dispatch=2"

unit() {  # unit <cap-seconds> <commit-msg> <cmd...>
  local cap=$1 msg=$2; shift 2
  past_deadline && bail "$msg"
  stage "$*"
  timeout "$(budget "$cap")" python "$@" >> "$LOG/tables.log" 2>&1 \
    || { echo "unit FAILED (rc=$?): $*"; tail -5 "$LOG/tables.log"; }
  ./commit_stage.sh "$msg"
}

stage "3/5 Tables 2-3 stage a: N=10 rows, five methods, ny0s=$NY"
unit 5400 "Table 2 N=10 gibbs rows: inpaint-15, 100 y0s"  imgs/inpainting.py $COMMON $M10 --rect_size=15 --method=gibbs-eb-ef
unit 5400 "Table 3 N=10 gibbs rows: supr-4, 100 y0s"      imgs/supr.py       $COMMON $M10 --rate=4       --method=gibbs-eb-ef
unit 3600 "Table 2 N=10 filter rows"                      imgs/inpainting.py $COMMON $M10 --rect_size=15 --method=filter
unit 3600 "Table 3 N=10 filter rows"                      imgs/supr.py       $COMMON $M10 --rate=4       --method=filter
unit 5400 "Table 2 N=10 pMCMC rows"                       imgs/inpainting.py $COMMON $M10 --rect_size=15 --method=pmcmc-0.005
unit 5400 "Table 3 N=10 pMCMC rows"                       imgs/supr.py       $COMMON $M10 --rate=4       --method=pmcmc-0.005
unit 3600 "Table 2 N=10 twisted rows"                     imgs/inpainting_twisted.py $COMMON $B10 --rect_size=15
unit 3600 "Table 3 N=10 twisted rows"                     imgs/supr_twisted.py       $COMMON $B10 --rate=4
unit 2400 "Table 2 N=10 CSGM rows"                        imgs/inpainting_csgm.py    $COMMON $C10 --rect_size=15
unit 2400 "Table 3 N=10 CSGM rows"                        imgs/supr_csgm.py          $COMMON $C10 --rate=4

stage "4/5 Tables 2-3 stage b: N=100 rows, ny0s=$NY (gibbs, filter, then pmcmc)"
unit 7200 "Table 2 N=100 gibbs rows: inpaint-15, 100 y0s" imgs/inpainting.py $COMMON $M100 --rect_size=15 --method=gibbs-eb-ef
unit 7200 "Table 3 N=100 gibbs rows: supr-4, 100 y0s"     imgs/supr.py       $COMMON $M100 --rate=4       --method=gibbs-eb-ef
unit 3600 "Table 2 N=100 filter rows"                     imgs/inpainting.py $COMMON $M100 --rect_size=15 --method=filter
unit 3600 "Table 3 N=100 filter rows"                     imgs/supr.py       $COMMON $M100 --rate=4       --method=filter
unit 5400 "Table 2 N=100 pMCMC rows"                      imgs/inpainting.py $COMMON $M100 --rect_size=15 --method=pmcmc-0.005
unit 5400 "Table 3 N=100 pMCMC rows"                      imgs/supr.py       $COMMON $M100 --rate=4       --method=pmcmc-0.005

stage "5/5 tabulating (CPU, auto-detected scale) -> $OUT/tables23_r3.txt"
{
  for METHOD in gibbs-eb-ef filter pmcmc-0.005 twisted csgm; do
    for NP in 10 100; do
      JAX_PLATFORMS=cpu python tabulators/tabulate_imgs.py --task=inpainting --dataset=mnist \
        --size=15 --nparticles=$NP --method=$METHOD || true
      JAX_PLATFORMS=cpu python tabulators/tabulate_imgs.py --task=supr --dataset=mnist \
        --size=4 --nparticles=$NP --method=$METHOD || true
    done
  done
} > "$OUT/tables23_r3.txt" 2>&1
{
  JAX_PLATFORMS=cpu python tabulators/tabulate_toy.py --nparticles 100 || true
  JAX_PLATFORMS=cpu python tabulators/tabulate_toy.py --nparticles 10 || true
} > "$OUT/table1_r3.txt" 2>&1
{
  JAX_PLATFORMS=cpu python tabulators/plot_sb.py --method gibbs-eb || true
  JAX_PLATFORMS=cpu python tabulators/plot_sb.py --method filter || true
} > "$OUT/table_sb_r3.txt" 2>&1
./commit_stage.sh "Tabulated Tables 1-3 + SB ablation from the committed round-3 artifacts"

stage "queue done"
touch "$LOG/DONE"
