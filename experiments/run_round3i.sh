#!/bin/bash
# Round-3 queue, part 6 (r3i): the tail of the table stages, re-prioritised
# once the true per-unit costs were measured (r3h's header has the dispatch
# cost model; on top of it each unit pays ~6-7 min fixed per *program*:
# compile-or-cached-executable + params through the tunnel, so a 16-unit
# stage carries ~1.9 h of pure fixed cost).
#
# Priority logic: a COMPLETE five-method comparison at N=10 (the paper's
# method-ordering claim) beats a deeper N sweep of fewer methods — so the
# one-shot baselines (csgm, then twisted) run before the N=100 rows, and
# within N=100 the flagship gibbs rows go first.  N=100 uses nsamples=5:
# the across-y0 variance dominates the table SE (PSNR SD ~10 across y0s vs
# ~2-3 within a chain), so halving the per-y0 chain length costs ~nothing
# statistically and saves ~25 min/unit of chip time.
set -u
cd "$(dirname "$0")"
LOG=${LOG:-/tmp/r3i}
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
B10="--nparticles=10 --ny0s=$NY --nsamples=20 --samples_per_dispatch=10"
C10="--nparticles=10 --ny0s=$NY --nsamples=20 --samples_per_dispatch=10"
M100="--nparticles=100 --ny0s=$NY --nsamples=5 --y0s_per_dispatch=4 --sweeps_per_dispatch=1"

unit() {  # unit <cap-seconds> <commit-msg> <cmd...>
  local cap=$1 msg=$2; shift 2
  past_deadline && bail "$msg"
  stage "$*"
  timeout "$(budget "$cap")" python "$@" >> "$LOG/tables.log" 2>&1 \
    || { echo "unit FAILED (rc=$?): $*"; tail -5 "$LOG/tables.log"; }
  ./commit_stage.sh "$msg"
}

stage "1/3 one-shot baselines at N=10 (csgm fast, twisted slow)"
unit 2400 "Table 2 N=10 CSGM rows"                        imgs/inpainting_csgm.py    $COMMON $C10 --rect_size=15
unit 2400 "Table 3 N=10 CSGM rows"                        imgs/supr_csgm.py          $COMMON $C10 --rate=4
unit 3600 "Table 2 N=10 twisted rows"                     imgs/inpainting_twisted.py $COMMON $B10 --rect_size=15
unit 3600 "Table 3 N=10 twisted rows"                     imgs/supr_twisted.py       $COMMON $B10 --rate=4

stage "2/3 N=100 rows (gibbs, filter, pmcmc; nsamples=5)"
unit 3600 "Table 2 N=100 gibbs rows: inpaint-15, 100 y0s" imgs/inpainting.py $COMMON $M100 --rect_size=15 --method=gibbs-eb-ef
unit 3600 "Table 3 N=100 gibbs rows: supr-4, 100 y0s"     imgs/supr.py       $COMMON $M100 --rate=4       --method=gibbs-eb-ef
unit 3000 "Table 2 N=100 filter rows"                     imgs/inpainting.py $COMMON $M100 --rect_size=15 --method=filter
unit 3000 "Table 3 N=100 filter rows"                     imgs/supr.py       $COMMON $M100 --rate=4       --method=filter
unit 3600 "Table 2 N=100 pMCMC rows"                      imgs/inpainting.py $COMMON $M100 --rect_size=15 --method=pmcmc-0.005
unit 3600 "Table 3 N=100 pMCMC rows"                      imgs/supr.py       $COMMON $M100 --rate=4       --method=pmcmc-0.005

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
