#!/bin/bash
# Hand the chip from run_round3d.sh to run_round3e.sh at the stage-5/6
# boundary.  r3e re-probes the rewritten fused-ResBlock kernel and redoes
# the 256^2 stage that crashed on a mid-write dataset, then continues with
# r3d's remaining stages (tables, toy, SB ablation) unchanged.
#
# PID-file based only — never kills by pattern.  r3d's stage 5 (SB train +
# super-resolution) is left to finish; the trigger is the "6/9" stage line
# (or r3d exiting on its own).
set -u
QPID=$(cat /tmp/r3d_queue.pid 2>/dev/null || echo "")
LOGF=/tmp/r3d_queue.log

while true; do
  alive=0
  [ -n "$QPID" ] && kill -0 "$QPID" 2>/dev/null && alive=1
  hit=0
  grep -q '6/9 Tables' "$LOGF" 2>/dev/null && hit=1
  if [ "$alive" -eq 0 ] || [ "$hit" -eq 1 ]; then
    break
  fi
  sleep 60
done

if [ -n "$QPID" ] && kill -0 "$QPID" 2>/dev/null; then
  echo "takeover: stopping r3d ($QPID) and its children"
  CHILDREN=$(ps -o pid= --ppid "$QPID" 2>/dev/null)
  kill "$QPID" 2>/dev/null
  for c in $CHILDREN; do
    GRAND=$(ps -o pid= --ppid "$c" 2>/dev/null)
    kill "$c" 2>/dev/null
    for g in $GRAND; do kill "$g" 2>/dev/null; done
  done
  sleep 15
  # hard-kill anything of the tree still alive
  for c in $CHILDREN; do kill -9 "$c" 2>/dev/null; done
  kill -9 "$QPID" 2>/dev/null
  sleep 5
fi

echo "takeover: launching run_round3e.sh"
cd "$(dirname "$0")"
nohup bash run_round3e.sh > /tmp/r3e_queue.log 2>&1 &
echo $! > /tmp/r3e_queue.pid
echo "takeover: r3e pid $(cat /tmp/r3e_queue.pid)"
