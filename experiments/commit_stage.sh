#!/bin/bash
# Commit the artifacts a queue stage just produced.
#
# The dev VM can restart between sessions, wiping everything outside git —
# round 3 lost a full night of chip output that lived in gitignored results
# dirs.  Queue stages therefore commit their artifacts as soon as they land.
# flock-guarded so a concurrent manual commit never races the index.
#
# Usage: commit_stage.sh "message" [extra files to force-add...]
set -u
cd "$(dirname "$0")/.."
MSG=${1:?commit message required}
shift || true
exec 9>/tmp/fbs_git.lock
flock 9
git add -A experiments docs STATUS.md README.md 2>/dev/null || true
for f in "$@"; do
  # Queues pass artifact paths relative to experiments/ (their cwd); this
  # script runs at the repo root — try both resolutions.
  git add -f "$f" 2>/dev/null || true
  git add -f "experiments/$f" 2>/dev/null || true
done
if git diff --cached --quiet; then
  echo "commit_stage: nothing to commit for: $MSG"
  exit 0
fi
# Keep the committed summary tables in lockstep with the artifacts (round 4
# shipped a tables doc missing rows its own artifacts contained): whenever a
# stage lands image-sampling results, regenerate the tabulation in the same
# commit.
if git diff --cached --name-only | grep -q "experiments/imgs/results_"; then
  TBL=docs/measurements/tables23_r5.txt
  if timeout 900 env FBS_PLATFORM=cpu python experiments/tabulators/tabulate_imgs.py \
      > "$TBL.tmp" 2>/dev/null; then
    mv "$TBL.tmp" "$TBL" && git add "$TBL"
  else
    rm -f "$TBL.tmp"; echo "commit_stage: tabulation refresh failed (kept old $TBL)"
  fi
fi
git commit -q -m "$MSG

No-Verification-Needed: experiment artifacts / orchestration only" \
  && echo "commit_stage: committed: $MSG"
