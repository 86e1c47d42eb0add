#!/bin/bash
# Count expected result files per method (counterpart of reference
# experiments/check_integrity.sh).
cd "$(dirname "$0")"

for dir in imgs/results_inpainting imgs/results_supr toy/results sb/results; do
  if [ -d "$dir" ]; then
    echo "$dir:"
    for pat in gibbs pmcmc filter twisted csgm; do
      n=$(ls "$dir" 2>/dev/null | grep -c "$pat" || true)
      echo "  $pat: $n files"
    done
  fi
done
