#!/bin/bash
# tile_strips ablation (round-4 VERDICT weak #5): measure strips in
# {1, 2, 4} on the dense rows (configs 3, 4, 5) so the _spec auto-tune
# either encodes a measured winner or the knob is justified manual-only.
# ONE TPU claimant at a time (see ROUND5_NOTES).
# Usage: bash benchmarks/ablate_strips.sh [logfile]
LOG="${1:-/tmp/ablate_strips.log}"
cd "$(dirname "$0")/.."
: > "$LOG"
: > "$LOG.err"
for S in 1 2 4; do
  echo "== strips=$S" | tee -a "$LOG"
  timeout 3600 env BENCH_STRIPS=$S python benchmarks/run_configs.py \
    --configs 3,4,5 --frames 16 2>>"$LOG.err" | tee -a "$LOG"
done
echo done | tee -a "$LOG"
