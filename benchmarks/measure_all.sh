#!/bin/bash
# Serialized measurement sweep (ONE TPU claimant at a time — under the
# axon relay concurrent claimants wedge the tunnel; see ROUND5_NOTES).
# Usage: bash benchmarks/measure_all.sh [logfile]
LOG="${1:-/tmp/measure_all.log}"
cd "$(dirname "$0")/.."
run() {
  echo "== $*" | tee -a "$LOG"
  timeout 1500 env "$@" 2>>"$LOG" | tail -1 | tee -a "$LOG"
}
: > "$LOG"
run python bench.py
run BENCH_ORBIT=1 python bench.py
run BENCH_INSTANCED=1 python bench.py
run BENCH_SIZE=3840x2160 python bench.py
run BENCH_SIZE=3840x2160 BENCH_ORBIT=1 python bench.py
run BENCH_ORBIT=1 BENCH_SEQ=8 python bench.py
run BENCH_SIZE=3840x2160 BENCH_ORBIT=1 BENCH_SEQ=8 python bench.py
run BENCH_SIZE=3840x2160 BENCH_INSTANCED=1 python bench.py
run BENCH_SIZE=3840x2160 BENCH_CLIP=1 python bench.py
run BENCH_SIZE=3840x2160 BENCH_CLIP=1 BENCH_INSTANCED=1 python bench.py
echo "== run_configs 1-7" | tee -a "$LOG"
timeout 4500 python benchmarks/run_configs.py --configs 1,2,3,4,5,6,7 2>>"$LOG" | tee -a "$LOG"
echo "done" | tee -a "$LOG"
