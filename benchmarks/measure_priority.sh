#!/bin/bash
# Priority-ordered variant of measure_all.sh: the VERDICT "done =" rows
# first (clip/alpha-4K, 4K-orbit, dense strokes, dense text), then the
# rest of the matrix — so a truncated session still records the rows
# that gate the round. ONE TPU claimant at a time (see ROUND5_NOTES).
# Usage: bash benchmarks/measure_priority.sh [logfile]
LOG="${1:-/tmp/measure_priority.log}"
cd "$(dirname "$0")/.."
run() {
  echo "== $*" | tee -a "$LOG"
  timeout 2500 env BENCH_RETRY_S="$RETRY" "$@" 2>>"$LOG.err" | tail -1 | tee -a "$LOG"
}
rc() {
  echo "== run_configs $*" | tee -a "$LOG"
  timeout 3600 python benchmarks/run_configs.py --configs "$@" 2>>"$LOG.err" | tee -a "$LOG"
}
: > "$LOG"
: > "$LOG.err"
echo "== preflight probe" | tee -a "$LOG"
if timeout 800 python - <<'EOF' 2>>"$LOG.err"
from contrast_renderer_tpu.utils.backend import ensure_live_backend
import sys
sys.exit(1 if ensure_live_backend(
    warn_label="measure_priority", retry_window_s=480.0) else 0)
EOF
then
  RETRY=120
  echo "preflight: accelerator alive" | tee -a "$LOG"
else
  RETRY=0
  echo "preflight: accelerator unreachable; CPU fallbacks" | tee -a "$LOG"
fi
# --- north-star rows ---
rc 5,7
rc 3,4
run BENCH_SIZE=3840x2160 BENCH_CLIP=1 python bench.py
run BENCH_SIZE=3840x2160 BENCH_ORBIT=1 python bench.py
# --- rest of the measure_all matrix ---
run python bench.py
run BENCH_ORBIT=1 python bench.py
run BENCH_INSTANCED=1 python bench.py
run BENCH_SIZE=3840x2160 python bench.py
run BENCH_ORBIT=1 BENCH_SEQ=8 python bench.py
run BENCH_SIZE=3840x2160 BENCH_ORBIT=1 BENCH_SEQ=8 python bench.py
run BENCH_SIZE=3840x2160 BENCH_INSTANCED=1 python bench.py
run BENCH_SIZE=3840x2160 BENCH_CLIP=1 BENCH_INSTANCED=1 python bench.py
run BENCH_SIZE=3840x2160 BENCH_CLIP=1 BENCH_INSTANCED=1 BENCH_U8=1 python bench.py
run BENCH_SIZE=3840x2160 BENCH_U8=1 python bench.py
run BENCH_SIZE=3840x2160 BENCH_DEPTH=1 python bench.py
run BENCH_SIZE=3840x2160 BENCH_ORBIT=1 BENCH_U8=1 python bench.py
run BENCH_SIZE=3840x2160 BENCH_ORBIT=1 BENCH_U8=1 BENCH_SEQ=8 python bench.py
rc 1,2,6,8
echo "done" | tee -a "$LOG"
