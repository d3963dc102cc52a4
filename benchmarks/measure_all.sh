#!/bin/bash
# Serialized measurement sweep (ONE TPU claimant at a time — under the
# axon relay concurrent claimants wedge the tunnel; see ROUND5_NOTES).
# Usage: bash benchmarks/measure_all.sh [logfile]
LOG="${1:-/tmp/measure_all.log}"
cd "$(dirname "$0")/.."
run() {
  echo "== $*" | tee -a "$LOG"
  timeout 2500 env BENCH_RETRY_S="$RETRY" "$@" 2>>"$LOG" | tail -1 | tee -a "$LOG"
}
: > "$LOG"
# Preflight: pay the tunnel-recovery retry window ONCE for the whole
# sweep (each bench.py would otherwise retry for 10 min on its own).
# The timeout must exceed the worst-case probe sequence: an initial
# ~150 s probe + the 480 s retry window whose LAST probe may itself
# run ~150 s — killing the probe mid-flight would misclassify a
# late-recovering tunnel as dead and CPU-fallback the whole sweep.
echo "== preflight probe" | tee -a "$LOG"
if timeout 800 python - <<'EOF' 2>>"$LOG"
from contrast_renderer_tpu.utils.backend import ensure_live_backend
import sys
sys.exit(1 if ensure_live_backend(
    warn_label="measure_all", retry_window_s=480.0) else 0)
EOF
then
  RETRY=120   # alive: brief re-probe guards against mid-sweep wedges
  echo "preflight: accelerator alive" | tee -a "$LOG"
else
  RETRY=0     # dead after the window: emit labeled CPU fallbacks fast
  echo "preflight: accelerator unreachable; CPU fallbacks" | tee -a "$LOG"
fi
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
run BENCH_SIZE=3840x2160 BENCH_CLIP=1 BENCH_INSTANCED=1 BENCH_U8=1 python bench.py
run BENCH_SIZE=3840x2160 BENCH_U8=1 python bench.py
run BENCH_SIZE=3840x2160 BENCH_DEPTH=1 python bench.py
run BENCH_SIZE=3840x2160 BENCH_ORBIT=1 BENCH_U8=1 python bench.py
run BENCH_SIZE=3840x2160 BENCH_ORBIT=1 BENCH_U8=1 BENCH_SEQ=8 python bench.py
echo "== run_configs 1-8" | tee -a "$LOG"
timeout 5400 python benchmarks/run_configs.py --configs 1,2,3,4,5,6,7,8 2>>"$LOG" | tee -a "$LOG"
echo "done" | tee -a "$LOG"
