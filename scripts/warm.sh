#!/bin/bash
# Warm the persistent XLA compile caches so later runs are minutes, not
# half-hours, on this 1-core host:
#   ~/.cache/jax_cache_tests   — every FrameSpec the fast gate compiles
#   ~/.cache/jax_cache_dryrun  — the driver's multichip dry-run pipeline
#   ~/.cache/jax_cache_bench   — bench.py's showcase frame programs (CPU
#                                shapes only; TPU entries are added the
#                                first time bench runs on the chip)
# Safe to re-run: warm entries are cache hits.  CPU-only by
# construction — never claims the TPU tunnel.
set -e
cd "$(dirname "$0")/.."
echo "== fast gate (populates jax_cache_tests)"
env -u PALLAS_AXON_POOL_IPS -u AXON_LOOPBACK_RELAY JAX_PLATFORMS=cpu \
  python -m pytest tests/ -q -m "not slow" -x
echo "== multichip dryrun (populates jax_cache_dryrun)"
python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
echo "== bench CPU shapes (populates jax_cache_bench)"
env -u PALLAS_AXON_POOL_IPS -u AXON_LOOPBACK_RELAY JAX_PLATFORMS=cpu \
  BENCH_RETRY_S=0 python bench.py
echo "warm done"
