"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Tests never require real TPU hardware; multi-chip sharding tests use
xla_force_host_platform_device_count per the project build rules.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: this environment has a single CPU core and
# very slow XLA compiles; caching across test runs keeps the suite usable.
# JAX's persistent cache is content-addressed (keyed on the serialized
# HLO + compile options + backend), so a fixed directory is safe across
# source edits: an edited kernel lowers to different HLO and misses; an
# unchanged one still hits — which is what keeps incremental test runs
# to minutes instead of recompiling the world after every edit.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tests")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")


def _force_cpu_if_accelerator_unreachable(timeout_s: float = 150.0):
    """A globally-set accelerator platform (JAX_PLATFORMS=axon) wins
    over the setdefault above, so a plain pytest run executes on the
    real TPU.  That's desirable — but under the axon relay a dead TPU
    tunnel blocks backend init *forever*, turning the whole suite into
    a hang.  Probe init in a subprocess and fall back to CPU (the
    config update is required: the env var is snapshotted when a site
    hook imports jax at interpreter start)."""
    import subprocess
    import sys

    if os.environ.get("JAX_PLATFORMS", "cpu") == "cpu":
        return
    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        if proc.returncode == 0:
            return
    except subprocess.TimeoutExpired:
        pass
    sys.stderr.write(
        "conftest: accelerator backend unreachable (tunnel down?); "
        "running the suite on CPU\n"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")


_force_cpu_if_accelerator_unreachable()
