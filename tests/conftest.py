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
# The cache lives under ~/.cache (durable across /tmp cleanup; losing
# it costs a ~35 min cold recompile on this 1-core host) and is
# env-overridable.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/jax_cache_tests"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")


# A globally-set accelerator platform (JAX_PLATFORMS=axon) wins over
# the setdefault above, so a plain pytest run executes on the real TPU.
# That's desirable — but a dead TPU tunnel blocks backend init forever,
# turning the whole suite into a hang; probe and fall back to CPU.
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from contrast_renderer_tpu.utils.backend import (  # noqa: E402
    ensure_live_backend,
)

ensure_live_backend(warn_label="conftest")
