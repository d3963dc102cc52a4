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
# The cache dir is keyed by a hash of the device-code sources — stale
# entries have been observed to survive source edits otherwise.
import glob
import hashlib

_digest = hashlib.md5()
_root = os.path.join(os.path.dirname(__file__), "..", "contrast_renderer_tpu")
for _f in sorted(glob.glob(os.path.join(_root, "**", "*.py"), recursive=True)):
    with open(_f, "rb") as _fh:
        _digest.update(_fh.read())
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", f"/tmp/jax_cache_{_digest.hexdigest()[:12]}"
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
