"""Accelerator-backend liveness: probe + CPU fallback.

Under the axon loopback relay a dead TPU tunnel blocks jax backend
init *forever* (claim-retry loop with no timeout), so anything that
would touch the device first probes init in a subprocess and, on
failure, forces the CPU platform.  Shared by bench.py, the test
conftest and the driver entry points."""

from __future__ import annotations

import os
import subprocess
import sys

__all__ = ["accelerator_reachable", "ensure_live_backend"]


def accelerator_reachable(timeout_s: float = 150.0) -> bool:
    """True when jax backend init completes in a fresh subprocess
    within the timeout.  A platform already forced to CPU counts as
    unreachable (callers use this to pick the CPU path)."""
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return False
    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def ensure_live_backend(
    timeout_s: float = 150.0,
    warn_label: str = "backend",
    retry_window_s: float = 0.0,
    retry_interval_s: float = 60.0,
) -> bool:
    """Force the CPU platform when the accelerator is unreachable.

    Returns True when a fallback was applied.  Both the env var and
    ``jax.config`` are set: the env var alone is snapshotted when a
    site hook imports jax at interpreter start, so the config update is
    what actually takes effect in-process.

    ``retry_window_s`` > 0 keeps re-probing (every ``retry_interval_s``)
    for up to that long before falling back — a transient tunnel wedge
    then delays a measurement instead of zeroing it out to a CPU
    artifact (the round-2 bench lost its TPU signal exactly this way)."""
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return False
    if accelerator_reachable(timeout_s):
        return False
    if retry_window_s > 0:
        import time

        deadline = time.monotonic() + retry_window_s
        attempt = 1
        while time.monotonic() < deadline:
            sys.stderr.write(
                f"{warn_label}: accelerator unreachable (probe "
                f"{attempt}); retrying for another "
                f"{deadline - time.monotonic():.0f}s\n"
            )
            time.sleep(
                min(retry_interval_s, max(0.0, deadline - time.monotonic()))
            )
            attempt += 1
            if accelerator_reachable(timeout_s):
                return False
    sys.stderr.write(
        f"{warn_label}: accelerator backend unreachable (tunnel down?); "
        "forcing the CPU platform for this process\n"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    return True
