"""Tracing / profiling helpers (SURVEY.md §5: absent in the reference).

Thin wrappers over ``jax.profiler`` plus a step timer that understands the
framework's measurement rules (BENCHLOG.md): on remote-tunnel backends,
``block_until_ready`` neither surfaces async faults nor excludes host
transfer, so timings reduce to a device-side scalar and read THAT back.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np
import jax
import jax.numpy as jnp


def honor_jax_platforms_env() -> None:
    """Re-apply an explicit JAX_PLATFORMS export after ``import jax``.

    The axon tunnel's sitecustomize force-registers the TPU plugin and
    clobbers JAX_PLATFORMS at import time, so exporting the env var alone
    does not keep a CPU-intended run off a (possibly busy or unreachable)
    chip.  Call this from every bench/CLI entry point after importing jax
    and before any device use.  No-op when the export is unset or names
    the axon platform itself.
    """
    import os

    want = os.environ.get("JAX_PLATFORMS", "")
    if want and "axon" not in want:
        jax.config.update("jax_platforms", want)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XProf/perfetto trace of the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in profiler traces (use as context manager)."""
    return jax.profiler.TraceAnnotation(name)


def checksum(out):
    """Device-side scalar checksum of any pytree; forces full execution."""
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "ravel")]
    return sum(jnp.sum(x) for x in leaves)


def sync(out) -> float:
    """Read back a scalar derived from ``out`` (fault-surfacing barrier)."""
    return float(np.asarray(checksum(out)))


class StepTimer:
    """Wall-clock timer for jitted step functions.

    >>> timer = StepTimer()
    >>> dt = timer.time(fn, *args, iters=5)   # seconds per call
    """

    def time(self, fn, *args, warmup: int = 2, iters: int = 5) -> float:
        for _ in range(warmup):
            sync(fn(*args))
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        return (time.perf_counter() - t0) / iters
