"""Profiling hooks (SURVEY.md §5: tracing/metrics equivalents).

The reference has only a progress bar; the TPU build exposes the XLA
profiler: `with trace("/tmp/rray_trace"): render(...)` writes an xprof
trace viewable in TensorBoard / xprof, and `live_arrays_bytes()` reports
device memory held by JAX arrays.
"""
from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an xprof/TensorBoard trace of everything inside the with."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def live_arrays_bytes() -> int:
    """Total bytes of live device arrays in this process."""
    return sum(a.nbytes for a in jax.live_arrays())
