"""Device-time measurement that survives async-dispatch runtimes.

On tunneled/remote TPU backends, `block_until_ready()` can return before
execution finishes, and any host fetch pays a large fixed round-trip.
`device_seconds_per_call` therefore times an in-graph `fori_loop` running
the workload N times (each iteration perturbed so nothing hoists) against
a 1-iteration baseline — the slope is pure device time per call.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def device_seconds_per_call(make_fn, n: int = 2001, tries: int = 4) -> float:
    """make_fn(reps) -> a jitted zero-arg callable returning a scalar that
    runs the workload `reps` times. Returns seconds per single call."""
    t = {}
    for reps in (1, n):
        fn = make_fn(reps)
        float(fn())  # compile + warm
        best = float("inf")
        for _ in range(tries):
            t0 = time.perf_counter()
            float(fn())
            best = min(best, time.perf_counter() - t0)
        t[reps] = best
    return max((t[n] - t[1]) / (n - 1), 1e-9)


def repeat_with_jitter(render_scalar, reps: int):
    """Build a jitted thunk: sum of `reps` perturbed workload evaluations.

    `render_scalar(jitter)` must return a scalar and actually consume
    `jitter` (e.g. feed it into the camera), so iterations can't be CSE'd.
    """
    def thunk():
        def body(i, acc):
            return acc + render_scalar(i.astype(jnp.float32) * 1e-3)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    return jax.jit(thunk)
