"""Throughput benchmark: rays/s on the BASELINE sphere scene.

Renders the checker-plane + sphere scene (BASELINE.md config 1) at
800x600, depth 5, and reports primary rays per second of steady-state
device execution. Device time is measured with in-graph repetition
(rray_tpu/utils/timing.py) because tunneled backends make wall-clock
`block_until_ready` timings meaningless.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is value / 1e9 (the >=1e9 rays/s/chip target).
"""
from __future__ import annotations

import dataclasses
import json
import os
import subprocess
import sys
import time

import numpy as np


def main_with_retries(attempts: int = 4, wait_s: float = 600.0):
    """Run the measurement in a child process, retrying on device loss.

    The tunneled TPU worker occasionally crashes and needs ~10 minutes to
    recover; a wedged backend cannot be re-initialized in-process, so
    each attempt gets a fresh interpreter.
    """
    env = dict(os.environ, RRAY_BENCH_CHILD="1")
    for attempt in range(attempts):
        proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                              env=env, capture_output=True, text=True,
                              timeout=3600)
        for line in reversed(proc.stdout.splitlines()):
            if line.startswith("{"):
                print(line)
                return 0
        sys.stderr.write(proc.stderr[-2000:] + "\n")
        if attempt < attempts - 1:
            sys.stderr.write(
                f"bench attempt {attempt + 1} failed; waiting "
                f"{wait_s:.0f}s for device recovery\n")
            time.sleep(wait_s)
    return 1


def main():
    import jax.numpy as jnp
    from rray_tpu.api import enable_compile_cache
    enable_compile_cache()
    from rray_tpu import (Camera, Material, Pattern, PointLight,
                          RenderSettings, Shape, compile_camera,
                          compile_scene)
    from rray_tpu import mathutils as mu
    from rray_tpu.render.integrator import render
    from rray_tpu.utils.timing import measure_frame_seconds

    dtype = jnp.float32
    width, height = 800, 600

    floor = Shape("plane", material=Material(
        pattern=Pattern("checker", a=Pattern.solid([1.0, 1.0, 1.0]),
                        b=Pattern.solid([0.2, 0.2, 0.2])),
        specular=0.0))
    ball = Shape("sphere", transform=mu.translate(0, 1, 0),
                 material=Material(pattern=Pattern.solid([0.7, 0.2, 0.2]),
                                   diffuse=0.7, specular=0.3))
    light = PointLight(np.array([-10.0, 10.0, -10.0]), np.ones(3))
    scene = compile_scene([floor, ball], [light], dtype=dtype)

    cam_h = Camera(width, height, np.pi / 3)
    cam_h.transform = mu.view_transform([0, 1.5, -5], [0, 1, 0], [0, 1, 0])
    cam = compile_camera(cam_h, dtype)

    settings = RenderSettings(rows_per_tile=600, max_hits=4,
                              containers_depth=2)

    def render_scalar(jitter):
        c = dataclasses.replace(cam, half_width=cam.half_width + jitter * 1e-9)
        return render(scene, c, settings=settings).sum()

    # Adaptive rep count (utils/timing.py): a 35 us frame needs ~20k
    # in-graph reps so tunnel jitter (±10 ms) doesn't dominate, but a
    # regressed frame must NOT run a fixed huge rep count — single
    # executions beyond ~10 s crash the tunneled worker.
    sec = measure_frame_seconds(render_scalar)
    value = width * height / sec

    # Hard-path configs (glass wavefront / area light / mesh / CSG) ride
    # along in the same JSON line so regressions there are visible to the
    # driver, under a wall-clock budget so a cold compile cache can't
    # blow the bench window.
    suite = {}
    budget_s = float(os.environ.get("RRAY_BENCH_BUDGET_S", "1800"))
    t0 = time.time()
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "benchmarks"))
        import bench_suite
        import contextlib
        import io

        def capture(label, fn):
            if time.time() - t0 > budget_s:
                suite[label] = "skipped (budget)"
                return
            buf = io.StringIO()
            try:
                with contextlib.redirect_stdout(buf):
                    fn()
                for line in buf.getvalue().splitlines():
                    if line.startswith("{"):
                        rec = json.loads(line)
                        suite[rec["metric"]] = rec["value"]
            except Exception as e:  # one bad config must not kill the bench
                suite[label] = f"error: {e}"[:200]

        for cfg in ("2", "3", "4", "4r", "4b", "5", "5aa"):
            capture(f"config{cfg}", lambda c=cfg: bench_suite.main([c]))
        # Named BASELINE metrics: backward/forward time ratio + 1-chip
        # SPMD (shard_map) efficiency.
        import bench_grad
        import bench_multiproc
        import bench_scaling
        import check_device_parity
        for cfg in ("1", "2", "3", "4", "5"):
            capture(f"bwd_fwd_{cfg}", lambda c=cfg: bench_grad.main([c]))
        capture("scaling", bench_scaling.main)
        # Multi-process (2 x jax.distributed, CPU mesh) efficiency —
        # the closest measurable analog of the N>=2-hosts BASELINE
        # metric on single-host hardware.
        capture("multiproc", bench_multiproc.main)
        # On-device kernel-vs-XLA parity: CPU tests can't see TPU-only
        # numerics (bf16 matmul truncation shipped invisibly once).
        capture("kernel_parity", check_device_parity.main)
        # Whole-frame TPU-f32 vs CPU-f64 parity after the u8 cast
        # (BASELINE.md forward-parity target).
        import check_frame_parity
        capture("frame_parity", check_frame_parity.main)
    except Exception:
        pass

    print(json.dumps({
        "metric": "primary_rays_per_s",
        "value": value,
        "unit": "rays/s",
        "vs_baseline": value / 1e9,
        "suite": suite,
    }))


if __name__ == "__main__":
    if os.environ.get("RRAY_BENCH_CHILD") == "1":
        main()
    else:
        sys.exit(main_with_retries())
