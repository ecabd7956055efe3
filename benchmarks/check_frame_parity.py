"""On-device FULL-FRAME parity: TPU f32 render vs a CPU f64 golden.

Kernel-level parity (check_device_parity.py) pins the Pallas kernels
against XLA on the real device, but device-only frame bugs have shipped
through whole-frame interactions the kernels never see (bf16 MXU
truncation, FMA-contraction boundary flips — see CLAUDE.md). This probe
renders BASELINE configs 1 (analytic fast path), 2 (glass compact
wavefront), and 5 (CSG + torus + texture) at reduced resolution on the
REAL backend in f32 and compares, after the reference's u8 cast
(canvas.rs:76-105), against a CPU f64 render of the same scenes done in
a child process (f64 needs jax_enable_x64, which is process-global).

Metrics per config: max |diff| in u8 steps and the fraction of
subpixels differing by more than 2/255 (BASELINE.md forward-parity
target: allclose after the cast; area-light configs are excluded —
their seeded jitter differs legitimately from any golden).

Run: python benchmarks/check_frame_parity.py
Child (internal): python benchmarks/check_frame_parity.py --golden OUT.npz
"""
import json
import os
import subprocess
import sys

import numpy as np

BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)

# (name, yaml, width, height, settings kwargs) — sizes keep the CPU f64
# golden render under ~2 min while crossing every shading branch.
CONFIGS = (
    ("config1", "example1.yaml", 320, 240,
     dict(rows_per_tile=240, max_hits=4, containers_depth=2)),
    ("config2", "glass.yaml", 160, 120,
     dict(rows_per_tile=120, max_hits=16, containers_depth=4)),
    ("config5", "csg_showcase.yaml", 320, 180,
     dict(rows_per_tile=36, max_hits=24, containers_depth=4)),
)


def _build(name, yaml_name, w, h, skw, dtype):
    from rray_tpu import Camera, RenderSettings, compile_camera, compile_scene
    from rray_tpu.io.yaml_loader import load_scene_file

    cam_spec, lights, shapes = load_scene_file(
        os.path.join(BASE, "examples", yaml_name))
    scene = compile_scene(shapes, lights, dtype=dtype)
    cam_h = Camera(w, h, cam_spec["fov"])
    cam_h.transform = cam_spec["transform"]
    return scene, compile_camera(cam_h, dtype), RenderSettings(**skw)


def golden_child(out_path):
    """CPU f64 renders of every config -> npz (run in a child process)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from rray_tpu.render.integrator import render

    frames = {}
    for name, yml, w, h, skw in CONFIGS:
        scene, cam, settings = _build(name, yml, w, h, skw, jnp.float64)
        frames[name] = np.asarray(render(scene, cam, settings=settings))
    np.savez(out_path, **frames)


def _u8(img):
    """The reference's saturating truncation cast (canvas.rs:97)."""
    return np.clip(np.trunc(np.asarray(img, np.float64) * 255.0),
                   0, 255).astype(np.uint8)


def main():
    import jax.numpy as jnp

    from rray_tpu.api import enable_compile_cache
    enable_compile_cache()
    from rray_tpu.render.integrator import render

    cache = os.path.join(os.path.expanduser("~"), ".cache", "rray_tpu")
    os.makedirs(cache, exist_ok=True)
    golden_path = os.path.join(cache, "frame_parity_golden_v1.npz")
    if not os.path.exists(golden_path):
        env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--golden",
             golden_path], env=env, capture_output=True, text=True,
            timeout=1800)
        if proc.returncode != 0:
            print(json.dumps({"metric": "frame_parity", "value": None,
                              "note": "golden render failed: "
                                      + proc.stderr[-300:]}))
            return
    golden = np.load(golden_path)

    for name, yml, w, h, skw in CONFIGS:
        scene, cam, settings = _build(name, yml, w, h, skw, jnp.float32)
        img = np.asarray(render(scene, cam, settings=settings))
        a = _u8(img)
        b = _u8(golden[name])
        d = np.abs(a.astype(np.int32) - b.astype(np.int32))
        # Headline value = fraction of subpixels off by >2/255: isolated
        # boundary pixels legitimately flip whole discrete decisions
        # between f32 and f64 (checker cell, shadow edge), so max|diff|
        # is structurally noisy (one flipped checker cell = ~180 steps)
        # while the >2 fraction is the stable regression signal.
        print(json.dumps({
            "metric": f"frame_parity_{name}_frac_gt2",
            "value": float((d > 2).mean()),
            "unit": "fraction of subpixels >2/255 off CPU-f64",
            "maxdiff_u8": int(d.max()),
            "mean_u8": float(d.mean()),
            "vs_baseline": float((d > 2).mean()) / 0.01,
        }), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--golden":
        golden_child(sys.argv[2])
    else:
        main()
