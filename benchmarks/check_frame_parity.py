"""On-device FULL-FRAME parity: TPU f32 render vs a CPU f64 golden.

Kernel-level parity (check_device_parity.py) pins the Pallas kernels
against XLA on the real device, but device-only frame bugs have shipped
through whole-frame interactions the kernels never see (bf16 MXU
truncation, FMA-contraction boundary flips — see CLAUDE.md). This probe
renders BASELINE configs 1 (analytic fast path), 2 (glass compact
wavefront), 3 (area-light soft shadows — the point-keyed jitter hashes
the f32 bits of the shadow origin, so the f64 golden consumes the SAME
draws wherever the origin rounds identically), 4 (teapot-low mesh) and
5 (CSG + torus + texture) at reduced resolution on the REAL backend in
f32 and compares, after the reference's u8 cast (canvas.rs:76-105),
against a CPU f64 render of the same scenes done in a child process
(f64 needs jax_enable_x64, which is process-global).

Metrics per config: max |diff| in u8 steps and the fraction of
subpixels differing by more than 2/255 (BASELINE.md forward-parity
target: allclose after the cast).

The golden cache filename is keyed on a hash of the config table, the
scene YAML bytes, and a semantic version salt — a stale golden after an
intentional renderer/scene change would silently report false parity
numbers. Bump _SEMVER on any deliberate forward-semantics change.

Run: python benchmarks/check_frame_parity.py
Child (internal): python benchmarks/check_frame_parity.py --golden OUT.npz
"""
import hashlib
import json
import os
import subprocess
import sys

import numpy as np

BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)

# Bump when forward semantics change deliberately (invalidates goldens).
_SEMVER = "r5-1"

# (name, yaml (None = built-in mesh scene), width, height, settings
# kwargs, per-config >2/255 budget) — sizes keep the CPU f64 golden
# render under ~2 min while crossing every shading branch.
CONFIGS = (
    ("config1", "example1.yaml", 320, 240,
     dict(rows_per_tile=240, max_hits=4, containers_depth=2), 0.01),
    ("config2", "glass.yaml", 160, 120,
     dict(rows_per_tile=120, max_hits=16, containers_depth=4), 0.01),
    # Penumbra pixels whose f32/f64 shadow origins round to different
    # f32 bits draw different jitter — a legitimate deviation class on
    # top of the boundary flips, hence the wider budget.
    ("config3", "area_light.yaml", 240, 180,
     dict(rows_per_tile=180, max_hits=4, containers_depth=2), 0.02),
    ("config4", None, 240, 180,
     dict(rows_per_tile=180, max_hits=4, containers_depth=2), 0.01),
    # config5's >2/255 pixels concentrate on the CSG cube's NOISE
    # pattern (round-5 attribution: columns holding the cube account
    # for ~85% of them): its pattern transform scales by 0.001, so
    # pattern-space coordinates sit near 1000 where f32 quantization is
    # ~6e-5 absolute — large enough to move 4-octave Perlin across
    # color boundaries. CPU-f32-XLA measures the identical 1.41% vs
    # f64, so there is NO device or kernel component; the budget is the
    # measured f32-inherent floor plus slack.
    ("config5", "csg_showcase.yaml", 320, 180,
     dict(rows_per_tile=36, max_hits=24, containers_depth=4), 0.02),
)

TEAPOT = "/root/reference/examples/teapot-low.obj"


def _build(name, yaml_name, w, h, skw, dtype):
    from rray_tpu import Camera, RenderSettings, compile_camera, compile_scene
    from rray_tpu.io.yaml_loader import load_scene_file

    if yaml_name is None:
        return _build_mesh(w, h, skw, dtype)
    cam_spec, lights, shapes = load_scene_file(
        os.path.join(BASE, "examples", yaml_name))
    scene = compile_scene(shapes, lights, dtype=dtype)
    cam_h = Camera(w, h, cam_spec["fov"])
    cam_h.transform = cam_spec["transform"]
    return scene, compile_camera(cam_h, dtype), RenderSettings(**skw)


def _build_mesh(w, h, skw, dtype):
    """teapot-low (240 tris, smooth normals) + checker floor — the
    BASELINE config-4 scene at parity-probe scale."""
    from rray_tpu import (Camera, Material, Pattern, PointLight,
                          RenderSettings, Shape, compile_camera,
                          compile_scene)
    from rray_tpu import mathutils as mu
    from rray_tpu.io.obj_loader import load_obj_file

    mat = Material(pattern=Pattern.solid([0.7, 0.5, 0.2]))
    mesh = load_obj_file(TEAPOT, mat)
    mesh.transform = mu.compose([mu.rotate_x(-np.pi / 2),
                                 mu.scale(0.12, 0.12, 0.12)])
    floor = Shape("plane", material=Material(
        pattern=Pattern("checker", a=Pattern.solid([1.0, 1.0, 1.0]),
                        b=Pattern.solid([0.2, 0.2, 0.2])), specular=0.0))
    light = PointLight(np.array([-10.0, 10.0, -10.0]), np.ones(3))
    scene = compile_scene([floor, mesh], [light], dtype=dtype)
    cam_h = Camera(w, h, np.pi / 3)
    cam_h.transform = mu.view_transform([0, 1.5, -4], [0, 0.7, 0],
                                        [0, 1, 0])
    return scene, compile_camera(cam_h, dtype), RenderSettings(**skw)


def _configs():
    return tuple(c for c in CONFIGS
                 if c[1] is not None or os.path.exists(TEAPOT))


def _golden_key():
    """Hash of everything the golden depends on (ADVICE r4: a fixed
    filename silently compared against stale goldens)."""
    h = hashlib.sha256()
    h.update(_SEMVER.encode())
    h.update(repr(_configs()).encode())
    for _, yml, *_ in _configs():
        if yml is None:
            with open(TEAPOT, "rb") as f:
                h.update(f.read())
            continue
        with open(os.path.join(BASE, "examples", yml), "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:16]


def golden_child(out_path):
    """CPU f64 renders of every config -> npz (run in a child process)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from rray_tpu.render.integrator import render

    frames = {}
    for name, yml, w, h, skw, _ in _configs():
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
    golden_path = os.path.join(
        cache, f"frame_parity_golden_{_golden_key()}.npz")
    if not os.path.exists(golden_path):
        env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--golden",
             golden_path], env=env, capture_output=True, text=True,
            timeout=2400)
        if proc.returncode != 0:
            print(json.dumps({"metric": "frame_parity", "value": None,
                              "note": "golden render failed: "
                                      + proc.stderr[-300:]}))
            return
    golden = np.load(golden_path)

    for name, yml, w, h, skw, budget in _configs():
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
            "vs_baseline": float((d > 2).mean()) / budget,
        }), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--golden":
        golden_child(sys.argv[2])
    else:
        main()
