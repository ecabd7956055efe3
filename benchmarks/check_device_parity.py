"""On-device parity probe: Pallas triangle kernel vs the XLA f32 path.

CPU-interpret tests cannot see device-only numerics (e.g. the TPU's
default f32 matmul truncating operands to bf16 — an MXU variant of the
kernel shipped that way invisibly until this probe was added). Renders
the teapot scene once with each path on the real backend and reports
the max linear-color difference; anything beyond ~1e-3 means the kernel
is misclassifying u/v/t boundary tests.

Run: python benchmarks/check_device_parity.py
"""
import json
import os
import sys

import numpy as np

BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)

TEAPOT = "/root/reference/examples/teapot-low.obj"


def main():
    import jax.numpy as jnp

    from rray_tpu.api import enable_compile_cache
    enable_compile_cache()
    from rray_tpu import (Camera, Material, Pattern, PointLight,
                          RenderSettings, Shape, compile_camera,
                          compile_scene)
    from rray_tpu import mathutils as mu
    from rray_tpu.io.obj_loader import load_obj_file
    from rray_tpu.render.integrator import render

    if not os.path.exists(TEAPOT):
        print(json.dumps({"metric": "mesh_kernel_parity_maxdiff",
                          "value": None, "note": "no teapot fixture"}))
        return

    f32 = jnp.float32
    mesh = load_obj_file(TEAPOT, Material(pattern=Pattern.solid(
        [0.7, 0.5, 0.2])))
    mesh.transform = mu.compose([mu.rotate_x(-np.pi / 2),
                                 mu.scale(0.12, 0.12, 0.12)])
    floor = Shape("plane", material=Material(
        pattern=Pattern.solid([0.9, 0.9, 0.9]), specular=0.0))
    light = PointLight(np.array([-10.0, 10.0, -10.0]), np.ones(3))
    scene = compile_scene([floor, mesh], [light], dtype=f32)
    cam_h = Camera(200, 150, np.pi / 3)
    cam_h.transform = mu.view_transform([0, 1.5, -4], [0, 0.7, 0],
                                        [0, 1, 0])
    cam = compile_camera(cam_h, f32)

    a = np.asarray(render(scene, cam, settings=RenderSettings(
        rows_per_tile=150, pallas="on")))
    b = np.asarray(render(scene, cam, settings=RenderSettings(
        rows_per_tile=150, pallas="off", tri_chunk=256)))
    d = np.abs(a - b)
    out = {"metric": "mesh_kernel_parity_maxdiff",
           "value": float(d.max()),
           "unit": "linear color (tolerance ~1e-3)",
           "frac_gt_1e3": float((d > 1e-3).mean()),
           "vs_baseline": float(d.max()) / 1e-3}

    # Same probe through the BVH kernel: teapot-low (240 tris) runs the
    # linear-chunk kernel, so without this the production >=1024-tri
    # path (bvh_closest_triangle) never touches the real device outside
    # benches. The full teapot fans to 6320 triangles.
    full = os.path.join(os.path.dirname(TEAPOT), "teapot.obj")
    if os.path.exists(full):
        mesh = load_obj_file(full, Material(pattern=Pattern.solid(
            [0.7, 0.5, 0.2])))
        mesh.transform = mu.compose([mu.rotate_x(-np.pi / 2),
                                     mu.scale(0.05, 0.05, 0.05)])
        scene = compile_scene([floor, mesh], [light], dtype=f32)
        a = np.asarray(render(scene, cam, settings=RenderSettings(
            rows_per_tile=150, pallas="on")))
        b = np.asarray(render(scene, cam, settings=RenderSettings(
            rows_per_tile=150, pallas="off", tri_chunk=256)))
        db = np.abs(a - b)
        # Own JSON line so bench.py's metric capture records it too.
        print(json.dumps({"metric": "bvh_kernel_parity_maxdiff",
                          "value": float(db.max()),
                          "unit": "linear color (tolerance ~1e-3)",
                          "frac_gt_1e3": float((db > 1e-3).mean()),
                          "vs_baseline": float(db.max()) / 1e-3}),
              flush=True)

    # Fused Whitted-wavefront kernel (kernels/whitted.py) vs the XLA
    # compact path on the glass scene: the whole bounce scan runs
    # in-kernel, so this pins its Mosaic numerics end-to-end.
    glass = os.path.join(BASE, "examples", "glass.yaml")
    if os.path.exists(glass):
        from rray_tpu.io.yaml_loader import load_scene_file

        cam_spec, lights, shapes = load_scene_file(glass)
        scene = compile_scene(shapes, lights, dtype=f32)
        cam_h = Camera(160, 120, cam_spec["fov"])
        cam_h.transform = cam_spec["transform"]
        cam = compile_camera(cam_h, f32)
        a = np.asarray(render(scene, cam, settings=RenderSettings(
            rows_per_tile=120, max_hits=16, containers_depth=4,
            pallas="on")))
        b = np.asarray(render(scene, cam, settings=RenderSettings(
            rows_per_tile=120, max_hits=16, containers_depth=4,
            pallas="off")))
        dw = np.abs(a - b)
        print(json.dumps({"metric": "whitted_kernel_parity_maxdiff",
                          "value": float(dw.max()),
                          "unit": "linear color (tolerance ~1e-3)",
                          "frac_gt_1e3": float((dw > 1e-3).mean()),
                          "vs_baseline": float(dw.max()) / 1e-3}),
              flush=True)

    # Fused area-shadow kernel (kernels/analytic.py) vs the XLA sample
    # loop, on the real device: interpret-mode tests can't see Mosaic
    # lowering numerics (reciprocal-multiply division already bit one
    # refactor of this kernel). Same draws + predicates => exact.
    area = "/root/reference/examples/area_light.yaml"
    if os.path.exists(area):
        from rray_tpu.io.yaml_loader import load_scene_file

        cam_spec, lights, shapes = load_scene_file(area)
        scene = compile_scene(shapes, lights, dtype=f32)
        cam_h = Camera(200, 150, cam_spec["fov"])
        cam_h.transform = cam_spec["transform"]
        cam = compile_camera(cam_h, f32)
        a = np.asarray(render(scene, cam, settings=RenderSettings(
            rows_per_tile=150, pallas="on")))
        b = np.asarray(render(scene, cam, settings=RenderSettings(
            rows_per_tile=150, pallas="off")))
        da = np.abs(a - b)
        # pallas=on now routes this scene through the fused WHITTED
        # kernel (round 4), which recomputes the identical point-keyed
        # jitter draws in-register; the only numeric difference left is
        # the kernel's multiply-by-1/n shadow fraction vs XLA's divide
        # (<= 1 ulp).
        print(json.dumps({"metric": "area_kernel_parity_maxdiff",
                          "value": float(da.max()),
                          "unit": "linear color (expected ~0: identical "
                                  "draws and predicates)",
                          "vs_baseline": float(da.max()) / 1e-3}),
              flush=True)
    # Round-5 whitted extensions on real silicon: CSG parity filter,
    # Mosaic-safe torus quartic, in-kernel Perlin, affine texture
    # completion (polynomial atan2 uv). Tolerance is looser than the
    # glass probe: the kernel's quartic (Newton cos(acos/3), exp/log
    # cbrt) legitimately differs from XLA's trig solver by ~7e-4 in t,
    # which moves shading slightly and can flip a texel/silhouette on a
    # handful of pixels — gate on the >1e-2 FRACTION instead of max.
    csg = os.path.join(BASE, "examples", "csg_showcase.yaml")
    if os.path.exists(csg):
        from rray_tpu.io.yaml_loader import load_scene_file

        cam_spec, lights, shapes = load_scene_file(csg)
        scene = compile_scene(shapes, lights, dtype=f32)
        cam_h = Camera(192, 108, cam_spec["fov"])
        cam_h.transform = cam_spec["transform"]
        cam = compile_camera(cam_h, f32)
        a = np.asarray(render(scene, cam, settings=RenderSettings(
            rows_per_tile=54, max_hits=24, containers_depth=4,
            pallas="on")))
        b = np.asarray(render(scene, cam, settings=RenderSettings(
            rows_per_tile=54, max_hits=24, containers_depth=4,
            pallas="off")))
        dc = np.abs(a - b)
        print(json.dumps({"metric": "csg_kernel_parity_frac_gt_1e2",
                          "value": float((dc > 1e-2).mean()),
                          "unit": "fraction of subpixels (budget 2e-3)",
                          "maxdiff": float(dc.max()),
                          "median": float(np.median(dc)),
                          "vs_baseline": float((dc > 1e-2).mean()) / 2e-3}),
              flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
