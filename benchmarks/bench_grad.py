"""Backward/forward time-ratio benchmark (a named BASELINE.json metric).

Times `jax.grad` of a scalar render loss (w.r.t. the differentiable
scene params — material scalars, transforms, light intensities; see
parallel/train.partition_scene) against the plain forward render, on the
BASELINE config-1 (sphere) and config-2 (glass) scenes. The reference
has no gradient path at all, so the ratio only has an internal target:
a healthy reverse-mode pass lands in the 2-4x band.

Run: python benchmarks/bench_grad.py [1 2]
Prints one JSON line per config:
  {"metric": "config1_bwd_fwd_ratio", "value": ..., ...}
"""
import dataclasses
import json
import os
import sys

import numpy as np

BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)


def bench_grad(name, scene, cam, settings):
    import jax
    import jax.numpy as jnp
    from rray_tpu.parallel import train as ptrain
    from rray_tpu.render.integrator import render
    from rray_tpu.utils.timing import measure_frame_seconds

    params, static = ptrain.partition_scene(scene)

    def loss(params, jitter):
        sc = ptrain.merge_scene(params, static)
        c = dataclasses.replace(cam, half_width=cam.half_width + jitter * 1e-9)
        img = render(sc, c, settings=settings)
        return jnp.mean(img ** 2)

    def fwd_scalar(jitter):
        return loss(params, jitter)

    grad_fn = jax.grad(loss)

    def bwd_scalar(jitter):
        g = grad_fn(params, jitter)
        return sum(jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(g))

    fwd_s = measure_frame_seconds(fwd_scalar)
    bwd_s = measure_frame_seconds(bwd_scalar)
    ratio = bwd_s / fwd_s
    print(json.dumps({"metric": f"{name}_bwd_fwd_ratio", "value": ratio,
                      "unit": "x", "fwd_s": fwd_s, "bwd_s": bwd_s,
                      "vs_baseline": ratio}), flush=True)


def main(which):
    import jax.numpy as jnp
    from rray_tpu import RenderSettings
    from rray_tpu.api import enable_compile_cache
    enable_compile_cache()
    from bench_suite import load

    ex = os.path.join(BASE, "examples")
    f32 = jnp.float32
    if "1" in which:
        scene, cam = load(os.path.join(ex, "example1.yaml"), 400, 300, f32)
        bench_grad("config1", scene, cam,
                   RenderSettings(rows_per_tile=300, max_hits=4,
                                  containers_depth=2))
    if "2" in which:
        # rows_per_tile 300 (one tile): the backward's per-level
        # residual traffic amortizes across the whole frame (swept:
        # 13.1 ms bwd vs 15.7 at 150 / 17.2 at 75). The remaining
        # ratio is structural: the XLA backward pays ~6 full-width
        # level backwards while the kernel forward skips dead rows
        # per block (full remat and scan-mode backwards both measured
        # 3-6x WORSE).
        scene, cam = load(os.path.join(ex, "glass.yaml"), 400, 300, f32)
        bench_grad("config2", scene, cam,
                   RenderSettings(rows_per_tile=300, max_hits=16,
                                  containers_depth=4))
    if "3" in which:  # area-light soft shadows (fractional-shadow grads)
        scene, cam = load(os.path.join(ex, "area_light.yaml"), 400, 300, f32)
        bench_grad("config3", scene, cam,
                   RenderSettings(rows_per_tile=150, max_hits=4,
                                  containers_depth=2))
    if "4" in which:  # mesh: Pallas kernel forward + custom-VJP backward
        from rray_tpu import (Camera, Material, Pattern, PointLight, Shape,
                              compile_camera, compile_scene)
        from rray_tpu import mathutils as mu
        from rray_tpu.io.obj_loader import load_obj_file, load_obj_str
        from bench_mesh import uv_sphere_obj

        teapot = "/root/reference/examples/teapot-low.obj"
        mat = Material(pattern=Pattern.solid([0.7, 0.5, 0.2]))
        if os.path.exists(teapot):
            mesh = load_obj_file(teapot, mat)
            mesh.transform = mu.compose([mu.rotate_x(-np.pi / 2),
                                         mu.scale(0.12, 0.12, 0.12)])
        else:
            mesh = load_obj_str(uv_sphere_obj(11, 11), mat)
            mesh.transform = mu.translate(0, 1, 0)
        floor = Shape("plane", material=Material(
            pattern=Pattern("checker", a=Pattern.solid([1.0, 1.0, 1.0]),
                            b=Pattern.solid([0.2, 0.2, 0.2])), specular=0.0))
        light = PointLight(np.array([-10.0, 10.0, -10.0]), np.ones(3))
        scene = compile_scene([floor, mesh], [light], dtype=f32)
        cam_h = Camera(400, 300, np.pi / 3)
        cam_h.transform = mu.view_transform([0, 1.5, -4], [0, 0.7, 0],
                                            [0, 1, 0])
        cam = compile_camera(cam_h, f32)
        bench_grad("config4", scene, cam,
                   RenderSettings(rows_per_tile=300, max_hits=4,
                                  containers_depth=2))
    if "5" in which:  # CSG + torus + texture (slot machinery backward)
        scene, cam = load(os.path.join(ex, "csg_showcase.yaml"), 480, 270,
                          f32)
        bench_grad("config5", scene, cam,
                   RenderSettings(rows_per_tile=54, max_hits=24,
                                  containers_depth=4))


if __name__ == "__main__":
    main(sys.argv[1:] or ["1", "2", "3", "4", "5"])
