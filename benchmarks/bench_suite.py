"""All BASELINE.md benchmark configs; one JSON line per config.

Device time via in-graph repetition (utils/timing.py). Config 4 uses a
procedural mesh at teapot scale when the reference teapot fixture is
unavailable. Run: python benchmarks/bench_suite.py [config ...]
"""
import dataclasses
import json
import os
import sys

import numpy as np

BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)


def bench_scene(name, scene, cam, settings, n=None):
    import jax.numpy as jnp
    from rray_tpu.api import enable_compile_cache
    enable_compile_cache()
    from rray_tpu.render.integrator import render
    from rray_tpu.utils.timing import measure_frame_seconds

    def render_scalar(jitter):
        c = dataclasses.replace(cam, half_width=cam.half_width + jitter * 1e-9)
        return render(scene, c, settings=settings).sum()

    sec = measure_frame_seconds(render_scalar)
    rays = cam.hsize * cam.vsize
    print(json.dumps({"metric": f"{name}_rays_per_s", "value": rays / sec,
                      "unit": "rays/s", "frame_s": sec,
                      "vs_baseline": (rays / sec) / 1e9}), flush=True)


def load(path, w, h, dtype):
    from rray_tpu import Camera, compile_camera, compile_scene
    from rray_tpu.io.yaml_loader import load_scene_file

    cam_spec, lights, shapes = load_scene_file(path)
    scene = compile_scene(shapes, lights, dtype=dtype)
    cam_h = Camera(w, h, cam_spec["fov"])
    cam_h.transform = cam_spec["transform"]
    return scene, compile_camera(cam_h, dtype)


def main(which):
    import jax.numpy as jnp
    from rray_tpu import RenderSettings

    f32 = jnp.float32
    ex = os.path.join(BASE, "examples")

    if "1" in which:  # sphere + checker plane
        scene, cam = load(os.path.join(ex, "example1.yaml"), 800, 600, f32)
        bench_scene("config1_sphere", scene, cam,
                    RenderSettings(rows_per_tile=600, max_hits=4,
                                   containers_depth=2))
    if "2" in which:  # glass, 5-bounce wavefront
        scene, cam = load(os.path.join(ex, "glass.yaml"), 800, 600, f32)
        bench_scene("config2_glass", scene, cam,
                    RenderSettings(rows_per_tile=150, max_hits=16,
                                   containers_depth=4))
    if "3" in which:  # area light soft shadows + AA3
        scene, cam = load(os.path.join(ex, "area_light.yaml"), 800 * 3,
                          600 * 3, f32)
        bench_scene("config3_area", scene, cam,
                    RenderSettings(rows_per_tile=150, max_hits=4,
                                   containers_depth=2))
    if "4" in which:  # triangle mesh
        from bench_mesh import uv_sphere_obj
        from rray_tpu import (Camera, Material, Pattern, PointLight, Shape,
                              compile_camera, compile_scene)
        from rray_tpu import mathutils as mu
        from rray_tpu.io.obj_loader import load_obj_str, load_obj_file

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
        cam_h = Camera(800, 600, np.pi / 3)
        cam_h.transform = mu.view_transform([0, 1.5, -4], [0, 0.7, 0],
                                            [0, 1, 0])
        cam = compile_camera(cam_h, f32)
        bench_scene("config4_mesh", scene, cam,
                    RenderSettings(rows_per_tile=600, max_hits=4,
                                   containers_depth=2))
    if "4r" in which:
        # Config-4 variant with a REFLECTIVE floor: the round-5 mesh-
        # fusion widening lets the whitted kernel carry the mesh fold
        # through the width-1 reflection chain (scene.rs:159-178 over
        # meshes) instead of falling back to the HBM-bound XLA node.
        from rray_tpu import (Camera, Material, Pattern, PointLight, Shape,
                              compile_camera, compile_scene)
        from rray_tpu import mathutils as mu
        from rray_tpu.io.obj_loader import load_obj_file

        teapot = "/root/reference/examples/teapot-low.obj"
        if os.path.exists(teapot):
            mat = Material(pattern=Pattern.solid([0.7, 0.5, 0.2]))
            mesh = load_obj_file(teapot, mat)
            mesh.transform = mu.compose([mu.rotate_x(-np.pi / 2),
                                         mu.scale(0.12, 0.12, 0.12)])
            floor = Shape("plane", material=Material(
                pattern=Pattern("checker", a=Pattern.solid([1.0, 1.0, 1.0]),
                                b=Pattern.solid([0.2, 0.2, 0.2])),
                specular=0.0, reflective=0.3))
            light = PointLight(np.array([-10.0, 10.0, -10.0]), np.ones(3))
            scene = compile_scene([floor, mesh], [light], dtype=f32)
            cam_h = Camera(800, 600, np.pi / 3)
            cam_h.transform = mu.view_transform([0, 1.5, -4], [0, 0.7, 0],
                                                [0, 1, 0])
            cam = compile_camera(cam_h, f32)
            bench_scene("config4r_mesh_reflective", scene, cam,
                        RenderSettings(rows_per_tile=600, max_hits=4,
                                       containers_depth=2))
    if "4b" in which:  # full teapot: the production BVH kernel path
        from rray_tpu import (Camera, Material, Pattern, PointLight, Shape,
                              compile_camera, compile_scene)
        from rray_tpu import mathutils as mu
        from rray_tpu.io.obj_loader import load_obj_file

        teapot = "/root/reference/examples/teapot.obj"
        if os.path.exists(teapot):
            mat = Material(pattern=Pattern.solid([0.7, 0.5, 0.2]))
            mesh = load_obj_file(teapot, mat)  # 6320 tris >= bvh_min_tris
            mesh.transform = mu.compose([mu.rotate_x(-np.pi / 2),
                                         mu.scale(0.05, 0.05, 0.05)])
            floor = Shape("plane", material=Material(
                pattern=Pattern("checker", a=Pattern.solid([1.0, 1.0, 1.0]),
                                b=Pattern.solid([0.2, 0.2, 0.2])),
                specular=0.0))
            light = PointLight(np.array([-10.0, 10.0, -10.0]), np.ones(3))
            scene = compile_scene([floor, mesh], [light], dtype=f32)
            cam_h = Camera(800, 600, np.pi / 3)
            cam_h.transform = mu.view_transform([0, 1.5, -4], [0, 0.7, 0],
                                                [0, 1, 0])
            cam = compile_camera(cam_h, f32)
            bench_scene("config4b_bvh", scene, cam,
                        RenderSettings(rows_per_tile=600, max_hits=4,
                                       containers_depth=2))
    if "5" in which:  # CSG + torus + group + texture, 1920x1080
        scene, cam = load(os.path.join(ex, "csg_showcase.yaml"), 1920, 1080,
                          f32)
        bench_scene("config5_csg", scene, cam,
                    RenderSettings(rows_per_tile=54, max_hits=24,
                                   containers_depth=4))
    if "5aa" in which:
        # The BASELINE.md spec for config 5 is 1920x1080 at AA=5: the
        # reference sizes its camera width*aa x height*aa and box-
        # downsamples (scene_builder_yaml.rs:392, canvas.rs:76-105) —
        # a 9600x5400 supersampled raster, 51.8M primary rays, which
        # exercises the buffer caps and tiling at full production
        # scale. The downsample is included in the timed frame.
        from rray_tpu.render import canvas as rcanvas
        scene, cam = load(os.path.join(ex, "csg_showcase.yaml"),
                          1920 * 5, 1080 * 5, f32)
        import dataclasses

        import jax.numpy as jnp
        from rray_tpu.api import enable_compile_cache
        enable_compile_cache()
        from rray_tpu.render.integrator import render
        from rray_tpu.utils.timing import measure_frame_seconds

        settings = RenderSettings(rows_per_tile=54, max_hits=24,
                                  containers_depth=4)

        def render_scalar(jitter):
            c = dataclasses.replace(
                cam, half_width=cam.half_width + jitter * 1e-9)
            img = render(scene, c, settings=settings)
            return rcanvas.downsample(img, 5).sum()

        sec = measure_frame_seconds(render_scalar, max_exec_seconds=8.0)
        rays = 1920 * 5 * 1080 * 5
        print(json.dumps({"metric": "config5_aa5_rays_per_s",
                          "value": rays / sec, "unit": "rays/s",
                          "frame_s": sec,
                          "vs_baseline": (rays / sec) / 1e9}),
              flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["1", "2", "3", "4", "4r", "4b", "5", "5aa"])
