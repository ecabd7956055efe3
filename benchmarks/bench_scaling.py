"""Scaling-efficiency measurements for the SPMD render path.

BASELINE asks for >= 85% rays/s scaling efficiency at 1 chip / 1 host /
N hosts. Only one physical TPU chip is reachable from this environment,
so this bench measures what is physically measurable and delegates the
rest to correctness tests:

* **1-chip mesh-path efficiency** (reported here, on the real chip):
  rays/s of `parallel.mesh.render_sharded` over a 1-device mesh vs the
  plain single-device `render`. This is the entire per-device overhead
  the SPMD path adds — shard_map partitioning, sharded output layout,
  ray padding. Multi-chip scaling multiplies this per-device term by
  collective costs the forward path does not have (the image is written
  sharded; nothing is gathered), so the 1-chip number is the dominant
  term of the BASELINE efficiency metric that can be measured at all
  here.
* **Multi-device/multi-host correctness** (not timed): an 8-virtual-
  device CPU mesh and a 2-process jax.distributed render are asserted
  bit-identical to single-device output in tests/test_parallel.py. The
  host has 4 cores, so timing virtual devices would measure core
  timesharing, not scaling.

Run: python benchmarks/bench_scaling.py
"""
import dataclasses
import json
import os
import sys

BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)


def main():
    import jax
    import jax.numpy as jnp

    from rray_tpu.api import enable_compile_cache
    enable_compile_cache()
    from rray_tpu import Camera, RenderSettings, compile_camera, compile_scene
    from rray_tpu.io.yaml_loader import load_scene_file
    from rray_tpu.parallel import mesh as pmesh
    from rray_tpu.render.integrator import render
    from rray_tpu.utils.timing import measure_frame_seconds

    f32 = jnp.float32
    cam_spec, lights, shapes = load_scene_file(
        os.path.join(BASE, "examples", "example1.yaml"))
    scene = compile_scene(shapes, lights, dtype=f32)
    cam_h = Camera(800, 600, cam_spec["fov"])
    cam_h.transform = cam_spec["transform"]
    cam = compile_camera(cam_h, f32)
    settings = RenderSettings(rows_per_tile=600, max_hits=4,
                              containers_depth=2)
    rays = cam.hsize * cam.vsize

    def plain(jitter):
        c = dataclasses.replace(cam, half_width=cam.half_width + jitter * 1e-9)
        return render(scene, c, settings=settings).sum()

    t_plain = measure_frame_seconds(plain)

    m = pmesh.make_mesh(jax.devices()[:1])

    def sharded(jitter):
        c = dataclasses.replace(cam, half_width=cam.half_width + jitter * 1e-9)
        return pmesh.render_sharded(scene, c, m, settings=settings).sum()

    t_shard = measure_frame_seconds(sharded)

    eff = t_plain / t_shard
    print(json.dumps({
        "metric": "mesh_path_efficiency_1chip",
        "value": eff,
        "unit": "ratio (plain_time / shard_map_time, 1.0 = no overhead)",
        "plain_rays_per_s": rays / t_plain,
        "sharded_rays_per_s": rays / t_shard,
        "vs_baseline": eff / 0.85,
        "note": ("multi-device and 2-process renders are asserted "
                 "bit-identical in tests/test_parallel.py; no second "
                 "chip/host is reachable to time"),
    }), flush=True)

    # Sharded TRAIN step (pjit-style sharding constraints + psum'd
    # scene grads) vs the unsharded step on the same chip: the
    # per-device overhead of the SPMD training path.
    import optax

    from rray_tpu.parallel import train as ptrain

    optimizer = optax.adam(1e-2)
    state, rest = ptrain.init_train_state(scene, optimizer)
    target = jnp.zeros((cam.vsize, cam.hsize, 3), f32)
    key = jax.random.PRNGKey(0)
    times = {}
    for tag, mesh_arg in (("plain", None), ("sharded", m)):
        step = ptrain.make_train_step(rest, cam, settings, optimizer,
                                      mesh=mesh_arg,
                                      axis=pmesh.RAY_AXIS)
        st0 = state

        def one(jitter, step=step, st0=st0):
            st1, loss = step(st0, target + jitter * 1e-12, key)
            return loss

        times[tag] = measure_frame_seconds(one)
    eff_t = times["plain"] / times["sharded"]
    print(json.dumps({
        "metric": "train_step_efficiency_1chip",
        "value": eff_t,
        "unit": "ratio (plain_step_time / sharded_step_time)",
        "plain_step_s": times["plain"],
        "sharded_step_s": times["sharded"],
        "vs_baseline": eff_t / 0.85,
    }), flush=True)


if __name__ == "__main__":
    main()
