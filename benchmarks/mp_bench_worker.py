"""Worker for bench_multiproc: timed sharded render over a CPU mesh.

Usage: python mp_bench_worker.py <num_procs> <pid> <devices_per_proc>
With num_procs > 1 the worker joins a jax.distributed cluster at
127.0.0.1:12421; the GLOBAL device count (num_procs * devices_per_proc)
is held fixed so the 2-process run measures pure multi-process overhead
against the 1-process baseline. Process 0 prints the best (min) seconds per
frame of the steady-state sharded render.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"


def main(num_procs, pid, dev_per_proc):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={dev_per_proc}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from rray_tpu import (Camera, Material, Pattern, PointLight,
                          RenderSettings, Shape, compile_camera,
                          compile_scene)
    from rray_tpu import mathutils as mu
    from rray_tpu.parallel import distributed as dist
    from rray_tpu.parallel import mesh as pmesh

    if num_procs > 1:
        coord = os.environ.get("RRAY_MP_COORD", "127.0.0.1:12421")
        ok = dist.init_distributed(coord, num_procs, pid)
        assert ok, "expected multi-process init"
    assert len(jax.devices()) == num_procs * dev_per_proc

    floor = Shape("plane", material=Material(
        pattern=Pattern("checker", a=Pattern.solid([1.0, 1.0, 1.0]),
                        b=Pattern.solid([0.2, 0.2, 0.2])), specular=0.0))
    ball = Shape("sphere", transform=mu.translate(0, 1, 0),
                 material=Material(pattern=Pattern.solid([0.7, 0.2, 0.2]),
                                   reflective=0.3))
    light = PointLight(np.array([-10.0, 10.0, -10.0]), np.ones(3))
    scene = compile_scene([floor, ball], [light], dtype=jnp.float32)
    cam_h = Camera(512, 256, np.pi / 3)
    cam_h.transform = mu.view_transform([0, 1.5, -5], [0, 1, 0], [0, 1, 0])
    cam = compile_camera(cam_h, jnp.float32)
    mesh = dist.global_mesh()
    settings = RenderSettings(rows_per_tile=256)

    def frame():
        img = pmesh.render_sharded_jit(scene, cam, mesh, settings=settings)
        jax.block_until_ready(img)
        return img

    frame()  # compile + warm
    times = []
    for _ in range(7):
        t0 = time.perf_counter()
        frame()
        times.append(time.perf_counter() - t0)
    if pid == 0:
        print(f"median_frame_s {min(times)}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
