"""SPMD rendering over a TPU device mesh.

The reference's only parallelism is a rayon thread pool over pixels with a
Mutex'd canvas (camera.rs:107-121). The TPU-native equivalent shards the
pixel-ray axis across a 1-D device mesh with `shard_map`: every device
renders its contiguous block of rays against a replicated scene, and the
image is reassembled by the output sharding (no mutex, no gather on the
hot path — XLA lays the shards straight into the sharded output buffer).

Multi-host: `jax.distributed.initialize` + the same mesh spanning all
processes; each host feeds its addressable shard. Collectives ride ICI
within a slice and DCN across hosts, all emitted by XLA from the sharding
annotations.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..config import RenderSettings
from ..render import integrator
from ..render.camera import CameraData, all_rays
from ..scene import data as sd

RAY_AXIS = "rays"


def make_mesh(devices=None, axis: str = RAY_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices; the axis shards rays."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def _pad_rays(ro, rd, multiple: int):
    R = ro.shape[0]
    pad = (-R) % multiple
    if pad:
        ro = jnp.concatenate([ro, jnp.zeros((pad, 3), ro.dtype)], 0)
        # Padding rays point +z from origin; their colors are discarded.
        filler = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], rd.dtype), (pad, 1))
        rd = jnp.concatenate([rd, filler], 0)
    return ro, rd, R


def render_sharded(scene: sd.SceneData, cam: CameraData, mesh: Mesh,
                   settings: RenderSettings = RenderSettings(),
                   seed: int = 0):
    """Full-frame render with rays sharded over `mesh`'s first axis.

    Returns the image [vsize, hsize, 3] (committed to the mesh's devices,
    sharded by rows when vsize divides evenly).
    """
    axis = mesh.axis_names[0]
    n = mesh.shape[axis]
    ro, rd = all_rays(cam)
    ro, rd, R = _pad_rays(ro, rd, n)
    key = jax.random.PRNGKey(seed)

    @partial(shard_map, mesh=mesh, in_specs=(P(), P(axis), P(axis), P()),
             out_specs=P(axis))
    def shard_render(scene_, ro_, rd_, key_):
        # Each device folds its mesh position into the sampling key so
        # area-light jitter stays decorrelated across shards.
        k = jax.random.fold_in(key_, jax.lax.axis_index(axis))
        return integrator.color_at(scene_, ro_, rd_, settings.depth,
                                   settings, k)

    colors = shard_render(scene, ro, rd, key)
    return colors[:R].reshape(cam.vsize, cam.hsize, 3)


def render_sharded_jit(scene, cam, mesh, settings=RenderSettings(), seed=0):
    fn = jax.jit(render_sharded, static_argnames=("mesh", "settings", "seed"))
    return fn(scene, cam, mesh, settings=settings, seed=seed)


def device_put_replicated(tree, mesh: Mesh):
    """Commit scene tensors replicated across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "shape") else x,
        tree)
