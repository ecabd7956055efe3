"""Differentiable rendering: inverse-graphics training over a device mesh.

The reference has no gradient path (a Rust forward renderer). Here the
whole render is differentiable JAX, so scene parameters — material
scalars, pattern colors, light positions/intensities, object and camera
transforms — can be optimized against a target image.

The training step shards the pixel-ray axis across the mesh with sharding
constraints under `jit` (pjit-style): XLA partitions the forward and
backward passes and inserts the gradient all-reduce (`psum` over ICI) for
the replicated scene parameters automatically.
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import RenderSettings
from ..render import integrator
from ..render.camera import CameraData, all_rays_soa
from ..scene import data as sd


def partition_scene(scene: sd.SceneData, trainable=None):
    """Split SceneData into (params, static) by differentiability.

    Params: every floating-point leaf (transforms, materials, lights,
    pattern payloads). Static: integer/bool tables and pytree metadata.

    `trainable`: optional predicate over the leaf's key-path string (e.g.
    ".patterns[1].color") restricting which float leaves are optimized;
    the rest stay frozen in `static`.
    """
    leaves_paths, treedef = jax.tree_util.tree_flatten_with_path(scene)
    is_param = [
        hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.inexact)
        and (trainable is None or trainable(jax.tree_util.keystr(path)))
        for path, l in leaves_paths]
    leaves = [l for _, l in leaves_paths]
    params = [l if p else None for l, p in zip(leaves, is_param)]
    static = [None if p else l for l, p in zip(leaves, is_param)]
    return params, (static, treedef, is_param)


def merge_scene(params, rest) -> sd.SceneData:
    static, treedef, is_param = rest
    leaves = [p if sel else s for p, s, sel in zip(params, static, is_param)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def render_loss(params, rest, cam: CameraData, target, settings, key, axis=None):
    """Mean-squared pixel loss of a full render vs a target image.

    Rays stay in SoA component arrays (the single-device hot-path
    layout); the sharding constraint on each [R] component lets XLA
    shard the forward AND backward over the mesh, inserting the gradient
    psum itself."""
    scene = sd.canonicalize(merge_scene(params, rest))
    if axis is not None and getattr(settings, "pallas", "off") == "auto":
        # Resolve "auto" against the training mesh's devices (see
        # parallel/mesh.py — a CPU mesh on a TPU-default process must
        # not trace Pallas TPU kernels).
        import dataclasses
        import numpy as np
        if np.asarray(axis[0].devices).flat[0].platform == "cpu":
            settings = dataclasses.replace(settings, pallas="off")
    ro, rd = all_rays_soa(cam)
    if axis is not None:
        spec = NamedSharding(axis[0], P(axis[1]))
        constrain = lambda v: jax.lax.with_sharding_constraint(v, spec)
        ro = jax.tree_util.tree_map(constrain, ro)
        rd = jax.tree_util.tree_map(constrain, rd)
    node = integrator._soa_node_fn(scene)
    out = node(scene, ro, rd, settings.depth, settings, key)
    image = out.to_array().reshape(target.shape)
    return jnp.mean((image - target) ** 2)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: Any


def make_train_step(rest, cam, settings: RenderSettings, optimizer,
                    mesh: Mesh = None, axis: str = "rays"):
    """Build a jitted SPMD train step closed over static scene structure."""
    sharding_ctx = (mesh, axis) if mesh is not None else None

    def step_fn(state: TrainState, target, key):
        loss, grads = jax.value_and_grad(render_loss)(
            state.params, rest, cam, target, settings, key, sharding_ctx)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return jax.jit(step_fn)


def init_train_state(scene: sd.SceneData, optimizer, trainable=None):
    params, rest = partition_scene(scene, trainable)
    opt_state = optimizer.init(params)
    return TrainState(params, opt_state, jnp.zeros((), jnp.int32)), rest
