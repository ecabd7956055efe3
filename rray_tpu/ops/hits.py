"""Per-ray hit list assembly: the TPU replacement for Scene::intersect.

The reference walks every object through a global mutex'd registry and
sorts a Vec<Intersection> per ray (scene.rs:97-106). Here every primitive
type contributes fixed hit slots; slots are merged into a per-ray sorted
top-K list (ascending t, +inf padding). That sorted prefix drives:

* hit selection — first slot with t >= 0 (scene.rs:128-136, 249-259);
* CSG filtering — a masked scan replay of filter_intersections
  (csg.rs:177-195) per CSG node, innermost first;
* the n1/n2 containers walk for refraction (intersection.rs:61-92).

Triangle meshes are streamed in chunks with a running top-K merge so
memory stays bounded for large OBJ models.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ..scene import data as sd
from . import intersect

_INF = jnp.inf


@dataclasses.dataclass
class Slots:
    t: Any      # [R,K] ascending, +inf padded
    prim: Any   # [R,K] int32
    u: Any      # [R,K]
    v: Any      # [R,K]
    valid: Any  # [R,K] bool


jax.tree_util.register_dataclass(
    Slots, data_fields=["t", "prim", "u", "v", "valid"], meta_fields=[])


def _sort_slots(t, prim, u, v, k):
    """Sort slots ascending by t and keep the first k."""
    t_s, prim_s, u_s, v_s = jax.lax.sort((t, prim, u, v), num_keys=1, is_stable=True)
    return t_s[:, :k], prim_s[:, :k], u_s[:, :k], v_s[:, :k]


def _analytic_slots(scene: sd.SceneData, ro, rd):
    """All analytic-primitive hit slots, unsorted: (t, prim, u, v) [R,S]."""
    ns, npl, ncu, ncy, nco, nto, _, _ = scene.counts
    R = ro.shape[0]
    dtype = ro.dtype
    ts, prims = [], []

    def add(t, valid, prim_ids):
        # t:[R,N,k] valid:[R,N,k] prim_ids:[N]
        k = t.shape[-1]
        t = jnp.where(valid, t, _INF).reshape(R, -1)
        pid = jnp.broadcast_to(prim_ids[None, :, None], valid.shape).reshape(R, -1)
        ts.append(t)
        prims.append(pid)

    if ns:
        o, d = intersect.transform_rays(scene.sph_inv, ro, rd)
        t, valid = intersect.spheres(o, d)
        add(t, valid, scene.sph_prim)
    if npl:
        o, d = intersect.transform_rays(scene.pla_inv, ro, rd)
        t, valid = intersect.planes(o, d)
        add(t, valid, scene.pla_prim)
    if ncu:
        o, d = intersect.transform_rays(scene.cub_inv, ro, rd)
        t, valid = intersect.cubes(o, d)
        add(t, valid, scene.cub_prim)
    if ncy:
        o, d = intersect.transform_rays(scene.cyl_inv, ro, rd)
        t, valid = intersect.cylinders(o, d, scene.cyl_min[None, :],
                                       scene.cyl_max[None, :],
                                       scene.cyl_closed[None, :])
        add(t, valid, scene.cyl_prim)
    if nco:
        o, d = intersect.transform_rays(scene.con_inv, ro, rd)
        t, valid = intersect.cones(o, d, scene.con_min[None, :],
                                   scene.con_max[None, :],
                                   scene.con_closed[None, :])
        add(t, valid, scene.con_prim)
    if nto:
        o, d = intersect.transform_rays(scene.tor_inv, ro, rd)
        t, valid = intersect.tori(o, d, scene.tor_r[None, :])
        add(t, valid, scene.tor_prim)

    if not ts:
        t = jnp.full((R, 0), _INF, dtype)
        prim = jnp.zeros((R, 0), jnp.int32)
    else:
        t = jnp.concatenate(ts, axis=1)
        prim = jnp.concatenate(prims, axis=1)
    u = jnp.zeros_like(t)
    v = jnp.zeros_like(t)
    return t, prim, u, v


def _triangle_topk(scene: sd.SceneData, ro, rd, k, chunk):
    """Running top-K merge over triangle chunks: returns sorted [R,k] slots."""
    T = scene.counts[6]
    R = ro.shape[0]
    dtype = ro.dtype
    pad = (-T) % chunk
    n_chunks = (T + pad) // chunk

    def padded(x, fill=0.0):
        if pad == 0:
            return x
        width = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, width, constant_values=fill)

    p1 = padded(scene.tri_p1).reshape(n_chunks, chunk, 3)
    e1 = padded(scene.tri_e1).reshape(n_chunks, chunk, 3)
    e2 = padded(scene.tri_e2).reshape(n_chunks, chunk, 3)
    pid = padded(scene.tri_prim, fill=0).reshape(n_chunks, chunk)
    live = padded(jnp.ones(T, bool), fill=False).reshape(n_chunks, chunk)

    kk = min(k, T)
    init = (jnp.full((R, kk), _INF, dtype), jnp.zeros((R, kk), jnp.int32),
            jnp.zeros((R, kk), dtype), jnp.zeros((R, kk), dtype))

    def body(carry, chunk_data):
        ct, cp, cu, cv = carry
        cp1, ce1, ce2, cpid, clive = chunk_data
        t, u, v, ok = intersect.triangles(ro, rd, cp1, ce1, ce2)
        ok = ok & clive[None, :]
        t = jnp.where(ok, t, _INF)
        pidb = jnp.broadcast_to(cpid[None, :], t.shape)
        mt = jnp.concatenate([ct, t], axis=1)
        mp = jnp.concatenate([cp, pidb], axis=1)
        muu = jnp.concatenate([cu, u], axis=1)
        mv = jnp.concatenate([cv, v], axis=1)
        return _sort_slots(mt, mp, muu, mv, kk), None

    if n_chunks == 1:
        carry, _ = body(init, (p1[0], e1[0], e2[0], pid[0], live[0]))
    else:
        carry, _ = jax.lax.scan(body, init, (p1, e1, e2, pid, live))
    return carry


def gather_sorted_hits(scene: sd.SceneData, ro, rd, settings) -> Slots:
    """Sorted per-ray hit prefix with CSG filtering applied."""
    t, prim, u, v = _analytic_slots(scene, ro, rd)
    S = t.shape[1]
    T = scene.counts[6]
    k = min(settings.max_hits, S + min(T, settings.max_hits))
    k = max(k, 1)

    if T:
        tt, tp, tu, tv = _triangle_topk(scene, ro, rd, settings.max_hits,
                                        min(settings.tri_chunk, max(T, 1)))
        t = jnp.concatenate([t, tt], axis=1)
        prim = jnp.concatenate([prim, tp], axis=1)
        u = jnp.concatenate([u, tu], axis=1)
        v = jnp.concatenate([v, tv], axis=1)

    if t.shape[1] == 0:
        R = ro.shape[0]
        t = jnp.full((R, 1), _INF, ro.dtype)
        prim = jnp.zeros((R, 1), jnp.int32)
        u = jnp.zeros((R, 1), ro.dtype)
        v = jnp.zeros((R, 1), ro.dtype)

    t, prim, u, v = _sort_slots(t, prim, u, v, k)
    valid = jnp.isfinite(t)
    slots = Slots(t=t, prim=prim, u=u, v=v, valid=valid)
    return _apply_csg(scene, slots)


def _apply_csg(scene: sd.SceneData, slots: Slots) -> Slots:
    """Replay filter_intersections (csg.rs:177-195) per CSG node.

    Innermost nodes run first; a hit they drop no longer toggles in/out
    state for enclosing nodes (the reference's nested local_intersect
    composes the same way)."""
    valid = slots.valid
    for ci, op in enumerate(scene.csg_ops):
        side = scene.csg_side[ci][slots.prim]  # [R,K] 0/1/2
        side = jnp.where(valid, side, 0)

        def step(carry, s):
            inl, inr = carry
            lhit = s == 1
            under = s > 0
            if op == sd.CSG_UNION:
                allowed = (lhit & ~inr) | (~lhit & ~inl)
            elif op == sd.CSG_INTERSECTION:
                allowed = (lhit & inr) | (~lhit & inl)
            else:
                allowed = (lhit & ~inr) | (~lhit & inl)
            keep = ~under | allowed
            inl = inl ^ (s == 1)
            inr = inr ^ (s == 2)
            return (inl, inr), keep

        R = side.shape[0]
        init = (jnp.zeros(R, bool), jnp.zeros(R, bool))
        _, keep = jax.lax.scan(step, init, side.T)
        valid = valid & keep.T
    if scene.csg_ops:
        slots = Slots(t=slots.t, prim=slots.prim, u=slots.u, v=slots.v,
                      valid=valid)
    return slots


def closest_hit(scene: sd.SceneData, ro, rd, settings):
    """Closest t >= 0 hit WITHOUT building the sorted prefix.

    Valid whenever nothing downstream needs the full ordered hit list —
    i.e. no CSG filtering (csg.rs:177-195) and no refraction containers
    walk (intersection.rs:61-92). Equivalent to select_hit(gather_sorted_
    hits(...)) in that regime, but skips both lax.sort calls and the
    top-K slot tensors, which dominate simple scenes.

    Returns (found, t, prim, u, v).
    """
    t, prim, u, v = _analytic_slots(scene, ro, rd)
    t = jnp.where(t >= 0.0, t, _INF)
    R = ro.shape[0]
    dtype = ro.dtype

    if t.shape[1]:
        best_i = jnp.argmin(t, axis=1)
        take = lambda x: jnp.take_along_axis(x, best_i[:, None], axis=1)[:, 0]
        best_t, best_prim, best_u, best_v = take(t), take(prim), take(u), take(v)
    else:
        best_t = jnp.full(R, _INF, dtype)
        best_prim = jnp.zeros(R, jnp.int32)
        best_u = best_v = jnp.zeros(R, dtype)

    T = scene.counts[6]
    if T:
        chunk = min(settings.tri_chunk, T)
        pad = (-T) % chunk
        n_chunks = (T + pad) // chunk

        def padded(x, fill=0.0):
            if pad == 0:
                return x
            width = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, width, constant_values=fill)

        p1 = padded(scene.tri_p1).reshape(n_chunks, chunk, 3)
        e1 = padded(scene.tri_e1).reshape(n_chunks, chunk, 3)
        e2 = padded(scene.tri_e2).reshape(n_chunks, chunk, 3)
        pid = padded(scene.tri_prim, fill=0).reshape(n_chunks, chunk)
        live = padded(jnp.ones(T, bool), fill=False).reshape(n_chunks, chunk)

        def body(carry, c):
            bt, bp, bu, bv = carry
            cp1, ce1, ce2, cpid, clive = c
            tt, uu, vv, ok = intersect.triangles(ro, rd, cp1, ce1, ce2)
            tt = jnp.where(ok & clive[None, :] & (tt >= 0.0), tt, _INF)
            ci = jnp.argmin(tt, axis=1)
            take = lambda x: jnp.take_along_axis(x, ci[:, None], axis=1)[:, 0]
            ct = take(tt)
            better = ct < bt
            bt = jnp.where(better, ct, bt)
            bp = jnp.where(better, cpid[ci], bp)
            bu = jnp.where(better, take(uu), bu)
            bv = jnp.where(better, take(vv), bv)
            return (bt, bp, bu, bv), None

        init = (best_t, best_prim, best_u, best_v)
        if n_chunks == 1:
            (best_t, best_prim, best_u, best_v), _ = body(
                init, (p1[0], e1[0], e2[0], pid[0], live[0]))
        else:
            (best_t, best_prim, best_u, best_v), _ = jax.lax.scan(
                body, init, (p1, e1, e2, pid, live))

    found = jnp.isfinite(best_t)
    return found, best_t, best_prim, best_u, best_v


def select_hit(slots: Slots):
    """First intersection with t >= 0 (scene.rs:128-136)."""
    pos = slots.valid & (slots.t >= 0.0)
    found = jnp.any(pos, axis=1)
    idx = jnp.argmax(pos, axis=1)
    take = lambda x: jnp.take_along_axis(x, idx[:, None], axis=1)[:, 0]
    return found, idx, take(slots.t), take(slots.prim), take(slots.u), take(slots.v)


def shadow_hit(scene: sd.SceneData, ro, rd, distance, settings):
    """is_shadowed (scene.rs:234-245): any filtered hit with 0 <= t < dist."""
    if scene.csg_ops:
        slots = gather_sorted_hits(scene, ro, rd, settings)
        hit = slots.valid & (slots.t >= 0.0) & (slots.t < distance[:, None])
        return jnp.any(hit, axis=1)
    # Fast any-hit path: no sort needed.
    t, prim, _, _ = _analytic_slots(scene, ro, rd)
    any_hit = jnp.any((t >= 0.0) & (t < distance[:, None]) & jnp.isfinite(t), axis=1)
    T = scene.counts[6]
    if T:
        chunk = min(settings.tri_chunk, T)
        pad = (-T) % chunk
        n_chunks = (T + pad) // chunk

        def padded(x, fill=0.0):
            if pad == 0:
                return x
            width = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, width, constant_values=fill)

        p1 = padded(scene.tri_p1).reshape(n_chunks, chunk, 3)
        e1 = padded(scene.tri_e1).reshape(n_chunks, chunk, 3)
        e2 = padded(scene.tri_e2).reshape(n_chunks, chunk, 3)
        live = padded(jnp.ones(T, bool), fill=False).reshape(n_chunks, chunk)

        def body(acc, c):
            cp1, ce1, ce2, clive = c
            t, _, _, ok = intersect.triangles(ro, rd, cp1, ce1, ce2)
            ok = ok & clive[None, :] & (t >= 0.0) & (t < distance[:, None])
            return acc | jnp.any(ok, axis=1), None

        if n_chunks == 1:
            any_tri, _ = body(jnp.zeros_like(any_hit), (p1[0], e1[0], e2[0], live[0]))
        else:
            any_tri, _ = jax.lax.scan(body, jnp.zeros_like(any_hit),
                                      (p1, e1, e2, live))
        any_hit = any_hit | any_tri
    return any_hit


def refractive_indices(scene: sd.SceneData, slots: Slots, hit_idx, depth: int):
    """n1/n2 via the containers walk (intersection.rs:61-92), vectorized.

    Maintains an ordered container list (append on enter, remove-shift on
    exit) per ray and reads the last element's refractive index just
    before/after processing the hit slot. The list is floored at the
    scene's prim count (membership toggles per prim, so it can never grow
    past P) — exact for any nesting depth, matching the SoA twin."""
    R, K = slots.t.shape
    dtype = slots.t.dtype
    cd = min(max(int(depth), int(scene.counts[7])), 64)
    arange_cd = jnp.arange(cd)

    def top_ior(ids, size):
        empty = size == 0
        last = jnp.take_along_axis(ids, jnp.maximum(size - 1, 0)[:, None], axis=1)[:, 0]
        ior = scene.mat_ior[jnp.maximum(last, 0)]
        return jnp.where(empty, jnp.asarray(1.0, dtype), ior)

    def step(carry, xs):
        ids, size, n1, n2 = carry
        slot_i, prim, valid = xs
        is_hit = slot_i == hit_idx

        n1_here = top_ior(ids, size)
        n1 = jnp.where(is_hit & valid, n1_here, n1)

        # Toggle membership of `prim` in the ordered container list.
        occupied = arange_cd[None, :] < size[:, None]
        eq = (ids == prim[:, None]) & occupied
        present = jnp.any(eq, axis=1)
        pos = jnp.argmax(eq, axis=1)
        # remove: shift left from pos
        shifted = jnp.concatenate([ids[:, 1:], jnp.full((R, 1), -1, ids.dtype)], axis=1)
        removed = jnp.where(arange_cd[None, :] >= pos[:, None], shifted, ids)
        # push: place at `size`
        pushed = jnp.where(arange_cd[None, :] == size[:, None], prim[:, None], ids)
        new_ids = jnp.where(present[:, None], removed, pushed)
        new_size = jnp.where(present, size - 1, jnp.minimum(size + 1, cd))
        ids = jnp.where(valid[:, None], new_ids, ids)
        size = jnp.where(valid, new_size, size)

        n2_here = top_ior(ids, size)
        n2 = jnp.where(is_hit & valid, n2_here, n2)
        return (ids, size, n1, n2), None

    init = (jnp.full((R, cd), -1, jnp.int32), jnp.zeros(R, jnp.int32),
            jnp.ones(R, dtype), jnp.ones(R, dtype))
    xs = (jnp.arange(K), slots.prim.T, slots.valid.T)
    (ids, size, n1, n2), _ = jax.lax.scan(step, init, xs)
    return n1, n2
