"""Pallas TPU kernel: fused Möller–Trumbore closest-hit over a mesh.

The XLA path streams [R, C] ray/triangle intermediates through HBM
between the intersection math and the min-reduction. This kernel keeps
everything in VMEM: the grid tiles the ray axis; each program holds the
full triangle component tables (SoA, a few hundred KB for typical
meshes) in VMEM and loops over lane-aligned chunks, folding the running
per-ray minimum in registers/VMEM scratch.

Chunk culling: triangles are Morton-ordered at scene compile
(scene/data.py), so each 512-triangle chunk has a tight AABB; a chunk
whose slab test (cube.rs:48-61 style) misses every ray in the block is
skipped entirely — the TPU-side equivalent of the reference's per-group
AABB gate (group.rs:80-91), but per ray-block x triangle-chunk.

Semantics: triangle.rs:72-94 (Möller–Trumbore, EPSILON determinant
cutoff) with the closest-hit filter t >= 0; ties resolve to the lowest
triangle index like the stable sort + first-hit rule (scene.rs:97-136).

Inputs are padded: rays to BR multiples, triangles to C multiples with
far-away degenerate triangles (p1 = 1e30, zero edges) so padding chunks
cull away.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import EPSILON

BR = 512        # rays per program
CHUNK = 512      # max triangles per inner step
CHUNK_ALIGN = 128  # lane alignment for small meshes

_INF = float("inf")
_FAR = 1e30


def chunk_size(T: int) -> int:
    """Lane-aligned chunk: small meshes avoid padding to the full 512."""
    if T >= CHUNK:
        return CHUNK
    return -(-T // CHUNK_ALIGN) * CHUNK_ALIGN


def _kernel(chunk, normals, seeded, *refs):
    refs = list(refs)
    rox, roy, roz, rdx, rdy, rdz = refs[:6]
    del refs[:6]
    t0_ref = refs.pop(0) if seeded else None
    if normals:
        (p1x, p1y, p1z, e1x, e1y, e1z, e2x, e2y, e2z,
         n1x, n1y, n1z, n2x, n2y, n2z, n3x, n3y, n3z,
         boxes, t_ref, u_ref, v_ref, idx_ref,
         nx_ref, ny_ref, nz_ref) = refs
    else:
        (p1x, p1y, p1z, e1x, e1y, e1z, e2x, e2y, e2z,
         boxes, t_ref, u_ref, v_ref, idx_ref) = refs
    T = p1x.shape[1]
    n_chunks = T // chunk

    ox = rox[0, :][:, None]
    oy = roy[0, :][:, None]
    oz = roz[0, :][:, None]
    dx = rdx[0, :][:, None]
    dy = rdy[0, :][:, None]
    dz = rdz[0, :][:, None]

    # Reciprocal directions for the AABB slab test (zero-safe).
    def inv(d):
        return 1.0 / jnp.where(jnp.abs(d) < 1e-30,
                               jnp.where(d < 0, -1e-30, 1e-30), d)

    ix, iy, iz = inv(dx[:, 0]), inv(dy[:, 0]), inv(dz[:, 0])
    # Seed bound for the chunk cull: an analytic hit already known to be
    # closer lets whole chunks drop. Only the cull consults it (a loaded
    # vector in the loop-carry init fails Mosaic's layout check); hits
    # beyond the seed may still be reported and the caller's strict `<`
    # merge discards them.
    t_seed = (t0_ref[0, :][:, None])[:, 0] if seeded else _INF

    def mt_body(c, carry):
        bt, bu, bv, bi = carry[:4]
        s = pl.ds(c * chunk, chunk)
        te1x = e1x[0, s][None, :]
        te1y = e1y[0, s][None, :]
        te1z = e1z[0, s][None, :]
        te2x = e2x[0, s][None, :]
        te2y = e2y[0, s][None, :]
        te2z = e2z[0, s][None, :]
        tp1x = p1x[0, s][None, :]
        tp1y = p1y[0, s][None, :]
        tp1z = p1z[0, s][None, :]

        cx = dy * te2z - dz * te2y
        cy = dz * te2x - dx * te2z
        cz = dx * te2y - dy * te2x
        det = te1x * cx + te1y * cy + te1z * cz
        ok = jnp.abs(det) >= EPSILON
        f = 1.0 / jnp.where(ok, det, 1.0)
        sx = ox - tp1x
        sy = oy - tp1y
        sz = oz - tp1z
        uu = f * (sx * cx + sy * cy + sz * cz)
        ok = ok & (uu >= 0.0) & (uu <= 1.0)
        qx = sy * te1z - sz * te1y
        qy = sz * te1x - sx * te1z
        qz = sx * te1y - sy * te1x
        vv = f * (dx * qx + dy * qy + dz * qz)
        ok = ok & (vv >= 0.0) & (uu + vv <= 1.0)
        tt = f * (te2x * qx + te2y * qy + te2z * qz)
        ok = ok & (tt >= 0.0)
        tt = jnp.where(ok, tt, _INF)

        local = jnp.argmin(tt, axis=1).astype(jnp.int32)
        ct = jnp.min(tt, axis=1)
        # One-hot select: Mosaic can't lower gathers inside the kernel.
        col = jax.lax.broadcasted_iota(jnp.int32, tt.shape, 1)
        onehot = col == local[:, None]
        take = lambda a: jnp.sum(jnp.where(onehot, a, 0.0), axis=1)
        better = ct < bt
        out = (jnp.where(better, ct, bt),
               jnp.where(better, take(uu), bu),
               jnp.where(better, take(vv), bv),
               jnp.where(better, c * chunk + local, bi))
        if normals:
            # Interpolate the winning triangle's (already world-space,
            # nmat-transformed) vertex normals in-kernel: replaces 13
            # per-ray table gathers (~1 elem/cycle on TPU) downstream.
            # Flat triangles store n1=n2=n3=nflat, so one formula serves
            # both (smooth_triangle.rs:99-101).
            wu = jnp.where(onehot, uu, 0.0)
            wv = jnp.where(onehot, vv, 0.0)
            w1 = jnp.where(onehot, 1.0 - uu - vv, 0.0)
            nsel = lambda a1, a2, a3: jnp.sum(
                w1 * a1[0, s][None, :] + wu * a2[0, s][None, :]
                + wv * a3[0, s][None, :], axis=1)
            out += (jnp.where(better, nsel(n1x, n2x, n3x), carry[4]),
                    jnp.where(better, nsel(n1y, n2y, n3y), carry[5]),
                    jnp.where(better, nsel(n1z, n2z, n3z), carry[6]))
        return out

    def body(c, carry):
        # Block-level cull: does any ray in this block enter chunk c's box
        # before the block's current worst best-t?
        # Chunk boxes live in SMEM: dynamic scalar reads are legal there
        # (a dynamic VMEM load fails Mosaic's 128-alignment proof as soon
        # as n_chunks > 1).
        lox, loy, loz = boxes[0, c], boxes[1, c], boxes[2, c]
        hix, hiy, hiz = boxes[3, c], boxes[4, c], boxes[5, c]
        rx0 = ox[:, 0]
        ry0 = oy[:, 0]
        rz0 = oz[:, 0]
        tx1 = (lox - rx0) * ix
        tx2 = (hix - rx0) * ix
        ty1 = (loy - ry0) * iy
        ty2 = (hiy - ry0) * iy
        tz1 = (loz - rz0) * iz
        tz2 = (hiz - rz0) * iz
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx1, tx2),
                                       jnp.minimum(ty1, ty2)),
                           jnp.minimum(tz1, tz2))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx1, tx2),
                                       jnp.maximum(ty1, ty2)),
                           jnp.maximum(tz1, tz2))
        enter = ((tmin <= tmax) & (tmax >= 0.0)
                 & (tmin < jnp.minimum(carry[0], t_seed)))
        hit_any = jnp.any(enter)
        return jax.lax.cond(hit_any, lambda cc: mt_body(c, cc),
                            lambda cc: cc, carry)

    R = ox.shape[0]
    init = (jnp.full((R,), _INF, jnp.float32),
            jnp.zeros((R,), jnp.float32),
            jnp.zeros((R,), jnp.float32),
            jnp.zeros((R,), jnp.int32))
    if normals:
        init += (jnp.zeros((R,), jnp.float32),) * 3
    out = jax.lax.fori_loop(0, n_chunks, body, init)
    t_ref[0, :] = out[0]
    u_ref[0, :] = out[1]
    v_ref[0, :] = out[2]
    idx_ref[0, :] = out[3]
    if normals:
        nx_ref[0, :] = out[4]
        ny_ref[0, :] = out[5]
        nz_ref[0, :] = out[6]


def _any_kernel(chunk, *refs):
    (rox, roy, roz, rdx, rdy, rdz, dist_ref,
     p1x, p1y, p1z, e1x, e1y, e1z, e2x, e2y, e2z,
     boxes, hit_ref) = refs
    T = p1x.shape[1]
    n_chunks = T // chunk

    ox = rox[0, :][:, None]
    oy = roy[0, :][:, None]
    oz = roz[0, :][:, None]
    dx = rdx[0, :][:, None]
    dy = rdy[0, :][:, None]
    dz = rdz[0, :][:, None]
    distc = dist_ref[0, :][:, None]
    dist = distc[:, 0]

    def inv(d):
        return 1.0 / jnp.where(jnp.abs(d) < 1e-30,
                               jnp.where(d < 0, -1e-30, 1e-30), d)

    ix, iy, iz = inv(dx[:, 0]), inv(dy[:, 0]), inv(dz[:, 0])

    def mt_body(c, hit):
        s = pl.ds(c * chunk, chunk)
        te1x = e1x[0, s][None, :]
        te1y = e1y[0, s][None, :]
        te1z = e1z[0, s][None, :]
        te2x = e2x[0, s][None, :]
        te2y = e2y[0, s][None, :]
        te2z = e2z[0, s][None, :]
        tp1x = p1x[0, s][None, :]
        tp1y = p1y[0, s][None, :]
        tp1z = p1z[0, s][None, :]

        cx = dy * te2z - dz * te2y
        cy = dz * te2x - dx * te2z
        cz = dx * te2y - dy * te2x
        det = te1x * cx + te1y * cy + te1z * cz
        ok = jnp.abs(det) >= EPSILON
        f = 1.0 / jnp.where(ok, det, 1.0)
        sx = ox - tp1x
        sy = oy - tp1y
        sz = oz - tp1z
        uu = f * (sx * cx + sy * cy + sz * cz)
        ok = ok & (uu >= 0.0) & (uu <= 1.0)
        qx = sy * te1z - sz * te1y
        qy = sz * te1x - sx * te1z
        qz = sx * te1y - sy * te1x
        vv = f * (dx * qx + dy * qy + dz * qz)
        ok = ok & (vv >= 0.0) & (uu + vv <= 1.0)
        tt = f * (te2x * qx + te2y * qy + te2z * qz)
        ok = ok & (tt >= 0.0) & (tt < distc)
        return hit | jnp.any(ok, axis=1).astype(jnp.int32)

    def body(c, hit):
        lox, loy, loz = boxes[0, c], boxes[1, c], boxes[2, c]
        hix, hiy, hiz = boxes[3, c], boxes[4, c], boxes[5, c]
        rx0 = ox[:, 0]
        ry0 = oy[:, 0]
        rz0 = oz[:, 0]
        tx1 = (lox - rx0) * ix
        tx2 = (hix - rx0) * ix
        ty1 = (loy - ry0) * iy
        ty2 = (hiy - ry0) * iy
        tz1 = (loz - rz0) * iz
        tz2 = (hiz - rz0) * iz
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx1, tx2),
                                       jnp.minimum(ty1, ty2)),
                           jnp.minimum(tz1, tz2))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx1, tx2),
                                       jnp.maximum(ty1, ty2)),
                           jnp.maximum(tz1, tz2))
        enter = ((tmin <= tmax) & (tmax >= 0.0) & (tmin < dist)
                 & (hit == 0))
        return jax.lax.cond(jnp.any(enter), lambda h: mt_body(c, h),
                            lambda h: h, hit)

    R = ox.shape[0]
    hit = jax.lax.fori_loop(0, n_chunks, body, jnp.zeros((R,), jnp.int32))
    hit_ref[0, :] = hit


@functools.partial(jax.jit, static_argnames=("interpret",))
def any_triangle(ro_comps, rd_comps, tri_comps, dist, interpret: bool = False):
    """Shadow-ray occlusion: does any triangle hit with 0 <= t < dist?

    Much cheaper than `closest_triangle` — no argmin/one-hot payload
    selection (one any-reduction per chunk instead of seven cross-lane
    reductions), the distance cap tightens the chunk AABB cull, and
    already-occluded rays drop out of the cull so fully-shadowed blocks
    skip remaining chunks. Same Möller–Trumbore semantics as the closest
    kernel (triangle.rs:72-94); the reference's shadow rule hit.t <
    distance (scene.rs:234-245). Returns int32 [R] (1 = occluded).
    """
    R = ro_comps[0].shape[0]
    T = tri_comps[0].shape[0]
    chunk = chunk_size(T)
    assert R % BR == 0 and T % chunk == 0, (R, T, chunk)
    n_chunks = T // chunk

    boxes = []
    for j in range(3):
        p1 = tri_comps[j].reshape(n_chunks, chunk)
        v2 = p1 + tri_comps[3 + j].reshape(n_chunks, chunk)
        v3 = p1 + tri_comps[6 + j].reshape(n_chunks, chunk)
        lo = jnp.minimum(jnp.minimum(p1.min(1), v2.min(1)), v3.min(1))
        hi = jnp.maximum(jnp.maximum(p1.max(1), v2.max(1)), v3.max(1))
        boxes.append((lo, hi))
    aabb = [boxes[0][0], boxes[1][0], boxes[2][0],
            boxes[0][1], boxes[1][1], boxes[2][1]]

    grid = (R // BR,)
    ray_spec = pl.BlockSpec((1, BR), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((1, T), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    box_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((1, BR), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    args = [c.reshape(1, R) for c in (*ro_comps, *rd_comps)]
    args.append(dist.reshape(1, R))
    args += [c.reshape(1, T) for c in tri_comps[:9]]
    args.append(jnp.stack(aabb, axis=0))

    out = pl.pallas_call(
        functools.partial(_any_kernel, chunk),
        grid=grid,
        in_specs=[ray_spec] * 7 + [tri_spec] * 9 + [box_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((1, R), jnp.int32),
        interpret=interpret,
    )(*args)
    return out.reshape(R)


@functools.partial(jax.jit, static_argnames=("interpret",))
def closest_triangle(ro_comps, rd_comps, tri_comps, t_init=None,
                     interpret: bool = False):
    """Closest-hit over triangles.

    ro_comps/rd_comps: 3-tuples of [R] f32; tri_comps: 9-tuple of [T] f32
    (p1xyz, e1xyz, e2xyz) — or an 18-tuple with vertex-normal components
    (n1xyz, n2xyz, n3xyz) appended, in which case the winning triangle's
    interpolated world normal is returned too. R and T must be multiples
    of BR and CHUNK (pad rays arbitrarily, triangles with _FAR p1 / zero
    edges). `t_init` ([R], optional) bounds the chunk cull with an
    already-known closer hit (analytic primitives) so occluded chunks
    are skipped; hits beyond the seed may still be reported when a
    chunk was entered for another ray — merge with a strict `<` against
    the seed. Returns (t, u, v, tri_index[, nx, ny, nz]) each [R];
    misses (and rays whose chunks all culled) carry t=+inf.
    """
    R = ro_comps[0].shape[0]
    T = tri_comps[0].shape[0]
    normals = len(tri_comps) == 18
    chunk = chunk_size(T)
    assert R % BR == 0 and T % chunk == 0, (R, T, chunk)
    n_chunks = T // chunk

    # Per-chunk AABBs over the three vertices (p1, p1+e1, p1+e2).
    boxes = []
    for j in range(3):
        p1 = tri_comps[j].reshape(n_chunks, chunk)
        v2 = p1 + tri_comps[3 + j].reshape(n_chunks, chunk)
        v3 = p1 + tri_comps[6 + j].reshape(n_chunks, chunk)
        lo = jnp.minimum(jnp.minimum(p1.min(1), v2.min(1)), v3.min(1))
        hi = jnp.maximum(jnp.maximum(p1.max(1), v2.max(1)), v3.max(1))
        boxes.append((lo, hi))
    aabb = [boxes[0][0], boxes[1][0], boxes[2][0],
            boxes[0][1], boxes[1][1], boxes[2][1]]

    grid = (R // BR,)
    ray_spec = pl.BlockSpec((1, BR), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((1, T), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    box_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((1, BR), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    seeded = t_init is not None
    args = [c.reshape(1, R) for c in (*ro_comps, *rd_comps)]
    if seeded:
        args.append(t_init.reshape(1, R))
    args += [c.reshape(1, T) for c in tri_comps]
    args.append(jnp.stack(aabb, axis=0))  # [6, n_chunks] -> SMEM

    n_out = 7 if normals else 4
    out_shapes = (
        jax.ShapeDtypeStruct((1, R), jnp.float32),
        jax.ShapeDtypeStruct((1, R), jnp.float32),
        jax.ShapeDtypeStruct((1, R), jnp.float32),
        jax.ShapeDtypeStruct((1, R), jnp.int32),
    )
    if normals:
        out_shapes += (jax.ShapeDtypeStruct((1, R), jnp.float32),) * 3

    import functools as _ft
    outs = pl.pallas_call(
        _ft.partial(_kernel, chunk, normals, seeded),
        grid=grid,
        in_specs=([ray_spec] * (7 if seeded else 6)
                  + [tri_spec] * len(tri_comps) + [box_spec]),
        out_specs=(out_spec,) * n_out,
        out_shape=out_shapes,
        interpret=interpret,
    )(*args)
    return tuple(o.reshape(R) for o in outs)
