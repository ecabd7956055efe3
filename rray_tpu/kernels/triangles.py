"""Pallas TPU kernel: fused Möller–Trumbore closest-hit over a mesh.

The XLA path streams [R, C] ray/triangle intermediates through HBM
between the intersection math and the min-reduction. This kernel keeps
everything in VMEM: the grid tiles the ray axis; each program holds the
full triangle table (packed [T, 9|18], a few hundred KB for typical
meshes) in VMEM and loops over sublane-aligned chunks, folding the
running per-ray minimum into the output refs.

Layout (the part that matters on TPU): the [chunk, BR] intersection
intermediates keep **rays in lanes and triangles in sublanes**. Ray
components broadcast from native [1, BR] rows (free), triangle
components broadcast from native [chunk, 1] columns of the packed
table (free), and the closest-hit reductions run along the *sublane*
axis. The transposed orientation — rays in sublanes via `x[:, None]`
columns — forces Mosaic lane→sublane relayouts of every ray component
and 7 cross-lane reductions per chunk; measured 3.1× slower on the
all-hit case and 18× slower on the all-cull case at 480k rays.

Chunk culling: triangles are Morton-ordered at scene compile
(scene/data.py), so each chunk has a tight AABB; a chunk whose slab
test (cube.rs:48-61 style) misses every ray in the block is skipped
entirely under `pl.when` — the TPU-side equivalent of the reference's
per-group AABB gate (group.rs:80-91), but per ray-block × triangle-
chunk. (`jax.lax.cond` is NOT equivalent here: with vector-valued
carries Mosaic flattens it to both-branches + select, so the skipped
chunk's intersection math still executes — measured as the entire cull
path's cost.)

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

BR = 512         # rays per program
CHUNK = 256      # max triangles per inner step (sublane axis)
CHUNK_ALIGN = 8  # sublane alignment for small meshes

_INF = float("inf")
_FAR = 1e30


def chunk_size(T: int) -> int:
    """Sublane-aligned chunk size for a T-triangle mesh.

    Production meshes here are < bvh_min_tris (larger ones take the BVH
    kernel), where a ~40-64-triangle chunk measured ~25% faster than
    one 256-wide chunk on the teapot frame: finer chunks cull tighter
    (blocks that graze the mesh AABB skip most of its triangles), and a
    pad-free divisor avoids wasted Möller–Trumbore rows. T >= 1024
    keeps the coarse chunk (that path only runs in tests/interpret)."""
    if T >= 1024:
        return CHUNK
    if T <= 64:
        return -(-T // CHUNK_ALIGN) * CHUNK_ALIGN
    return min((64, 56, 48, 40), key=lambda c: ((-T) % c, -c))


def _chunk_boxes(tri_comps, chunk):
    """Per-chunk AABBs over the three vertices -> [6, n_chunks] for SMEM."""
    T = tri_comps[0].shape[0]
    n_chunks = T // chunk
    boxes = []
    for j in range(3):
        p1 = tri_comps[j].reshape(n_chunks, chunk)
        v2 = p1 + tri_comps[3 + j].reshape(n_chunks, chunk)
        v3 = p1 + tri_comps[6 + j].reshape(n_chunks, chunk)
        lo = jnp.minimum(jnp.minimum(p1.min(1), v2.min(1)), v3.min(1))
        hi = jnp.maximum(jnp.maximum(p1.max(1), v2.max(1)), v3.max(1))
        boxes.append((lo, hi))
    return jnp.stack([boxes[0][0], boxes[1][0], boxes[2][0],
                      boxes[0][1], boxes[1][1], boxes[2][1]], axis=0)


def _ray_slab(rox, roy, roz, ix, iy, iz, lox, loy, loz, hix, hiy, hiz):
    """AABB slab test on [BR] lane vectors -> (tmin, tmax)."""
    tx1 = (lox - rox) * ix
    tx2 = (hix - rox) * ix
    ty1 = (loy - roy) * iy
    ty2 = (hiy - roy) * iy
    tz1 = (loz - roz) * iz
    tz2 = (hiz - roz) * iz
    tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx1, tx2),
                                   jnp.minimum(ty1, ty2)),
                       jnp.minimum(tz1, tz2))
    tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx1, tx2),
                                   jnp.maximum(ty1, ty2)),
                       jnp.maximum(tz1, tz2))
    return tmin, tmax


def _inv_dir(d):
    """Zero-safe reciprocal of a direction component ([BR] lanes)."""
    return 1.0 / jnp.where(jnp.abs(d) < 1e-30,
                           jnp.where(d < 0, -1e-30, 1e-30), d)


def _mt_rows(trisT, s, ox, oy, oz, dx, dy, dz):
    """Möller–Trumbore on a [chunk, BR] tile (tris in sublanes).

    Returns (tt with misses at +inf, uu, vv) each [chunk, BR]."""
    col = lambda k: trisT[s, k][:, None]          # [chunk, 1] native
    tp1x, tp1y, tp1z = col(0), col(1), col(2)
    te1x, te1y, te1z = col(3), col(4), col(5)
    te2x, te2y, te2z = col(6), col(7), col(8)

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
    return jnp.where(ok, tt, _INF), uu, vv


def _kernel(chunk, normals, seeded, n_aux, *refs):
    refs = list(refs)
    rox, roy, roz, rdx, rdy, rdz = refs[:6]
    del refs[:6]
    t0_ref = refs.pop(0) if seeded else None
    trisT, boxes, t_ref, u_ref, v_ref, idx_ref = refs[:6]
    del refs[:6]
    if normals:
        nx_ref, ny_ref, nz_ref = refs[:3]
        del refs[:3]
    aux_refs = refs
    aux_base = 18 if normals else 9  # aux columns follow the geometry
    T = trisT.shape[0]
    n_chunks = T // chunk
    BRl = rox.shape[1]

    # Rays stay in lanes: [1, BR] rows broadcast along sublanes for free.
    ox = rox[0, :][None, :]
    oy = roy[0, :][None, :]
    oz = roz[0, :][None, :]
    dx = rdx[0, :][None, :]
    dy = rdy[0, :][None, :]
    dz = rdz[0, :][None, :]
    ix, iy, iz = _inv_dir(rdx[0, :]), _inv_dir(rdy[0, :]), _inv_dir(rdz[0, :])
    # Seed bound for the chunk cull: an analytic hit already known to be
    # closer lets whole chunks drop. Only the cull consults it; hits
    # beyond the seed may still be reported and the caller's strict `<`
    # merge discards them.
    t_seed = t0_ref[0, :] if seeded else _INF

    t_ref[0, :] = jnp.full((BRl,), _INF, jnp.float32)
    u_ref[0, :] = jnp.zeros((BRl,), jnp.float32)
    v_ref[0, :] = jnp.zeros((BRl,), jnp.float32)
    idx_ref[0, :] = jnp.zeros((BRl,), jnp.int32)
    if normals:
        nx_ref[0, :] = jnp.zeros((BRl,), jnp.float32)
        ny_ref[0, :] = jnp.zeros((BRl,), jnp.float32)
        nz_ref[0, :] = jnp.zeros((BRl,), jnp.float32)
    for ar in aux_refs:
        ar[0, :] = jnp.zeros((BRl,), jnp.float32)

    def body(c, carry):
        # Block-level cull: does any ray in this block enter chunk c's box
        # before the block's current best (or seeded) t? Chunk boxes live
        # in SMEM: dynamic scalar reads are legal there.
        tmin, tmax = _ray_slab(
            rox[0, :], roy[0, :], roz[0, :], ix, iy, iz,
            boxes[0, c], boxes[1, c], boxes[2, c],
            boxes[3, c], boxes[4, c], boxes[5, c])
        enter = ((tmin <= tmax) & (tmax >= 0.0)
                 & (tmin < jnp.minimum(t_ref[0, :], t_seed)))

        @pl.when(jnp.any(enter))
        def _():
            s = pl.ds(c * chunk, chunk)
            tt, uu, vv = _mt_rows(trisT, s, ox, oy, oz, dx, dy, dz)
            ct = jnp.min(tt, axis=0)                       # [BR]
            row = jax.lax.broadcasted_iota(jnp.int32, tt.shape, 0)
            # Lowest-index tie-break (== argmin) via a second masked min:
            # Mosaic sublane reductions are cheap; argmin would be too,
            # but min-of-masked-iota composes with the one-hot below.
            local = jnp.min(jnp.where(tt == ct[None, :], row, T), axis=0)
            onehot = row == local[None, :]
            take = lambda a: jnp.sum(jnp.where(onehot, a, 0.0), axis=0)
            bt = t_ref[0, :]
            better = ct < bt
            t_ref[0, :] = jnp.where(better, ct, bt)
            u_ref[0, :] = jnp.where(better, take(uu), u_ref[0, :])
            v_ref[0, :] = jnp.where(better, take(vv), v_ref[0, :])
            idx_ref[0, :] = jnp.where(better, c * chunk + local, idx_ref[0, :])
            if normals:
                # Interpolate the winning triangle's (already world-space,
                # nmat-transformed) vertex normals in-kernel: replaces 13
                # per-ray table gathers (~1 elem/cycle on TPU) downstream.
                # Flat triangles store n1=n2=n3=nflat, so one formula
                # serves both (smooth_triangle.rs:99-101).
                wu = jnp.where(onehot, uu, 0.0)
                wv = jnp.where(onehot, vv, 0.0)
                w1 = jnp.where(onehot, 1.0 - uu - vv, 0.0)
                ncol = lambda k: trisT[s, k][:, None]
                nsel = lambda k: jnp.sum(
                    w1 * ncol(9 + k) + wu * ncol(12 + k) + wv * ncol(15 + k),
                    axis=0)
                nx_ref[0, :] = jnp.where(better, nsel(0), nx_ref[0, :])
                ny_ref[0, :] = jnp.where(better, nsel(1), ny_ref[0, :])
                nz_ref[0, :] = jnp.where(better, nsel(2), nz_ref[0, :])
            for k, ar in enumerate(aux_refs):
                # Per-triangle payload column (e.g. shade class, prim id
                # as f32): one sublane select-sum here replaces a ~1
                # elem/cycle XLA gather downstream (measured ~2 ms per
                # gather at 480k rays).
                ar[0, :] = jnp.where(
                    better, take(trisT[s, aux_base + k][:, None]), ar[0, :])
        return carry

    jax.lax.fori_loop(0, n_chunks, body, 0)


def _any_kernel(chunk, *refs):
    (rox, roy, roz, rdx, rdy, rdz, dist_ref, trisT, boxes, hit_ref) = refs
    T = trisT.shape[0]
    n_chunks = T // chunk
    BRl = rox.shape[1]

    ox = rox[0, :][None, :]
    oy = roy[0, :][None, :]
    oz = roz[0, :][None, :]
    dx = rdx[0, :][None, :]
    dy = rdy[0, :][None, :]
    dz = rdz[0, :][None, :]
    ix, iy, iz = _inv_dir(rdx[0, :]), _inv_dir(rdy[0, :]), _inv_dir(rdz[0, :])
    dist = dist_ref[0, :]

    hit_ref[0, :] = jnp.zeros((BRl,), jnp.int32)

    def body(c, carry):
        tmin, tmax = _ray_slab(
            rox[0, :], roy[0, :], roz[0, :], ix, iy, iz,
            boxes[0, c], boxes[1, c], boxes[2, c],
            boxes[3, c], boxes[4, c], boxes[5, c])
        # Already-occluded rays drop out so fully-shadowed blocks skip
        # remaining chunks; the distance cap tightens the cull.
        enter = ((tmin <= tmax) & (tmax >= 0.0) & (tmin < dist)
                 & (hit_ref[0, :] == 0))

        @pl.when(jnp.any(enter))
        def _():
            s = pl.ds(c * chunk, chunk)
            tt, _, _ = _mt_rows(trisT, s, ox, oy, oz, dx, dy, dz)
            occ = jnp.any(tt < dist[None, :], axis=0)
            hit_ref[0, :] = hit_ref[0, :] | occ.astype(jnp.int32)
        return carry

    jax.lax.fori_loop(0, n_chunks, body, 0)


def _pack_tris(tri_comps):
    """SoA component tuple -> [T, 9|18] table (tris in sublanes).

    One 128-lane tile regardless of width, so triangle columns read as
    native [chunk, 1] and broadcast along lanes for free. VMEM cost is
    T x 512 B (the lane tile pads to 128), which bounds VMEM-resident
    meshes at a few thousand triangles — larger meshes take the BVH
    kernel (kernels/bvh.py), whose leaves stream from HBM."""
    return jnp.stack(tri_comps, axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def any_triangle(ro_comps, rd_comps, tri_comps, dist, interpret: bool = False):
    """Shadow-ray occlusion: does any triangle hit with 0 <= t < dist?

    Much cheaper than `closest_triangle` — no payload selection (one
    any-reduction per chunk), the distance cap tightens the chunk AABB
    cull, and already-occluded rays drop out of the cull so fully-
    shadowed blocks skip remaining chunks. Same Möller–Trumbore
    semantics as the closest kernel (triangle.rs:72-94); the reference's
    shadow rule hit.t < distance (scene.rs:234-245). Returns int32 [R]
    (1 = occluded).
    """
    R = ro_comps[0].shape[0]
    T = tri_comps[0].shape[0]
    chunk = chunk_size(T)
    assert R % BR == 0 and T % chunk == 0, (R, T, chunk)

    grid = (R // BR,)
    ray_spec = pl.BlockSpec((1, BR), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((T, 9), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    box_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((1, BR), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    args = [c.reshape(1, R) for c in (*ro_comps, *rd_comps)]
    args.append(dist.reshape(1, R))
    args.append(_pack_tris(tri_comps[:9]))
    args.append(_chunk_boxes(tri_comps, chunk))

    out = pl.pallas_call(
        functools.partial(_any_kernel, chunk),
        grid=grid,
        in_specs=[ray_spec] * 7 + [tri_spec, box_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((1, R), jnp.int32),
        interpret=interpret,
    )(*args)
    return out.reshape(R)


@functools.partial(jax.jit, static_argnames=("interpret",))
def closest_triangle(ro_comps, rd_comps, tri_comps, t_init=None, aux=None,
                     interpret: bool = False):
    """Closest-hit over triangles.

    ro_comps/rd_comps: 3-tuples of [R] f32; tri_comps: 9-tuple of [T] f32
    (p1xyz, e1xyz, e2xyz) — or an 18-tuple with vertex-normal components
    (n1xyz, n2xyz, n3xyz) appended, in which case the winning triangle's
    interpolated world normal is returned too. R and T must be multiples
    of BR and chunk_size(T) (pad rays arbitrarily, triangles with _FAR
    p1 / zero edges). `t_init` ([R], optional) bounds the chunk cull
    with an already-known closer hit (analytic primitives) so occluded
    chunks are skipped; hits beyond the seed may still be reported when
    a chunk was entered for another ray — merge with a strict `<`
    against the seed. `aux` (optional tuple of [T] f32 columns, e.g.
    shade class / prim id) selects each column for the winning triangle
    in-kernel — replacing XLA gathers, which run at ~1 element/cycle.
    Returns (t, u, v, tri_index[, nx, ny, nz][, *aux]) each [R]; misses
    (and rays whose chunks all culled) carry t=+inf and zero payloads.
    """
    R = ro_comps[0].shape[0]
    T = tri_comps[0].shape[0]
    normals = len(tri_comps) == 18
    aux = tuple(aux) if aux else ()
    chunk = chunk_size(T)
    assert R % BR == 0 and T % chunk == 0, (R, T, chunk)

    grid = (R // BR,)
    ray_spec = pl.BlockSpec((1, BR), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((T, len(tri_comps) + len(aux)),
                            lambda i: (0, 0), memory_space=pltpu.VMEM)
    box_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((1, BR), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    seeded = t_init is not None
    args = [c.reshape(1, R) for c in (*ro_comps, *rd_comps)]
    if seeded:
        args.append(t_init.reshape(1, R))
    args.append(_pack_tris(tri_comps + aux))
    args.append(_chunk_boxes(tri_comps, chunk))

    n_out = (7 if normals else 4) + len(aux)
    out_shapes = (
        jax.ShapeDtypeStruct((1, R), jnp.float32),
        jax.ShapeDtypeStruct((1, R), jnp.float32),
        jax.ShapeDtypeStruct((1, R), jnp.float32),
        jax.ShapeDtypeStruct((1, R), jnp.int32),
    )
    if normals:
        out_shapes += (jax.ShapeDtypeStruct((1, R), jnp.float32),) * 3
    out_shapes += (jax.ShapeDtypeStruct((1, R), jnp.float32),) * len(aux)

    outs = pl.pallas_call(
        functools.partial(_kernel, chunk, normals, seeded, len(aux)),
        grid=grid,
        in_specs=([ray_spec] * (7 if seeded else 6) + [tri_spec, box_spec]),
        out_specs=(out_spec,) * n_out,
        out_shape=out_shapes,
        interpret=interpret,
    )(*args)
    return tuple(o.reshape(R) for o in outs)
