"""Pallas TPU kernel: fused Möller–Trumbore closest-hit over a mesh.

The XLA path streams [R, C] ray/triangle intermediates through HBM
between the intersection math and the min-reduction. This kernel keeps
everything in VMEM — and puts the intersection FLOPs on the MXU:

**MT as one matmul.** For a ray (o, d) and triangle (p1, e1, e2), every
quantity Möller–Trumbore needs is a scalar triple product, i.e. a
*bilinear* form in the ray and the triangle:

    det   = e1·(d×e2)   =  d·(e2×e1)
    u_num = s·(d×e2)    =  (o×d)·e2  + d·(p1×e2)        (s = o - p1)
    v_num = d·(s×e1)    = -(o×d)·e1  + d·(e1×p1)
    t_num = e2·(s×e1)   =  o·n - p1·n                   (n = e1×e2)

With the 10-feature ray vector F = [o×d, d, o, 1] (padded to 16), all
four planes for a whole ray-block × triangle-chunk are ONE systolic
matmul F[BR,16] @ B[16,4C] — the per-triangle coefficient columns B are
precomputed once per scene. The VPU then only does the cheap epilogue
(reciprocal, masks, argmin, one-hot select). Rays and triangles are
re-centered on the mesh AABB midpoint so the o·n − p1·n cancellation
stays well-conditioned in f32.

Chunk culling: triangles are Morton-ordered at scene compile
(scene/data.py), so each chunk has a tight AABB; a chunk whose slab
test (cube.rs:48-61 style) misses every ray in the block is skipped
entirely — the TPU-side equivalent of the reference's per-group AABB
gate (group.rs:80-91), but per ray-block × triangle-chunk.

Semantics: triangle.rs:72-94 (Möller–Trumbore, EPSILON determinant
cutoff) with the closest-hit filter t >= 0; ties resolve to the lowest
triangle index like the stable sort + first-hit rule (scene.rs:97-136).

Inputs are padded: rays to BR multiples, triangles to C multiples with
far-away degenerate triangles (p1 = 1e30, zero edges) so padding chunks
cull away (their B columns are zero => det 0 => masked).
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
NF = 16          # ray feature rows (10 live + 6 pad for sublane alignment)

_INF = float("inf")
_FAR = 1e30


def chunk_size(T: int) -> int:
    """Lane-aligned chunk: small meshes avoid padding to the full 512."""
    if T >= CHUNK:
        return CHUNK
    return -(-T // CHUNK_ALIGN) * CHUNK_ALIGN


def _cross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def mt_coeff_matrix(p1, e1, e2, dtype=jnp.float32):
    """[NF, 4T] Möller–Trumbore coefficient columns for re-centered tris.

    p1/e1/e2: 3-tuples of [T] components (p1 already re-centered). Column
    planes are [det | u_num | v_num | t_num], each T wide, matching the
    feature rows [o×d (3), d (3), o (3), 1, 0…]. Zero (padding) triangles
    produce zero columns => det = 0 => masked by the EPSILON cutoff.
    """
    T = p1[0].shape[0]
    z = jnp.zeros((T,), dtype)
    e2xe1 = _cross(e2, e1)
    p1xe2 = _cross(p1, e2)
    e1xp1 = _cross(e1, p1)
    n = _cross(e1, e2)
    p1n = p1[0] * n[0] + p1[1] * n[1] + p1[2] * n[2]
    one = jnp.ones((T,), dtype)

    def col(oxd, d, o, c):
        return [oxd[0], oxd[1], oxd[2], d[0], d[1], d[2],
                o[0], o[1], o[2], c] + [z] * (NF - 10)

    det_c = col((z, z, z), e2xe1, (z, z, z), z)
    u_c = col(e2, p1xe2, (z, z, z), z)
    v_c = col((-e1[0], -e1[1], -e1[2]), e1xp1, (z, z, z), z)
    t_c = col((z, z, z), (z, z, z), n, -p1n)
    planes = [jnp.stack([r.astype(dtype) for r in cols], axis=0)
              for cols in (det_c, u_c, v_c, t_c)]
    return jnp.concatenate(planes, axis=1)  # [NF, 4T]


def _kernel(chunk, normals, *refs):
    if normals:
        (rox, roy, roz, rdx, rdy, rdz, bmat,
         n1x, n1y, n1z, n2x, n2y, n2z, n3x, n3y, n3z,
         boxes, t_ref, u_ref, v_ref, idx_ref,
         nx_ref, ny_ref, nz_ref) = refs
    else:
        (rox, roy, roz, rdx, rdy, rdz, bmat,
         boxes, t_ref, u_ref, v_ref, idx_ref) = refs
    n_chunks = bmat.shape[1] // (4 * chunk)

    ox = rox[0, :]
    oy = roy[0, :]
    oz = roz[0, :]
    dx = rdx[0, :]
    dy = rdy[0, :]
    dz = rdz[0, :]

    # Ray feature matrix for the MXU contraction (built once per block).
    zeros = jnp.zeros_like(ox)
    feats = jnp.stack(
        [oy * dz - oz * dy, oz * dx - ox * dz, ox * dy - oy * dx,
         dx, dy, dz, ox, oy, oz, jnp.ones_like(ox)]
        + [zeros] * (NF - 10), axis=1)  # [BR, NF]

    # Reciprocal directions for the AABB slab test (zero-safe).
    def inv(d):
        return 1.0 / jnp.where(jnp.abs(d) < 1e-30,
                               jnp.where(d < 0, -1e-30, 1e-30), d)

    ix, iy, iz = inv(dx), inv(dy), inv(dz)

    def mt_body(c, carry):
        bt, bu, bv, bi = carry[:4]
        planes = jax.lax.dot_general(
            feats, bmat[:, pl.ds(c * (4 * chunk), 4 * chunk)],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [BR, 4*chunk]
        det = planes[:, 0:chunk]
        un = planes[:, chunk:2 * chunk]
        vn = planes[:, 2 * chunk:3 * chunk]
        tn = planes[:, 3 * chunk:4 * chunk]

        ok = jnp.abs(det) >= EPSILON
        f = 1.0 / jnp.where(ok, det, 1.0)
        uu = un * f
        vv = vn * f
        tt = tn * f
        ok = (ok & (uu >= 0.0) & (uu <= 1.0)
              & (vv >= 0.0) & (uu + vv <= 1.0) & (tt >= 0.0))
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
            s = pl.ds(c * chunk, chunk)
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
        tx1 = (lox - ox) * ix
        tx2 = (hix - ox) * ix
        ty1 = (loy - oy) * iy
        ty2 = (hiy - oy) * iy
        tz1 = (loz - oz) * iz
        tz2 = (hiz - oz) * iz
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx1, tx2),
                                       jnp.minimum(ty1, ty2)),
                           jnp.minimum(tz1, tz2))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx1, tx2),
                                       jnp.maximum(ty1, ty2)),
                           jnp.maximum(tz1, tz2))
        enter = (tmin <= tmax) & (tmax >= 0.0) & (tmin < carry[0])
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


@functools.partial(jax.jit, static_argnames=("interpret",))
def closest_triangle(ro_comps, rd_comps, tri_comps, interpret: bool = False):
    """Closest-hit over triangles.

    ro_comps/rd_comps: 3-tuples of [R] f32; tri_comps: 9-tuple of [T] f32
    (p1xyz, e1xyz, e2xyz) — or an 18-tuple with vertex-normal components
    (n1xyz, n2xyz, n3xyz) appended, in which case the winning triangle's
    interpolated world normal is returned too. R and T must be multiples
    of BR and CHUNK (pad rays arbitrarily, triangles with _FAR p1 / zero
    edges). Returns (t, u, v, tri_index[, nx, ny, nz]) each [R]; misses
    carry t=+inf.
    """
    R = ro_comps[0].shape[0]
    T = tri_comps[0].shape[0]
    normals = len(tri_comps) == 18
    chunk = chunk_size(T)
    assert R % BR == 0 and T % chunk == 0, (R, T, chunk)
    n_chunks = T // chunk

    # Re-center rays and triangles on the (live-triangle) AABB midpoint:
    # keeps the matmul's o·n − p1·n cancellation conditioned in f32.
    live = tri_comps[0] < _FAR / 2
    ctr = []
    for j in range(3):
        p1 = jnp.where(live, tri_comps[j], 0.0)
        v2 = p1 + jnp.where(live, tri_comps[3 + j], 0.0)
        v3 = p1 + jnp.where(live, tri_comps[6 + j], 0.0)
        lo = jnp.minimum(jnp.minimum(p1.min(), v2.min()), v3.min())
        hi = jnp.maximum(jnp.maximum(p1.max(), v2.max()), v3.max())
        ctr.append(0.5 * (lo + hi))

    p1c = tuple(jnp.where(live, tri_comps[j] - ctr[j], _FAR)
                for j in range(3))
    e1c = tuple(jnp.where(live, tri_comps[3 + j], 0.0) for j in range(3))
    e2c = tuple(jnp.where(live, tri_comps[6 + j], 0.0) for j in range(3))
    roc = tuple(ro_comps[j] - ctr[j] for j in range(3))

    # MT coefficient columns, re-grouped so chunk c's four planes are the
    # contiguous lane range [c*4*chunk, (c+1)*4*chunk).
    bzero = tuple(jnp.where(live, p1c[j], 0.0) for j in range(3))
    bmat = mt_coeff_matrix(bzero, e1c, e2c)  # [NF, 4T]
    if n_chunks > 1:
        bmat = (bmat.reshape(NF, 4, n_chunks, chunk).transpose(0, 2, 1, 3)
                .reshape(NF, 4 * T))

    # Per-chunk AABBs over the three vertices (p1, p1+e1, p1+e2), in the
    # re-centered frame (padding tris sit at _FAR: their chunks never
    # pass the slab test against re-centered rays).
    livec = live.reshape(n_chunks, chunk)
    los, his = [], []
    for j in range(3):
        p1 = p1c[j].reshape(n_chunks, chunk)
        v2 = p1 + e1c[j].reshape(n_chunks, chunk)
        v3 = p1 + e2c[j].reshape(n_chunks, chunk)
        mn = jnp.where(livec, jnp.minimum(jnp.minimum(p1, v2), v3), _INF)
        mx = jnp.where(livec, jnp.maximum(jnp.maximum(p1, v2), v3), -_INF)
        los.append(mn.min(1))
        his.append(mx.max(1))
    aabb = los + his

    grid = (R // BR,)
    ray_spec = pl.BlockSpec((1, BR), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    bmat_spec = pl.BlockSpec((NF, 4 * T), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((1, T), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    box_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((1, BR), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    args = [c.reshape(1, R) for c in (*roc, *rd_comps)]
    args.append(bmat)
    if normals:
        args += [c.reshape(1, T) for c in tri_comps[9:18]]
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

    in_specs = ([ray_spec] * 6 + [bmat_spec]
                + ([tri_spec] * 9 if normals else []) + [box_spec])
    outs = pl.pallas_call(
        functools.partial(_kernel, chunk, normals),
        grid=grid,
        in_specs=in_specs,
        out_specs=(out_spec,) * n_out,
        out_shape=out_shapes,
        interpret=interpret,
    )(*args)
    return tuple(o.reshape(R) for o in outs)
