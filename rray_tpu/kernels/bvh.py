"""Pallas TPU kernel: BVH-guided Möller–Trumbore over large meshes.

Replaces the reference's linear group scan (group.rs:80-91) — and this
repo's earlier linear chunk loop — with a real bounding-volume
hierarchy:

* **Host build** (in-graph, O(T)): triangles are already Morton-ordered
  along their world centroids (scene/data.py), so contiguous runs of
  `chunk` triangles are spatially tight leaves. The tree is the implicit
  complete binary heap over the power-of-two-padded leaf list (an LBVH
  over the Morton order): node i's children are 2i/2i+1, leaves are
  nodes [Lp, 2Lp), and AABBs are unioned bottom-up. Padded leaves carry
  inverted boxes that never pass a slab test.
* **Kernel traversal** (block-synchronous): each program owns a block of
  BR rays and walks the heap with an SMEM stack. A node is entered iff
  ANY ray in the block passes its slab test with entry closer than the
  ray's current best t — rays in a block are spatially coherent (tiled
  pixels), so dead subtrees drop for the whole block at once. Leaf
  triangle data lives in **HBM** (memory_space ANY) and is DMA'd into a
  VMEM scratch buffer per visited leaf, so triangle storage is bounded
  by HBM, not VMEM (the previous kernel held the whole mesh in VMEM).
  Node AABBs sit in SMEM for dynamic scalar reads, which bounds the
  tree at MAX_LEAVES leaves; meshes past ~512k triangles auto-raise the
  leaf size instead of cliffing (`auto_leaf`), so mesh capacity is
  bounded only by the VMEM leaf scratch (~16M triangles).

Layout and control flow follow kernels/triangles.py: the [leaf, BR]
intersection tiles keep rays in lanes and triangles in sublanes (the
triangle table is packed [Tp, 16|24], so leaf columns read natively and
the hit reductions run along the cheap sublane axis), the best-hit
state lives in the output refs, and the leaf body runs under `pl.when`
— `jax.lax.cond` with vector carries is flattened by Mosaic to
both-branches + select, which would execute a full leaf intersection
at every *inner* node visit as well.

Intersection semantics match triangle.rs:72-94 (Möller–Trumbore,
EPSILON determinant cutoff, t >= 0 closest hit); ties resolve to the
lowest triangle index like the stable sort + first-hit rule
(scene.rs:97-136) because leaves are visited in index order and a
strict `<` keeps the earlier winner.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import EPSILON
from .triangles import _inv_dir, _ray_slab

BR = 512          # rays per block (lane width x 4)
# 512-ray blocks per program. 1 is the measured optimum: an (8, BR)
# program was tried in round 5 — full-vreg slab tests and 8x fewer
# serial steps — but each entered leaf must fold per ray ROW, and the
# 8-block UNION of entered leaves multiplied fold work ~8x (6.3x slower
# on config4b). Fold compute, not the stack walk, bounds this kernel.
SUBB = 1
LEAF = 256        # triangles per leaf (sublane-aligned)
STACK = 64        # traversal stack bound (>= tree depth + 1)
MAX_LEAVES = 2048  # SMEM node-box budget: [6, 2*Lp] f32 = 96 KB at 2048


def auto_leaf(T: int, leaf: int = LEAF, max_leaves: int = MAX_LEAVES) -> int:
    """Smallest sublane-aligned leaf size >= `leaf` whose tree fits the
    SMEM node-box budget (`max_leaves` padded leaves).

    The reference's linear group scan has no size cliff
    (load_obj.rs:124-139); neither should the BVH — a 600k-triangle mesh
    auto-raises leaf 256 -> 296 instead of tripping an assert deep
    inside render. Larger leaves trade slab-test granularity for tree
    height; traversal stays correct at any leaf size (the A/B tests pin
    this at a forced-small `max_leaves`).

    build_tree pads the leaf count to the next power of two, so the
    budget is really the largest power of two <= max_leaves — sizing
    against max_leaves itself would let e.g. T=1536, max_leaves=3 pad
    to Lp=4 and trip the `Lp <= max_leaves` assert."""
    cap = 1
    while cap * 2 <= max_leaves:
        cap *= 2
    need = -(-T // cap)                 # ceil: tris one leaf must absorb
    raised = -(-need // 8) * 8          # sublane-align the VMEM scratch
    return max(leaf, raised)

_INF = float("inf")
_FAR = 1e30


def tree_sizes(T: int, leaf: int = LEAF):
    """(n_leaves padded to pow2, padded triangle count) for a T-tri mesh."""
    L = -(-T // leaf)
    Lp = 1
    while Lp < L:
        Lp *= 2
    return Lp, Lp * leaf


def build_tree(p1, e1, e2, normals=None, aux=(), leaf: int = LEAF,
               subl: int = None):
    """Implicit-heap BVH over Morton-ordered triangles (in-graph, jnp).

    p1/e1/e2: 3-tuples of [T] component arrays (SoA); `normals` an
    optional 9-tuple (n1xyz, n2xyz, n3xyz) packed alongside so traversal
    can interpolate the winning normal in-kernel; `aux` optional extra
    [T] f32 payload columns (shade class, prim id) appended after them.
    Returns (packed [Tp, 128] f32 triangle table — triangles in
    sublanes, components in lanes — 6 node-box arrays each [2*Lp],
    sub-leaf boxes [6, Lp*(leaf//subl)], Lp). Node 0 is unused; real
    leaves have tight boxes, padding leaves inverted (+inf/-inf) boxes.
    The sub-leaf boxes let the kernel pl.when-skip each `subl`-triangle
    fold slice — one more cull level WITHOUT extra stack steps.
    """
    T = p1[0].shape[0]
    Lp, Tp = tree_sizes(T, leaf)
    pad = Tp - T

    comps = []
    for j in range(3):
        comps.append(jnp.concatenate(
            [p1[j].astype(jnp.float32), jnp.full((pad,), _FAR, jnp.float32)]))
    for src in (e1, e2) + ((tuple(normals[i:i + 3] for i in (0, 3, 6)))
                           if normals else ()):
        for j in range(3):
            comps.append(jnp.concatenate(
                [src[j].astype(jnp.float32), jnp.zeros((Tp - T,),
                                                       jnp.float32)]))
    for a in aux:
        comps.append(jnp.concatenate(
            [a.astype(jnp.float32), jnp.zeros((Tp - T,), jnp.float32)]))
    # Pad the component count (lane axis) to the 128-lane tile: Mosaic
    # requires DMA slice widths 128-aligned, and HBM stores the table
    # lane-padded to 128 regardless, so this costs nothing extra
    # (512 B/triangle total).
    ncomp = 128

    # Leaf AABBs over the three vertices; padding tris sit at _FAR with
    # zero extent, so padded leaves (and mixed tails) stay finite but
    # far away — fully-padded leaves get inverted boxes below. Sub-leaf
    # boxes at `subl` granularity ride along for the in-fold cull.
    subl = subl or leaf
    n_sub = Tp // subl
    lo, hi, slo, shi = [], [], [], []
    live = (jnp.arange(Tp) < T).reshape(Lp, leaf)
    any_live = live.any(axis=1)
    live_s = (jnp.arange(Tp) < T).reshape(n_sub, subl)
    any_live_s = live_s.any(axis=1)
    for j in range(3):
        v1 = comps[j].reshape(Lp, leaf)
        v2 = v1 + comps[3 + j].reshape(Lp, leaf)
        v3 = v1 + comps[6 + j].reshape(Lp, leaf)
        mn = jnp.where(live, jnp.minimum(jnp.minimum(v1, v2), v3), _INF)
        mx = jnp.where(live, jnp.maximum(jnp.maximum(v1, v2), v3), -_INF)
        lo.append(jnp.where(any_live, mn.min(axis=1), _INF))
        hi.append(jnp.where(any_live, mx.max(axis=1), -_INF))
        mn_s = mn.reshape(n_sub, subl)
        mx_s = mx.reshape(n_sub, subl)
        slo.append(jnp.where(any_live_s, mn_s.min(axis=1), _INF))
        shi.append(jnp.where(any_live_s, mx_s.max(axis=1), -_INF))

    packed = jnp.zeros((Tp, ncomp), jnp.float32)
    packed = packed.at[:, :len(comps)].set(jnp.stack(comps, axis=1))

    # Bottom-up union into the heap: levels are static (Lp is static).
    nodes_lo = [None] * 3
    nodes_hi = [None] * 3
    for j in range(3):
        levels_lo = [lo[j]]
        levels_hi = [hi[j]]
        while levels_lo[0].shape[0] > 1:
            cur_lo, cur_hi = levels_lo[0], levels_hi[0]
            levels_lo.insert(0, jnp.minimum(cur_lo[0::2], cur_lo[1::2]))
            levels_hi.insert(0, jnp.maximum(cur_hi[0::2], cur_hi[1::2]))
        # Heap layout: [unused root-0 slot, level0 (root=node 1), ...].
        nodes_lo[j] = jnp.concatenate(
            [jnp.full((1,), _INF, jnp.float32)] + levels_lo)
        nodes_hi[j] = jnp.concatenate(
            [jnp.full((1,), -_INF, jnp.float32)] + levels_hi)
    sboxes = jnp.stack(slo + shi, axis=0)  # [6, n_sub]
    return packed, nodes_lo, nodes_hi, sboxes, Lp


def _traverse_kernel(Lp, leaf, any_hit, normals, n_aux,
                     rox, roy, roz, rdx, rdy, rdz, dist,
                     boxes, sboxes, tri_hbm, *refs):
    """Block-synchronous heap walk over SUBB x BR = 4096 rays per
    program. The round-4 kernel traversed per 512-ray block: its slab
    tests ran as [1, BR] rows (7/8 of every vreg idle — the same
    disease CLAUDE.md documents for the first whitted kernel) and the
    grid serialized 8x more while-loop steps per frame; per-block
    timing showed the serial step machinery, not leaf DMA or fold
    compute, bounding the config4b frame. 4096 swizzled rays = 8
    adjacent 16x32 pixel tiles, so the shared stack stays coherent."""
    refs = list(refs)
    t_ref, u_ref, v_ref, idx_ref = refs[:4]
    del refs[:4]
    if normals:
        nx_ref, ny_ref, nz_ref = refs[:3]
        del refs[:3]
    aux_refs = refs[:n_aux]
    buf0, buf1, sem0, sem1, stack = refs[n_aux:]
    aux_base = 18 if normals else 9
    S = rox.shape[0]
    ox = rox[...]
    oy = roy[...]
    oz = roz[...]
    ix, iy, iz = _inv_dir(rdx[...]), _inv_dir(rdy[...]), _inv_dir(rdz[...])
    limit = dist[...]  # any-hit range (closest-hit passes +inf)
    # Per-row [1, BR] views for the triangles-in-sublanes leaf fold.
    oxr = [rox[r, :][None, :] for r in range(S)]
    oyr = [roy[r, :][None, :] for r in range(S)]
    ozr = [roz[r, :][None, :] for r in range(S)]
    dxr = [rdx[r, :][None, :] for r in range(S)]
    dyr = [rdy[r, :][None, :] for r in range(S)]
    dzr = [rdz[r, :][None, :] for r in range(S)]

    zero = jnp.zeros_like(ox)
    t_ref[...] = zero + _INF
    u_ref[...] = zero
    v_ref[...] = zero
    idx_ref[...] = jnp.zeros_like(ox, jnp.int32)
    if normals:
        nx_ref[...] = zero
        ny_ref[...] = zero
        nz_ref[...] = zero
    for ar in aux_refs:
        ar[...] = zero

    def leaf_dma(ci, buf, sem):
        """The async copy descriptor for leaf ci -> VMEM buffer `buf`
        (recreated identically at start and wait time)."""
        return pltpu.make_async_copy(
            tri_hbm.at[pl.ds(ci * leaf, leaf), :], buf, sem)

    # Sub-leaf fold granularity: the ~14 live [SUBL, BR] Möller–Trumbore
    # temporaries spill to scoped VMEM (16 MB budget) — a whole
    # [256, 512] slice put ~14 x 0.5 MB on the kernel stack and OOM'd.
    SUBL = min(leaf, 64)

    def mt_leaf(ci, tri_vmem):
        """Fold leaf ci's closest hits from its already-copied VMEM
        buffer (the DMA was started when the leaf was ENTERED and is
        waited by the caller — each leaf's copy overlaps the previous
        leaf's fold). One [SUBL, BR] intersection tile per ray ROW per
        sub-slice: triangles in sublanes, rays in lanes (ONE DMA now
        serves all SUBB rows). Sub-slices fold in index order with an
        explicit lowest-index tie-break, so results are identical to a
        whole-leaf argmin. Each sub-slice is additionally gated on its
        OWN AABB (`sboxes`, SMEM) — one more cull level that costs a
        ~25-op slab test instead of stack steps (the fold, not the
        walk, bounds this kernel)."""
        for base in range(0, leaf, SUBL):
            sidx = ci * (leaf // SUBL) + base // SUBL
            smin, smax = _ray_slab(
                ox, oy, oz, ix, iy, iz,
                sboxes[0, sidx], sboxes[1, sidx], sboxes[2, sidx],
                sboxes[3, sidx], sboxes[4, sidx], sboxes[5, sidx])
            s_enter = (smin <= smax) & (smax >= 0.0) & (
                smin < jnp.minimum(t_ref[...], limit))

            @pl.when(jnp.any(s_enter))
            def _(base=base):
                _mt_slice(tri_vmem, ci, base)

    def _mt_slice(tri_vmem, ci, base):
        for r in range(S):
            col = lambda k: tri_vmem[base:base + SUBL, k][:, None]
            tp1x, tp1y, tp1z = col(0), col(1), col(2)
            te1x, te1y, te1z = col(3), col(4), col(5)
            te2x, te2y, te2z = col(6), col(7), col(8)
            dx, dy, dz = dxr[r], dyr[r], dzr[r]
            cx = dy * te2z - dz * te2y
            cy = dz * te2x - dx * te2z
            cz = dx * te2y - dy * te2x
            det = te1x * cx + te1y * cy + te1z * cz
            ok = jnp.abs(det) >= EPSILON
            f = 1.0 / jnp.where(ok, det, 1.0)
            sx = oxr[r] - tp1x
            sy = oyr[r] - tp1y
            sz = ozr[r] - tp1z
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
            row_sl = slice(r, r + 1)

            if any_hit:
                # Occlusion only: no payload selection. A hit inside
                # the range pins best-t to 0 so the traversal's
                # early-exit and the caller's `t < dist` test see it.
                row_hit = jnp.any(tt < limit[row_sl, :], axis=0,
                                  keepdims=True)
                t_ref[row_sl, :] = jnp.where(row_hit, 0.0,
                                             t_ref[row_sl, :])
                continue

            ct = jnp.min(tt, axis=0, keepdims=True)   # [1, BR]
            row = jax.lax.broadcasted_iota(jnp.int32, tt.shape, 0)
            local = jnp.min(jnp.where(tt == ct, row, SUBL), axis=0,
                            keepdims=True)
            onehot = row == local
            take = lambda a: jnp.sum(jnp.where(onehot, a, 0.0), axis=0,
                                     keepdims=True)
            bt = t_ref[row_sl, :]
            cand_idx = ci * leaf + base + local
            # Lowest-triangle-index on t ties, EXPLICITLY: makes the
            # fold order-independent, so the ordered (near-first)
            # traversal below cannot flip seam pixels vs the XLA
            # index-order fold (scene.rs:97-136 tie rule).
            better = (ct < bt) | ((ct == bt)
                                  & (cand_idx < idx_ref[row_sl, :]))
            t_ref[row_sl, :] = jnp.where(better, ct, bt)
            u_ref[row_sl, :] = jnp.where(better, take(uu),
                                         u_ref[row_sl, :])
            v_ref[row_sl, :] = jnp.where(better, take(vv),
                                         v_ref[row_sl, :])
            idx_ref[row_sl, :] = jnp.where(better, cand_idx,
                                           idx_ref[row_sl, :])
            if normals:
                # Interpolated world vertex normal (columns 9-17),
                # in-kernel: avoids per-ray table gathers downstream
                # (flat triangles store n1=n2=n3, so one formula
                # serves both).
                wu = jnp.where(onehot, uu, 0.0)
                wv = jnp.where(onehot, vv, 0.0)
                w1 = jnp.where(onehot, 1.0 - uu - vv, 0.0)
                nsel = lambda k: jnp.sum(
                    w1 * col(9 + k) + wu * col(12 + k) + wv * col(15 + k),
                    axis=0, keepdims=True)
                nx_ref[row_sl, :] = jnp.where(better, nsel(0),
                                              nx_ref[row_sl, :])
                ny_ref[row_sl, :] = jnp.where(better, nsel(1),
                                              ny_ref[row_sl, :])
                nz_ref[row_sl, :] = jnp.where(better, nsel(2),
                                              nz_ref[row_sl, :])
            for k, ar in enumerate(aux_refs):
                # Per-triangle payload column (shade class / prim id
                # as f32): one sublane select-sum replaces a ~1
                # elem/cycle XLA gather downstream.
                ar[row_sl, :] = jnp.where(better, take(col(aux_base + k)),
                                          ar[row_sl, :])

    def cond(c):
        sp, done, _, _ = c
        return (sp > 0) & ~done

    def step(c):
        """Traversal step with a one-leaf software pipeline: entering a
        leaf STARTS its DMA into the parity buffer and folds the
        PREVIOUS (pending) leaf from the other buffer, so each leaf's
        HBM copy overlaps the previous leaf's Möller–Trumbore fold.
        Fold order stays leaf-visit order (only deferred by one), so the
        strict-< tie-breaking is unchanged; the cull merely sees best-t
        one fold late, which can only ADMIT an extra leaf, never drop
        one."""
        sp, _, pend, par = c
        n = stack[sp - 1]
        sp = sp - 1
        # Node boxes live in SMEM: dynamic scalar reads are legal there
        # (Mosaic can't prove 128-alignment for dynamic VMEM loads).
        tmin, tmax = _ray_slab(
            ox, oy, oz, ix, iy, iz,
            boxes[0, n], boxes[1, n], boxes[2, n],
            boxes[3, n], boxes[4, n], boxes[5, n])
        enter = (tmin <= tmax) & (tmax >= 0.0) & (
            tmin < jnp.minimum(t_ref[...], limit))
        enter_any = jnp.any(enter)
        is_leaf = n >= Lp

        @pl.when(enter_any & ~is_leaf)
        def _():
            # Push right child first so the left (lower-Morton) child
            # is popped first. Ordered (near-first) descent was tried
            # in round 5: the two extra per-inner-node slab tests +
            # scalar ordering keys cost MORE than the tighter best-t
            # culling saved (70.5 vs 78.2 M on the teapot) — Morton
            # order already visits roughly front-to-back for primary
            # rays. (The leaf fold tie-breaks on triangle index
            # explicitly, so visit order cannot change results.)
            stack[sp] = 2 * n + 1
            stack[sp + 1] = 2 * n

        sp = sp + jnp.where(enter_any & ~is_leaf, 2, 0)

        hit_leaf = enter_any & is_leaf

        @pl.when(hit_leaf & (par == 0))
        def _():
            leaf_dma(n - Lp, buf0, sem0).start()

        @pl.when(hit_leaf & (par == 1))
        def _():
            leaf_dma(n - Lp, buf1, sem1).start()

        # Pending leaf sits in the OTHER buffer (par flipped when it was
        # started); wait its copy and fold it while the new copy flies.
        @pl.when(hit_leaf & (pend > 0) & (par == 1))
        def _():
            leaf_dma(pend - 1, buf0, sem0).wait()
            mt_leaf(pend - 1, buf0)

        @pl.when(hit_leaf & (pend > 0) & (par == 0))
        def _():
            leaf_dma(pend - 1, buf1, sem1).wait()
            mt_leaf(pend - 1, buf1)

        pend = jnp.where(hit_leaf, n - Lp + 1, pend)
        par = jnp.where(hit_leaf, 1 - par, par)

        if any_hit:
            # limit <= 0 marks padding rays as already satisfied so they
            # can't block the block-level early exit. (The pending
            # leaf's hits land one step late; the drain below catches
            # the final fold.)
            done = jnp.all((t_ref[...] < limit) | (limit <= 0.0))
        else:
            done = jnp.asarray(False)
        return (sp, done, pend, par)

    stack[0] = 1
    _, _, pend, par = jax.lax.while_loop(
        cond, step, (jnp.asarray(1, jnp.int32), jnp.asarray(False),
                     jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32)))

    # Drain: the last entered leaf is still pending.
    @pl.when((pend > 0) & (par == 1))
    def _():
        leaf_dma(pend - 1, buf0, sem0).wait()
        mt_leaf(pend - 1, buf0)

    @pl.when((pend > 0) & (par == 0))
    def _():
        leaf_dma(pend - 1, buf1, sem1).wait()
        mt_leaf(pend - 1, buf1)


@functools.partial(jax.jit,
                   static_argnames=("leaf", "any_hit", "interpret",
                                    "max_leaves"))
def bvh_closest_triangle(ro_comps, rd_comps, tri_comps, dist=None, aux=None,
                         leaf: int = LEAF, any_hit: bool = False,
                         interpret: bool = False,
                         max_leaves: int = MAX_LEAVES):
    """BVH closest-hit (or bounded any-hit) over triangles.

    ro/rd_comps: 3-tuples of [R] f32 (R a multiple of BR); tri_comps:
    9-tuple of [T] f32 (p1xyz, e1xyz, e2xyz) in Morton order. `dist`
    ([R], optional) bounds the search for shadow rays; with
    any_hit=True traversal stops once every ray in the block has a hit
    inside `dist`. `aux` (optional tuple of [T] f32 columns, e.g. shade
    class / prim id) selects each column for the winning triangle
    in-kernel — replacing XLA gathers, which run at ~1 element/cycle.

    Returns (t, u, v, tri_index[, nx, ny, nz][, *aux]) — normals when
    tri_comps carries the 9 normal columns. Closest-hit: misses carry
    t=+inf and u/v/tri_index belong to the winning triangle.
    any_hit=True returns an occlusion sentinel instead of a payload: t
    is pinned to 0 when some triangle lies inside `dist` (so `t < dist`
    tests occlusion) and +inf otherwise; u/v/tri_index are meaningless
    zeros.
    """
    R = ro_comps[0].shape[0]
    assert R % BR == 0, R
    normals = len(tri_comps) == 18
    aux = tuple(aux) if aux else ()
    assert not (any_hit and (normals or aux)), "any-hit reports no payload"
    # Node boxes ([6, 2*Lp] f32) live in SMEM for dynamic scalar reads,
    # so scalar memory bounds the LEAF COUNT, not the mesh: grow the
    # leaf size instead of cliffing (the reference's linear scan has no
    # size limit — load_obj.rs:124-139). The VMEM leaf scratch grows
    # with it (leaf x 512 B); assert that secondary budget explicitly
    # rather than failing opaquely inside Mosaic.
    leaf = auto_leaf(tri_comps[0].shape[0], leaf, max_leaves)
    assert 2 * leaf * 512 <= 8 * 1024 * 1024, (
        f"auto-raised leaf {leaf} needs {2 * leaf * 512} B of VMEM "
        f"scratch (double-buffered); mesh of {tri_comps[0].shape[0]} "
        f"triangles exceeds the kernel's budget — split the mesh")
    packed, nlo, nhi, sboxes, Lp = build_tree(
        tri_comps[0:3], tri_comps[3:6], tri_comps[6:9],
        normals=tri_comps[9:18] if normals else None, aux=aux, leaf=leaf,
        subl=min(leaf, 64))
    assert Lp <= max_leaves, (Lp, max_leaves)
    NN = 2 * Lp
    if dist is None:
        dist = jnp.full((R,), _INF, jnp.float32)

    # XLA stages the custom call's whole operands/results in scoped
    # VMEM (S(1)); 16 tile-sized arrays at ~1 MB each blow the 16 MB
    # scoped budget, so big tiles split into <=128k-ray slices (the
    # tree build above is shared; only the ray-shaped args slice).
    RMAX = 128 * 1024
    if R > RMAX:
        outs = None
        for s in range(0, R, RMAX):
            e = min(s + RMAX, R)
            part = bvh_closest_triangle(
                tuple(c[s:e] for c in ro_comps),
                tuple(c[s:e] for c in rd_comps),
                tri_comps, dist=dist[s:e], aux=aux, leaf=leaf,
                any_hit=any_hit, interpret=interpret,
                max_leaves=max_leaves)
            outs = part if outs is None else tuple(
                jnp.concatenate([a, b]) for a, b in zip(outs, part))
        return outs

    # Pad the ray axis to whole (SUBB, BR) programs. Padding rays carry
    # dist = -inf: they never pass the slab test's `tmin < limit` and
    # count as already satisfied for the any-hit early exit.
    blk = SUBB * BR
    padR = (-R) % blk
    Rp = R + padR

    def padr(c, fill=0.0):
        return jnp.pad(c, (0, padR), constant_values=fill) if padR else c

    nrows = Rp // BR
    grid = (nrows // SUBB,)
    if SUBB == 1:
        # Lane-sliced layout: a (1, BR) block must equal the full
        # sublane dim, so the arrays stay [1, Rp] and blocks stride the
        # lane axis.
        shape2 = (1, Rp)
        ray_spec = pl.BlockSpec((1, BR), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
    else:
        shape2 = (nrows, BR)
        ray_spec = pl.BlockSpec((SUBB, BR), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    box_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_spec = ray_spec

    args = [padr(c).reshape(shape2) for c in (*ro_comps, *rd_comps)]
    args.append(padr(dist.astype(jnp.float32),
                     fill=-_INF).reshape(shape2))
    args.append(jnp.stack([*nlo, *nhi], axis=0))  # [6, NN] -> SMEM
    args.append(sboxes)                           # [6, n_sub] -> SMEM
    args.append(packed)

    n_out = (7 if normals else 4) + len(aux)
    out_shapes = (
        jax.ShapeDtypeStruct(shape2, jnp.float32),
        jax.ShapeDtypeStruct(shape2, jnp.float32),
        jax.ShapeDtypeStruct(shape2, jnp.float32),
        jax.ShapeDtypeStruct(shape2, jnp.int32),
    )
    if normals:
        out_shapes += (jax.ShapeDtypeStruct(shape2, jnp.float32),) * 3
    out_shapes += (jax.ShapeDtypeStruct(shape2, jnp.float32),) * len(aux)

    outs = pl.pallas_call(
        functools.partial(_traverse_kernel, Lp, leaf, any_hit, normals,
                          len(aux)),
        grid=grid,
        in_specs=[ray_spec] * 7 + [box_spec, box_spec]
        + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(out_spec,) * n_out,
        out_shape=out_shapes,
        scratch_shapes=[
            # Double-buffered leaf scratch: leaf N+1's DMA overlaps
            # leaf N's fold (one semaphore per buffer).
            pltpu.VMEM((leaf, packed.shape[1]), jnp.float32),
            pltpu.VMEM((leaf, packed.shape[1]), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SMEM((STACK,), jnp.int32),
        ],
        interpret=interpret,
    )(*args)
    return tuple(o.reshape(Rp)[:R] for o in outs)
