"""SoA shading: normals, uv mappings, pattern trees, Phong lighting.

Component-array ([R]-per-axis) rewrites of ops/normals.py and
render/patterns.py (see ops/vec.py for the layout rationale). Per-hit
primitive properties come from component gathers out of the flat scene
tables — prim_inv/prim_nmat entries are gathered coefficient-by-
coefficient so no [R, 3] minor axis ever materializes.

Reference semantics: normal dispatch object.rs:52-56 + per-shape
local_normal_at; uv mappings sphere.rs:126-132, plane.rs:105-113,
cube.rs:132-174, cylinder.rs:181-196, cone.rs:232-255, torus.rs:150-161;
patterns material/pattern.rs:145-215; Phong light.rs:98-140.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import EPSILON
from ..ops import noise as fnl
from ..ops.soa import Hit
from ..ops.vec import V3
from ..scene import data as sd


from ..ops.vec import take_rows as _take


def _present_types(scene):
    ns, npl, ncu, ncy, nco, nto, T, _ = scene.counts
    return {code for code, n in ((sd.SPHERE, ns), (sd.PLANE, npl),
                                 (sd.CUBE, ncu), (sd.CYLINDER, ncy),
                                 (sd.CONE, nco), (sd.TORUS, nto),
                                 (sd.TRIANGLE, T)) if n}


def gathered_affine(table, prim):
    """[P,3,4] (or [P,3,3]) table -> 3x4 nested tuple of [R] coefficients."""
    rows = []
    for i in range(table.shape[1]):
        rows.append(tuple(_take(table[:, i, j], prim)
                          for j in range(table.shape[2])))
    return tuple(rows)


class ClassReader:
    """Per-hit shade-table reads over the [M] class domain.

    TPU gathers emit ~1 element/cycle, so every `jnp.take(table, prim)`
    on a 60k-ray tile cost ~60 us; a full shade did dozens of them
    (measured ~73% of mesh-scene frame time). Here the hit's class id is
    fetched with ONE gather ([R] over prim_class), and every subsequent
    column read is an unrolled select-sum over the M classes — pure VPU
    work, exact (no matmul rounding), and M is the number of distinct
    scene objects (meshes count once), typically < 32.

    Masks are built once per reader; columns are memoized."""

    def __init__(self, scene, prim, cls=None):
        self._tbl = scene.cls_table
        self._M = max(scene.n_classes, 1)
        if cls is None:
            cls = _take(scene.prim_class, prim)
        self._masks = [cls == m for m in range(self._M)]
        self._cols = {}

    def col(self, c):
        """Column c gathered per ray -> [R] (scene dtype)."""
        if c not in self._cols:
            tbl = self._tbl
            acc = jnp.where(self._masks[0], tbl[0, c],
                            jnp.zeros((), tbl.dtype))
            for m in range(1, self._M):
                acc = jnp.where(self._masks[m], tbl[m, c], acc)
            self._cols[c] = acc
        return self._cols[c]

    def icol(self, c):
        return self.col(c).astype(jnp.int32)

    def affine_inv(self):
        """world->object affine as a 3x4 nested tuple of [R]."""
        return tuple(tuple(self.col(sd.CLS_INV + 4 * i + j)
                           for j in range(4)) for i in range(3))

    def nmat(self):
        """normal matrix as a 3x3 nested tuple of [R]."""
        return tuple(tuple(self.col(sd.CLS_NMAT + 3 * i + j)
                           for j in range(3)) for i in range(3))


def apply_gathered_point(m, p: V3) -> V3:
    return V3(m[0][0] * p.x + m[0][1] * p.y + m[0][2] * p.z + m[0][3],
              m[1][0] * p.x + m[1][1] * p.y + m[1][2] * p.z + m[1][3],
              m[2][0] * p.x + m[2][1] * p.y + m[2][2] * p.z + m[2][3])


def apply_gathered_linear(m, v: V3) -> V3:
    return V3(m[0][0] * v.x + m[0][1] * v.y + m[0][2] * v.z,
              m[1][0] * v.x + m[1][1] * v.y + m[1][2] * v.z,
              m[2][0] * v.x + m[2][1] * v.y + m[2][2] * v.z)


def local_point(scene: sd.SceneData, prim, world_pt: V3) -> V3:
    """world_to_object via the composed inverse (object.rs:102-109)."""
    return apply_gathered_point(gathered_affine(scene.prim_inv, prim),
                                world_pt)


def normal_at(scene: sd.SceneData, hit: Hit, world_pt: V3,
              lp: V3 = None, reader: ClassReader = None) -> V3:
    """World-space unit normal (pre eye-facing flip)."""
    present = _present_types(scene)
    prim = hit.prim
    if reader is None:
        reader = ClassReader(scene, prim, cls=hit.cls)
    if lp is None:
        lp = apply_gathered_point(reader.affine_inv(), world_pt)
    ptype = reader.icol(sd.CLS_TYPE)
    x, y, z = lp.x, lp.y, lp.z
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)

    n = V3(zero, zero, zero)

    def merge(code, cand: V3) -> V3:
        m = ptype == code
        return V3(jnp.where(m, cand.x, n.x), jnp.where(m, cand.y, n.y),
                  jnp.where(m, cand.z, n.z))

    if sd.SPHERE in present:
        n = merge(sd.SPHERE, lp)
    if sd.PLANE in present:
        n = merge(sd.PLANE, V3(zero, one, zero))
    if sd.CUBE in present:
        ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
        maxc = jnp.maximum(ax, jnp.maximum(ay, az))
        cand = V3(jnp.where(maxc == ax, x, zero),
                  jnp.where((maxc != ax) & (maxc == ay), y, zero),
                  jnp.where((maxc != ax) & (maxc != ay), z, zero))
        n = merge(sd.CUBE, cand)
    if sd.CYLINDER in present:
        cmin = reader.col(sd.CLS_PMIN)
        cmax = reader.col(sd.CLS_PMAX)
        dist = x * x + z * z
        top = (dist < 1.0) & (y >= cmax - EPSILON)
        bot = (dist < 1.0) & (y <= cmin + EPSILON)
        cand = V3(jnp.where(top | bot, zero, x),
                  jnp.where(top, one, jnp.where(bot, -one, zero)),
                  jnp.where(top | bot, zero, z))
        n = merge(sd.CYLINDER, cand)
    if sd.CONE in present:
        cmin = reader.col(sd.CLS_PMIN)
        cmax = reader.col(sd.CLS_PMAX)
        dist = x * x + z * z
        ny = jnp.sqrt(jnp.maximum(dist, 0.0))
        ny = jnp.where(y > 0.0, -ny, ny)
        top = (dist < 1.0) & (y >= cmax - EPSILON)
        bot = (dist < 1.0) & (y <= cmin + EPSILON)
        cand = V3(jnp.where(top | bot, zero, x),
                  jnp.where(top, one, jnp.where(bot, -one, ny)),
                  jnp.where(top | bot, zero, z))
        n = merge(sd.CONE, cand)
    if sd.TORUS in present:
        r = reader.col(sd.CLS_TORR)
        ss = x * x + y * y + z * z
        ps = 1.0 + r * r
        n = merge(sd.TORUS, V3(4.0 * x * (ss - ps), 4.0 * y * (ss - ps),
                               4.0 * z * (ss - ps + 2.0)))

    world_n = apply_gathered_linear(reader.nmat(), n).normalize()

    if sd.TRIANGLE in present:
        if hit.tri_n is not None:
            # Kernel-interpolated world normal (flat triangles store
            # n1=n2=n3=nflat, so the interpolation is the identity).
            tri_n = V3(*hit.tri_n).normalize()
        else:
            tri = hit.tri

            def tv3(table):
                return V3(_take(table[:, 0], tri), _take(table[:, 1], tri),
                          _take(table[:, 2], tri))

            # One formula for smooth AND flat (flat tris store
            # n1=n2=n3 — identity interpolation), matching the kernel
            # paths so grad attribution is path-invariant.
            interp = (tv3(scene.tri_n2) * hit.u + tv3(scene.tri_n3) * hit.v
                      + tv3(scene.tri_n1) * (1.0 - hit.u - hit.v))
            tri_n = interp.normalize()
        m = ptype == sd.TRIANGLE
        world_n = V3(jnp.where(m, tri_n.x, world_n.x),
                     jnp.where(m, tri_n.y, world_n.y),
                     jnp.where(m, tri_n.z, world_n.z))
    return world_n


def _contains(node, ptypes) -> bool:
    return node is not None and (node.ptype in ptypes
                                 or _contains(node.a, ptypes)
                                 or _contains(node.b, ptypes))


def _has_image(node) -> bool:
    return _contains(node, ("image",))


def _is_expensive(node) -> bool:
    """True when the pattern tree contains texture gathers or Perlin
    octaves — the nodes worth a lax.cond fusion barrier to skip."""
    return _contains(node, ("image", "noise", "perturbed"))


def _textured_kinds(scene):
    """Shape kinds whose pattern tree contains an image node (static).

    uv_mapping is only consumed by texture sampling (pattern.rs:209-213);
    skipping the other kinds' uv branches avoids their arctan2s on every
    ray (measured 10 ms of the 1080p CSG-showcase frame)."""
    kinds = set()
    for pid, kind in zip(scene.prim_pattern_static, scene.prim_kinds):
        if pid < len(scene.patterns) and _has_image(scene.patterns[pid]):
            kinds.add(kind)
    return kinds


def uv_at(scene: sd.SceneData, hit: Hit, pts: V3,
          reader: ClassReader = None, kinds=None):
    """Per-shape uv_mapping on pattern-space points.

    `kinds` (static set) restricts evaluation to those shape kinds; rays
    on other kinds get (0, 0) — callers mask them out."""
    present = _present_types(scene)
    if kinds is not None:
        present = present & kinds
    prim = hit.prim
    if reader is None:
        reader = ClassReader(scene, prim)
    ptype = reader.icol(sd.CLS_TYPE)
    x, y, z = pts.x, pts.y, pts.z
    pi = jnp.pi
    u = jnp.zeros_like(x)
    v = jnp.zeros_like(x)

    def merge(code, uu, vv):
        m = ptype == code
        return jnp.where(m, uu, u), jnp.where(m, vv, v)

    if sd.SPHERE in present:
        theta = jnp.arctan2(z, x)
        rr = jnp.sqrt(jnp.maximum(x * x + y * y + z * z, 1e-30))
        phi = jnp.arccos(jnp.clip(y / rr, -1.0, 1.0))
        u, v = merge(sd.SPHERE, (theta + pi) / (2.0 * pi), 1.0 - phi / pi)
    if sd.PLANE in present:
        u, v = merge(sd.PLANE, jnp.mod(x, 1.0), jnp.mod(z, 1.0))
    if sd.CUBE in present:
        ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
        fx = (ax >= ay) & (ax >= az)
        fy = ~fx & (ay >= ax) & (ay >= az)
        ur = jnp.where(x > 0, (z + 1.0) * 0.5, (1.0 - z) * 0.5)
        uy = (x + 1.0) * 0.5
        vy = jnp.where(y > 0, (1.0 - z) * 0.5, (z + 1.0) * 0.5)
        uz = jnp.where(z > 0, (x + 1.0) * 0.5, (1.0 - x) * 0.5)
        uu = jnp.where(fx, ur, jnp.where(fy, uy, uz))
        vv = jnp.where(fy, vy, (y + 1.0) * 0.5)
        u, v = merge(sd.CUBE, uu, vv)
    if sd.CYLINDER in present:
        cmin = reader.col(sd.CLS_PMIN)
        cmax = reader.col(sd.CLS_PMAX)
        closed = reader.col(sd.CLS_CLOSED) != 0.0
        cap = closed & ((y <= cmin) | (y >= cmax))
        theta = jnp.arctan2(z, x)
        uu = jnp.where(cap, (x + 1.0) / 2.0, (theta + pi) / (2.0 * pi))
        vv = jnp.where(cap, (z + 1.0) / 2.0, jnp.mod(y, 1.0))
        u, v = merge(sd.CYLINDER, uu, vv)
    if sd.CONE in present:
        cmin = reader.col(sd.CLS_PMIN)
        cmax = reader.col(sd.CLS_PMAX)
        closed = reader.col(sd.CLS_CLOSED) != 0.0
        cap = closed & ((jnp.abs(y - cmin) <= EPSILON)
                        | (jnp.abs(y - cmax) <= EPSILON))
        radius = jnp.maximum(jnp.abs(y), 1e-30)
        theta = (jnp.arctan2(z, x) + pi) / (2.0 * pi)
        height = jnp.where(jnp.abs(cmax - cmin) < 1e-30, 1e-30, cmax - cmin)
        # Side uv is (normalized_y, theta) — cone.rs:244-253.
        uu = jnp.where(cap, (x / radius + 1.0) / 2.0, (y - cmin) / height)
        vv = jnp.where(cap, (z / radius + 1.0) / 2.0, theta)
        u, v = merge(sd.CONE, uu, vv)
    if sd.TORUS in present:
        uu = (jnp.arctan2(y, x) + pi) / (2.0 * pi)
        dist = jnp.sqrt(jnp.maximum(x * x + y * y, 1e-30)) - 1.0
        vv = (jnp.arctan2(z, dist) + pi) / (2.0 * pi)
        u, v = merge(sd.TORUS, uu, vv)
    if sd.TRIANGLE in present:
        tri = hit.tri

        def tv3(table):
            return V3(_take(table[:, 0], tri), _take(table[:, 1], tri),
                      _take(table[:, 2], tri))

        p1 = tv3(scene.tri_p1)
        e1 = tv3(scene.tri_e1)
        e2 = tv3(scene.tri_e2)
        w = pts - p1
        d00 = e1.dot(e1)
        d01 = e1.dot(e2)
        d11 = e2.dot(e2)
        d20 = w.dot(e1)
        d21 = w.dot(e2)
        denom = d00 * d11 - d01 * d01
        denom = jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
        u, v = merge(sd.TRIANGLE, (d11 * d20 - d01 * d21) / denom,
                     (d00 * d21 - d01 * d20) / denom)
    return u, v


# ---------------------------------------------------------------------------
# Patterns
# ---------------------------------------------------------------------------

def _apply_inv(inv, p: V3) -> V3:
    """Pattern-node [3,4] inverse (a single matrix, statically indexed)."""
    return V3(inv[0, 0] * p.x + inv[0, 1] * p.y + inv[0, 2] * p.z + inv[0, 3],
              inv[1, 0] * p.x + inv[1, 1] * p.y + inv[1, 2] * p.z + inv[1, 3],
              inv[2, 0] * p.x + inv[2, 1] * p.y + inv[2, 2] * p.z + inv[2, 3])


def _even(x):
    return jnp.mod(jnp.floor(x), 2.0) == 0.0


def _sample_texture(texture, uu, vv):
    h, w = texture.shape[0], texture.shape[1]
    dtype = uu.dtype
    uu = jnp.clip(uu, 0.0, 1.0)
    vv = jnp.clip(vv, 0.0, 1.0)
    xi = jnp.minimum((uu * w).astype(jnp.int32), w - 1)
    yi = h - 1 - jnp.minimum((vv * h).astype(jnp.int32), h - 1)
    return _fetch_texel_flat(texture, yi * w + xi, dtype)


def _fetch_texel_flat(texture, flat, dtype):
    """Texel fetch by FLAT index (row-major, already clamp/v-flipped) —
    the tail of _sample_texture, shared with the whitted kernel's
    texture-completion path (which computes the identical flat index
    in-kernel)."""
    h, w = texture.shape[0], texture.shape[1]
    if texture.dtype == jnp.uint32:
        # Packed 8-bit RGB (scene/data.py): one fetch instead of three.
        # Fetched as a [1, 128] ROW gather + exact in-lane select: XLA's
        # 1D element gather runs ~12.7 ns/index on TPU vs 2.1 ns/index
        # for 128-wide row gathers (measured at 104k indices; the
        # element form was ~65% of the 1080p CSG-showcase frame).
        n = h * w
        t2 = jnp.pad(texture.reshape(-1), (0, (-n) % 128)).reshape(-1, 128)
        rows = jnp.take(t2, flat // 128, axis=0)        # [R, 128]
        lane = (flat % 128)[:, None]
        px = jnp.sum(jnp.where(jnp.arange(128)[None, :] == lane, rows, 0),
                     axis=1)
        s = jnp.asarray(1.0 / 255.0, dtype)
        return V3(((px >> 16) & 0xFF).astype(dtype) * s,
                  ((px >> 8) & 0xFF).astype(dtype) * s,
                  (px & 0xFF).astype(dtype) * s)
    return V3(jnp.take(texture[:, :, 0].reshape(-1), flat),
              jnp.take(texture[:, :, 1].reshape(-1), flat),
              jnp.take(texture[:, :, 2].reshape(-1), flat))


def eval_pattern(node: sd.PatternData, pts: V3, uv_ctx) -> V3:
    p = _apply_inv(node.inv, pts)
    t = node.ptype
    if t == "solid":
        like = jnp.ones_like(p.x)
        return V3(node.color[0] * like, node.color[1] * like,
                  node.color[2] * like)
    if t == "test":
        return p
    if t in ("stripe", "ring", "checker"):
        if t == "stripe":
            cond = _even(p.x)
        elif t == "ring":
            cond = _even(jnp.sqrt(p.x * p.x + p.z * p.z))
        else:
            cond = _even(jnp.floor(p.x) + jnp.floor(p.y) + jnp.floor(p.z))
        a = eval_pattern(node.a, p, uv_ctx)
        b = eval_pattern(node.b, p, uv_ctx)
        return V3(jnp.where(cond, a.x, b.x), jnp.where(cond, a.y, b.y),
                  jnp.where(cond, a.z, b.z))
    if t == "gradient":
        a = eval_pattern(node.a, p, uv_ctx)
        b = eval_pattern(node.b, p, uv_ctx)
        frac = p.x - jnp.floor(p.x)
        return a + (b - a) * frac
    if t == "blend":
        a = eval_pattern(node.a, p, uv_ctx)
        b = eval_pattern(node.b, p, uv_ctx)
        return a * (1.0 - node.scale) + b * node.scale
    if t == "perturbed":
        oc, pe = node.octaves, node.persistence
        nx = fnl.octave_perlin(p.x, p.y, p.z, oc, pe) * node.scale
        ny = fnl.octave_perlin(p.x, p.y, p.z + 1.0, oc, pe) * node.scale
        nz = fnl.octave_perlin(p.x, p.y, p.z + 2.0, oc, pe) * node.scale
        return eval_pattern(node.a, p + V3(nx, ny, nz), uv_ctx)
    if t == "noise":
        n = fnl.octave_perlin(p.x, p.y, p.z, node.octaves,
                              node.persistence) * node.scale
        a = eval_pattern(node.a, p, uv_ctx)
        b = eval_pattern(node.b, p, uv_ctx)
        neg = n <= 0.0
        return V3(jnp.where(neg, a.x * -n, b.x * n),
                  jnp.where(neg, a.y * -n, b.y * n),
                  jnp.where(neg, a.z * -n, b.z * n))
    if t == "image":
        uu, vv = uv_ctx(p)
        return _sample_texture(node.texture, uu, vv)
    raise ValueError(f"unknown pattern type {t!r}")


def pattern_at(scene: sd.SceneData, hit: Hit, obj_pts: V3,
               reader: ClassReader = None) -> V3:
    """pattern_at_object (material.rs:77-80) on already-object-space points."""
    if reader is None:
        reader = ClassReader(scene, hit.prim)

    def uv_ctx(pattern_pts):
        return uv_at(scene, hit, pattern_pts, reader=reader,
                     kinds=_textured_kinds(scene))

    if len(scene.patterns) == 1:
        return eval_pattern(scene.patterns[0], obj_pts, uv_ctx)
    pid = reader.icol(sd.CLS_PATTERN)
    out = V3(jnp.zeros_like(obj_pts.x), jnp.zeros_like(obj_pts.x),
             jnp.zeros_like(obj_pts.x))
    for i, root in enumerate(scene.patterns):
        m = pid == i

        # Patterns are screen-local (a texture lives on one object), so
        # a whole ray tile often holds no ray of pattern i: lax.cond
        # skips EXPENSIVE trees — texture gathers, Perlin octaves — for
        # that tile entirely (the masked select discards the values
        # anyway; measured 1.2x on the 1080p CSG-showcase frame). Cheap
        # trees evaluate unconditionally: a cond is an XLA fusion
        # barrier, and wrapping a few-op checker cost 2x on the 35 us
        # sphere frame.
        if _is_expensive(root):
            def eval_root(_, root=root):
                c = eval_pattern(root, obj_pts, uv_ctx)
                return c.x, c.y, c.z

            def skip(_):
                z = jnp.zeros_like(obj_pts.x)
                return z, z, z

            cx, cy, cz = jax.lax.cond(jnp.any(m), eval_root, skip, None)
            color = V3(cx, cy, cz)
        else:
            color = eval_pattern(root, obj_pts, uv_ctx)
        out = V3(jnp.where(m, color.x, out.x), jnp.where(m, color.y, out.y),
                 jnp.where(m, color.z, out.z))
    return out
