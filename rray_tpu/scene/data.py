"""Scene representation: host-side construction + device-side SoA tables.

Design (SURVEY.md §7): instead of the reference's `dyn Object` trait plus a
global Mutex'd registry (object/db.rs:11-77), the scene is compiled once on
the host into flat, statically-shaped struct-of-arrays tensors:

* per-leaf-primitive tables (composed world->object affines, normal
  matrices, material scalars, pattern ids) — parent group/CSG transform
  chains (object.rs:102-138) are folded at build time, which is exact
  because per-level normalization only rescales directions;
* per-primitive-type geometry tables so each intersection kernel runs as
  one batched, masked closed-form evaluation;
* triangles pre-transformed into world space (Möller–Trumbore t/u/v are
  invariant under the fold; vertex normals are carried through the
  inverse-transpose unnormalized so smooth interpolation stays exact);
* CSG membership tables (innermost-first) driving a masked scan filter
  that reproduces csg.rs:163-195 — including the reference's quirk that a
  CSG's `includes` only checks direct children (csg.rs:295-297) while a
  Group's recurses (group.rs:151-159).

Everything dynamic is a JAX pytree (registered dataclasses); everything
structural (counts, pattern node types, light kinds, CSG ops) is pytree
metadata so `jit` re-specializes per scene.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import mathutils as mu
from ..config import RenderSettings, default_dtype

# Primitive type codes.
SPHERE, PLANE, CUBE, CYLINDER, CONE, TORUS, TRIANGLE = range(7)

# cls_table column layout. A "class" is a shade-equivalent leaf group:
# every analytic leaf is its own class, while all triangles sharing one
# source mesh (same material object + composed transform) collapse to a
# single class. Shading reads then happen over the tiny [M] class domain
# instead of the [P] prim domain — per-element gathers run at ~1
# element/cycle on the TPU scalar path, so a 60k-ray tile paid ~60 us
# PER table read; class reads are unrolled selects on the VPU instead
# (see shade_soa.ClassReader).
CLS_INV = 0          # 12 cols: world->object affine, row-major [3,4]
CLS_NMAT = 12        # 9 cols: object-normal -> world matrix [3,3]
CLS_TYPE = 21        # type code (exact small int in float)
CLS_PATTERN = 22     # pattern root index
CLS_AMBIENT = 23
CLS_DIFFUSE = 24
CLS_SPECULAR = 25
CLS_SHININESS = 26
CLS_REFLECTIVE = 27
CLS_TRANSPARENCY = 28
CLS_IOR = 29
CLS_PMIN = 30        # cylinder/cone minimum (by type)
CLS_PMAX = 31        # cylinder/cone maximum
CLS_CLOSED = 32      # cylinder/cone closed flag (0/1)
CLS_TORR = 33        # torus minor radius
CLS_COLS = 34

# CSG op codes (csg.rs:53-64).
CSG_UNION, CSG_INTERSECTION, CSG_DIFFERENCE = range(3)
_CSG_OPS = {"union": CSG_UNION, "intersection": CSG_INTERSECTION,
            "difference": CSG_DIFFERENCE}

# Hit-slot budget contributed by each analytic primitive.
SLOTS_PER_TYPE = {SPHERE: 2, PLANE: 1, CUBE: 2, CYLINDER: 4, CONE: 5, TORUS: 4}


# --------------------------------------------------------------------------
# Host-side pattern / material / shape description (what the YAML loader and
# tests construct).
# --------------------------------------------------------------------------

@dataclasses.dataclass
class Pattern:
    """Host pattern-tree node (material/pattern.rs:26-37)."""

    ptype: str  # solid|test|stripe|gradient|ring|checker|blend|perturbed|noise|image
    transform: np.ndarray = dataclasses.field(default_factory=mu.identity)
    color: Optional[np.ndarray] = None
    a: Optional["Pattern"] = None
    b: Optional["Pattern"] = None
    scale: float = 0.0
    octaves: int = 0
    persistence: float = 0.0
    texture: Optional[np.ndarray] = None  # [H, W, 3] float in [0,1]

    @staticmethod
    def solid(color, transform=None):
        return Pattern("solid", transform if transform is not None else mu.identity(),
                       color=np.asarray(color, np.float64))


def default_pattern() -> Pattern:
    return Pattern.solid([1.0, 1.0, 1.0])


@dataclasses.dataclass
class Material:
    """Host material (material.rs:35-58 defaults)."""

    pattern: Pattern = dataclasses.field(default_factory=default_pattern)
    ambient: float = 0.1
    diffuse: float = 0.9
    specular: float = 0.9
    shininess: float = 200.0
    reflective: float = 0.0
    transparency: float = 0.0
    refractive_index: float = 1.0


def glass_material() -> Material:
    m = Material()
    m.transparency = 1.0
    m.refractive_index = 1.5
    return m


@dataclasses.dataclass
class Shape:
    """Host scene-graph node; leaves become SoA rows, interior nodes fold."""

    kind: str  # sphere|plane|cube|cylinder|cone|torus|triangle|smooth_triangle|group|csg
    transform: np.ndarray = dataclasses.field(default_factory=mu.identity)
    material: Optional[Material] = None
    hidden: bool = False
    # cylinder / cone
    minimum: float = -np.inf
    maximum: float = np.inf
    closed: bool = False
    # torus
    minor_radius: float = 1.0
    # triangle
    p1: Optional[np.ndarray] = None
    p2: Optional[np.ndarray] = None
    p3: Optional[np.ndarray] = None
    n1: Optional[np.ndarray] = None
    n2: Optional[np.ndarray] = None
    n3: Optional[np.ndarray] = None
    # group
    children: Tuple["Shape", ...] = ()
    # csg
    operation: str = "union"
    left: Optional["Shape"] = None
    right: Optional["Shape"] = None


def sphere(transform=None, material=None):
    return Shape("sphere", transform if transform is not None else mu.identity(),
                 material or Material())


def plane(transform=None, material=None):
    return Shape("plane", transform if transform is not None else mu.identity(),
                 material or Material())


@dataclasses.dataclass
class PointLight:
    position: np.ndarray
    intensity: np.ndarray


@dataclasses.dataclass
class AreaLight:
    corner: np.ndarray
    uvec: np.ndarray
    vvec: np.ndarray
    intensity: np.ndarray
    level: int = 5

    @property
    def position(self):
        # Area lights shade from their center (light.rs:41-45).
        return self.corner + 0.5 * self.uvec + 0.5 * self.vvec


# --------------------------------------------------------------------------
# Device-side pytrees.
# --------------------------------------------------------------------------

def _register(cls, data_fields, meta_fields):
    jax.tree_util.register_dataclass(cls, data_fields=list(data_fields),
                                     meta_fields=list(meta_fields))
    return cls


@dataclasses.dataclass
class PatternData:
    ptype: str
    octaves: int
    inv: Any  # [3,4] pattern-space inverse affine
    color: Any  # [3]
    scale: Any  # scalar
    persistence: Any  # scalar
    texture: Any  # [H,W,3] or None
    a: Optional["PatternData"]
    b: Optional["PatternData"]


_register(PatternData,
          data_fields=("inv", "color", "scale", "persistence", "texture", "a", "b"),
          meta_fields=("ptype", "octaves"))


@dataclasses.dataclass
class LightData:
    kind: str  # "point" | "area"
    level: int
    position: Any  # [3] (area: center)
    intensity: Any  # [3]
    corner: Any  # [3] or None
    uvec: Any
    vvec: Any


_register(LightData,
          data_fields=("position", "intensity", "corner", "uvec", "vvec"),
          meta_fields=("kind", "level"))


@dataclasses.dataclass
class SceneData:
    """All device tensors for one compiled scene (leaves may be size 0)."""

    # Per-leaf-primitive tables, indexed by prim id (DFS order).
    prim_inv: Any       # [P,3,4] composed world->object affine
    prim_nmat: Any      # [P,3,3] object-normal -> world (unnormalized)
    prim_type: Any      # [P] int32 type code
    prim_row: Any       # [P] int32 row in its per-type table
    mat_ambient: Any    # [P]
    mat_diffuse: Any
    mat_specular: Any
    mat_shininess: Any
    mat_reflective: Any
    mat_transparency: Any
    mat_ior: Any
    pattern_id: Any     # [P] int32 index into `patterns`
    prim_class: Any     # [P] int32 shade-class id (see CLS_* columns)
    cls_table: Any      # [M, CLS_COLS] class shade table

    # Analytic per-type tables.
    sph_inv: Any        # [Ns,3,4]
    sph_prim: Any       # [Ns] int32
    pla_inv: Any
    pla_prim: Any
    cub_inv: Any
    cub_prim: Any
    cyl_inv: Any
    cyl_prim: Any
    cyl_min: Any        # [Ncyl]
    cyl_max: Any
    cyl_closed: Any     # [Ncyl] bool
    con_inv: Any
    con_prim: Any
    con_min: Any
    con_max: Any
    con_closed: Any
    tor_inv: Any
    tor_prim: Any
    tor_r: Any          # [Nt] minor radius

    # Triangles (world space; smooth + flat unified).
    tri_p1: Any         # [T,3]
    tri_e1: Any
    tri_e2: Any
    # Vertex normals are the SINGLE normal source on every path: flat
    # triangles store n1 = n2 = n3 = the normalized flat normal
    # (triangle.rs:55,96-98), so the smooth interpolation
    # (smooth_triangle.rs:99-101) is the identity for them and gradient
    # attribution cannot depend on which execution path ran.
    tri_n1: Any         # [T,3] unnormalized world vertex normals
    tri_n2: Any
    tri_n3: Any
    tri_smooth: Any     # [T] bool
    tri_prim: Any       # [T] int32
    tri_class: Any      # [T] int32 shade-class of each triangle

    # CSG (innermost-first): side[c, p] in {0: not under, 1: left, 2: right}.
    csg_side: Any       # [C, P] int32

    lights: Tuple[LightData, ...]
    patterns: Tuple[PatternData, ...]

    # ---- static metadata ----
    csg_ops: Tuple[int, ...]
    has_reflective: bool
    has_transparent: bool
    counts: Tuple[int, ...]  # (Ns, Npl, Ncu, Ncy, Nco, Nto, T, P)
    # Static copies of prim_type/prim_row (SoA path unrolls over leaves).
    prim_kinds: Tuple[int, ...]
    prim_rows_static: Tuple[int, ...]
    # Per-prim: is the leaf an operand of any CSG node? (static, so the
    # integrator can restrict sorted-slot work to member prims only).
    csg_member_static: Tuple[bool, ...] = ()
    # Static copy of csg_side (slot -> operand side is compile-time
    # knowledge; the sort-free CSG filter branches on it per slot).
    csg_side_static: Tuple[Tuple[int, ...], ...] = ()
    n_classes: int = 0
    prim_class_static: Tuple[int, ...] = ()
    # Per-prim pattern-root index (static, so shading can restrict uv
    # computation to shape kinds whose pattern tree samples a texture).
    prim_pattern_static: Tuple[int, ...] = ()


_register(SceneData,
          data_fields=(
              "prim_inv", "prim_nmat", "prim_type", "prim_row",
              "mat_ambient", "mat_diffuse", "mat_specular", "mat_shininess",
              "mat_reflective", "mat_transparency", "mat_ior", "pattern_id",
              "prim_class", "cls_table",
              "sph_inv", "sph_prim", "pla_inv", "pla_prim", "cub_inv", "cub_prim",
              "cyl_inv", "cyl_prim", "cyl_min", "cyl_max", "cyl_closed",
              "con_inv", "con_prim", "con_min", "con_max", "con_closed",
              "tor_inv", "tor_prim", "tor_r",
              "tri_p1", "tri_e1", "tri_e2",
              "tri_n1", "tri_n2", "tri_n3", "tri_smooth", "tri_prim",
              "tri_class", "csg_side", "lights", "patterns",
          ),
          meta_fields=("csg_ops", "has_reflective", "has_transparent",
                       "counts", "prim_kinds", "prim_rows_static",
                       "csg_member_static", "csg_side_static", "n_classes",
                       "prim_class_static", "prim_pattern_static"))


# --------------------------------------------------------------------------
# Compilation: host scene graph -> SceneData.
# --------------------------------------------------------------------------

_KIND_TO_TYPE = {
    "sphere": SPHERE, "plane": PLANE, "cube": CUBE, "cylinder": CYLINDER,
    "cone": CONE, "torus": TORUS, "triangle": TRIANGLE,
    "smooth_triangle": TRIANGLE,
}


class _Leaf:
    __slots__ = ("shape", "world", "material", "prim_id")

    def __init__(self, shape, world, material):
        self.shape = shape
        self.world = world
        self.material = material
        self.prim_id = -1


class _CsgNode:
    __slots__ = ("op", "left_leaves", "right_leaves", "left_direct", "depth")

    def __init__(self, op, depth):
        self.op = op
        self.depth = depth
        self.left_leaves = []   # all leaves under the left child
        self.right_leaves = []  # all leaves under the right child
        self.left_direct = []   # leaves the reference's left.includes() reports


def _walk(shape: Shape, parent_world: np.ndarray, leaves, csgs, depth):
    """DFS fold of the scene graph. Returns the leaves added in this subtree
    plus the leaves that `includes()` would report for this node
    (group: recursive — group.rs:151-159; csg: direct children only —
    csg.rs:295-297; primitive: itself).

    `hidden` is honored only where the reference's builder consults it:
    top-level objects (scene_builder_yaml.rs:401) and group children
    (scene_builder_yaml.rs:169). A hidden CSG operand is still built —
    create_csg never checks the flag."""
    world = parent_world @ shape.transform
    if shape.kind == "group":
        subtree, included = [], []
        for child in shape.children:
            if child.hidden:
                continue
            s, i = _walk(child, world, leaves, csgs, depth + 1)
            subtree.extend(s)
            included.extend(i)
        return subtree, included
    if shape.kind == "csg":
        node = _CsgNode(_CSG_OPS[shape.operation], depth)
        csgs.append(node)
        ls, li = _walk(shape.left, world, leaves, csgs, depth + 1)
        rs, ri = _walk(shape.right, world, leaves, csgs, depth + 1)
        node.left_leaves = ls
        node.right_leaves = rs
        node.left_direct = li
        # A CSG's includes() only matches its *direct* children: a leaf is
        # "included" only if the child itself is that leaf.
        direct = []
        if shape.left is not None and shape.left.kind not in ("group", "csg") and ls:
            direct.extend(ls)
        if shape.right is not None and shape.right.kind not in ("group", "csg") and rs:
            direct.extend(rs)
        return ls + rs, direct
    # Primitive leaf.
    leaf = _Leaf(shape, world, shape.material or Material())
    leaves.append(leaf)
    return [leaf], [leaf]


def _spread_bits(v: np.ndarray) -> np.ndarray:
    """Spread 10-bit ints so bits land every 3 positions (Morton)."""
    v = v.astype(np.uint64)
    v = (v | (v << 16)) & np.uint64(0x030000FF)
    v = (v | (v << 8)) & np.uint64(0x0300F00F)
    v = (v | (v << 4)) & np.uint64(0x030C30C3)
    v = (v | (v << 2)) & np.uint64(0x09249249)
    return v


def _morton_sort(tri_leaves):
    """Order triangle leaves along a Morton curve of world centroids."""
    if len(tri_leaves) < 2:
        return tri_leaves
    cents = []
    for leaf in tri_leaves:
        s = leaf.shape
        A = leaf.world[:3, :3]
        b = leaf.world[:3, 3]
        pts = [A @ np.asarray(p) + b for p in (s.p1, s.p2, s.p3)]
        cents.append(np.mean(pts, axis=0))
    cents = np.asarray(cents)
    lo = cents.min(axis=0)
    span = np.maximum(cents.max(axis=0) - lo, 1e-12)
    q = np.clip(((cents - lo) / span * 1023.0), 0, 1023).astype(np.uint32)
    code = (_spread_bits(q[:, 0]) | (_spread_bits(q[:, 1]) << np.uint64(1))
            | (_spread_bits(q[:, 2]) << np.uint64(2)))
    order = np.argsort(code, kind="stable")
    return [tri_leaves[i] for i in order]


def _compile_pattern(p: Pattern, dtype) -> PatternData:
    inv = jnp.asarray(mu.affine(mu.inverse(p.transform)), dtype)
    color = jnp.asarray(p.color if p.color is not None else np.zeros(3), dtype)
    tex = None
    if p.texture is not None:
        # 8-bit sources (PNG via the image crate is u8 — texture.rs:49-54)
        # pack RGB into one uint32 plane so sampling is ONE gather per ray
        # instead of three (TPU gathers run ~1 element/cycle; measured
        # 33 ms of the 1080p CSG-showcase frame). Unpacking reproduces the
        # exact u8/255 float values. Non-8-bit textures keep the float
        # [H,W,3] layout.
        arr = np.asarray(p.texture, np.float64)
        q = np.round(arr * 255.0)
        if (arr.ndim == 3 and arr.shape[-1] == 3
                and q.min() >= 0.0 and q.max() <= 255.0
                and np.abs(arr * 255.0 - q).max() < 1e-9):
            qi = q.astype(np.uint32)
            tex = jnp.asarray((qi[..., 0] << 16) | (qi[..., 1] << 8)
                              | qi[..., 2])
        else:
            tex = jnp.asarray(arr, dtype)
    return PatternData(
        ptype=p.ptype,
        octaves=int(p.octaves),
        inv=inv,
        color=color,
        scale=jnp.asarray(p.scale, dtype),
        persistence=jnp.asarray(p.persistence, dtype),
        texture=tex,
        a=_compile_pattern(p.a, dtype) if p.a is not None else None,
        b=_compile_pattern(p.b, dtype) if p.b is not None else None,
    )


def _compile_light(light, dtype) -> LightData:
    if isinstance(light, PointLight):
        return LightData("point", 0,
                         jnp.asarray(light.position, dtype),
                         jnp.asarray(light.intensity, dtype),
                         None, None, None)
    return LightData("area", int(light.level),
                     jnp.asarray(light.position, dtype),
                     jnp.asarray(light.intensity, dtype),
                     jnp.asarray(light.corner, dtype),
                     jnp.asarray(light.uvec, dtype),
                     jnp.asarray(light.vvec, dtype))


def compile_scene(objects, lights, dtype=None) -> SceneData:
    """Fold a host scene graph into device SoA tables."""
    dtype = dtype or default_dtype()
    leaves: list[_Leaf] = []
    csgs: list[_CsgNode] = []
    root = mu.identity()
    for obj in objects:
        if obj.hidden:
            continue
        _walk(obj, root, leaves, csgs, 0)

    P = len(leaves)
    for i, leaf in enumerate(leaves):
        leaf.prim_id = i

    # Deduplicate pattern roots by host-object identity (OBJ meshes share one
    # material across thousands of triangles).
    pattern_roots: list[Pattern] = []
    pattern_index: dict[int, int] = {}

    def pattern_id_of(p: Pattern) -> int:
        key = id(p)
        if key not in pattern_index:
            pattern_index[key] = len(pattern_roots)
            pattern_roots.append(p)
        return pattern_index[key]

    prim_inv = np.zeros((P, 3, 4))
    prim_nmat = np.zeros((P, 3, 3))
    prim_type = np.zeros(P, np.int32)
    prim_row = np.zeros(P, np.int32)
    mats = {k: np.zeros(P) for k in
            ("ambient", "diffuse", "specular", "shininess", "reflective",
             "transparency", "ior")}
    pat_ids = np.zeros(P, np.int32)

    by_type: dict[int, list[_Leaf]] = {t: [] for t in range(7)}
    for leaf in leaves:
        t = _KIND_TO_TYPE[leaf.shape.kind]
        prim_type[leaf.prim_id] = t
        prim_row[leaf.prim_id] = len(by_type[t])
        by_type[t].append(leaf)
        inv = mu.inverse(leaf.world)
        prim_inv[leaf.prim_id] = mu.affine(inv)
        prim_nmat[leaf.prim_id] = mu.normal_matrix(leaf.world)
        m = leaf.material
        mats["ambient"][leaf.prim_id] = m.ambient
        mats["diffuse"][leaf.prim_id] = m.diffuse
        mats["specular"][leaf.prim_id] = m.specular
        mats["shininess"][leaf.prim_id] = m.shininess
        mats["reflective"][leaf.prim_id] = m.reflective
        mats["transparency"][leaf.prim_id] = m.transparency
        mats["ior"][leaf.prim_id] = m.refractive_index
        pat_ids[leaf.prim_id] = pattern_id_of(m.pattern)

    def type_table(t):
        group = by_type[t]
        inv = np.stack([prim_inv[l.prim_id] for l in group]) if group else np.zeros((0, 3, 4))
        ids = np.array([l.prim_id for l in group], np.int32)
        return jnp.asarray(inv, dtype), jnp.asarray(ids)

    sph_inv, sph_prim = type_table(SPHERE)
    pla_inv, pla_prim = type_table(PLANE)
    cub_inv, cub_prim = type_table(CUBE)
    cyl_inv, cyl_prim = type_table(CYLINDER)
    con_inv, con_prim = type_table(CONE)
    tor_inv, tor_prim = type_table(TORUS)

    cyl = by_type[CYLINDER]
    con = by_type[CONE]
    tor = by_type[TORUS]
    cyl_min = jnp.asarray(np.array([l.shape.minimum for l in cyl]), dtype)
    cyl_max = jnp.asarray(np.array([l.shape.maximum for l in cyl]), dtype)
    cyl_closed = jnp.asarray(np.array([l.shape.closed for l in cyl], bool))
    con_min = jnp.asarray(np.array([l.shape.minimum for l in con]), dtype)
    con_max = jnp.asarray(np.array([l.shape.maximum for l in con]), dtype)
    con_closed = jnp.asarray(np.array([l.shape.closed for l in con], bool))
    tor_r = jnp.asarray(np.array([l.shape.minor_radius for l in tor]), dtype)

    # Triangles: fold transforms into world-space vertices. t/u/v are
    # invariant; vertex normals ride the inverse-transpose unnormalized so
    # the smooth interpolation (smooth_triangle.rs:99-101) stays exact.
    # Leaves are Morton-ordered by world centroid so chunk AABBs (the
    # TPU-side replacement for the reference's per-group AABB gate,
    # group.rs:80-91) stay tight.
    by_type[TRIANGLE] = _morton_sort(by_type[TRIANGLE])
    for row, leaf in enumerate(by_type[TRIANGLE]):
        prim_row[leaf.prim_id] = row
    tris = by_type[TRIANGLE]
    T = len(tris)
    tp1 = np.zeros((T, 3))
    te1 = np.zeros((T, 3))
    te2 = np.zeros((T, 3))
    tnf = np.zeros((T, 3))
    tn1 = np.zeros((T, 3))
    tn2 = np.zeros((T, 3))
    tn3 = np.zeros((T, 3))
    tsm = np.zeros(T, bool)
    for i, leaf in enumerate(tris):
        s = leaf.shape
        A = leaf.world[:3, :3]
        b = leaf.world[:3, 3]
        p1w, p2w, p3w = (A @ np.asarray(p) + b for p in (s.p1, s.p2, s.p3))
        e1, e2 = p2w - p1w, p3w - p1w
        tp1[i], te1[i], te2[i] = p1w, e1, e2
        # Flat normal e2 x e1 (triangle.rs:55); any det<0 sign flip is
        # cancelled by the eye-facing flip in prepare_computations.
        n = np.cross(e2, e1)
        norm = np.linalg.norm(n)
        tnf[i] = n / norm if norm > 0 else n
        if s.kind == "smooth_triangle":
            tsm[i] = True
            nm = prim_nmat[leaf.prim_id]
            tn1[i], tn2[i], tn3[i] = (nm @ np.asarray(v) for v in (s.n1, s.n2, s.n3))
        else:
            tn1[i] = tn2[i] = tn3[i] = tnf[i]

    # CSG membership, innermost (deepest) first.
    csgs_sorted = sorted(csgs, key=lambda c: -c.depth)
    C = len(csgs_sorted)
    csg_side = np.zeros((C, max(P, 1)), np.int32)
    csg_ops = []
    for ci, node in enumerate(csgs_sorted):
        csg_ops.append(node.op)
        left_inc = {id(l) for l in node.left_direct}
        for leaf in node.left_leaves + node.right_leaves:
            csg_side[ci, leaf.prim_id] = 1 if id(leaf) in left_inc else 2

    has_reflective = any(l.material.reflective > 0.0 for l in leaves)
    has_transparent = any(l.material.transparency > 0.0 for l in leaves)

    # Shade classes: each analytic leaf is its own class; a mesh's
    # triangles (same material object + composed transform) collapse to
    # one. All per-prim shading state is class-uniform by construction
    # (triangle vertex normals stay in the per-tri tables).
    prim_class = np.zeros(P, np.int32)
    class_index: dict = {}
    class_rep: list[_Leaf] = []
    for leaf in leaves:
        if leaf.shape.kind in ("triangle", "smooth_triangle"):
            key = ("tri", id(leaf.material), leaf.world.tobytes())
        else:
            key = ("leaf", leaf.prim_id)
        if key not in class_index:
            class_index[key] = len(class_rep)
            class_rep.append(leaf)
        prim_class[leaf.prim_id] = class_index[key]
    M = len(class_rep)
    cls_table = np.zeros((max(M, 1), CLS_COLS))
    for ci, leaf in enumerate(class_rep):
        p = leaf.prim_id
        s, m = leaf.shape, leaf.material
        cls_table[ci, CLS_INV:CLS_INV + 12] = prim_inv[p].reshape(12)
        cls_table[ci, CLS_NMAT:CLS_NMAT + 9] = prim_nmat[p].reshape(9)
        cls_table[ci, CLS_TYPE] = prim_type[p]
        cls_table[ci, CLS_PATTERN] = pat_ids[p]
        cls_table[ci, CLS_AMBIENT] = m.ambient
        cls_table[ci, CLS_DIFFUSE] = m.diffuse
        cls_table[ci, CLS_SPECULAR] = m.specular
        cls_table[ci, CLS_SHININESS] = m.shininess
        cls_table[ci, CLS_REFLECTIVE] = m.reflective
        cls_table[ci, CLS_TRANSPARENCY] = m.transparency
        cls_table[ci, CLS_IOR] = m.refractive_index
        if s.kind in ("cylinder", "cone"):
            cls_table[ci, CLS_PMIN] = s.minimum
            cls_table[ci, CLS_PMAX] = s.maximum
            cls_table[ci, CLS_CLOSED] = float(bool(s.closed))
        elif s.kind == "torus":
            cls_table[ci, CLS_TORR] = s.minor_radius

    return SceneData(
        prim_inv=jnp.asarray(prim_inv, dtype),
        prim_nmat=jnp.asarray(prim_nmat, dtype),
        prim_type=jnp.asarray(prim_type),
        prim_row=jnp.asarray(prim_row),
        mat_ambient=jnp.asarray(mats["ambient"], dtype),
        mat_diffuse=jnp.asarray(mats["diffuse"], dtype),
        mat_specular=jnp.asarray(mats["specular"], dtype),
        mat_shininess=jnp.asarray(mats["shininess"], dtype),
        mat_reflective=jnp.asarray(mats["reflective"], dtype),
        mat_transparency=jnp.asarray(mats["transparency"], dtype),
        mat_ior=jnp.asarray(mats["ior"], dtype),
        pattern_id=jnp.asarray(pat_ids),
        prim_class=jnp.asarray(prim_class),
        cls_table=jnp.asarray(cls_table, dtype),
        sph_inv=sph_inv, sph_prim=sph_prim,
        pla_inv=pla_inv, pla_prim=pla_prim,
        cub_inv=cub_inv, cub_prim=cub_prim,
        cyl_inv=cyl_inv, cyl_prim=cyl_prim,
        cyl_min=cyl_min, cyl_max=cyl_max, cyl_closed=cyl_closed,
        con_inv=con_inv, con_prim=con_prim,
        con_min=con_min, con_max=con_max, con_closed=con_closed,
        tor_inv=tor_inv, tor_prim=tor_prim, tor_r=tor_r,
        tri_p1=jnp.asarray(tp1, dtype), tri_e1=jnp.asarray(te1, dtype),
        tri_e2=jnp.asarray(te2, dtype),
        tri_n1=jnp.asarray(tn1, dtype), tri_n2=jnp.asarray(tn2, dtype),
        tri_n3=jnp.asarray(tn3, dtype), tri_smooth=jnp.asarray(tsm),
        tri_prim=jnp.asarray(np.array([l.prim_id for l in tris], np.int32)),
        tri_class=jnp.asarray(np.array([prim_class[l.prim_id] for l in tris],
                                       np.int32)),
        csg_side=jnp.asarray(csg_side),
        lights=tuple(_compile_light(l, dtype) for l in lights),
        patterns=tuple(_compile_pattern(p, dtype) for p in pattern_roots),
        csg_ops=tuple(csg_ops),
        has_reflective=has_reflective,
        has_transparent=has_transparent,
        counts=(int(sph_prim.shape[0]), int(pla_prim.shape[0]),
                int(cub_prim.shape[0]), int(cyl_prim.shape[0]),
                int(con_prim.shape[0]), int(tor_prim.shape[0]), T, P),
        prim_kinds=tuple(int(t) for t in prim_type),
        prim_rows_static=tuple(int(r) for r in prim_row),
        csg_member_static=tuple(bool(csg_side[:, p].any()) if C else False
                                for p in range(P)),
        csg_side_static=tuple(tuple(int(s) for s in row) for row in csg_side),
        n_classes=M,
        prim_class_static=tuple(int(c) for c in prim_class),
        prim_pattern_static=tuple(int(i) for i in pat_ids),
    )


def canonicalize(scene: SceneData) -> SceneData:
    """Re-derive every duplicated device tensor from its canonical source.

    The SoA layout stores the same physical quantity more than once for
    layout reasons: the per-prim world->object affines (`prim_inv`) are
    copied into per-type intersection tables (`sph_inv`..`tor_inv`) and,
    together with `prim_nmat`, the `mat_*` scalars and the cylinder/
    cone/torus extras, into the per-class shade rows (`cls_table`).
    Rendering a scene whose copies have drifted apart (e.g. after an
    optimizer step updated one table but not another) silently produces
    path-dependent images — the round-4 red test's failure mode, which
    `tri_nflat`'s removal fixed for triangle normals but which applies
    to every duplicated tensor.

    This is called at the top of every traced forward (integrator
    `_tile_eval`, `color_at`, the SPMD shard body), so:
    * forward values are bit-identical to the compile-time tables (the
      derivation is gathers/reshapes/casts only — no arithmetic);
    * gradient mass lands ONLY on the canonical leaves (`prim_inv`,
      `prim_nmat`, `mat_*`, `cyl_*`/`con_*`/`tor_r`, `tri_*`, lights,
      patterns) on every execution path — the derived copies receive
      zero cotangent because they are overwritten before use;
    * a trained scene renders identically under the kernel and XLA
      paths (train-then-render A/B in test_wavefront).
    """
    if not scene.prim_kinds:
        return scene
    dtype = scene.prim_inv.dtype
    kinds = scene.prim_kinds
    upd: dict = {}

    for name, t in (("sph_inv", SPHERE), ("pla_inv", PLANE),
                    ("cub_inv", CUBE), ("cyl_inv", CYLINDER),
                    ("con_inv", CONE), ("tor_inv", TORUS)):
        ids = np.array([i for i, k in enumerate(kinds) if k == t], np.int32)
        if ids.size:
            upd[name] = jnp.take(scene.prim_inv, jnp.asarray(ids), axis=0)

    M = scene.n_classes
    if M:
        reps: list = [None] * M
        for pid, ci in enumerate(scene.prim_class_static):
            if reps[ci] is None:
                reps[ci] = pid
        z = jnp.zeros((), dtype)
        f = lambda v: jnp.asarray(v, dtype).reshape(-1)
        rows = []
        for ci in range(M):
            pid = reps[ci]
            t = kinds[pid]
            row = scene.prim_rows_static[pid]
            if t == CYLINDER:
                pmin, pmax = scene.cyl_min[row], scene.cyl_max[row]
                closed = scene.cyl_closed[row].astype(dtype)
            elif t == CONE:
                pmin, pmax = scene.con_min[row], scene.con_max[row]
                closed = scene.con_closed[row].astype(dtype)
            else:
                pmin = pmax = closed = z
            torr = scene.tor_r[row] if t == TORUS else z
            rows.append(jnp.concatenate([
                f(scene.prim_inv[pid]), f(scene.prim_nmat[pid]),
                f(float(t) * jnp.ones((), dtype)),
                f(float(scene.prim_pattern_static[pid])
                  * jnp.ones((), dtype)),
                f(scene.mat_ambient[pid]), f(scene.mat_diffuse[pid]),
                f(scene.mat_specular[pid]), f(scene.mat_shininess[pid]),
                f(scene.mat_reflective[pid]),
                f(scene.mat_transparency[pid]), f(scene.mat_ior[pid]),
                f(pmin), f(pmax), f(closed), f(torr)]))
        upd["cls_table"] = jnp.stack(rows)
    return dataclasses.replace(scene, **upd)


def analytic_slot_count(scene: SceneData) -> int:
    ns, npl, ncu, ncy, nco, nto, _, _ = scene.counts
    return (SLOTS_PER_TYPE[SPHERE] * ns + SLOTS_PER_TYPE[PLANE] * npl
            + SLOTS_PER_TYPE[CUBE] * ncu + SLOTS_PER_TYPE[CYLINDER] * ncy
            + SLOTS_PER_TYPE[CONE] * nco + SLOTS_PER_TYPE[TORUS] * nto)
