"""Table-driven geometry oracles from the reference's inline tests
(cube.rs:196-284, cylinder.rs, cone.rs, triangle.rs, smooth_triangle.rs,
torus.rs, group.rs, csg.rs) — renderer-independent math facts."""
import jax.numpy as jnp
import numpy as np
import pytest

from rray_tpu import (Material, Pattern, PointLight, RenderSettings, Shape,
                      compile_scene)
from rray_tpu import mathutils as mu
from rray_tpu.ops import hits as hits_mod
from rray_tpu.ops import normals as nrm

SET = RenderSettings()
LIGHT = PointLight(np.zeros(3), np.ones(3))


def one_shape_scene(shape):
    return compile_scene([shape], [LIGHT], dtype=jnp.float64)


def ts_of(scene, origin, direction):
    ro = jnp.asarray([origin], jnp.float64)
    rd = jnp.asarray([direction], jnp.float64)
    slots = hits_mod.gather_sorted_hits(scene, ro, rd, SET)
    t = np.asarray(slots.t[0])[np.asarray(slots.valid[0])]
    return t[np.isfinite(t)]


def normal_of(scene, world_pt, prim=0, u=0.0, v=0.0):
    n = nrm.normal_at(scene, jnp.asarray([prim]),
                      jnp.asarray([u], jnp.float64),
                      jnp.asarray([v], jnp.float64),
                      jnp.asarray([world_pt], jnp.float64))
    return np.asarray(n[0])


def norm(v):
    v = np.asarray(v, np.float64)
    return v / np.linalg.norm(v)


class TestSphereNormals:
    def test_axis_and_nonaxial(self):
        scene = one_shape_scene(Shape("sphere"))
        np.testing.assert_allclose(normal_of(scene, [1, 0, 0]), [1, 0, 0], atol=1e-12)
        s3 = np.sqrt(3) / 3
        np.testing.assert_allclose(normal_of(scene, [s3, s3, s3]),
                                   [s3, s3, s3], atol=1e-12)

    def test_translated(self):
        scene = one_shape_scene(Shape("sphere", transform=mu.translate(0, 1, 0)))
        np.testing.assert_allclose(normal_of(scene, [0, 1.70711, -0.70711]),
                                   [0, 0.70711, -0.70711], atol=1e-5)

    def test_transformed(self):
        m = mu.scale(1, 0.5, 1) @ mu.rotate_z(np.pi / 5)
        scene = one_shape_scene(Shape("sphere", transform=m))
        r2 = np.sqrt(2) / 2
        np.testing.assert_allclose(normal_of(scene, [0, r2, -r2]),
                                   [0, 0.97014, -0.24254], atol=1e-5)


class TestPlane:
    def test_intersect_above_below(self):
        scene = one_shape_scene(Shape("plane"))
        np.testing.assert_allclose(ts_of(scene, [0, 1, 0], [0, -1, 0]), [1.0])
        np.testing.assert_allclose(ts_of(scene, [0, -1, 0], [0, 1, 0]), [1.0])
        assert ts_of(scene, [0, 10, 0], [0, 0, 1]).size == 0  # parallel
        assert ts_of(scene, [0, 0, 0], [0, 0, 1]).size == 0   # coplanar


CUBE_HITS = [
    ([5, 0.5, 0], [-1, 0, 0], 4, 6),
    ([-5, 0.5, 0], [1, 0, 0], 4, 6),
    ([0.5, 5, 0], [0, -1, 0], 4, 6),
    ([0.5, -5, 0], [0, 1, 0], 4, 6),
    ([0.5, 0, 5], [0, 0, -1], 4, 6),
    ([0.5, 0, -5], [0, 0, 1], 4, 6),
    ([0, 0.5, 0], [0, 0, 1], -1, 1),
]
CUBE_MISSES = [
    ([-2, 0, 0], [0.2673, 0.5345, 0.8018]),
    ([0, -2, 0], [0.8018, 0.2673, 0.5345]),
    ([0, 0, -2], [0.5345, 0.8018, 0.2673]),
    ([2, 0, 2], [0, 0, -1]),
    ([0, 2, 2], [0, -1, 0]),
    ([2, 2, 0], [-1, 0, 0]),
]
CUBE_NORMALS = [
    ([1, 0.5, -0.8], [1, 0, 0]),
    ([-1, -0.2, 0.9], [-1, 0, 0]),
    ([-0.4, 1, -0.1], [0, 1, 0]),
    ([0.3, -1, -0.7], [0, -1, 0]),
    ([-0.6, 0.3, 1], [0, 0, 1]),
    # Ties go to x: local_normal_at checks the x axis first (cube.rs:79-88).
    ([0.4, 0.4, -0.4], [1, 0, 0]),
    ([1, 1, 1], [1, 0, 0]),
    ([-1, -1, -1], [-1, 0, 0]),
]


class TestCube:
    def test_hits(self):
        scene = one_shape_scene(Shape("cube"))
        for origin, direction, t1, t2 in CUBE_HITS:
            np.testing.assert_allclose(ts_of(scene, origin, direction),
                                       [t1, t2], atol=1e-9, err_msg=str(origin))

    def test_misses(self):
        scene = one_shape_scene(Shape("cube"))
        for origin, direction in CUBE_MISSES:
            assert ts_of(scene, origin, direction).size == 0, origin

    def test_normals(self):
        scene = one_shape_scene(Shape("cube"))
        for point, n in CUBE_NORMALS:
            np.testing.assert_allclose(normal_of(scene, point), n,
                                       atol=1e-9, err_msg=str(point))


class TestCylinder:
    def test_misses(self):
        scene = one_shape_scene(Shape("cylinder"))
        for origin, direction in [([1, 0, 0], [0, 1, 0]),
                                  ([0, 0, 0], [0, 1, 0]),
                                  ([0, 0, -5], norm([1, 1, 1]))]:
            assert ts_of(scene, origin, direction).size == 0, origin

    def test_hits(self):
        scene = one_shape_scene(Shape("cylinder"))
        np.testing.assert_allclose(ts_of(scene, [1, 0, -5], [0, 0, 1]),
                                   [5, 5], atol=1e-9)
        np.testing.assert_allclose(ts_of(scene, [0, 0, -5], [0, 0, 1]),
                                   [4, 6], atol=1e-9)
        np.testing.assert_allclose(
            ts_of(scene, [0.5, 0, -5], norm([0.1, 1, 1])),
            [6.80798, 7.08872], atol=1e-5)

    def test_truncated(self):
        scene = one_shape_scene(Shape("cylinder", minimum=1.0, maximum=2.0))
        cases = [([0, 1.5, 0], [0.1, 1, 0], 0), ([0, 3, -5], [0, 0, 1], 0),
                 ([0, 0, -5], [0, 0, 1], 0), ([0, 2, -5], [0, 0, 1], 0),
                 ([0, 1, -5], [0, 0, 1], 0), ([0, 1.5, -2], [0, 0, 1], 2)]
        for origin, direction, count in cases:
            assert ts_of(scene, origin, norm(direction)).size == count, origin

    def test_capped(self):
        scene = one_shape_scene(Shape("cylinder", minimum=1.0, maximum=2.0,
                                      closed=True))
        cases = [([0, 3, 0], [0, -1, 0], 2), ([0, 3, -2], [0, -1, 2], 2),
                 ([0, 4, -2], [0, -1, 1], 2), ([0, 0, -2], [0, 1, 2], 2),
                 ([0, -1, -2], [0, 1, 1], 2)]
        for origin, direction, count in cases:
            assert ts_of(scene, origin, norm(direction)).size == count, origin

    def test_normals(self):
        scene = one_shape_scene(Shape("cylinder"))
        for point, n in [([1, 0, 0], [1, 0, 0]), ([0, 5, -1], [0, 0, -1]),
                         ([0, -2, 1], [0, 0, 1]), ([-1, 1, 0], [-1, 0, 0])]:
            np.testing.assert_allclose(normal_of(scene, point), n, atol=1e-9)

    def test_cap_normals(self):
        scene = one_shape_scene(Shape("cylinder", minimum=1.0, maximum=2.0,
                                      closed=True))
        for point, n in [([0, 1, 0], [0, -1, 0]), ([0.5, 1, 0], [0, -1, 0]),
                         ([0, 1, 0.5], [0, -1, 0]), ([0, 2, 0], [0, 1, 0]),
                         ([0.5, 2, 0], [0, 1, 0]), ([0, 2, 0.5], [0, 1, 0])]:
            np.testing.assert_allclose(normal_of(scene, point), n, atol=1e-9)


class TestCone:
    def test_hits(self):
        scene = one_shape_scene(Shape("cone"))
        np.testing.assert_allclose(ts_of(scene, [0, 0, -5], [0, 0, 1]),
                                   [5, 5], atol=1e-9)
        np.testing.assert_allclose(ts_of(scene, [0, 0, -5], norm([1, 1, 1])),
                                   [8.66025, 8.66025], atol=1e-5)
        np.testing.assert_allclose(
            ts_of(scene, [1, 1, -5], norm([-0.5, -1, 1])),
            [4.55006, 49.44994], atol=1e-5)

    def test_parallel_to_half(self):
        scene = one_shape_scene(Shape("cone"))
        ts = ts_of(scene, [0, 0, -1], norm([0, 1, 1]))
        np.testing.assert_allclose(ts, [0.35355], atol=1e-5)

    def test_caps(self):
        scene = one_shape_scene(Shape("cone", minimum=-0.5, maximum=0.5,
                                      closed=True))
        # The book expects 2 hits for the ([0,0,-0.25], [0,1,1]) ray, but
        # the reference's linear-case early return (cone.rs:134-141) skips
        # the caps when the linear hit is in y-range -> 1 hit; we match the
        # reference.
        cases = [([0, 0, -5], [0, 1, 0], 0), ([0, 0, -0.25], [0, 1, 1], 1),
                 ([0, 0, -0.25], [0, 1, 0], 4)]
        for origin, direction, count in cases:
            assert ts_of(scene, origin, norm(direction)).size == count, origin

    def test_normals(self):
        # Local normals (cone.rs:168-187) checked through the identity
        # transform; (0,0,0) normalizes to zero-guarded output so skip it.
        scene = one_shape_scene(Shape("cone"))
        r2 = np.sqrt(2.0)
        np.testing.assert_allclose(normal_of(scene, [1, 1, 1]),
                                   norm([1, -r2, 1]), atol=1e-9)
        np.testing.assert_allclose(normal_of(scene, [-1, -1, 0]),
                                   norm([-1, 1, 0]), atol=1e-9)


class TestTorus:
    def test_four_hits_along_x(self):
        scene = one_shape_scene(Shape("torus", minor_radius=0.25))
        np.testing.assert_allclose(ts_of(scene, [-5, 0, 0], [1, 0, 0]),
                                   [3.75, 4.25, 5.75, 6.25], atol=1e-6)

    def test_two_hits_through_tube(self):
        scene = one_shape_scene(Shape("torus", minor_radius=0.25))
        np.testing.assert_allclose(ts_of(scene, [1, 0, -5], [0, 0, 1]),
                                   [4.75, 5.25], atol=1e-6)

    def test_through_hole(self):
        scene = one_shape_scene(Shape("torus", minor_radius=0.25))
        assert ts_of(scene, [0, 0, -5], [0, 0, 1]).size == 0

    def test_only_positive_roots(self):
        # torus.rs:62-90 keeps only t > 0 — from inside the tube, the
        # behind-the-origin roots must not appear.
        scene = one_shape_scene(Shape("torus", minor_radius=0.25))
        ts = ts_of(scene, [1, 0, 0], [0, 0, 1])
        np.testing.assert_allclose(ts, [0.25], atol=1e-6)

    def test_normal(self):
        scene = one_shape_scene(Shape("torus", minor_radius=0.25))
        np.testing.assert_allclose(normal_of(scene, [1.25, 0, 0]),
                                   [1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(normal_of(scene, [1, 0, 0.25]),
                                   [0, 0, 1], atol=1e-6)


class TestTriangles:
    def tri(self, kind="triangle", **kw):
        return Shape(kind, p1=np.array([0.0, 1.0, 0.0]),
                     p2=np.array([-1.0, 0.0, 0.0]),
                     p3=np.array([1.0, 0.0, 0.0]), **kw)

    def test_misses(self):
        scene = one_shape_scene(self.tri())
        for origin, direction in [([0, -1, -2], [0, 1, 0]),
                                  ([1, 1, -2], [0, 0, 1]),
                                  ([-1, 1, -2], [0, 0, 1]),
                                  ([0, -1, -2], [0, 0, 1])]:
            assert ts_of(scene, origin, direction).size == 0, origin

    def test_hit(self):
        scene = one_shape_scene(self.tri())
        np.testing.assert_allclose(ts_of(scene, [0, 0.5, -2], [0, 0, 1]),
                                   [2.0], atol=1e-9)

    def test_smooth_uv_and_normal(self):
        # smooth_triangle.rs:280-317: u=0.45, v=0.25, interpolated normal.
        s = self.tri("smooth_triangle", n1=np.array([0.0, 1.0, 0.0]),
                     n2=np.array([-1.0, 0.0, 0.0]), n3=np.array([1.0, 0.0, 0.0]))
        scene = one_shape_scene(s)
        ro = jnp.asarray([[-0.2, 0.3, -2.0]], jnp.float64)
        rd = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float64)
        slots = hits_mod.gather_sorted_hits(scene, ro, rd, SET)
        found, _, t, prim, u, v = hits_mod.select_hit(slots)
        assert bool(found[0])
        assert abs(float(u[0]) - 0.45) < 1e-9
        assert abs(float(v[0]) - 0.25) < 1e-9
        n = normal_of(scene, [-0.2, 0.3, -2.0], u=0.45, v=0.25)
        np.testing.assert_allclose(n, [-0.5547, 0.83205, 0], atol=1e-5)


class TestGroups:
    def test_group_intersections_sorted(self):
        # group.rs: s1 at origin, s2 at z=-3, s3 at x=5; ray hits s2 then s1.
        s1 = Shape("sphere")
        s2 = Shape("sphere", transform=mu.translate(0, 0, -3))
        s3 = Shape("sphere", transform=mu.translate(5, 0, 0))
        g = Shape("group", children=(s1, s2, s3))
        scene = one_shape_scene(g)
        ts = ts_of(scene, [0, 0, -5], [0, 0, 1])
        np.testing.assert_allclose(ts, [1, 3, 4, 6], atol=1e-9)

    def test_transformed_group(self):
        g = Shape("group", transform=mu.scale(2, 2, 2),
                  children=(Shape("sphere", transform=mu.translate(5, 0, 0)),))
        scene = one_shape_scene(g)
        assert ts_of(scene, [10, 0, -10], [0, 0, 1]).size == 2

    def test_normal_through_group_chain(self):
        # object.rs:129-138 oracle via composed fold.
        inner = Shape("group", transform=mu.scale(1, 2, 3),
                      children=(Shape("sphere", transform=mu.translate(5, 0, 0)),))
        outer = Shape("group", transform=mu.rotate_y(np.pi / 2),
                      children=(inner,))
        scene = one_shape_scene(outer)
        n = normal_of(scene, [1.7321, 1.1547, -5.5774])
        np.testing.assert_allclose(n, [0.2857, 0.4286, -0.8571], atol=1e-4)

    def test_hidden_children_skipped(self):
        s1 = Shape("sphere")
        s2 = Shape("sphere", transform=mu.translate(0, 0, -3), hidden=True)
        scene = one_shape_scene(Shape("group", children=(s1, s2)))
        np.testing.assert_allclose(ts_of(scene, [0, 0, -5], [0, 0, 1]),
                                   [4, 6], atol=1e-9)


class TestCSG:
    def csg_scene(self, op):
        s1 = Shape("sphere")
        s2 = Shape("sphere", transform=mu.translate(0, 0, 0.5))
        return compile_scene([Shape("csg", operation=op, left=s1, right=s2)],
                             [LIGHT], dtype=jnp.float64)

    def test_union_filters(self):
        # csg.rs local_intersect oracle: keep s1-entry (t=4) + s2-exit (t=6.5).
        scene = self.csg_scene("union")
        np.testing.assert_allclose(ts_of(scene, [0, 0, -5], [0, 0, 1]),
                                   [4, 6.5], atol=1e-9)

    def test_intersection_filters(self):
        scene = self.csg_scene("intersection")
        np.testing.assert_allclose(ts_of(scene, [0, 0, -5], [0, 0, 1]),
                                   [4.5, 6.0], atol=1e-9)

    def test_difference_filters(self):
        scene = self.csg_scene("difference")
        np.testing.assert_allclose(ts_of(scene, [0, 0, -5], [0, 0, 1]),
                                   [4, 4.5], atol=1e-9)

    def test_ray_misses(self):
        scene = self.csg_scene("union")
        assert ts_of(scene, [0, 2, -5], [0, 0, 1]).size == 0

    def test_difference_cube_sphere(self):
        cube = Shape("cube")
        ball = Shape("sphere", transform=mu.scale(1.2, 1.2, 1.2))
        scene = compile_scene(
            [Shape("csg", operation="difference", left=cube, right=ball)],
            [LIGHT], dtype=jnp.float64)
        # Through the face centers the sphere covers the cube: no hits.
        assert ts_of(scene, [0, 0, -5], [0, 0, 1]).size == 0
        # Near a corner the cube pokes out of the sphere.
        ts = ts_of(scene, [0.95, 0.95, -5], [0, 0, 1])
        assert ts.size == 2

    def test_nested_csg(self):
        # CSG with a group/CSG child exercises the innermost-first replay.
        inner = Shape("csg", operation="union",
                      left=Shape("sphere", transform=mu.translate(0, 0, 0.5)),
                      right=Shape("sphere", transform=mu.translate(0, 0, -0.5)))
        outer = Shape("csg", operation="difference",
                      left=Shape("sphere", transform=mu.scale(2, 2, 2)),
                      right=inner)
        scene = compile_scene([outer], [LIGHT], dtype=jnp.float64)
        ts = ts_of(scene, [0, 0, -5], [0, 0, 1])
        # Big sphere spans [3,7]; inner union spans [3.5,6.5] and is cut out.
        np.testing.assert_allclose(ts, [3.0, 3.5, 6.5, 7.0], atol=1e-9)

    def test_pairwise_filter_matches_sorted_filter(self):
        """The sort-free pairwise member filter (soa.py
        _member_slots_filtered_nosort) must reproduce the sorted
        compare-swap + scan filter exactly — fuzzed over nested CSGs and
        mixed shapes, including grazing/inside/miss rays."""
        from rray_tpu.ops import soa
        from rray_tpu.ops.vec import V3

        inner = Shape("csg", operation="intersection",
                      left=Shape("sphere", transform=mu.translate(0, 0, 0.5)),
                      right=Shape("cube", transform=mu.rotate_y(0.4)))
        outer = Shape("csg", operation="difference",
                      left=Shape("sphere", transform=mu.scale(2, 2, 2)),
                      right=inner)
        other = Shape("csg", operation="union",
                      left=Shape("cylinder", minimum=-1.0, maximum=1.0,
                                 closed=True,
                                 transform=mu.translate(3, 0, 0)),
                      right=Shape("sphere", transform=mu.translate(3, 1, 0)))
        scene = compile_scene([outer, other, Shape("plane")], [LIGHT],
                              dtype=jnp.float64)

        rng = np.random.default_rng(5)
        N = 20000
        ro = V3(*(jnp.asarray(rng.uniform(-4, 4, N)) for _ in range(3)))
        d = rng.normal(size=(3, N))
        d /= np.linalg.norm(d, axis=0)
        rd = V3(*(jnp.asarray(c) for c in d))

        ref = soa.apply_csg_soa(scene, soa.sorted_member_slots(scene, ro, rd))
        rfound, rt, rprim, _ = soa.select_hit_slots(ref)
        found, t, prim, mslots = soa.csg_filtered_member_hit(scene, ro, rd)
        np.testing.assert_array_equal(np.asarray(found), np.asarray(rfound))
        f = np.asarray(found)
        np.testing.assert_allclose(np.asarray(t)[f], np.asarray(rt)[f],
                                   rtol=1e-12)
        assert (np.asarray(prim)[f] == np.asarray(rprim)[f]).all()
        # Surviving-slot multisets match (order-free: the n1/n2 walk
        # consumes them per slot).
        mt, mprim, mvalid = mslots
        st, sprim, svalid = ref[:3]
        ref_kept = np.sort(np.where(np.asarray(svalid), np.asarray(st),
                                    np.inf), axis=0)
        new_kept = np.sort(np.where(np.asarray(mvalid), np.asarray(mt),
                                    np.inf), axis=0)
        np.testing.assert_allclose(new_kept, ref_kept, rtol=1e-12)


class TestHitSelection:
    def test_hit_rules(self):
        # intersection.rs hit(): lowest non-negative t.
        scene = one_shape_scene(Shape("sphere"))
        ro = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float64)
        rd = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float64)
        slots = hits_mod.gather_sorted_hits(scene, ro, rd, SET)
        found, _, t, _, _, _ = hits_mod.select_hit(slots)
        assert bool(found[0]) and abs(float(t[0]) - 1.0) < 1e-12
        ro = jnp.asarray([[0.0, 0.0, 5.0]], jnp.float64)
        slots = hits_mod.gather_sorted_hits(scene, ro, rd, SET)
        found, _, _, _, _, _ = hits_mod.select_hit(slots)
        assert not bool(found[0])
