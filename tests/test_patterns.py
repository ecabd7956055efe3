"""Pattern oracles (material/pattern.rs:232-315 + book scenarios) evaluated
through the scene pipeline: world point -> object space -> pattern tree."""
import jax.numpy as jnp
import numpy as np

from rray_tpu import Material, Pattern, PointLight, Shape, compile_scene
from rray_tpu import mathutils as mu
from rray_tpu.render import patterns as pat

WHITE = [1.0, 1.0, 1.0]
BLACK = [0.0, 0.0, 0.0]
LIGHT = PointLight(np.zeros(3), np.ones(3))


def color_at_object(shape, world_pt):
    scene = compile_scene([shape], [LIGHT], dtype=jnp.float64)
    pts = jnp.asarray([world_pt], jnp.float64)
    return np.asarray(pat.pattern_at_object(scene, jnp.asarray([0]), pts)[0])


def sphere_with(pattern):
    return Shape("sphere", material=Material(pattern=pattern))


def stripe():
    return Pattern("stripe", a=Pattern.solid(WHITE), b=Pattern.solid(BLACK))


class TestStripe:
    def test_constant_in_y_z_alternates_in_x(self):
        s = sphere_with(stripe())
        for p, c in [([0, 0, 0], WHITE), ([0, 1, 0], WHITE), ([0, 2, 0], WHITE),
                     ([0, 0, 1], WHITE), ([0, 0, 2], WHITE),
                     ([0.9, 0, 0], WHITE), ([-0.1, 0, 0], BLACK),
                     ([-1, 0, 0], BLACK), ([-1.1, 0, 0], WHITE)]:
            np.testing.assert_allclose(color_at_object(s, p), c, err_msg=str(p))

    def test_with_object_transform(self):
        s = Shape("sphere", transform=mu.scale(2, 2, 2),
                  material=Material(pattern=stripe()))
        np.testing.assert_allclose(color_at_object(s, [1.5, 0, 0]), WHITE)

    def test_with_pattern_transform(self):
        p = stripe()
        p.transform = mu.scale(2, 2, 2)
        np.testing.assert_allclose(color_at_object(sphere_with(p), [1.5, 0, 0]),
                                   WHITE)

    def test_with_both_transforms(self):
        p = stripe()
        p.transform = mu.translate(0.5, 0, 0)
        s = Shape("sphere", transform=mu.scale(2, 2, 2),
                  material=Material(pattern=p))
        np.testing.assert_allclose(color_at_object(s, [2.5, 0, 0]), WHITE)


class TestOtherPatterns:
    def test_gradient(self):
        p = Pattern("gradient", a=Pattern.solid(WHITE), b=Pattern.solid(BLACK))
        s = sphere_with(p)
        np.testing.assert_allclose(color_at_object(s, [0, 0, 0]), WHITE)
        np.testing.assert_allclose(color_at_object(s, [0.25, 0, 0]), [0.75] * 3)
        np.testing.assert_allclose(color_at_object(s, [0.5, 0, 0]), [0.5] * 3)
        np.testing.assert_allclose(color_at_object(s, [0.75, 0, 0]), [0.25] * 3)

    def test_ring(self):
        p = Pattern("ring", a=Pattern.solid(WHITE), b=Pattern.solid(BLACK))
        s = sphere_with(p)
        np.testing.assert_allclose(color_at_object(s, [0, 0, 0]), WHITE)
        np.testing.assert_allclose(color_at_object(s, [1, 0, 0]), BLACK)
        np.testing.assert_allclose(color_at_object(s, [0, 0, 1]), BLACK)
        np.testing.assert_allclose(color_at_object(s, [0.708, 0, 0.708]), BLACK)

    def test_checker(self):
        p = Pattern("checker", a=Pattern.solid(WHITE), b=Pattern.solid(BLACK))
        s = sphere_with(p)
        for pt, c in [([0, 0, 0], WHITE), ([0.99, 0, 0], WHITE),
                      ([1.01, 0, 0], BLACK), ([0, 0.99, 0], WHITE),
                      ([0, 1.01, 0], BLACK), ([0, 0, 0.99], WHITE),
                      ([0, 0, 1.01], BLACK)]:
            np.testing.assert_allclose(color_at_object(s, pt), c, err_msg=str(pt))

    def test_blend(self):
        p = Pattern("blend", a=Pattern.solid([1.0, 0.0, 0.0]),
                    b=Pattern.solid([0.0, 1.0, 0.0]), scale=0.5)
        np.testing.assert_allclose(color_at_object(sphere_with(p), [0, 0, 0]),
                                   [0.5, 0.5, 0.0])

    def test_test_pattern_returns_point(self):
        s = sphere_with(Pattern("test"))
        np.testing.assert_allclose(color_at_object(s, [0.3, 0.4, 0.5]),
                                   [0.3, 0.4, 0.5], atol=1e-12)

    def test_nested_sub_patterns(self):
        inner = Pattern("stripe", a=Pattern.solid(WHITE), b=Pattern.solid(BLACK))
        p = Pattern("checker", a=inner, b=Pattern.solid([0.5, 0.5, 0.5]))
        s = sphere_with(p)
        np.testing.assert_allclose(color_at_object(s, [0.2, 0, 0]), WHITE)
        np.testing.assert_allclose(color_at_object(s, [1.2, 0, 0]), [0.5] * 3)

    def test_unknown_defaults_to_black_via_loader(self):
        from rray_tpu.io.yaml_loader import create_pattern
        p = create_pattern({"type": "bogus"}, ".")
        assert p.ptype == "solid"
        np.testing.assert_allclose(p.color, BLACK)


class TestImagePattern:
    def test_texture_sampling_v_flip(self):
        # 2x2 texture: top row red/green, bottom row blue/white.
        tex = np.array([[[1, 0, 0], [0, 1, 0]],
                        [[0, 0, 1], [1, 1, 1]]], np.float64)
        p = Pattern("image", texture=tex)
        s = Shape("plane", material=Material(pattern=p))
        # plane uv = (frac(x), frac(z)); v=0 samples the BOTTOM row
        # (texture.rs:41-42).
        np.testing.assert_allclose(color_at_object(s, [0.1, 0, 0.1]), [0, 0, 1])
        np.testing.assert_allclose(color_at_object(s, [0.9, 0, 0.1]), [1, 1, 1])
        np.testing.assert_allclose(color_at_object(s, [0.1, 0, 0.9]), [1, 0, 0])
        np.testing.assert_allclose(color_at_object(s, [0.9, 0, 0.9]), [0, 1, 0])


class TestNoise:
    def test_deterministic_and_bounded(self):
        from rray_tpu.ops import noise
        x = jnp.linspace(-50.0, 50.0, 101, dtype=jnp.float64)
        a = np.asarray(noise.octave_perlin(x, x * 0.5, x * 0.25, 3, 0.5))
        b = np.asarray(noise.octave_perlin(x, x * 0.5, x * 0.25, 3, 0.5))
        np.testing.assert_array_equal(a, b)
        assert np.all(np.abs(a) <= 1.0)
        assert np.std(a) > 1e-4  # actually varies

    def test_value_pins(self):
        """Pinned get_noise_3d/octave_perlin values (seed 1337, freq 0.01
        — noise.rs:5-9 defaults).

        The fastnoise-lite crate can't run in this environment, so these
        are regression pins of this reimplementation, cross-validated
        end-to-end by the noise/perturbed golden renders in
        test_golden.py, which match the reference's own PNGs to mean
        0.13/0.29 per 255 — i.e. the sampled noise field is
        indistinguishable from the crate's at 8-bit output precision."""
        from rray_tpu.ops import noise
        pins = [
            (0.0, 0.0, 0.0, 0.000000000000),
            (1.0, 2.0, 3.0, 0.009481118523),
            (-1.5, 0.25, 7.75, 0.068365374845),
            (10.0, -10.0, 5.5, 0.138653422577),
            (100.0, 200.0, -300.0, 0.000000000000),  # lattice point
            (0.1, 0.2, 0.3, 0.000964739643),
            (-0.7, -0.8, -0.9, -0.000966498660),
            (55.5, -12.25, 3.125, 0.141673246815),
            (1234.5, -678.9, 42.0, -0.101801542675),
            (-0.01, 0.02, -0.03, -0.000482460620),
            (3.14159, 2.71828, 1.41421, -0.012419348232),
            (8.0, 8.0, 8.0, 0.000652994130),
            (-64.0, 32.0, -16.0, -0.036618025704),
            (0.5, 0.5, 0.5, 0.000000011968),
            (7.7, 7.7, 7.7, 0.000565989104),
            (-1000.0, 1000.0, 0.0, 0.000000000000),  # lattice point
            (250.0, 0.0, -250.0, -0.241230353713),
            (12.34, 56.78, -90.12, 0.124675092162),
            (0.001, 0.002, 0.003, 0.000009649214),
            (40.0, -0.5, 2.0, 0.024113911421),
        ]
        xs = jnp.asarray([p[0] for p in pins], jnp.float64)
        ys = jnp.asarray([p[1] for p in pins], jnp.float64)
        zs = jnp.asarray([p[2] for p in pins], jnp.float64)
        want = np.asarray([p[3] for p in pins])
        got = np.asarray(noise.get_noise_3d(xs, ys, zs))
        np.testing.assert_allclose(got, want, atol=1e-9)
        oct_pins = [
            (1.0, 2.0, 3.0, 3, 3.0, 0.025944478534),
            (10.0, -5.0, 2.5, 4, 0.5, 0.137764000744),
            (0.3, 0.6, 0.9, 1, 0.5, 0.002889940156),
        ]
        for x, y, z, o, p, w in oct_pins:
            got = float(noise.octave_perlin(jnp.float64(x), jnp.float64(y),
                                            jnp.float64(z), o, p))
            assert abs(got - w) < 1e-9, (x, y, z, got, w)

    def test_perturbed_moves_point(self):
        p = Pattern("perturbed", a=Pattern("test"), scale=0.2, octaves=3,
                    persistence=0.5)
        s = sphere_with(p)
        out = color_at_object(s, [1.7, 2.3, 0.9])
        # Displaced test-pattern output differs from the raw point but
        # stays within `scale` of it.
        assert np.all(np.abs(out - [1.7, 2.3, 0.9]) <= 0.2 + 1e-9)
        assert np.any(np.abs(out - [1.7, 2.3, 0.9]) > 1e-6)


class TestUV:
    def test_sphere_uv(self):
        from rray_tpu.ops import normals as nrm
        scene = compile_scene([Shape("sphere")], [LIGHT], dtype=jnp.float64)
        pts = jnp.asarray([[0, 0, -1], [1, 0, 0], [0, 1, 0]], jnp.float64)
        u, v = nrm.uv_at(scene, jnp.asarray([0, 0, 0]), pts)
        np.testing.assert_allclose(np.asarray(u), [0.25, 0.5, 0.5], atol=1e-9)
        np.testing.assert_allclose(np.asarray(v), [0.5, 0.5, 1.0], atol=1e-9)

    def test_plane_uv_wraps_negative(self):
        from rray_tpu.ops import normals as nrm
        scene = compile_scene([Shape("plane")], [LIGHT], dtype=jnp.float64)
        pts = jnp.asarray([[-0.25, 0, -1.75]], jnp.float64)
        u, v = nrm.uv_at(scene, jnp.asarray([0]), pts)
        assert abs(float(u[0]) - 0.75) < 1e-9
        assert abs(float(v[0]) - 0.25) < 1e-9

    @staticmethod
    def _both_uv(shape, pts):
        """uv from the AoS oracle AND the SoA path; asserts they agree."""
        from rray_tpu.ops import normals as nrm
        from rray_tpu.ops.soa import Hit
        from rray_tpu.render import shade_soa
        from rray_tpu.ops.vec import V3

        scene = compile_scene([shape], [LIGHT], dtype=jnp.float64)
        pts = jnp.asarray(pts, jnp.float64)
        R = pts.shape[0]
        prim = jnp.zeros((R,), jnp.int32)
        u1, v1 = nrm.uv_at(scene, prim, pts)
        zero = jnp.zeros((R,), jnp.float64)
        hit = Hit(found=jnp.ones((R,), bool), t=zero, prim=prim,
                  u=zero, v=zero, tri=prim)
        u2, v2 = shade_soa.uv_at(
            scene, hit, V3(pts[:, 0], pts[:, 1], pts[:, 2]))
        np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-12)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-12)
        return np.asarray(u1), np.asarray(v1)

    def test_cube_uv_faces(self):
        """All six faces (cube.rs:132-174): oracle points per face."""
        pts = [
            [1.0, 0.5, -0.8],    # right: u=(z+1)/2, v=(y+1)/2
            [-1.0, 0.3, 0.4],    # left:  u=(1-z)/2, v=(y+1)/2
            [0.2, 1.0, -0.6],    # top:   u=(x+1)/2, v=(1-z)/2
            [0.2, -1.0, -0.6],   # bottom:u=(x+1)/2, v=(z+1)/2
            [-0.4, 0.9, 1.0],    # front: u=(x+1)/2, v=(y+1)/2
            [-0.4, 0.9, -1.0],   # back:  u=(1-x)/2, v=(y+1)/2
        ]
        u, v = self._both_uv(Shape("cube"), pts)
        want_u = [0.1, 0.3, 0.6, 0.6, 0.3, 0.7]
        want_v = [0.75, 0.65, 0.8, 0.2, 0.95, 0.95]
        np.testing.assert_allclose(u, want_u, atol=1e-12)
        np.testing.assert_allclose(v, want_v, atol=1e-12)

    def test_cylinder_uv_side_and_caps(self):
        """Side: u=(atan2(z,x)+pi)/2pi, v=y mod 1; caps (closed &&
        y<=min||y>=max): u=(x+1)/2, v=(z+1)/2 (cylinder.rs:181-196)."""
        s = Shape("cylinder")
        s.minimum, s.maximum, s.closed = 0.0, 2.0, True
        pts = [
            [1.0, 1.0, 0.0],     # side at theta=0 -> u=0.5, v=0
            [0.0, 1.25, -1.0],   # side at theta=-pi/2 -> u=0.25, v=0.25
            [0.5, 2.0, -0.5],    # top cap -> u=0.75, v=0.25
            [-0.5, 0.0, 0.5],    # bottom cap -> u=0.25, v=0.75
            [1.0, -0.75, 0.0],   # side below min but NOT <=min? y=-0.75<=0
        ]
        u, v = self._both_uv(s, pts)
        np.testing.assert_allclose(u[:4], [0.5, 0.25, 0.75, 0.25], atol=1e-12)
        np.testing.assert_allclose(v[:4], [0.0, 0.25, 0.25, 0.75], atol=1e-12)
        # y=-0.75 <= minimum on a closed cylinder -> cap mapping.
        np.testing.assert_allclose(u[4], 1.0, atol=1e-12)
        np.testing.assert_allclose(v[4], 0.5, atol=1e-12)

    def test_cylinder_uv_open_no_caps(self):
        """closed=false never takes the cap branch, and v wraps
        negatives to [0,1) like the reference's % fixup."""
        s = Shape("cylinder")
        s.minimum, s.maximum, s.closed = -1.0, 1.0, False
        pts = [[0.0, -1.25, 1.0]]  # below min, open -> side mapping
        u, v = self._both_uv(s, pts)
        np.testing.assert_allclose(u[0], 0.75, atol=1e-12)   # theta=pi/2
        np.testing.assert_allclose(v[0], 0.75, atol=1e-12)   # -1.25 mod 1

    def test_cone_uv_side_and_caps(self):
        """Side: u=(y-min)/height, v=(atan2(z,x)+pi)/2pi — note the
        reference returns (height, angle), NOT (angle, height). Caps
        (|y-min|<=EPS or |y-max|<=EPS): u=(x/|y|+1)/2, v=(z/|y|+1)/2
        (cone.rs:232-255)."""
        s = Shape("cone")
        s.minimum, s.maximum, s.closed = -2.0, -0.5, True
        pts = [
            [1.0, -1.0, 0.0],     # side: u=(-1+2)/1.5=2/3, v=0.5
            [0.0, -1.25, 1.25],   # side: u=0.5, v=(pi/2+pi)/2pi=0.75
            [1.0, -2.0, 1.0],     # bottom cap: u=(1/2+1)/2=0.75, v=0.75
            [-0.25, -0.5, 0.25],  # top cap: u=(−0.5+1)/2=0.25, v=0.75
        ]
        u, v = self._both_uv(s, pts)
        np.testing.assert_allclose(
            u, [2.0 / 3.0, 0.5, 0.75, 0.25], atol=1e-12)
        np.testing.assert_allclose(v, [0.5, 0.75, 0.75, 0.75], atol=1e-12)
