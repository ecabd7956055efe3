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
