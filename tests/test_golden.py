"""Golden-image comparisons against the reference renderer's own output
PNGs (shipped alongside their YAML scenes in the reference repo's
examples/). Skipped when the reference checkout isn't available.

These run in EXACT-parity mode: f64 on CPU with the anti-aliasing level
the reference used for each PNG (objects were rendered with -a 3,
patterns with -a 1 — discovered by sweeping aa until the diff hit
zero). Measured diffs are 0/255 for every pattern scene and every
object scene except torus (stale PNG, see below); noise/perturbed hit
max 1-2/255, which pins the FastNoiseLite reimplementation bit-for-bit
at 8-bit output precision. Tolerances below are a hair above measured.
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference/examples"

CASES = [
    # (yaml, png, aa, mean_tol, frac2_tol[, row_range])
    ("objects/sphere.yaml", "objects/sphere.png", 3, 0.05, 0.0005),
    ("objects/cube.yaml", "objects/cube.png", 3, 0.05, 0.0005),
    ("objects/cylinder.yaml", "objects/cylinder.png", 3, 0.05, 0.0005),
    ("objects/cone.yaml", "objects/cone.png", 3, 0.05, 0.0005),
    # torus.png is stale vs torus.yaml in the reference repo: the YAML
    # puts the back wall at z=4 (~80 px checker cells at this camera)
    # while the PNG shows ~27 px cells (z~22, like the other scenes);
    # every other object PNG matches to 0/255 under identical settings,
    # so the renderer is not the variable. Compare only the torus +
    # near-floor region, which does match.
    ("objects/torus.yaml", "objects/torus.png", 1, 18.0, 0.30, (160, 400)),
    ("objects/triangle.yaml", "objects/triangle.png", 3, 0.05, 0.0005),
    ("patterns/stripe_pattern.yaml", "patterns/stripe_pattern.png",
     1, 0.01, 0.0002),
    ("patterns/gradient_pattern.yaml", "patterns/gradient_pattern.png",
     1, 0.01, 0.0002),
    ("patterns/ring_pattern.yaml", "patterns/ring_pattern.png",
     1, 0.01, 0.0002),
    ("patterns/checker_pattern.yaml", "patterns/checker_pattern.png",
     1, 0.01, 0.0002),
    ("patterns/blend_pattern.yaml", "patterns/blend_pattern.png",
     1, 0.01, 0.0002),
    ("patterns/noise_pattern.yaml", "patterns/noise_pattern.png",
     1, 0.01, 0.0002),
    ("patterns/perturbed_pattern.yaml", "patterns/perturbed_pattern.png",
     1, 0.01, 0.0002),
]


def available():
    return [c for c in CASES
            if os.path.exists(os.path.join(REF, c[0]))
            and os.path.exists(os.path.join(REF, c[1]))]


def _compare(yaml_path, png_path, mean_tol, frac_tol, rows=None,
             size=None, aa=1, dtype=jnp.float32, frac_gt=30):
    from PIL import Image

    from rray_tpu.api import render_scene_from_file
    from rray_tpu.render.canvas import to_u8

    ref_im = Image.open(png_path).convert("RGB")
    if size is not None:
        ref_im = ref_im.resize(size, Image.BOX)
    ref = np.asarray(ref_im, np.float64)
    h, w = ref.shape[:2]
    img = render_scene_from_file(yaml_path, w, h, "", aa=aa, dtype=dtype)
    ours = to_u8(img).astype(np.float64)
    diff = np.abs(ours - ref).max(axis=-1)
    if rows is not None:
        diff = diff[rows[0]:rows[1]]
    mean = diff.mean()
    frac = (diff > frac_gt).mean()
    assert mean <= mean_tol and frac <= frac_tol, (
        f"{yaml_path}: mean={mean:.3f} (tol {mean_tol}), "
        f"frac>{frac_gt}={frac:.4f} (tol {frac_tol}), max={diff.max()}")


@pytest.mark.parametrize("case", available(), ids=[c[0] for c in available()])
def test_golden(case):
    yaml_rel, png_rel, aa, mean_tol, frac_tol = case[:5]
    rows = case[5] if len(case) > 5 else None
    # The torus row-range case keeps the legacy >30 gate (stale PNG);
    # exact-mode cases gate on >2 so even single-bit drifts register.
    frac_gt = 30 if rows is not None else 2
    _compare(os.path.join(REF, yaml_rel), os.path.join(REF, png_rel),
             mean_tol, frac_tol, rows=rows, aa=aa, dtype=jnp.float64,
             frac_gt=frac_gt)


ROOT = "/root/reference"


@pytest.mark.skipif(not os.path.exists(os.path.join(ROOT, "example1.yaml")),
                    reason="no reference checkout")
class TestShowcaseParity:
    """The reference repo's own showcase renders — BASELINE.md's headline
    forward-parity target (example1.yaml:1-260, project_icon.yaml)."""

    def test_area_light_tolerance(self):
        """The 15th reference image: area_light.png (800x400) vs this
        renderer, in TOLERANCE mode — the reference's area sampler is
        thread_rng (light.rs:47-65), so penumbra pixels cannot match
        any deterministic sampler bit-for-bit. Sampler-dependent pixels
        are identified structurally: render twice with different SEEDS
        and mask every pixel whose LINEAR color moved (this also
        catches reflections of the penumbra — the floor is 0.8
        reflective). Outside that mask the image must match the
        reference PNG tightly; inside, the mean must stay near it
        (the level^2 jittered-grid fraction has the same
        distribution — scene.rs:181-214).

        Measured (aa=3, f32): outside mask max 27/255, mean 0.64,
        mask fraction 0.07, overall mean 0.66 — the out-of-mask
        residual is f32 recursion noise through the 0.8-reflective
        floor (B-channel matches exactly; hidden CSG/cube confirmed
        absent from the PNG: un-hiding them measured 8x worse).
        Tolerances a hair above measured."""
        import scipy.ndimage as ndi

        from rray_tpu.api import render_scene_from_file
        from rray_tpu.render.canvas import to_u8
        from PIL import Image

        png = os.path.join(REF, "area_light.png")
        yml = os.path.join(REF, "area_light.yaml")
        if not os.path.exists(png):
            pytest.skip("no reference fixture")
        ref = np.asarray(Image.open(png).convert("RGB"), np.float64)
        h, w = ref.shape[:2]
        a = render_scene_from_file(yml, w, h, "", aa=3,
                                   dtype=jnp.float32, seed=0)
        b = render_scene_from_file(yml, w, h, "", aa=3,
                                   dtype=jnp.float32, seed=1)
        sens = np.abs(np.asarray(a) - np.asarray(b)).max(axis=-1) > 1e-7
        mask = ndi.binary_dilation(sens, iterations=2)
        assert mask.mean() <= 0.12, mask.mean()  # penumbra stays local
        diff = np.abs(to_u8(a).astype(np.float64) - ref).max(axis=-1)
        out = diff[~mask]
        assert out.max() <= 40, out.max()
        assert out.mean() <= 1.0, out.mean()
        assert diff.mean() <= 1.2, diff.mean()

    def test_project_icon(self):
        """256x256 at aa=3, area light level 6 (36 jittered shadow
        samples), reflective checker floor; the CSG and cube are hidden
        at top level (scene_builder_yaml.rs:401 honors the flag there),
        so they must not be built. Measured diff: mean 0.51, frac>2
        0.068, max 27 — entirely the seeded-PRNG area sampler (vs the
        reference's thread_rng) jittering the penumbra."""
        _compare(os.path.join(ROOT, "project_icon.yaml"),
                 os.path.join(ROOT, "project_icon.png"), 1.5, 0.005,
                 aa=3, dtype=jnp.float32)

    def test_example1_quarter(self):
        """example1 (perturbed-stripe floor, blend wall, earthmap image
        plane, group of cylinder/cone/glass sphere/teapot/mirror
        triangle/CSG difference/torus) at 200x100 vs the box-downsampled
        reference PNG. Point-sampling vs box-average dominates the diff
        (measured mean 8.5); the full-resolution comparison in
        test_example1_full measures mean 3.25."""
        _compare(os.path.join(ROOT, "example1.yaml"),
                 os.path.join(ROOT, "example1.png"), 12.0, 0.10,
                 size=(200, 100))

    @pytest.mark.slow
    def test_example1_full(self):
        """Full 800x400 parity render (~11 min CPU, aa=1 vs the
        reference's aa=3 PNG). Measured: mean 3.25, frac>30 0.0155 —
        silhouette anti-aliasing plus Perlin-boundary pixels."""
        _compare(os.path.join(ROOT, "example1.yaml"),
                 os.path.join(ROOT, "example1.png"), 5.0, 0.025)

    @pytest.mark.slow
    def test_example1_full_aa3(self):
        """Apples-to-apples flagship pin: 800x400 at the reference's own
        aa=3 (camera at 2400x1200, box downsample —
        scene_builder_yaml.rs:392, canvas.rs:76-105), f64. example1 has
        only a point light, so this is EXACT mode like the 13 object/
        pattern goldens. Measured (~47 min CPU): mean 0.012, frac>2
        0.00101, max 57 — the residual is Perlin-boundary and silhouette
        pixels at 8-bit quantization boundaries. Gate a hair above."""
        _compare(os.path.join(ROOT, "example1.yaml"),
                 os.path.join(ROOT, "example1.png"), 0.05, 0.002,
                 aa=3, dtype=jnp.float64, frac_gt=2)
