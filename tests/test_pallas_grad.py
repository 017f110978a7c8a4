"""Gradients through the fused Pallas path (ops/pallas_grad.py), interpret
mode on CPU, pinned against the pure-XLA VJP and finite differences.

The custom-VJP backward re-shades in XLA with the kernel's discrete
decisions (win, shadow bits) pinned; away from knife edges this must agree
with differentiating the XLA pipeline itself (the same tolerance pattern
as tests/test_inverse.TestTexelGradModes)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chess2rt_tpu.models import types as T
from chess2rt_tpu.models.packed import pack_scene
from chess2rt_tpu.ops.pallas_trace import build_flagship_renderer, build_gi_renderer, supports
from chess2rt_tpu.render.pipeline import render_frame
from chess2rt_tpu.scene.loader import parse_scene_from_file

KEY = jax.random.PRNGKey(0)

# leaves whose gradients the fused path must reproduce (every family the
# flagship scene exercises: materials, lights, geometry, camera, texels)
CHECK_LEAVES = (
    "mat_color",
    "mat_exponent",
    "mat_strength",
    "light_pos",
    "light_power",
    "light_color",
    "sphere_center",
    "sphere_r",
    "cube_center",
    "plane_y",
    "checker_c1",
    "checker_c2",
    "bitmap_atlas",
    "ambient",
)


def _grads(fn, packed):
    def loss(p):
        return (fn(p) ** 2).mean()

    return jax.grad(loss)(packed)


def _compare(g_pallas, g_xla, leaves=CHECK_LEAVES, rtol=2e-3, atol=2e-6, skip_zero=False):
    compared = 0
    for name in leaves:
        a = np.asarray(getattr(g_pallas, name))
        b = np.asarray(getattr(g_xla, name))
        if a.size == 0:
            continue
        if skip_zero and not np.abs(b).any():
            continue
        # knife-edge lanes (winner/shadow-bit flips between kernel and XLA
        # fp) are excluded by comparing against the XLA magnitude scale
        scale = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(a, b, rtol=rtol, atol=atol + rtol * scale, err_msg=name)
        if np.abs(b).any():
            compared += 1
    assert compared >= 3  # the comparison must not be vacuous


def _flagship(data_dir, w=64, h=48, mirror=True):
    sc = parse_scene_from_file(str(data_dir / "lecture5.sdl"))
    sc.settings.frameWidth, sc.settings.frameHeight = w, h
    sc.camera.set_frame_size(w, h)
    sc.settings.AAEnabled = False
    if mirror:
        m = T.Reflection(name="m", color=(0.9, 0.9, 0.9))
        sc.shaders.append(m)
        sc.nodes.append(
            T.Node(name="mb", geometry=T.Sphere(name="mbs", center=(0, 60, 360), R=55.0), shader=m)
        )
    return pack_scene(sc, dtype=jnp.float32)


class TestWhittedGrads:
    def test_lecture4_grads_match_xla(self, data_dir):
        sc = parse_scene_from_file(str(data_dir / "lecture4.sdl"))
        sc.settings.frameWidth, sc.settings.frameHeight = 48, 32
        sc.camera.set_frame_size(48, 32)
        sc.settings.AAEnabled = False
        packed, static = pack_scene(sc, dtype=jnp.float32)
        assert supports(static)
        fused = build_flagship_renderer(static, static.width, static.height, interpret=True)
        g_p = _grads(lambda p: fused(p, KEY), packed)
        g_x = _grads(lambda p: render_frame(p, static, KEY), packed)
        _compare(g_p, g_x)

    def test_flagship_grads_match_xla(self, data_dir):
        """CSG + bitmap + Phong + mirror bounces (the grad-bench config):
        gradients through kernel round 0 + compacted Pallas bounce rounds
        vs the XLA pipeline with the same compaction."""
        packed, static = _flagship(data_dir)
        static = dataclasses.replace(static, bounce_capacity=64 * 48 // 4)
        fused = build_flagship_renderer(static, static.width, static.height, interpret=True)
        g_p = _grads(lambda p: fused(p, KEY), packed)
        g_x = _grads(lambda p: render_frame(p, static, KEY), packed)
        # bitmap texel grads flow through the same combine/_quad_gather in
        # both paths, but UVs enter from polynomial vs libm atan2 — allow
        # a looser relative tail there (skip_zero: camera-only leaves)
        _compare(g_p, g_x, rtol=5e-3, skip_zero=True)

    def test_camera_grads_flow(self, data_dir):
        """Tight agreement on lecture4 (checker plane: UV math is identical
        between kernel and XLA); loose direction/magnitude agreement on the
        bitmap flagship, whose polynomial-atan2 UVs make the heavily
        cancelling camera-angle sums fp-sensitive (~2% observed)."""
        sc = parse_scene_from_file(str(data_dir / "lecture4.sdl"))
        sc.settings.frameWidth, sc.settings.frameHeight = 48, 32
        sc.camera.set_frame_size(48, 32)
        sc.settings.AAEnabled = False
        packed, static = pack_scene(sc, dtype=jnp.float32)
        fused = build_flagship_renderer(static, static.width, static.height, interpret=True)
        g_p = _grads(lambda p: fused(p, KEY), packed)
        g_x = _grads(lambda p: render_frame(p, static, KEY), packed)
        for leaf in ("pos", "yaw", "pitch", "fov"):
            a = np.asarray(getattr(g_p.camera, leaf))
            b = np.asarray(getattr(g_x.camera, leaf))
            assert np.isfinite(a).all()
            scale = np.abs(b).max() + 1e-12
            np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-3 * scale, err_msg=leaf)

        packed5, static5 = _flagship(data_dir, mirror=False)
        fused5 = build_flagship_renderer(static5, static5.width, static5.height, interpret=True)
        g_p5 = _grads(lambda p: fused5(p, KEY), packed5)
        g_x5 = _grads(lambda p: render_frame(p, static5, KEY), packed5)
        for leaf in ("pos", "yaw", "pitch", "fov"):
            a = np.asarray(getattr(g_p5.camera, leaf))
            b = np.asarray(getattr(g_x5.camera, leaf))
            assert np.isfinite(a).all()
            scale = np.abs(b).max() + 1e-12
            np.testing.assert_allclose(a, b, rtol=0.1, atol=0.1 * scale, err_msg=leaf)

    def test_fd_check_light_color(self, data_dir):
        """Finite differences through the FUSED forward itself (not just
        agreement with XLA): directional derivative along light_color,
        an O(1)-scaled leaf f32 central differences can resolve
        (light_power's gradient is ~4e-8 on this scene — below FD noise)."""
        packed, static = _flagship(data_dir, mirror=False)
        fused = build_flagship_renderer(static, static.width, static.height, interpret=True)

        def loss(p):
            return (fused(p, KEY) ** 2).mean()

        g = jax.grad(loss)(packed)
        eps = 1e-3
        lc = np.asarray(packed.light_color)
        up = dataclasses.replace(packed, light_color=jnp.asarray(lc + eps))
        dn = dataclasses.replace(packed, light_color=jnp.asarray(lc - eps))
        fd = (float(loss(up)) - float(loss(dn))) / (2 * eps)
        np.testing.assert_allclose(float(np.asarray(g.light_color).sum()), fd, rtol=1e-3)

    def test_aa_grads(self, data_dir):
        """The 5-tap AA scan backpropagates through every tap."""
        sc = parse_scene_from_file(str(data_dir / "lecture4.sdl"))
        sc.settings.frameWidth, sc.settings.frameHeight = 32, 24
        sc.camera.set_frame_size(32, 24)
        packed, static = pack_scene(sc, dtype=jnp.float32)
        assert static.aa_enabled
        fused = build_flagship_renderer(static, static.width, static.height, interpret=True)
        g_p = _grads(lambda p: fused(p, KEY), packed)
        g_x = _grads(lambda p: render_frame(p, static, KEY), packed)
        _compare(g_p, g_x, leaves=("mat_color", "checker_c1", "checker_c2", "plane_y", "light_power"))


class TestLeafPins:
    def test_leaf_vs_node_pin_grads(self, data_dir):
        """The leaf-pinned backward (closed-form winning-leaf reconstruction
        from matched t/normal residuals) must produce the SAME gradients as
        the node-pinned full re-scan — both differentiate the identical
        winning-branch closed form, just reconstructed differently.  The
        flagship scene exercises every pin case: CSG diff (parity-walk win +
        eaten-surface normal flip), matrix transforms (dist rescale), cube
        faces, both sphere roots, plane."""
        from chess2rt_tpu.ops.pallas_grad import build_diff_round0

        packed, static = _flagship(data_dir, w=48, h=32)

        def make_loss(mode):
            kern = build_diff_round0(static, 48, 32, interpret=True, pin_mode=mode)

            def loss(p):
                o = kern(p, (0.0, 0.0))
                return sum((v**2).mean() for k, v in o.items() if k != "win")

            return loss

        g_leaf = jax.grad(make_loss("leaf"))(packed)
        g_node = jax.grad(make_loss("node"))(packed)
        compared = 0
        for name in CHECK_LEAVES:
            a = np.asarray(getattr(g_leaf, name))
            b = np.asarray(getattr(g_node, name))
            if a.size == 0:
                continue
            scale = np.abs(b).max() + 1e-12
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4 * scale, err_msg=name)
            if np.abs(b).any():
                compared += 1
        assert compared >= 4

    def test_leaf_pins_identify_winners(self, data_dir):
        """compute_leaf_pins recovers a leaf belonging to the winning node
        with a closed-form t matching the kernel's winning distance."""
        from chess2rt_tpu.models.packed import leaf_table
        from chess2rt_tpu.ops.pallas_grad import _gen_rays, compute_leaf_pins
        from chess2rt_tpu.ops.pallas_trace import build_round0_kernel

        packed, static = _flagship(data_dir, w=48, h=32)
        kern = build_round0_kernel(static, 48, 32, interpret=True, want_hit=True)
        o = kern(packed, (0.0, 0.0))
        orig, dir = _gen_rays(packed, 48, 32, jnp.zeros(2))
        gleaf, sel = compute_leaf_pins(packed, static, orig, dir, o["win"], o["t"])
        leaves, _ = leaf_table(static)
        owner = np.asarray([lf[0] for lf in leaves], np.int32)
        win = np.asarray(o["win"])
        hit = win >= 0
        assert hit.any()
        assert (owner[np.asarray(gleaf)][hit] == win[hit]).all()


class TestGIGrads:
    def test_gi_grads_match_xla(self, data_dir):
        sc = parse_scene_from_file(str(data_dir / "lecture4.sdl"))
        sc.settings.frameWidth, sc.settings.frameHeight = 24, 16
        sc.camera.set_frame_size(24, 16)
        sc.settings.AAEnabled = False
        sc.settings.GIEnabled = True
        sc.settings.pathsPerPixel = 2
        sc.settings.maxTraceDepth = 2
        packed, static = pack_scene(sc, dtype=jnp.float32)
        static = dataclasses.replace(static, gi_point_light_direct=True)
        fused = build_gi_renderer(static, static.width, static.height, interpret=True)
        g_p = _grads(lambda p: fused(p, KEY), packed)
        g_x = _grads(lambda p: render_frame(p, static, KEY), packed)
        _compare(
            g_p,
            g_x,
            leaves=("mat_color", "checker_c1", "checker_c2", "light_power", "light_pos"),
            rtol=5e-3,
        )


class TestFitDispatch:
    def test_fit_through_fused_path(self, data_dir):
        """grad/inverse.fit with use_pallas=True runs its forward through
        the kernel (interpret on CPU) and still converges."""
        from chess2rt_tpu.grad.inverse import InverseProblem, fit

        sc = parse_scene_from_file(str(data_dir / "lecture4.sdl"))
        sc.settings.frameWidth, sc.settings.frameHeight = 32, 24
        sc.camera.set_frame_size(32, 24)
        sc.settings.AAEnabled = False
        packed, static = pack_scene(sc, dtype=jnp.float32)
        static = dataclasses.replace(static, use_pallas=True, interpret_pallas=True)
        target = render_frame(packed, static, KEY)
        wrong = dataclasses.replace(packed, checker_c2=packed.checker_c2 * 0.4)
        prob = InverseProblem(
            static=static, target=target, train_fields=("checker_c2",),
            learning_rate=5e-2, steps=20,
        )
        fitted, losses = fit(wrong, prob, key=KEY)
        assert losses[-1] < losses[0] * 0.2
        # the fused fit must track the XLA fit's trajectory (same grads ->
        # same Adam path, to fp): compare final parameters between modes
        static_x = dataclasses.replace(static, use_pallas=False)
        prob_x = dataclasses.replace(prob, static=static_x, target=target)
        fitted_x, losses_x = fit(wrong, prob_x, key=KEY)
        np.testing.assert_allclose(
            np.asarray(fitted.checker_c2), np.asarray(fitted_x.checker_c2), atol=2e-3
        )
        assert abs(losses[-1] - losses_x[-1]) < 1e-5
