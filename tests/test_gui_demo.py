"""GuiDemo parity + async render dispatch."""

import numpy as np
import pytest

from chess2rt_tpu.gui.demo import ARGB, GREEN, PURPLE, YELLOW, demo_frames, draw_circle
from chess2rt_tpu.render.async_render import render_scene_async
from chess2rt_tpu.scene.loader import parse_scene_from_file


class TestDrawCircle:
    def test_core_is_yellow_background_purple(self):
        img = draw_circle(256, 256, 0.2)
        np.testing.assert_allclose(img[128, 128], YELLOW)  # disc center
        # corner is beyond radius + max beam length (25.6 + 40 < 181)
        np.testing.assert_allclose(img[1, 1], PURPLE, atol=1e-6)
        assert img.shape == (256, 256, 3)

    def test_beams_blend_green_to_pink(self):
        img = draw_circle(128, 128, 0.3, seed=1)
        # somewhere just outside the disc radius there must be beam colors
        # distinct from both the core and the background
        ys, xs = np.mgrid[0:128, 0:128]
        dist = np.sqrt((64 - xs) ** 2 + (ys - 64) ** 2)
        ring = (dist > 0.3 * 64) & (dist < 0.3 * 64 + 10)
        ring_px = img[ring]
        assert (np.abs(ring_px - GREEN).sum(-1) < 0.7).any()

    def test_pulse_bounces(self):
        sizes = [s for s, _ in demo_frames(16, 16, n=250, speed=0.01, size0=0.99)]
        assert max(sizes) == 1.0 and min(sizes) < 0.5  # reflected at the rim


class TestARGB:
    def test_channel_unpacking(self):
        # the reference's unittest (gui_demo.d:262-273)
        assert ARGB(0xFF000000).a == 255
        assert ARGB(0x00FF0000).r == 255
        assert ARGB(0x0000FF00).g == 255
        assert ARGB(0x000000FF).b == 255
        assert ARGB(r=1, g=2, b=3).value == 0x010203


class TestAsyncRender:
    def test_async_render_progressive_passes(self, data_dir):
        """Prepass flat-fill, then the full-res pass, each published to the
        display callback (renderRT's pass structure, renderer.d:83-189)."""
        sc = parse_scene_from_file(str(data_dir / "lecture4.sdl"))
        sc.settings.frameWidth, sc.settings.frameHeight = 32, 16
        sc.camera.set_frame_size(32, 16)
        sc.settings.AAEnabled = False
        got = []
        h = render_scene_async(sc, callback=got.append, prepass_scale=8)
        out = h.result(timeout=240)
        assert not h.is_rendering
        assert out.shape == (16, 32, 3)
        assert len(got) == 2 and h.passes_completed == 2  # prepass + main
        assert got[0].shape == out.shape  # prepass upscaled to full frame
        # the prepass flat-fill is blockier than the final pass
        assert not np.array_equal(got[0], got[1])

    def test_prepass_only(self, data_dir):
        """prepassOnly stops after the coarse pass (renderer.d knob)."""
        sc = parse_scene_from_file(str(data_dir / "lecture4.sdl"))
        sc.settings.frameWidth, sc.settings.frameHeight = 32, 16
        sc.camera.set_frame_size(32, 16)
        sc.settings.AAEnabled = False
        sc.settings.prepassOnly = True
        h = render_scene_async(sc, prepass_scale=8)
        out = h.result(timeout=240)
        assert h.passes_completed == 1
        assert out.shape == (16, 32, 3)

    def test_stop_before_dispatch(self, data_dir):
        sc = parse_scene_from_file(str(data_dir / "lecture4.sdl"))
        sc.settings.frameWidth, sc.settings.frameHeight = 24, 16
        sc.camera.set_frame_size(24, 16)
        h = render_scene_async(sc)
        h.request_stop()  # may or may not land before dispatch; must not hang
        h.result(timeout=120)
        assert not h.is_rendering
