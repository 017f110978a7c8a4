"""Progressive viewer (gui/viewer.py): ANSI rendering + bucket-order
refinement — the runnable display surface owed by VERDICT round-1 item 4."""

import io

import numpy as np
import pytest

from chess2rt_tpu.gui.viewer import TerminalViewer, make_viewer, progressive_render
from chess2rt_tpu.render.buckets import get_buckets_list
from chess2rt_tpu.utils.color import srgb_u8


class TestTerminalViewer:
    def test_render_ansi_halfblocks(self):
        frame = np.zeros((4, 3, 3), dtype=np.float32)
        frame[0] = [1.0, 0.0, 0.0]  # top row red
        v = TerminalViewer(max_cols=10, max_rows=10, out=io.StringIO())
        s = v.render_ansi(frame)
        lines = s.split("\n")
        assert len(lines) == 2  # 4 pixel rows -> 2 half-block rows
        assert s.count("▀") == 6  # 3 columns x 2 rows
        # first row's foreground is the sRGB-compressed red
        assert f"\x1b[38;2;{srgb_u8(np.float32(1.0))};0;0m" in lines[0]

    def test_blit_writes_and_homes_cursor(self):
        out = io.StringIO()
        v = TerminalViewer(max_cols=8, max_rows=4, out=out)
        v.blit(np.zeros((4, 4, 3), dtype=np.float32))
        v.blit(np.ones((4, 4, 3), dtype=np.float32))
        s = out.getvalue()
        assert s.startswith("\x1b[2J\x1b[H")  # clear on first paint
        assert "\x1b[H" in s[10:]  # home (no clear) on repaint

    def test_downscale_fits_terminal(self):
        v = TerminalViewer(max_cols=10, max_rows=5, out=io.StringIO())
        img = v._downscale(np.zeros((100, 200, 3), dtype=np.float32))
        assert img.shape[1] <= 10 and img.shape[0] <= 10  # 5 rows x 2 px

    def test_make_viewer_falls_back_to_terminal(self):
        # pysdl2 isn't installed in this image -> terminal fallback
        v = make_viewer(64, 48, prefer_sdl=True)
        assert hasattr(v, "blit")


class TestProgressive:
    def test_bucket_order_refinement(self, data_dir):
        """Coarse prepass first, then full-quality buckets in zigzag order
        (renderer.d:110-127, :194-213)."""
        from chess2rt_tpu.gui.session import InteractiveSession

        session = InteractiveSession(str(data_dir / "lecture4.sdl"), preview_scale=4)
        session.scene.settings.frameWidth = 64
        session.scene.settings.frameHeight = 48
        session.scene.camera.set_frame_size(64, 48)
        session.scene.settings.AAEnabled = False

        blits = []

        class Spy:
            def blit(self, frame):
                blits.append(np.array(frame, copy=True))

        full = progressive_render(session, Spy(), bucket_size=32)
        n_buckets = len(get_buckets_list(64, 48, 32))
        assert len(blits) == 1 + n_buckets  # prepass + one per bucket
        # final canvas equals the full-quality frame
        np.testing.assert_array_equal(blits[-1], full)
        # the prepass blit differs from the final frame (coarse fill)
        assert blits[0].shape == full.shape
        # each refinement step only changes pixels inside its bucket
        b1 = get_buckets_list(64, 48, 32)[0]
        delta = np.abs(blits[1] - blits[0]).max(-1)
        outside = np.ones((48, 64), dtype=bool)
        outside[b1.y0 : b1.y1, b1.x0 : b1.x1] = False
        assert delta[outside].max() == 0.0


class TestResize:
    """Window-resize semantics (raytracer_demo.d:126-143 updateToWindowSize),
    headless via InteractiveSession.handle_resize."""

    def _session(self, data_dir):
        from chess2rt_tpu.gui.session import InteractiveSession

        s = InteractiveSession(str(data_dir / "lecture4.sdl"))
        # keep renders tiny
        s.scene.settings.frameWidth = 16
        s.scene.settings.frameHeight = 12
        s.scene.camera.set_frame_size(16, 12)
        s.scene.settings.AAEnabled = False
        return s

    def test_f2_toggles_adaptive_aa(self, data_dir):
        """EXTENSION key F2 flips adaptiveAA and re-renders (the jit cache
        is invalidated — static changed)."""
        s = self._session(data_dir)
        s.scene.settings.AAEnabled = True
        assert not getattr(s.scene.settings, "adaptiveAA", False)
        frame = s.handle_key("f2")
        assert s.scene.settings.adaptiveAA is True
        assert frame is not None and np.isfinite(frame).all()
        s.handle_key("f2")
        assert s.scene.settings.adaptiveAA is False

    def test_disabled_without_allow_resize(self, data_dir):
        s = self._session(data_dir)
        s.scene.settings.allowResize = False
        assert s.handle_resize(24, 18) is None
        assert s.scene.settings.frameWidth == 16

    def test_fullscreen_blocks_resize(self, data_dir):
        s = self._session(data_dir)
        s.scene.settings.allowResize = True
        s.scene.settings.fullscreen = True
        assert s.handle_resize(24, 18) is None

    def test_resize_reallocates_frame(self, data_dir):
        s = self._session(data_dir)
        s.scene.settings.allowResize = True
        old_aspect = s.scene.camera.aspect
        frame = s.handle_resize(24, 18)
        assert frame is not None and frame.shape == (18, 24, 3)
        assert s.scene.settings.frameWidth == 24
        # without dynamicAspectRatio the camera aspect is untouched
        assert s.scene.camera.aspect == old_aspect

    def test_dynamic_aspect_ratio_updates_camera(self, data_dir):
        s = self._session(data_dir)
        s.scene.settings.allowResize = True
        s.scene.settings.dynamicAspectRatio = True
        s.handle_resize(32, 12)
        assert s.scene.camera.aspect == pytest.approx(32 / 12)

    def test_noop_on_same_size(self, data_dir):
        s = self._session(data_dir)
        s.scene.settings.allowResize = True
        assert s.handle_resize(16, 12) is None

    def test_run_accepts_resize_events(self, data_dir):
        s = self._session(data_dir)
        s.scene.settings.allowResize = True
        frame = s.run([("resize", 20, 10), ("key", "w", None)])
        assert frame.shape == (10, 20, 3)
