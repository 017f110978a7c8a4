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
