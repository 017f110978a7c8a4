"""Structured per-frame logging (SURVEY.md §5.5, utils/structlog.py)."""

import io
import json

from chess2rt_tpu.utils.structlog import StructLogger, configure, get_logger


class TestStructLogger:
    def test_emit_json_lines(self):
        out = io.StringIO()
        log = StructLogger(stream=out)
        log.emit("scene_loaded", path="x.sdl", nodes=7)
        rec = json.loads(out.getvalue().splitlines()[0])
        assert rec["event"] == "scene_loaded" and rec["nodes"] == 7
        assert "t" in rec

    def test_frame_context_times_and_keeps_fields(self):
        log = StructLogger(stream=None)
        with log.frame(scene="s", width=4, height=3) as rec:
            rec["rays"] = 120
        r = log.records[-1]
        assert r["event"] == "frame" and r["rays"] == 120
        assert r["wall_ms"] >= 0

    def test_summary_aggregates(self):
        log = StructLogger(stream=None)
        for _ in range(3):
            with log.frame() as rec:
                rec["rays"] = 100
        s = log.summary()
        assert s["count"] == 3
        assert s["rays_per_sec"] > 0

    def test_ring_buffer_bounded(self):
        log = StructLogger(stream=None, keep=10)
        for i in range(50):
            log.emit("e", i=i)
        assert len(log.records) == 10
        assert log.records[-1]["i"] == 49

    def test_default_logger_configure(self):
        out = io.StringIO()
        configure(stream=out)
        get_logger().emit("ping")
        assert "ping" in out.getvalue()
        configure(stream=None)  # reset to silent for other tests


class TestSessionIntegration:
    def test_session_render_logs_frames(self, data_dir):
        from chess2rt_tpu.gui.session import InteractiveSession

        configure(stream=None)
        s = InteractiveSession(str(data_dir / "lecture4.sdl"), preview_scale=8)
        s.scene.settings.frameWidth = 32
        s.scene.settings.frameHeight = 24
        s.scene.camera.set_frame_size(32, 24)
        s.scene.settings.AAEnabled = False
        s.render(preview=True)
        recs = [r for r in get_logger().records if r["event"] == "frame"]
        assert recs and recs[-1]["preview"] is True
        assert recs[-1]["wall_ms"] > 0
