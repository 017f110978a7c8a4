"""Diagnostics, determinism, NaN sweeps, and the cubemap environment."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chess2rt_tpu.models import types as T
from chess2rt_tpu.models.packed import pack_scene
from chess2rt_tpu.render.pipeline import render_frame, render_scene_jax
from chess2rt_tpu.scene.loader import parse_scene_from_file
from chess2rt_tpu.utils.diagnostics import (
    assert_deterministic,
    frame_ray_stats,
    nan_sweep,
    wavefront_occupancy,
)


def _scene(data_dir, name="lecture4.sdl", w=32, h=24, aa=False):
    sc = parse_scene_from_file(str(data_dir / name))
    sc.settings.frameWidth, sc.settings.frameHeight = w, h
    sc.camera.set_frame_size(w, h)
    sc.settings.AAEnabled = aa
    return sc


class TestDeterminism:
    def test_whitted_bit_identical(self, data_dir):
        packed, static = pack_scene(_scene(data_dir))
        assert_deterministic(packed, static)

    def test_dof_bit_identical_same_key(self, data_dir):
        # stochastic sampling must still be reproducible per key
        # (replaces the reference's time-seeded rand, util/random.d:7-10)
        sc = _scene(data_dir, "zaphod.sdl", w=24, h=16)
        sc.camera.numSamples = 4
        packed, static = pack_scene(sc)
        assert_deterministic(packed, static)

    def test_different_keys_differ_when_stochastic(self, data_dir):
        sc = _scene(data_dir, "zaphod.sdl", w=24, h=16)
        sc.camera.numSamples = 4
        packed, static = pack_scene(sc)
        fn = jax.jit(lambda p, k: render_frame(p, static, k))
        a = np.asarray(fn(packed, jax.random.PRNGKey(0)))
        b = np.asarray(fn(packed, jax.random.PRNGKey(1)))
        assert (a != b).any()


class TestNanSweep:
    @pytest.mark.parametrize("name", ["lecture4.sdl", "lecture5.sdl", "zaphod.sdl"])
    def test_no_nans_in_pipeline(self, data_dir, name):
        sc = _scene(data_dir, name, w=24, h=16)
        if name == "zaphod.sdl":
            sc.camera.numSamples = 2
        packed, static = pack_scene(sc)
        img = nan_sweep(packed, static)
        assert np.isfinite(img).all()


class TestOccupancy:
    def test_non_recursive_is_single_round(self, data_dir):
        packed, static = pack_scene(_scene(data_dir))
        occ = wavefront_occupancy(packed, static)
        assert occ == [1.0]

    def test_mirror_occupancy_decays(self, data_dir):
        sc = _scene(data_dir)
        mirror = T.Reflection(name="m", color=(0.9, 0.9, 0.9))
        sc.nodes.append(
            T.Node(name="ball", geometry=T.Sphere(name="b", center=(0, 60, 120), R=40.0), shader=mirror)
        )
        packed, static = pack_scene(sc)
        occ = wavefront_occupancy(packed, static)
        assert len(occ) == static.max_trace_depth + 1
        assert occ[0] == 1.0
        assert 0.0 < occ[1] < 0.7  # only mirror-covered lanes continue
        assert occ[2] <= occ[1]


class TestRayStats:
    def test_counts_match_geometry(self, data_dir):
        packed, static = pack_scene(_scene(data_dir, w=16, h=12))
        stats = frame_ray_stats(packed, static)
        assert stats["camera"] == 16 * 12
        # every pixel hits the infinite floor or sky; hits get 1 shadow ray
        assert 0 < stats["shadow"] <= 16 * 12
        assert stats["total"] == stats["camera"] + stats["shadow"]


class TestCubemap:
    def _cubemap_scene(self, data_dir):
        sc = _scene(data_dir, w=32, h=24)
        faces = np.zeros((6, 8, 8, 3), dtype=np.float32)
        for i in range(6):
            faces[i, :, :, i % 3] = (i + 1) / 6.0
        sc.environment.cubemap = faces
        return sc

    def test_sky_pixels_use_cubemap(self, data_dir):
        sc = self._cubemap_scene(data_dir)
        img = np.asarray(render_scene_jax(sc))
        # top rows look above the horizon -> miss -> cubemap (non-black)
        assert img[0].max() > 0.0

    def test_oracle_parity(self, data_dir):
        from chess2rt_tpu.oracle.renderer import OracleRenderer

        jax.config.update("jax_enable_x64", True)
        try:
            sc = self._cubemap_scene(data_dir)
            gold = OracleRenderer(sc).render()
            img = np.asarray(render_scene_jax(sc, dtype=jnp.float64))
            assert np.abs(img - gold).max() < 1e-6
        finally:
            jax.config.update("jax_enable_x64", False)

    def test_cubemap_gradient_flows(self, data_dir):
        sc = self._cubemap_scene(data_dir)
        packed, static = pack_scene(sc)

        def loss(p):
            return render_frame(p, static, jax.random.PRNGKey(0)).mean()

        g = jax.grad(loss)(packed)
        assert np.isfinite(np.asarray(g.env_cubemap)).all()
        assert abs(np.asarray(g.env_cubemap).sum()) > 0


class TestDebugPixel:
    """--debug-pixel traces BOTH pipelines (VERDICT round-1 item 5): the
    device dump must reflect the actual render pipeline, not the oracle."""

    def test_device_and_oracle_sides(self, data_dir):
        from chess2rt_tpu.app import _device_pixel_trace, _oracle_pixel_trace, debug_pixel

        sc = parse_scene_from_file(str(data_dir / "lecture4.sdl"))
        sc.settings.frameWidth, sc.settings.frameHeight = 64, 48
        sc.camera.set_frame_size(64, 48)
        dev = _device_pixel_trace(sc, 32, 30)
        orc = _oracle_pixel_trace(sc, 32, 30)
        assert dev["win"] == orc["win"] == 0
        np.testing.assert_allclose(dev["dist"], orc["dist"], rtol=1e-5)
        np.testing.assert_allclose(dev["color"], orc["color"], atol=1e-4)
        dump = debug_pixel(sc, 32, 30)
        assert "device (f32)" in dump and "oracle (f64)" in dump
        assert "Plane" in dump and "Lambert" in dump

    def test_miss_pixel(self, data_dir):
        from chess2rt_tpu.app import debug_pixel

        sc = parse_scene_from_file(str(data_dir / "lecture4.sdl"))
        sc.settings.frameWidth, sc.settings.frameHeight = 64, 48
        sc.camera.set_frame_size(64, 48)
        dump = debug_pixel(sc, 32, 0)  # sky
        assert "miss (environment)" in dump
