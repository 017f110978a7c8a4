"""Pallas fused primary-pass kernel vs the XLA pipeline (interpret mode on
CPU; the compiled path is exercised on real TPU by bench/perf scripts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chess2rt_tpu.models import types as T
from chess2rt_tpu.models.packed import pack_scene
from chess2rt_tpu.ops.pallas_trace import build_primary_kernel, supports
from chess2rt_tpu.render.pipeline import render_frame
from chess2rt_tpu.scene.loader import parse_scene_from_file


def _scene(data_dir, w=48, h=32):
    sc = parse_scene_from_file(str(data_dir / "lecture4.sdl"))
    sc.settings.frameWidth, sc.settings.frameHeight = w, h
    sc.camera.set_frame_size(w, h)
    sc.settings.AAEnabled = False
    return sc


class TestSupports:
    def test_lecture4_supported(self, data_dir):
        _, static = pack_scene(_scene(data_dir))
        assert supports(static)

    def test_csg_falls_back(self, data_dir):
        sc = parse_scene_from_file(str(data_dir / "lecture5.sdl"))
        _, static = pack_scene(sc)
        assert not supports(static)  # CSG + bitmap textures + scale transform

    def test_dof_falls_back(self, data_dir):
        sc = _scene(data_dir)
        sc.camera.dof = True
        _, static = pack_scene(sc)
        assert not supports(static)


class TestKernelParity:
    def test_lecture4_checker(self, data_dir):
        sc = _scene(data_dir)
        packed, static = pack_scene(sc, dtype=jnp.float32)
        fn = build_primary_kernel(static, static.width, static.height, interpret=True)
        out = np.asarray(fn(packed)).reshape(static.height, static.width, 3)
        ref = np.asarray(render_frame(packed, static, jax.random.PRNGKey(0)))
        np.testing.assert_allclose(out, ref, atol=5e-4)

    def test_mixed_scene_phong_sphere_cube(self, data_dir):
        sc = _scene(data_dir, w=64, h=48)
        ph = T.Phong(name="ph", color=(0.2, 0.3, 0.8), exponent=30.0, strength=0.7)
        sc.shaders.append(ph)
        sc.nodes.append(
            T.Node(name="ball", geometry=T.Sphere(name="b", center=(-40, 40, 200), R=35.0), shader=ph)
        )
        box = T.Node(name="box", geometry=T.Cube(name="c", center=(0, 0, 0), side=50.0), shader=sc.shaders[0])
        box.transform.translate((60, 27, 250))
        sc.nodes.append(box)
        packed, static = pack_scene(sc, dtype=jnp.float32)
        assert supports(static)
        fn = build_primary_kernel(static, static.width, static.height, interpret=True)
        out = np.asarray(fn(packed)).reshape(static.height, static.width, 3)
        ref = np.asarray(render_frame(packed, static, jax.random.PRNGKey(0)))
        np.testing.assert_allclose(out, ref, atol=5e-4)

    def test_proc2_texture(self, data_dir):
        sc = parse_scene_from_file(str(data_dir / "lecture4-proc-texture.sdl"))
        sc.settings.frameWidth, sc.settings.frameHeight = 48, 32
        sc.camera.set_frame_size(48, 32)
        sc.settings.AAEnabled = False
        packed, static = pack_scene(sc, dtype=jnp.float32)
        assert supports(static)
        fn = build_primary_kernel(static, static.width, static.height, interpret=True)
        out = np.asarray(fn(packed)).reshape(static.height, static.width, 3)
        ref = np.asarray(render_frame(packed, static, jax.random.PRNGKey(0)))
        np.testing.assert_allclose(out, ref, atol=5e-4)
