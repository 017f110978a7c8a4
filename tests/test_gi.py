"""GI path-tracing statistical parity, incl. the NEE extension path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chess2rt_tpu.models.packed import pack_scene
from chess2rt_tpu.oracle.renderer import OracleRenderer
from chess2rt_tpu.render.pipeline import render_frame
from chess2rt_tpu.scene.loader import parse_scene_from_file


def _scene(data_dir, w=24, h=16, paths=24):
    sc = parse_scene_from_file(str(data_dir / "lecture4.sdl"))
    sc.settings.frameWidth, sc.settings.frameHeight = w, h
    sc.camera.set_frame_size(w, h)
    sc.settings.AAEnabled = False
    sc.settings.GIEnabled = True
    sc.settings.pathsPerPixel = paths
    # a bounce surface so indirect paths carry signal
    from chess2rt_tpu.models import types as T

    # NB keep the bounce surface FAR from the point light: NEE's 1/d^2 term
    # has unbounded variance when hit points approach the light
    sc.nodes.append(
        T.Node(name="wall", geometry=T.Sphere(name="w", center=(60, 80, 330), R=50.0),
               shader=T.Lambert(name="white", color=(0.8, 0.8, 0.8)))
    )
    return sc


class TestGiQuirkPath:
    def test_reference_semantics_black(self, data_dir):
        """solidAngle == 0 + non-intersectable point lights => exactly
        black (light.d:72-75, renderer.d:404-447)."""
        sc = _scene(data_dir, paths=4)
        img = np.asarray(
            render_frame(*pack_scene(sc, dtype=jnp.float32), jax.random.PRNGKey(0))
        )
        np.testing.assert_array_equal(img, 0.0)
        gold = OracleRenderer(sc, seed=3).render()
        np.testing.assert_array_equal(gold, 0.0)


class TestGiNeeExtension:
    def test_device_matches_oracle_statistically(self, data_dir):
        """With gi_point_light_direct the oracle and device must agree in
        expectation (both are unbiased estimators of the same integral)."""
        sc = _scene(data_dir, paths=48)
        packed, static = pack_scene(sc, dtype=jnp.float32)
        static = dataclasses.replace(static, gi_point_light_direct=True)
        img = np.asarray(render_frame(packed, static, jax.random.PRNGKey(0)))
        gold = OracleRenderer(sc, gi_point_light_direct=True, seed=5).render()
        assert img.max() > 0.01 and gold.max() > 0.01
        # rtol covers MC noise at 48 paths plus a small systematic f32
        # secondary-ray offset deficit vs the f64 oracle (~6%)
        np.testing.assert_allclose(img.mean(axis=(0, 1)), gold.mean(axis=(0, 1)), rtol=0.12)

    def test_physical_mode_darker_than_quirk(self, data_dir):
        """Dropping the multiplier quirk (renderer.d:356) must attenuate
        indirect bounces => strictly less energy."""
        sc = _scene(data_dir, paths=32)
        packed, static = pack_scene(sc, dtype=jnp.float32)
        st_q = dataclasses.replace(static, gi_point_light_direct=True, gi_multiplier_quirk=True)
        st_p = dataclasses.replace(static, gi_point_light_direct=True, gi_multiplier_quirk=False)
        a = np.asarray(render_frame(packed, st_q, jax.random.PRNGKey(0)))
        b = np.asarray(render_frame(packed, st_p, jax.random.PRNGKey(0)))
        assert b.mean() < a.mean()
        assert b.mean() > 0