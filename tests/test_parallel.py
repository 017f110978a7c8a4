"""Multi-device tests on the 8-way virtual CPU mesh (conftest.py sets
xla_force_host_platform_device_count=8 — the standard 'multi-node without a
cluster' trick, SURVEY.md §4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chess2rt_tpu.models.packed import pack_scene
from chess2rt_tpu.parallel import (
    make_mesh,
    make_sharded_render_fn,
    make_sharded_value_and_grad,
)
from chess2rt_tpu.render.pipeline import render_frame, render_scene_jax
from chess2rt_tpu.scene.loader import parse_scene_from_file


@pytest.fixture(scope="module")
def scene(data_dir):
    sc = parse_scene_from_file(str(data_dir / "lecture4.sdl"))
    # 50x30 = 1500 px: deliberately NOT divisible by 8 to exercise padding
    sc.settings.frameWidth, sc.settings.frameHeight = 50, 30
    sc.camera.set_frame_size(50, 30)
    return sc


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8
    return make_mesh()


class TestShardedRender:
    def test_bit_identical_to_single_chip(self, scene, mesh):
        packed, static = pack_scene(scene, dtype=jnp.float32)
        fn = make_sharded_render_fn(static, mesh)
        img = np.asarray(fn(packed, jax.random.PRNGKey(0)))
        ref = np.asarray(render_scene_jax(scene, dtype=jnp.float32))
        np.testing.assert_array_equal(img, ref)

    def test_output_sharding_is_row_partitioned(self, scene, mesh):
        packed, static = pack_scene(scene, dtype=jnp.float32)
        fn = make_sharded_render_fn(static, mesh)
        out = fn(packed, jax.random.PRNGKey(0))
        assert out.shape == (30, 50, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_mesh_subset(self, scene):
        # a 2-device mesh must give the same frame as the 8-device one
        packed, static = pack_scene(scene, dtype=jnp.float32)
        m2 = make_mesh(jax.devices()[:2])
        img2 = np.asarray(make_sharded_render_fn(static, m2)(packed, jax.random.PRNGKey(0)))
        ref = np.asarray(render_scene_jax(scene, dtype=jnp.float32))
        np.testing.assert_array_equal(img2, ref)


class TestShardedGrad:
    def test_loss_and_grads_match_single_device(self, scene, mesh):
        packed, static = pack_scene(scene, dtype=jnp.float32)
        vg = make_sharded_value_and_grad(static, mesh)
        target = jnp.zeros((30, 50, 3))
        key = jax.random.PRNGKey(0)
        loss, g = vg(packed, target, key)

        def loss1(p):
            return ((render_frame(p, static, key) - target) ** 2).mean()

        l1, g1 = jax.value_and_grad(loss1)(packed)
        np.testing.assert_allclose(float(loss), float(l1), rtol=1e-6)
        for f in ("light_power", "plane_y", "checker_c2", "mat_color"):
            np.testing.assert_allclose(
                np.asarray(getattr(g, f)), np.asarray(getattr(g1, f)), rtol=1e-5, atol=1e-12
            )
        np.testing.assert_allclose(float(g.camera.fov), float(g1.camera.fov), rtol=1e-5)

    def test_grad_descent_step_reduces_loss(self, scene, mesh):
        """One SGD step on the light power against a dimmer target frame
        must reduce the loss — the minimal end-to-end inverse-rendering
        smoke test over the mesh."""
        packed, static = pack_scene(scene, dtype=jnp.float32)
        key = jax.random.PRNGKey(0)
        dim = dataclasses.replace(packed, light_power=packed.light_power * 0.5)
        target = render_frame(dim, static, key)
        vg = make_sharded_value_and_grad(static, mesh)
        l0, g = vg(packed, target, key)
        stepped = dataclasses.replace(
            packed, light_power=packed.light_power - 2e8 * g.light_power
        )
        l1, _ = vg(stepped, target, key)
        assert float(l1) < float(l0)
