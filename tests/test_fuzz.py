"""Property/fuzz tests: random geometry vs the oracle, incl. nested CSG.

The device path's analytic all-hits CSG engine must agree with the
oracle's faithful epsilon-recast implementation on random primitives,
random boolean trees (including CSG-of-CSG, which no reference scene
exercises), and random rays — distances, normals and UVs, up to the
documented recast drift (~1e-6 per re-cast, geometry.d:286)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chess2rt_tpu.models import types as T
from chess2rt_tpu.models.packed import pack_scene
from chess2rt_tpu.ops import geometry as G
from chess2rt_tpu.oracle import renderer as orc


@pytest.fixture(scope="module")
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def _random_leaf(rng, name):
    kind = rng.integers(0, 3)
    if kind == 0:
        return T.Plane(name=name, y=float(rng.uniform(-2, 2)))
    if kind == 1:
        return T.Sphere(name=name, center=tuple(rng.uniform(-3, 3, 3)), R=float(rng.uniform(0.5, 2.5)))
    return T.Cube(name=name, center=tuple(rng.uniform(-3, 3, 3)), side=float(rng.uniform(0.5, 3.0)))


def _random_csg(rng, name, depth):
    if depth == 0 or rng.random() < 0.3:
        return _random_leaf(rng, name)
    op = ["union", "inter", "diff"][rng.integers(0, 3)]
    cls = {"union": T.CsgUnion, "inter": T.CsgInter, "diff": T.CsgDiff}[op]
    return cls(
        name=name,
        op=op,
        left=_random_csg(rng, name + "l", depth - 1),
        right=_random_csg(rng, name + "r", depth - 1),
    )


def _random_rays(rng, n):
    orig = rng.uniform(-6, 6, (n, 3))
    dir = rng.normal(size=(n, 3))
    dir /= np.linalg.norm(dir, axis=-1, keepdims=True)
    return orig, dir


def _compare(scene_geom, rng, n=512, atol=2e-5):
    """Oracle closest-hit vs device closest-hit for one geometry."""
    sc = T.Scene()
    node = T.Node(name="n", geometry=scene_geom, shader=T.Lambert(name="s"))
    sc.nodes = [node]
    sc.geometries = [scene_geom]
    sc.shaders = [node.shader]
    packed, static = pack_scene(sc, dtype=jnp.float64)

    orig, dir = _random_rays(rng, n)

    rec = orc.HitRecord(n)
    ok_o = orc.intersect_geometry(scene_geom, orig, dir, rec)

    cand = G.closest_hit_expr(packed, static.nodes[0].geom, jnp.asarray(orig), jnp.asarray(dir))
    dist_d = np.asarray(cand["dist"])
    ok_d = dist_d < G.INF

    # hit/miss agreement except near-grazing numerical fringe
    disagree = ok_o != ok_d
    assert disagree.mean() < 0.01, f"hit/miss disagreement {disagree.mean():.3%}"

    both = ok_o & ok_d
    if both.any():
        dd = np.abs(rec.dist[both] - dist_d[both])
        # oracle recast drift: 1e-6 per recast per CSG level
        assert np.quantile(dd, 0.99) < 1e-4, np.quantile(dd, 0.99)
        nd = np.abs(rec.normal[both] - np.asarray(cand["normal"])[both]).max(-1)
        agree_n = (nd < 1e-4).mean()
        assert agree_n > 0.98, f"normal agreement {agree_n:.3%}"


class TestFuzzLeaves:
    @pytest.mark.parametrize("seed", range(5))
    def test_random_leaf(self, x64, seed):
        rng = np.random.default_rng(seed)
        _compare(_random_leaf(rng, "g"), rng)


class TestFuzzCsg:
    @pytest.mark.parametrize("seed", range(8))
    def test_random_single_level(self, x64, seed):
        rng = np.random.default_rng(100 + seed)
        left = _random_leaf(rng, "l")
        right = _random_leaf(rng, "r")
        op = ["union", "inter", "diff"][seed % 3]
        cls = {"union": T.CsgUnion, "inter": T.CsgInter, "diff": T.CsgDiff}[op]
        _compare(cls(name="c", op=op, left=left, right=right), rng)

    @pytest.mark.parametrize("seed", range(8))
    def test_random_nested(self, x64, seed):
        """CSG-of-CSG (legal per geometry.d:254-256, unexercised by any
        reference scene)."""
        rng = np.random.default_rng(200 + seed)
        g = _random_csg(rng, "c", depth=2)
        # ensure at least one CSG level
        if not isinstance(g, T.CsgOp):
            g = T.CsgUnion(name="u", op="union", left=g, right=_random_leaf(rng, "r2"))
        _compare(g, rng)


class TestFuzzIsInside:
    @pytest.mark.parametrize("seed", range(5))
    def test_inside_agreement(self, x64, seed):
        rng = np.random.default_rng(300 + seed)
        g = _random_csg(rng, "c", depth=2)
        sc = T.Scene()
        node = T.Node(name="n", geometry=g, shader=T.Lambert(name="s"))
        sc.nodes = [node]
        packed, static = pack_scene(sc, dtype=jnp.float64)
        p = rng.uniform(-5, 5, (1024, 3))
        a = orc.is_inside(g, p)
        b = np.asarray(G.is_inside_expr(packed, static.nodes[0].geom, jnp.asarray(p)))
        np.testing.assert_array_equal(a, b)


class TestFuzzPallasKernel:
    """Random full scenes through the fused Pallas kernel (interpret mode)
    vs the XLA wavefront anchor: random primitive mixes, nested CSG, random
    transforms (identity / translate / scale+rotate-style matrices), random
    shader kinds and checker/proc2 textures."""

    def _random_scene(self, rng, n_nodes=3):
        sc = T.Scene()
        sc.settings.frameWidth, sc.settings.frameHeight = 32, 24
        sc.camera.set_frame_size(32, 24)
        sc.settings.AAEnabled = False
        sc.camera.pos = (0.0, float(rng.uniform(1.0, 4.0)), -8.0)
        sc.camera.pitch = float(rng.uniform(-25, 5))
        sc.lights = [
            T.PointLight(name="L", pos=tuple(rng.uniform(-5, 5, 3) + (0, 8, 0)),
                         color=(1, 1, 1), power=float(rng.uniform(30, 120)))
        ]
        for i in range(n_nodes):
            geom = _random_csg(rng, f"g{i}", depth=rng.integers(0, 3))
            skind = rng.integers(0, 3)
            if skind == 0:
                sh = T.Lambert(name=f"s{i}", color=tuple(rng.uniform(0.2, 1.0, 3)))
            elif skind == 1:
                sh = T.Phong(name=f"s{i}", color=tuple(rng.uniform(0.2, 1.0, 3)),
                             exponent=float(rng.uniform(5, 80)), strength=float(rng.uniform(0.2, 1.0)))
            else:
                sh = T.Reflection(name=f"s{i}", color=(0.9, 0.9, 0.9))
            tkind = rng.integers(0, 3)
            if tkind == 1 and skind != 2:
                sh.texture = T.Checker(name=f"t{i}", color1=tuple(rng.uniform(0, 1, 3)),
                                       color2=tuple(rng.uniform(0, 1, 3)), size=float(rng.uniform(0.5, 3)))
            elif tkind == 2 and skind != 2:
                sh.texture = T.Procedure2(
                    name=f"t{i}",
                    colorU=rng.uniform(0, 0.5, (3, 3)).tolist(),
                    colorV=rng.uniform(0, 0.5, (3, 3)).tolist(),
                    freqU=rng.uniform(0.2, 2.0, 3).tolist(),
                    freqV=rng.uniform(0.2, 2.0, 3).tolist(),
                )
            node = T.Node(name=f"n{i}", geometry=geom, shader=sh)
            tr = rng.integers(0, 3)
            if tr == 1:
                node.transform.translate(tuple(rng.uniform(-3, 3, 3)))
            elif tr == 2:
                sx, sy, sz = rng.uniform(0.6, 1.8, 3)
                node.transform.scale(float(sx), float(sy), float(sz))
                node.transform.translate(tuple(rng.uniform(-3, 3, 3)))
            sc.nodes.append(node)
            sc.geometries.append(geom)
            sc.shaders.append(sh)
        return sc

    @pytest.mark.slow  # interpret-mode fused kernels: heavy by design
    @pytest.mark.parametrize("seed", range(4))
    def test_random_bump_scene_matches_xla(self, seed):
        """Random scenes with random bump maps: the bump HYBRID
        (ops/pallas_grad.build_bump_round0 — kernel pins + tangent-carrying
        leaf-pinned XLA reshade) vs the XLA wavefront anchor, across random
        primitive mixes, CSG trees, transforms and shader kinds."""
        import dataclasses

        from chess2rt_tpu.ops.pallas_trace import build_flagship_renderer, supports
        from chess2rt_tpu.render.pipeline import render_frame

        rng = np.random.default_rng(3000 + seed)
        sc = self._random_scene(rng)
        hm = rng.uniform(0, 1, (16, 16)).astype(np.float32)
        bt = T.BumpTexture(
            name="bt", scaling=float(rng.uniform(0.2, 2.0)),
            data=np.repeat(hm[..., None], 3, axis=-1),
        )
        bt.strength = float(rng.uniform(1.0, 6.0))
        sc.textures.append(bt)
        for node in sc.nodes:
            if rng.random() < 0.7:
                node.bumpmap = bt
        sc.nodes[0].bumpmap = bt  # at least one bump-mapped node
        packed, static = pack_scene(sc, dtype=jnp.float32)
        assert static.has_bump and supports(static)
        st = dataclasses.replace(static, bounce_capacity=512)
        out = np.asarray(build_flagship_renderer(st, 32, 24, interpret=True)(packed))
        ref = np.asarray(render_frame(packed, st, jax.random.PRNGKey(0)))
        assert np.isfinite(out).all()
        d = np.abs(out - ref).max(-1)
        assert (d > 2e-3).mean() < 0.01, ((d > 2e-3).mean(), d.max())
        assert np.median(d) < 2e-4

    @pytest.mark.parametrize("seed", range(4))
    def test_random_scene_matches_xla(self, seed):
        import dataclasses

        from chess2rt_tpu.ops.pallas_trace import build_flagship_renderer, supports
        from chess2rt_tpu.render.pipeline import render_frame

        rng = np.random.default_rng(1000 + seed)
        sc = self._random_scene(rng)
        packed, static = pack_scene(sc, dtype=jnp.float32)
        assert supports(static)
        st = dataclasses.replace(static, bounce_capacity=512)
        out = np.asarray(build_flagship_renderer(st, 32, 24, interpret=True)(packed))
        ref = np.asarray(render_frame(packed, st, jax.random.PRNGKey(0)))
        assert np.isfinite(out).all()
        d = np.abs(out - ref).max(-1)
        # knife-edge tolerance: random scenes put silhouettes everywhere
        assert (d > 2e-3).mean() < 0.01, ((d > 2e-3).mean(), d.max())
        assert np.median(d) < 2e-4
