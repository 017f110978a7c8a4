"""GI path-tracing throughput on the real TPU (BASELINE row: lecture4 +
bounce wall, 640x480, 40 paths/px, depth 5, NEE extension).

Times the fused want_hit GI renderer and the pure-XLA path-tracer, K
genuinely-distinct frames per program (the GI pipeline consumes its RNG
key, so unlike the deterministic flagship the scan body can never be
LICM-hoisted — but we fold the key anyway for uniformity with bench.py).

Usage: python demos/gi_probe.py [kernel xla ...]
"""

from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from chess2rt_tpu.models import types as T
from chess2rt_tpu.models.packed import pack_scene
from chess2rt_tpu.render.pipeline import render_frame
from chess2rt_tpu.scene.loader import parse_scene_from_file

W, H = 640, 480
ITERS = 4
REPEATS = 3


def build():
    sc = parse_scene_from_file("/root/reference/data/lecture4.sdl")
    sc.settings.frameWidth, sc.settings.frameHeight = W, H
    sc.camera.set_frame_size(W, H)
    sc.settings.AAEnabled = False
    sc.settings.GIEnabled = True
    sc.settings.pathsPerPixel = 40
    sc.nodes.append(
        T.Node(
            name="wall",
            geometry=T.Sphere(name="w", center=(60, 80, 330), R=50.0),
            shader=T.Lambert(name="white", color=(0.8, 0.8, 0.8)),
        )
    )
    sc.geometries.append(sc.nodes[-1].geometry)
    sc.shaders.append(sc.nodes[-1].shader)
    packed, static = pack_scene(sc, dtype=jnp.float32)
    return packed, dataclasses.replace(static, gi_point_light_direct=True)


def timeit(name, renderer, packed):
    def many(p, keys):
        def body(acc, k):
            return acc + renderer(p, k).sum(), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), keys)
        return acc

    j = jax.jit(many)
    keys = jax.random.split(jax.random.PRNGKey(0), ITERS)
    t0 = time.perf_counter()
    v = float(np.asarray(j(packed, keys)))
    c = time.perf_counter() - t0
    assert np.isfinite(v) and v > 0, (name, v)
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(np.asarray(j(packed, keys)))
        times.append(time.perf_counter() - t0)
    ms = min(times) / ITERS * 1000
    segs = W * H * 40 * 5  # upper-bound path segments (camera paths x depth)
    print(
        f"{name}: {ms:.1f} ms/frame raw (checksum {v:.4e}; ~{30/ITERS:.1f} ms tunnel "
        f"share; compile {c:.0f}s; {W*H*40/1e6:.1f}M camera paths)",
        flush=True,
    )


def main():
    modes = sys.argv[1:] or ["kernel", "xla"]
    packed, static = build()
    print(f"# devices: {jax.devices()}", flush=True)
    for mode in modes:
        if mode == "kernel":
            from chess2rt_tpu.ops.pallas_trace import build_gi_renderer, supports_gi

            st = dataclasses.replace(static, use_pallas=True)
            assert supports_gi(st)
            renderer = build_gi_renderer(st, W, H)
            timeit(mode, renderer, packed)
        else:
            st = dataclasses.replace(static, use_pallas=False)
            timeit(mode, lambda p, k: render_frame(p, st, k), packed)


if __name__ == "__main__":
    main()
