"""Scaling-efficiency harness (BASELINE north star: >=80% rays/s scaling
from 1 chip to N>=2 hosts).

Measures the distributed forward render (parallel/mesh.py: pixel-sharded,
scene replicated — zero collectives) at every device count 1..N on the
available platform and prints per-count rays/s + efficiency vs linear.

On the current single-TPU-chip environment this runs on the virtual CPU
mesh (methodology validation only — CPU "devices" share the same socket,
so efficiency there measures harness overhead, not ICI).  On a real pod
slice, run under `jax.distributed.initialize` and the same code shards
across all chips/hosts.

    python demos/scaling_bench.py --cpu --devices 8 --size 640x480
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="640x480")
    ap.add_argument("--devices", type=int, default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import os

    if args.cpu:
        n = args.devices or 8
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + f" --xla_force_host_platform_device_count={n}"
        ).strip()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from chess2rt_tpu.models.packed import pack_scene
    from chess2rt_tpu.parallel import make_mesh, make_sharded_render_fn
    from chess2rt_tpu.scene.loader import parse_scene_from_file
    from chess2rt_tpu.utils.diagnostics import frame_ray_stats

    w, h = (int(v) for v in args.size.split("x"))
    sc = parse_scene_from_file("/root/reference/data/lecture5.sdl")
    sc.settings.frameWidth, sc.settings.frameHeight = w, h
    sc.camera.set_frame_size(w, h)
    sc.settings.AAEnabled = False
    packed, static = pack_scene(sc, dtype=jnp.float32)

    devices = jax.devices()
    counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= len(devices)]
    total_rays = frame_ray_stats(packed, static)["total"]
    key = jax.random.PRNGKey(0)

    base_rate = None
    rows = []
    for c in counts:
        mesh = make_mesh(devices[:c])
        fn = make_sharded_render_fn(static, mesh)
        out = fn(packed, key)
        jnp.sum(out).block_until_ready()
        times = []
        for i in range(args.repeats):
            t0 = time.perf_counter()
            float(jnp.sum(fn(packed, jax.random.fold_in(key, i))))
            times.append(time.perf_counter() - t0)
        rate = total_rays / min(times)
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * c)
        rows.append({"devices": c, "rays_per_sec": round(rate, 1), "efficiency": round(eff, 3)})
        print(json.dumps(rows[-1]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
