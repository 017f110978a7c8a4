"""A/B the flagship 1080p frame across bounce modes on the real TPU.

Times the full 5-tap AA frame (key-jittered per iteration, LICM-proof)
for bounce_mode in {full, block} — lane-granular "compact" already
measured slower than "full" (demos/compaction_probe.py).

Usage: python demos/bounce_mode_probe.py [--size WxH] [full block ...]
"""

from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bench import build
from chess2rt_tpu.ops import pallas_trace as PT

W, H = 1920, 1080
ITERS = 4
REPEATS = 3


def timeit(name, renderer, packed):
    def many(p, keys):
        def body(acc, k):
            d = (jax.random.uniform(k, (3,), jnp.float32) - 0.5) * 1e-4
            pj = dataclasses.replace(
                p, camera=dataclasses.replace(p.camera, pos=p.camera.pos + d)
            )
            return acc + renderer(pj).sum(), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), keys)
        return acc

    j = jax.jit(many)
    keys = jax.random.split(jax.random.PRNGKey(0), ITERS)
    t0 = time.perf_counter()
    v = float(np.asarray(j(packed, keys)))
    c = time.perf_counter() - t0
    assert np.isfinite(v), (name, v)
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(np.asarray(j(packed, keys)))
        times.append(time.perf_counter() - t0)
    ms = min(times) / ITERS * 1000
    print(
        f"{name}: {ms:.2f} ms/frame raw (checksum {v:.4e}; incl ~{30/ITERS:.1f} ms "
        f"tunnel share; compile {c:.0f}s)",
        flush=True,
    )


def main():
    args = sys.argv[1:]
    w, h = W, H
    if "--size" in args:
        i = args.index("--size")
        w, h = (int(v) for v in args[i + 1].split("x"))
        del args[i : i + 2]
    no_aa = "--no-aa" in args
    if no_aa:
        args.remove("--no-aa")
    chunk = None
    if "--chunk" in args:
        i = args.index("--chunk")
        chunk = int(args[i + 1])
        del args[i : i + 2]
    blkcap = None
    if "--blkcap" in args:
        i = args.index("--blkcap")
        blkcap = int(args[i + 1])
        del args[i : i + 2]
    modes = args or ["full", "block"]
    packed, static = build(w, h)
    print(f"# devices: {jax.devices()}  {w}x{h}  aa={not no_aa}", flush=True)
    for mode in modes:
        st = dataclasses.replace(
            static,
            use_pallas=True,
            fast_forward=True,
            bounce_capacity=w * h // 16,
            bounce_mode=mode,
            aa_enabled=not no_aa,
            chunk_pixels=chunk,
            bounce_block_capacity=blkcap,
        )
        renderer = PT.build_flagship_renderer(st, w, h)
        timeit(mode, renderer, packed)


if __name__ == "__main__":
    main()
