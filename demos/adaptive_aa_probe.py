"""Adaptive-AA probe (adaptiveAA extension): flagged fraction + frame time.

Measures, on the bench flagship config (lecture5 + mirror, 1080p depth-5):
  1. the needs-AA mask's flagged pixel / 128-lane-block fractions (sizes
     `aa_capacity`),
  2. quirk (resample-everything) vs adaptive frame time, key-jittered
     like bench.py so LICM can't hoist the scan body (CLAUDE.md).

Usage: python demos/adaptive_aa_probe.py [--size WxH] [--iters N]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1920x1080")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--cap", type=int, default=0, help="aa_capacity override (lanes)")
    ap.add_argument("--adaptive-only", action="store_true")
    args = ap.parse_args()
    w, h = (int(v) for v in args.size.split("x"))

    from bench import build
    from chess2rt_tpu.render.pipeline import aa_detect, render_frame

    packed, static = build(w, h)
    static = dataclasses.replace(
        static,
        use_pallas=True,
        fast_forward=True,
        bounce_capacity=w * h // 16,
        bounce_mode="block",
    )
    print(f"# {jax.devices()}  {w}x{h}", flush=True)

    # -- mask statistics (from the fused base tap) -------------------------
    from chess2rt_tpu.ops.pallas_trace import build_flagship_renderer

    st_base = dataclasses.replace(static, aa_enabled=False)
    tap = build_flagship_renderer(st_base, w, h, False)

    @jax.jit
    def mask_stats(p):
        base = tap(p).reshape(h, w, 3)
        m = aa_detect(base).reshape(-1)
        blk = m.reshape(-1, 128).any(axis=1)
        return jnp.stack([m.sum(), blk.sum()]).astype(jnp.int32)

    s = np.asarray(mask_stats(packed))
    n = w * h
    nblk = n // 128
    print(
        f"flagged pixels {s[0]}/{n} ({100.0 * s[0] / n:.2f}%)  "
        f"flagged blocks {s[1]}/{nblk} ({100.0 * s[1] / nblk:.2f}%)  "
        f"default aa_capacity n//32 = {-(-n // 32)} lanes",
        flush=True,
    )

    # -- frame time: quirk vs adaptive --------------------------------------
    def timed(st, label):
        def many(p, keys):
            def body(acc, k):
                jit_pos = (jax.random.uniform(k, (3,), jnp.float32) - 0.5) * 1e-4
                p2 = dataclasses.replace(
                    p, camera=dataclasses.replace(p.camera, pos=p.camera.pos + jit_pos)
                )
                return acc + render_frame(p2, st, k).sum(), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), keys)
            return acc

        fn = jax.jit(many)
        key = jax.random.PRNGKey(0)
        t0 = time.perf_counter()
        v = float(fn(packed, jax.random.split(key, args.iters)))
        comp = time.perf_counter() - t0
        assert np.isfinite(v) and v > 0
        times = []
        for i in range(3):
            ks = jax.random.split(jax.random.fold_in(key, i), args.iters)
            t0 = time.perf_counter()
            float(fn(packed, ks))
            times.append(time.perf_counter() - t0)
        ms = min(times) / args.iters * 1000
        print(f"{label}: {ms:.1f} ms/frame raw (compile {comp:.0f}s, checksum {v:.6e})", flush=True)
        return ms

    st_a = dataclasses.replace(
        static, aa_adaptive=True, aa_capacity=args.cap or None
    )
    if args.adaptive_only:
        timed(st_a, f"adaptive AA (cap={args.cap or 'default'})")
        return
    q = timed(static, "quirk AA (resample all)")
    a = timed(st_a, f"adaptive AA (mask-honored, cap={args.cap or 'default'})")
    print(f"speedup {q / a:.2f}x", flush=True)


if __name__ == "__main__":
    main()
