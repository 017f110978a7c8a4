"""Measured roofline for the flagship AA5 frame (round-4 VERDICT item 1b;
the SURVEY §5.1 profiling artifact's quantitative companion).

Times staged slices of the 1080p depth-5 AA-5 flagship frame on the real
chip (key-distinct iterations so XLA's while-loop LICM cannot hoist the
body — CLAUDE.md), then measures the HARDWARE FLOORS each stage sits on
in the same process on the same chip:

  tunnel_ms      one bare-scalar program execution (the ~30 ms axon
                 roundtrip every amortized number carries /ITERS)
  gather_ns_row  a synthetic u16-folded row gather at the texel fetch's
                 exact shape (quad-table rows x 24 B, one index per ray)
                 — the per-index cost class of CLAUDE.md rule 1b
  hbm_gbps       achieved big-array copy stream bandwidth (read+write)

and emits a markdown roofline table + ``roofline.json``.  The flagship
frame has no large matmuls (node lookups are tiny one-hot matmuls), so
the MXU roof is irrelevant: the kernel is VPU/transcendental-bound and
everything around it is gather-latency- or HBM-bound.

    python demos/roofline.py                    # full table
    python demos/roofline.py --trace artifacts/xprof_flagship
                                                # + jax.profiler trace of
                                                #   one frame execution

The --trace artifact is the checked-in §5.1 equivalent: open with
xprof/tensorboard ("Trace Viewer") or feed the .json.gz to Perfetto.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build  # the flagship lecture5+mirror scene

WIDTH, HEIGHT = 1920, 1080
N = WIDTH * HEIGHT
ITERS = 8
REPEATS = 3


def _time_many(fn, *args, iters=1):
    """min-of-REPEATS wall time of the jitted fn (already compiled)."""
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times) / iters


def measure_tunnel():
    f = jax.jit(lambda s: s * 2.0 + 1.0)
    s = jnp.float32(3.0)
    float(f(s))
    return _time_many(f, s)


def measure_gather_floor(rows, idx_n):
    """Synthetic texel-fetch twin: [rows, 12] f32 table (u16-folded by
    ops/fastgather like the real quad atlas), idx_n random row indices."""
    from chess2rt_tpu.ops.fastgather import row_gather_raw

    table = jnp.asarray(np.random.default_rng(0).random((rows, 12), np.float32))
    idx = jnp.asarray(np.random.default_rng(1).integers(0, rows, idx_n, np.int32))

    def many(t, i0):
        def body(acc, k):
            # new index vector each iteration (rotate) => not loop-invariant
            i = (i0 + k) % rows
            return acc + row_gather_raw(t, i, fold=True).sum(), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(ITERS))
        return acc

    f = jax.jit(many)
    assert np.isfinite(float(f(table, idx)))
    return _time_many(f, table, idx, iters=ITERS)


def measure_hbm_bw(mb=512):
    """Achieved read+write stream bandwidth: the scan CARRY is the full
    array, so every iteration must materialize a fresh n-element buffer
    (read n + write n) — a strided/sliced checksum would let XLA DCE the
    add (the first cut measured a fake 232 GB/s that way)."""
    n = mb * 1024 * 1024 // 4
    x = jnp.zeros((n,), jnp.float32)

    def many(x0):
        def body(carry, k):
            return carry * 0.999 + k.astype(jnp.float32), None

        y, _ = jax.lax.scan(body, x0, jnp.arange(ITERS))
        return y.sum()

    f = jax.jit(many)
    float(f(x))
    dt = _time_many(f, x, iters=ITERS)
    return (2 * n * 4) / dt / 1e9, dt  # GB/s moved per iteration


def stage_fns(packed, static):
    from chess2rt_tpu.ops import pallas_trace as PT
    from chess2rt_tpu.ops import shade as S

    kern = PT.build_round0_kernel(static, WIDTH, HEIGHT)
    renderer = PT.build_flagship_renderer(static, WIDTH, HEIGHT)

    def kern_fn(p, aa):
        o = kern(p, aa)
        return sum(v.sum() for v in o.values() if v.dtype == jnp.float32)

    def combine_tex_fn(p, aa):
        o = kern(p, aa)
        winc = jnp.maximum(o["win"], 0)
        return S.bitmap_color(packed, static, winc, o["u"], o["v"]).sum() + o["r"].sum()

    def combine_fn(p, aa):
        o = kern(p, aa)
        color, cont, atten, ro, rd = PT.combine_outputs(p, static, o, None)
        s = color.sum()
        if cont is not None:
            s = s + atten.sum() + ro.sum() + rd.sum()
        return s

    def tap_fn(p, aa):
        return renderer.tap(p, aa).sum()

    def frame_fn(p, aa):
        return renderer(p, jax.random.PRNGKey(0)).sum() + 0.0 * aa[0]

    return {
        "kern": (kern_fn, ITERS),
        "combine_tex": (combine_tex_fn, ITERS),
        "combine": (combine_fn, ITERS),
        "tap": (tap_fn, ITERS),
        "frame": (frame_fn, 4),
    }, renderer


def measure_stage(fn, packed, iters):
    def many(p):
        def body(acc, i):
            aa = jnp.stack([i.astype(jnp.float32) * 1e-6, jnp.float32(0.0)])
            return acc + fn(p, aa), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(iters))
        return acc

    j = jax.jit(many)
    v = float(j(packed))
    assert np.isfinite(v), v
    return _time_many(j, packed, iters=iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of one frame execution into DIR")
    ap.add_argument("--out", default=None, help="write the JSON artifact here")
    args = ap.parse_args()

    packed, static = build(WIDTH, HEIGHT)
    static = dataclasses.replace(
        static, use_pallas=True, fast_forward=True,
        bounce_capacity=N // 16, bounce_mode="block",
    )
    print(f"# devices: {jax.devices()}", file=sys.stderr)

    fns, renderer = stage_fns(packed, static)

    # ---- floors (measured on-chip, same process) -------------------------
    tunnel = measure_tunnel()
    from chess2rt_tpu.ops.shade import _quad_atlas_flat

    quad_rows = _quad_atlas_flat(packed.bitmap_atlas, static.bitmap_sizes).shape[0]
    g_dt = measure_gather_floor(quad_rows, N)
    gather_ns = g_dt / N * 1e9
    hbm_gbps, _ = measure_hbm_bw()
    print(f"# floors: tunnel {tunnel*1e3:.1f} ms, texel-shape gather "
          f"{gather_ns:.2f} ns/row ({quad_rows} rows), HBM copy {hbm_gbps:.0f} GB/s",
          file=sys.stderr)

    # ---- stages ----------------------------------------------------------
    raw = {}
    for name, (fn, iters) in fns.items():
        raw[name] = measure_stage(fn, packed, iters)
        net = raw[name] - tunnel / iters
        print(f"{name}: {raw[name]*1e3:.2f} ms raw ({iters} iters/call), "
              f"{net*1e3:.2f} ms net of tunnel share", file=sys.stderr)

    net = {k: raw[k] - tunnel / (4 if k == "frame" else ITERS) for k in raw}

    # ---- derived attribution + floor models ------------------------------
    # texel gather = combine_tex - kern; combine rest = combine - combine_tex
    # bounce rounds = tap - combine; AA5 overhead = frame - 5*tap
    tex = net["combine_tex"] - net["kern"]
    rest = net["combine"] - net["combine_tex"]
    bounce = net["tap"] - net["combine"]
    aa5 = net["frame"] - 5 * net["tap"]
    kern_out_bytes = 10 * 4 * N  # ~10 f32 outputs per ray
    rows = [
        # (phase, measured ms/frame, floor ms, floor basis)
        ("kernel taps (5x)", 5 * net["kern"] * 1e3,
         5 * kern_out_bytes / (hbm_gbps * 1e9) * 1e3,
         "HBM write of kernel outputs (VPU-transcendental-bound above it)"),
        ("texel quad gathers (5x)", 5 * tex * 1e3, 5 * g_dt * 1e3,
         f"measured synthetic RANDOM-index row gather at the exact table shape "
         f"({gather_ns:.1f} ns/row); the real gather can run slightly below it "
         f"(residual index coherence) — this per-index cost class IS the frame's floor"),
        ("combine rest (5x)", 5 * rest * 1e3,
         5 * 2 * kern_out_bytes / (hbm_gbps * 1e9) * 1e3,
         "HBM re-read of kernel outputs + frame write"),
        ("block bounce rounds (5x)", 5 * bounce * 1e3, 0.0,
         "~8%-width rounds; floor ~5x kernel-bytes x 0.08"),
        ("AA combine + schedule", aa5 * 1e3, 0.0, "5-tap average + dispatch slack"),
        ("tunnel share (/4 frames)", tunnel / 4 * 1e3, tunnel / 4 * 1e3,
         "measured bare-scalar roundtrip, amortized by FRAMES_PER_CALL=4"),
    ]
    total_floor = sum(r[2] for r in rows) + 0.0
    print("\n| phase | measured ms | floor ms | floor basis |")
    print("|---|---|---|---|")
    for name, ms, fl, basis in rows:
        print(f"| {name} | {ms:.1f} | {fl:.2f} | {basis} |")
    print(f"| **frame (raw, measured directly)** | **{raw['frame']*1e3:.1f}** | "
          f"{total_floor:.1f} | sum of floors |")

    payload = {
        "frame_ms_raw": round(raw["frame"] * 1e3, 2),
        "tunnel_ms": round(tunnel * 1e3, 2),
        "gather_ns_per_row": round(gather_ns, 2),
        "quad_table_rows": int(quad_rows),
        "hbm_copy_gbps": round(hbm_gbps, 1),
        "stages_net_ms": {k: round(v * 1e3, 2) for k, v in net.items()},
        "attribution_ms_per_frame": {r[0]: round(r[1], 2) for r in rows},
        "floors_ms_per_frame": {r[0]: round(r[2], 2) for r in rows},
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)
    print(json.dumps({"metric": "roofline_frame_ms", "value": payload["frame_ms_raw"],
                      "unit": "ms/frame", "vs_baseline": None}))

    if args.trace:
        os.makedirs(args.trace, exist_ok=True)
        key = jax.random.PRNGKey(7)
        f = jax.jit(lambda p, k: renderer(p, k).sum())
        float(f(packed, key))  # compile outside the trace window
        with jax.profiler.trace(args.trace):
            float(f(packed, jax.random.fold_in(key, 1)))
        print(f"# trace written to {args.trace}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
