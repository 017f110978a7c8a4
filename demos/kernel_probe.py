"""Round-0 kernel cost attribution probe (round-3 VERDICT item 4).

The fused kernel's 1080p tap measured ~31 ms in round 2 and was
"insensitive to scene content" — self-diagnosed spill-bound.  This probe
times STAGED variants of the kernel on the real TPU to locate where the
time actually goes:

    empty   — raygen-free: write an iota-derived f32 (grid/store floor)
    raygen  — camera ray generation only
    scan    — raygen + closest-hit scene scan (CSG + transforms)
    shadow  — scan + per-light shadow occlusion scans
    full    — the production build_round0_kernel (all outputs)

plus TILE-shape variants of `full` ((8,128) baseline vs taller tiles —
a taller tile amortizes per-grid-step overhead, fewer grid steps).

Each stage writes two f32 outputs (equal store traffic) except `full`.
Timing amortizes the ~30 ms tunnel roundtrip by running ITERS taps inside
one jit (aa_offset varies per iteration so XLA cannot CSE them).

Usage:  python demos/kernel_probe.py [stage ...]   (default: all)
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from bench import build  # flagship lecture5+mirror scene
from chess2rt_tpu.ops import pallas_trace as PT

WIDTH, HEIGHT = 1920, 1080
ITERS = 8
REPEATS = 3


def build_stage(static, width, height, stage):
    """A reduced round-0 kernel that stops after ``stage``."""
    pack, off, expr_tables, _ = PT._make_packer(static, width, height)
    n = width * height
    tile_n = PT.TILE_N
    n_pad = -(-n // tile_n) * tile_n
    grid = (n_pad // tile_n,)

    def kernel(prm_ref, out_a, out_b):
        def p(k):
            return prm_ref[k]

        if stage == "empty":
            pid = pl.program_id(0)
            lin = (
                pid * tile_n
                + jax.lax.broadcasted_iota(jnp.int32, PT.TILE, 0) * PT.TILE[1]
                + jax.lax.broadcasted_iota(jnp.int32, PT.TILE, 1)
            )
            v = lin.astype(jnp.float32) * p(off["aa"])
            out_a[:] = v
            out_b[:] = v + 1.0
            return

        ox, oy, oz, dx, dy, dz = PT._kernel_raygen(p, off, width, height)
        if stage == "raygen":
            out_a[:] = dx + dy
            out_b[:] = dz + ox + oy + oz
            return

        node_closest, node_min_dist, scene_scan = PT._node_builders(
            p, static, off, expr_tables
        )
        hit, win = scene_scan(ox, oy, oz, dx, dy, dz)
        if stage == "scan":
            out_a[:] = hit["t"]
            out_b[:] = win.astype(jnp.float32) + hit.get("u", hit["nx"])
            return

        # shadow occlusion per light (mirrors the production kernel)
        hitmask = win >= 0
        ts = jnp.where(hitmask, hit["t"], 0.0)
        hpx, hpy, hpz = ox + dx * ts, oy + dy * ts, oz + dz * ts
        ndotd = dx * hit["nx"] + dy * hit["ny"] + dz * hit["nz"]
        sgn = jnp.where(ndotd < 0, 1.0, -1.0)
        nx, ny, nz = hit["nx"] * sgn, hit["ny"] * sgn, hit["nz"] * sgn
        sx = hpx + nx * PT.EPS_SHADOW
        sy = hpy + ny * PT.EPS_SHADOW
        sz = hpz + nz * PT.EPS_SHADOW
        acc = jnp.zeros(PT.TILE, jnp.float32)
        for li in range(static.n_lights):
            lbase = off[f"light{li}"]
            lx, ly, lz = p(lbase), p(lbase + 1), p(lbase + 2)
            tx2, ty2, tz2 = lx - sx, ly - sy, lz - sz
            target = jnp.sqrt(jnp.maximum(tx2 * tx2 + ty2 * ty2 + tz2 * tz2, 1e-30))
            inv_t = 1.0 / target
            sdx, sdy, sdz = tx2 * inv_t, ty2 * inv_t, tz2 * inv_t
            occ = jnp.zeros(PT.TILE, jnp.bool_)
            for i in range(len(static.nodes)):
                occ = occ | (node_min_dist(i, sx, sy, sz, sdx, sdy, sdz) <= target)
            acc += jnp.where(occ, 0.0, 1.0)
        out_a[:] = acc
        out_b[:] = hit["t"]

    out_spec = pl.BlockSpec(PT.TILE, lambda i: (i, 0), memory_space=pltpu.VMEM)

    def run(packed, aa_offset):
        prm = pack(packed, aa_offset)
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=[out_spec, out_spec],
            out_shape=[
                jax.ShapeDtypeStruct((n_pad // PT.TILE[1], PT.TILE[1]), jnp.float32)
                for _ in range(2)
            ],
        )(prm)
        return outs[0].sum() + outs[1].sum()

    return run


def time_fn(name, fn, packed):
    """fn(packed, aa_offset) -> scalar; time ITERS varied-offset calls in
    one jit."""

    def many(p):
        def body(acc, i):
            return acc + fn(p, (i.astype(jnp.float32) * 1e-6, 0.0)), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(ITERS))
        return acc

    j = jax.jit(many)
    t_compile = time.perf_counter()
    v = float(j(packed))
    print(f"{name}: compile+first {time.perf_counter()-t_compile:.1f}s "
          f"checksum {v:.3e}", flush=True)
    assert np.isfinite(v)
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(j(packed))
        times.append(time.perf_counter() - t0)
    ms = min(times) / ITERS * 1000
    print(f"{name}: {ms:.2f} ms/tap  ({ms*1e6/(WIDTH*HEIGHT):.2f} ns/ray)",
          flush=True)
    return ms


def full_fn(static):
    kern = PT.build_round0_kernel(static, WIDTH, HEIGHT)

    def fn(packed, aa_offset):
        o = kern(packed, aa_offset)
        return sum(v.sum() for k, v in o.items() if v.dtype == jnp.float32)

    return fn


def main():
    stages = sys.argv[1:] or ["empty", "raygen", "scan", "shadow", "full",
                              "full16", "full32"]
    packed, static = build(WIDTH, HEIGHT)
    import dataclasses

    static = dataclasses.replace(static, use_pallas=True)
    print(f"# devices: {jax.devices()}", flush=True)

    for stage in stages:
        if stage.startswith("full") and stage != "full":
            rows = int(stage[4:])
            PT.TILE = (rows, 128)
            PT.TILE_N = rows * 128
        else:
            PT.TILE = (8, 128)
            PT.TILE_N = 8 * 128
        try:
            if stage.startswith("full"):
                fn = full_fn(static)
            else:
                fn = build_stage(static, WIDTH, HEIGHT, stage)
            time_fn(stage, fn, packed)
        except Exception as e:  # keep probing other stages
            print(f"{stage}: FAILED {type(e).__name__}: {e}", flush=True)
    PT.TILE = (8, 128)
    PT.TILE_N = 1024


if __name__ == "__main__":
    main()
