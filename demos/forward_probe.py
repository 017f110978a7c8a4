"""Flagship forward cost attribution (round 3).

demos/kernel_probe.py showed the fused round-0 kernel itself costs ~1 ms
per 1080p tap once the ~30 ms tunnel roundtrip is amortized out — the
flagship frame is dominated by the XLA glue around it (round-3 final:
tap ≈ kern 0.3-1.3 + combine 9.4 [texel gather ~8, the per-index floor]
+ block bounce ~1.2 ms; frame 65.5 ms raw).  This probe times staged
slices of one tap on the real TPU:

    kern      — the round-0 pallas_call alone (sum of raw outputs)
    combine   — kern + combine_outputs (deferred bitmap texel gather, env)
    tap       — render_tap (combine + compacted Pallas bounce rounds)
    frame     — the full 5-tap AA frame via build_flagship_renderer

Usage: python demos/forward_probe.py [stage ...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bench import build  # flagship lecture5+mirror scene
from chess2rt_tpu.ops import pallas_trace as PT

WIDTH, HEIGHT = 1920, 1080
ITERS = 8
REPEATS = 3


def time_fn(name, fn, packed, iters=ITERS):
    def many(p):
        def body(acc, i):
            return acc + fn(p, (i.astype(jnp.float32) * 1e-6, 0.0)), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(iters))
        return acc

    j = jax.jit(many)
    t0 = time.perf_counter()
    v = float(j(packed))
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s checksum {v:.3e}", flush=True)
    assert np.isfinite(v)
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(j(packed))
        times.append(time.perf_counter() - t0)
    total = min(times)
    ms = total / iters * 1000
    print(f"{name}: {ms:.2f} ms/tap raw ({total*1000:.1f} ms for {iters}; "
          f"subtract the ~30 ms roundtrip once per call)", flush=True)
    return total


def main():
    stages = sys.argv[1:] or ["kern", "combine", "tap", "frame"]
    import dataclasses

    packed, static = build(WIDTH, HEIGHT)
    static = dataclasses.replace(
        static, use_pallas=True, fast_forward=True, bounce_capacity=2073600 // 16
    )
    print(f"# devices: {jax.devices()}", flush=True)

    kern = PT.build_round0_kernel(static, WIDTH, HEIGHT)
    renderer = PT.build_flagship_renderer(static, WIDTH, HEIGHT)
    renderer_full = PT.build_flagship_renderer(
        dataclasses.replace(static, bounce_mode="full"), WIDTH, HEIGHT)
    # depth-limited renderers: marginal cost per bounce round
    renderer_r1 = PT.build_flagship_renderer(
        dataclasses.replace(static, max_trace_depth=1), WIDTH, HEIGHT)
    renderer_r3 = PT.build_flagship_renderer(
        dataclasses.replace(static, max_trace_depth=3), WIDTH, HEIGHT)

    def kern_fn(p, aa):
        o = kern(p, jnp.asarray(aa, jnp.float32).reshape(2))
        return sum(v.sum() for v in o.values() if v.dtype == jnp.float32)

    def combine_fn(p, aa):
        aa = jnp.asarray(aa, jnp.float32).reshape(2)
        o = kern(p, aa)
        color, cont, atten, ro, rd = PT.combine_outputs(p, static, o, None)
        s = color.sum()
        if cont is not None:
            s = s + atten.sum() + ro.sum() + rd.sum()
        return s

    def tap_fn(p, aa):
        return renderer.tap(p, jnp.asarray(aa, jnp.float32).reshape(2)).sum()

    def tap_full_fn(p, aa):
        return renderer_full.tap(p, jnp.asarray(aa, jnp.float32).reshape(2)).sum()

    def frame_full_fn(p, aa):
        key = jax.random.PRNGKey(0)
        return renderer_full(p, key).sum() + 0.0 * jnp.asarray(aa[0])

    def tap_r1_fn(p, aa):
        return renderer_r1.tap(p, jnp.asarray(aa, jnp.float32).reshape(2)).sum()

    def tap_r3_fn(p, aa):
        return renderer_r3.tap(p, jnp.asarray(aa, jnp.float32).reshape(2)).sum()

    def frame_fn(p, aa):
        key = jax.random.PRNGKey(0)
        return renderer(p, key).sum() + 0.0 * jnp.asarray(aa[0])

    # ---- combine sub-pieces --------------------------------------------
    from chess2rt_tpu.ops import shade as S

    def combine_color_fn(p, aa):
        o = kern(p, jnp.asarray(aa, jnp.float32).reshape(2))
        return jnp.stack([o["r"], o["g"], o["b"]], axis=-1).sum()

    def combine_tex_fn(p, aa):
        o = kern(p, jnp.asarray(aa, jnp.float32).reshape(2))
        winc = jnp.maximum(o["win"], 0)
        tex = S.bitmap_color(packed, static, winc, o["u"], o["v"])
        return tex.sum() + o["r"].sum()

    def combine_book_fn(p, aa):
        o = kern(p, jnp.asarray(aa, jnp.float32).reshape(2))
        winc = jnp.maximum(o["win"], 0)
        onehot = S.node_onehot(static, winc)
        skind = S.shader_kind_of(static, winc)
        cont = (o["win"] >= 0) & ((skind == 2) | (skind == 3))
        atten = jnp.where(cont[..., None], S.node_gather(onehot, p.mat_color), 1.0)
        return atten.sum() + o["r"].sum()

    # ---- bounce machinery without any rounds ----------------------------
    from chess2rt_tpu.render import pipeline as P

    def compact_fn(p, aa):
        o = kern(p, jnp.asarray(aa, jnp.float32).reshape(2))
        color, cont, atten, ro, rd = PT.combine_outputs(p, static, o, None)
        n = WIDTH * HEIGHT
        cap = static.bounce_capacity
        count = cont.sum()
        sel = P.compact_indices(cont, n, cap)
        lane_live = jnp.arange(cap) < count
        sub = jnp.where(lane_live[..., None], atten[sel] + ro[sel] + rd[sel], 0.0)
        return color.at[sel].add(sub).sum()

    # incremental bounce-machinery slices mirroring pallas_bounces exactly
    def _upto(p, aa, stage):
        from chess2rt_tpu.ops.fastgather import row_gather

        o = kern(p, jnp.asarray(aa, jnp.float32).reshape(2))
        color, cont, atten, ro, rd = PT.combine_outputs(p, static, o, None)
        n = WIDTH * HEIGHT
        cap = -(-static.bounce_capacity // PT.TILE_N) * PT.TILE_N
        count = cont.sum()
        sel = P.compact_indices(cont, n, cap)
        if stage == "sel":
            return color.sum() + sel.sum().astype(jnp.float32)
        lane_live = jnp.arange(cap) < count
        g = row_gather(jnp.concatenate([atten, ro, rd], axis=-1), sel, True, True,
                       stage == "selgather_fold")
        if stage in ("selgather", "selgather_fold"):
            return color.sum() + g.sum()
        tgt = jnp.where(lane_live, sel, n)
        out = color.at[tgt].add(g[:, 0:3], mode="drop", indices_are_sorted=True)
        return out.sum()

    fns = {
        "kern": kern_fn,
        "sel": lambda p, aa: _upto(p, aa, "sel"),
        "selgather": lambda p, aa: _upto(p, aa, "selgather"),
        "selgather_fold": lambda p, aa: _upto(p, aa, "selgather_fold"),
        "scatterback": lambda p, aa: _upto(p, aa, "scatterback"),
        "combine": combine_fn,
        "combine_color": combine_color_fn,
        "combine_tex": combine_tex_fn,
        "combine_book": combine_book_fn,
        "compact": compact_fn,
        "tap": tap_fn,
        "tap_full": tap_full_fn,
        "tap_r1": tap_r1_fn,
        "tap_r3": tap_r3_fn,
        "frame": frame_fn,
        "frame_full": frame_full_fn,
    }
    for stage in stages:
        try:
            time_fn(stage, fns[stage], packed, iters=(4 if stage.startswith("frame") else ITERS))
        except Exception as e:
            print(f"{stage}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
