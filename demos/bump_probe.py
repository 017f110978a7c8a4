"""Bump-mapping perf story (round-4 VERDICT item 4).

The BumpTexture extension (the reference's staged-but-never-implemented
bump machinery: renderer.d:370-372 hook, bitmap.d:139-154 differentiate,
node.d:72-81 bumpmap parsing) renders through the bump HYBRID on the
fused path (ops/pallas_grad.build_bump_round0): the kernel pins
(win, vis, t, N) — closest-hit + shadow scans stay in VMEM — and a
differentiable XLA reshade with tangent-carrying leaf-pinned records
applies the perturbation before lighting.  This probe puts numbers on
the configurations so BASELINE.md has a bump row:

    bump_fused   the bump scene through the hybrid (what ships)
    bump_xla     the same scene through the XLA wavefront — CAUTION: the
                 tangent-carrying traversal (scene_closest(tangents=True))
                 crashes the XLA TPU compiler (fusion-pass SIGILL for
                 cube tangents, compile hang for sphere/cube), measured
                 2026-08-20 — on real TPU the hybrid is the ONLY path
                 that renders bump scenes at all
    nobump_xla   bump off, XLA path — isolates the bump machinery cost
    nobump_fused bump off, fused kernel — the in-kernel-shading gap the
                 hybrid pays for re-shading in XLA

Why the kernel doesn't carry bump IN-kernel: the bumped normal feeds the
in-kernel lighting sums, so the deferred-texel trick (win/u/v out, one
XLA gather after) cannot compose — lighting would need the perturbed
normal BEFORE the in-kernel shadow scans, and Mosaic has no per-lane
vector gather for the bump atlas (the same reason bitmap TEXELS defer to
XLA, CLAUDE.md rule 7).  The hybrid keeps both heavy traversals fused
and pays one XLA re-shade: its cost vs nobump_fused is the honest price
of the extension.

Scene: the tests/test_bump.py coverage scene (plane + sphere +
transformed cube + CSG diff, every tangent case) at 1920x1080, AA 5.

Usage: python demos/bump_probe.py [--size WxH] [--iters N]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from chess2rt_tpu.models import types as T
from chess2rt_tpu.models.packed import pack_scene
from chess2rt_tpu.render.pipeline import render_frame
from chess2rt_tpu.utils.diagnostics import frame_ray_stats

REPEATS = 3


def _heightmap():
    hh, ww = 32, 32
    yy, xx = np.mgrid[0:hh, 0:ww]
    height = (0.5 + 0.5 * np.sin(xx * 0.25) * np.cos(yy * 0.2)).astype(np.float32)
    return np.repeat(height[..., None], 3, axis=-1)


def build(width, height, bump=True, csg_bump=True):
    sc = T.Scene()
    sc.settings.frameWidth, sc.settings.frameHeight = width, height
    sc.settings.AAEnabled = True
    sc.settings.maxTraceDepth = 2
    sc.camera = T.Camera(pos=(0, 60, -120), yaw=0, pitch=-15, fov=90)
    sc.camera.set_frame_size(width, height)
    sc.lights.append(T.PointLight(pos=(60, 180, -60), color=(1, 1, 1), power=40000))
    lam = T.Lambert(name="l", color=(0.7, 0.7, 0.7))
    sc.shaders.append(lam)
    bt = T.BumpTexture(name="bt", scaling=0.05, data=_heightmap())
    bt.strength = 8.0
    sc.textures.append(bt)

    def node(name, geom, transform=None, bumped=True):
        sc.geometries.append(geom)
        n = T.Node(name=name, geometry=geom, shader=lam)
        if transform:
            transform(n.transform)
        if bump and bumped:
            n.bumpmap = bt
        sc.nodes.append(n)

    node("floor", T.Plane(name="p", y=0, limit=200))
    node("ball", T.Sphere(name="s", center=(0, 40, 30), R=30.0))
    node(
        "box",
        T.Cube(name="c", center=(0, 0, 0), side=30.0),
        transform=lambda tr: (tr.scale(1.5, 1.0, 1.0), tr.translate((-60, 20, 10))),
    )
    node(
        "csg",
        T.CsgDiff(
            name="d",
            left=T.Sphere(name="ds", center=(60, 25, 0), R=25.0),
            right=T.Sphere(name="ds2", center=(60, 40, -15), R=20.0),
        ),
        bumped=csg_bump,
    )
    return pack_scene(sc, dtype=jnp.float32)


def time_stages(packed, static, iters):
    """Cumulative stage ladder of the bump hybrid's XLA side at ONE tap
    (AA off): kern (want_hit+want_vis kernel alone) -> rays (+XLA ray
    twin) -> pins (+compute_leaf_pins) -> record (+tangent-carrying
    leaf-pinned record) -> reshade (the full differentiable-reshade
    forward) -> fast (the kernel-record fast forward that ships,
    pallas_grad._fast_out's structure).  Differences between consecutive
    rows are the per-stage costs quoted in BASELINE.md's bump row."""
    from chess2rt_tpu.ops.pallas_grad import (
        _gen_rays, build_round0_kernel, compute_leaf_pins, leaf_pinned_record,
        reconstruct_tangents, reshade, _shade_pinned)

    W, H = static.width, static.height
    kern = build_round0_kernel(static, W, H, want_hit=True, want_vis=True)
    vis_names = [f"vis{li}" for li in range(static.n_lights)]

    def stage(which):
        def f(p, keys):
            def body(acc, k):
                jit = (jax.random.uniform(k, (3,), jnp.float32) - 0.5) * 1e-4
                p2 = dataclasses.replace(
                    p, camera=dataclasses.replace(p.camera, pos=p.camera.pos + jit)
                )
                o = kern(p2, (0.0, 0.0))
                if which == "kern":
                    return acc + o["t"].sum() + o["r"].sum(), None
                orig, dir = _gen_rays(p2, W, H, jnp.zeros(2))
                if which == "rays":
                    return acc + o["t"].sum() + orig.sum() + dir.sum(), None
                win = o["win"]
                winc = jnp.maximum(win, 0)
                n_pin = jnp.stack([o["nx"], o["ny"], o["nz"]], -1)
                if which == "fast":
                    rec = {"dist": o["t"], "normal": n_pin, "u": o["u"], "v": o["v"]}
                    rec["dndx"], rec["dndy"] = reconstruct_tangents(p2, static, winc, n_pin)
                    vis = [o[kk] > 0.5 for kk in vis_names]
                    diffuse = jnp.stack([o["dr"], o["dg"], o["db"]], -1)
                    out = _shade_pinned(p2, static, orig, dir, win, vis, rec,
                                        bump=True, diffuse=diffuse)
                    return acc + sum(v.sum() for v in out.values()), None
                gleaf, sel = compute_leaf_pins(p2, static, orig, dir, win, o["t"])
                if which == "pins":
                    return acc + o["t"].sum() + gleaf.sum() + sel.sum(), None
                if which == "record":
                    rec = leaf_pinned_record(p2, static, orig, dir, gleaf, sel,
                                             n_pin, tangents=True)
                    return acc + sum(v.sum() for v in rec.values()), None
                vis = [o[kk] > 0.5 for kk in vis_names]
                out = reshade(p2, static, orig, dir, win, vis,
                              rec_pins=(gleaf, sel, n_pin), bump=True)
                return acc + sum(v.sum() for v in out.values()
                                 if v.dtype == jnp.float32), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), keys)
            return acc

        return jax.jit(f)

    key = jax.random.PRNGKey(0)
    results = {}
    for which in ["kern", "rays", "pins", "record", "reshade", "fast"]:
        fn = stage(which)
        t0 = time.perf_counter()
        v = float(fn(packed, jax.random.split(key, iters)))
        t_first = time.perf_counter() - t0
        times = []
        for i in range(REPEATS):
            t0 = time.perf_counter()
            float(fn(packed, jax.random.split(jax.random.fold_in(key, i + 1), iters)))
            times.append(time.perf_counter() - t0)
        ms = min(times) / iters * 1e3
        results[which] = round(ms, 2)
        print(f"{which:8s} {ms:7.1f} ms/frame  (first {t_first:.0f}s, chk {v:.3e})",
              flush=True)
    print(json.dumps(results))


def time_config(name, packed, static, iters, grad=False):
    def one(p, k):
        # key-jittered camera: every scan iteration renders (LICM rule)
        jit_pos = (jax.random.uniform(k, (3,), jnp.float32) - 0.5) * 1e-4
        p2 = dataclasses.replace(
            p, camera=dataclasses.replace(p.camera, pos=p.camera.pos + jit_pos)
        )
        return render_frame(p2, static, k).sum()

    if grad:
        def many(p, keys):
            def body(acc, k):
                v, g = jax.value_and_grad(one)(p, k)
                return acc + v + jnp.abs(g.light_power).sum(), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), keys)
            return acc
    else:
        def many(p, keys):
            def body(acc, k):
                return acc + one(p, k), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), keys)
            return acc

    fn = jax.jit(many)
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    v = float(fn(packed, jax.random.split(key, iters)))
    print(f"# {name}: compile+first {time.perf_counter()-t0:.0f}s checksum {v:.4e}",
          file=sys.stderr, flush=True)
    assert np.isfinite(v) and v > 0, (name, v)
    times = []
    for i in range(REPEATS):
        t0 = time.perf_counter()
        float(fn(packed, jax.random.split(jax.random.fold_in(key, i + 1), iters)))
        times.append(time.perf_counter() - t0)
    return min(times) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1920x1080")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--chunk", type=int, default=518400,
                    help="chunk_pixels memory/program-size knob (the 1080p bump "
                         "wavefront un-chunked SIGILLs the XLA TPU fusion pass)")
    ap.add_argument("--configs", nargs="*",
                    default=["bump_fused", "nobump_fused", "nobump_xla"])
    ap.add_argument("--grad", action="store_true",
                    help="time a full value_and_grad step per frame instead "
                         "of the forward render (AA off, like bench --grad)")
    ap.add_argument("--stages", action="store_true",
                    help="cumulative per-stage ladder of the hybrid's XLA "
                         "side at one tap (the BASELINE attribution)")
    args = ap.parse_args()
    w, h = (int(v) for v in args.size.split("x"))

    print(f"# devices: {jax.devices()}", file=sys.stderr)
    if args.stages:
        packed, static = build(w, h, bump=True, csg_bump=False)
        static = dataclasses.replace(static, aa_enabled=False)
        time_stages(packed, static, args.iters)
        return 0
    results = {}
    for cfg in args.configs:
        # "bumpfast_*": the CSG node is NOT bump-mapped, so the hybrid
        # takes its FAST forward (record straight from the kernel,
        # pallas_grad._fast_bump_ok); plain "bump_*" bump-maps everything
        # incl. the CSG node -> the differentiable-reshade forward
        bump = cfg.startswith("bump")
        packed, static = build(w, h, bump=bump, csg_bump=not cfg.startswith("bumpfast"))
        static = dataclasses.replace(
            static,
            use_pallas=cfg.endswith("fused"),
            fast_forward=not args.grad,
            aa_enabled=not args.grad,
            bounce_capacity=max(w * h // 16, 8192),
            bounce_mode="block",
            chunk_pixels=(args.chunk if args.chunk and args.chunk < w * h else None),
        )
        dt = time_config(cfg, packed, static, args.iters, grad=args.grad)
        rays = frame_ray_stats(packed, static)["total"]
        results[cfg] = {"ms": round(dt * 1e3, 1), "rays_per_sec": round(rays / dt, 1)}
        print(f"{cfg}: {dt*1e3:.1f} ms/frame raw, {rays/dt/1e6:.1f}M rays/s", flush=True)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
