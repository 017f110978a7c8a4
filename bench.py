"""Benchmark: rays/s on the flagship scene (BASELINE.md north star).

Config: lecture5 (CSG + 2 bitmap textures + Phong + transforms) at
1920x1080 with a mirror sphere added and maxTraceDepth=5 — the BASELINE
"recursive reflection, depth 5" configuration — AA enabled (the engine
default, renderer.d:183-186: every pixel gets 5 samples).

Counted rays (matching how BASELINE.md derives the reference's ~250k
total rays/s from perf-results.md): camera/AA sample rays + shadow rays
(one per lit shading point per light) + reflection continuation rays.
Counts are measured exactly by an instrumented (untimed) pass.

Prints ONE JSON line:
    {"metric": "rays_per_sec_chip", "value": ..., "unit": "rays/s",
     "vs_baseline": ...}
vs_baseline is against the reference's derived ~250k total rays/s
(BASELINE.md: 640x480 incl. shadow rays / 2.417 s on 1 CPU core).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_TOTAL_RAYS_PER_SEC = 250_000.0  # BASELINE.md derived row

WIDTH, HEIGHT = 1920, 1080
REPEATS = 3


def build(width=WIDTH, height=HEIGHT):
    from chess2rt_tpu.models import types as T
    from chess2rt_tpu.models.packed import pack_scene
    from chess2rt_tpu.scene.loader import parse_scene_from_file

    sc = parse_scene_from_file("/root/reference/data/lecture5.sdl")
    sc.settings.frameWidth, sc.settings.frameHeight = width, height
    sc.camera.set_frame_size(width, height)
    sc.settings.maxTraceDepth = 5
    sc.settings.AAEnabled = True
    # the depth-5 recursive-reflection north-star config: a mirror sphere
    mirror = T.Reflection(name="mirror", color=(0.9, 0.9, 0.9))
    sc.shaders.append(mirror)
    sc.nodes.append(
        T.Node(name="mirror_ball", geometry=T.Sphere(name="mb", center=(0, 60, 360), R=55.0), shader=mirror)
    )
    return pack_scene(sc, dtype=jnp.float32)


def build_gi(width, height, paths=40):
    """The BASELINE GI config: lecture4 + far bounce wall, NEE extension
    (gi_point_light_direct), depth 5 (demos/gi_probe.py scene)."""
    import dataclasses

    from chess2rt_tpu.models import types as T
    from chess2rt_tpu.models.packed import pack_scene
    from chess2rt_tpu.scene.loader import parse_scene_from_file

    sc = parse_scene_from_file("/root/reference/data/lecture4.sdl")
    sc.settings.frameWidth, sc.settings.frameHeight = width, height
    sc.camera.set_frame_size(width, height)
    sc.settings.AAEnabled = False
    sc.settings.GIEnabled = True
    sc.settings.maxTraceDepth = 5
    sc.settings.pathsPerPixel = paths
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


def main_grad_gi(w=640, h=480, steps_per_call=4, paths=40):
    """GI grad benchmark (round-4 VERDICT item 2): a full value_and_grad
    step through the PATH-TRACED pipeline (NEE on, depth 5, 40 paths/px)
    on the fused want_hit GI renderer.  Key-jittered camera per step (the
    GI pipeline consumes its key anyway, so LICM can't hoist the body).

    Prints one JSON line: {"metric": "gi_grad_paths_per_sec", ...}."""
    import dataclasses

    from chess2rt_tpu.render.pipeline import render_frame

    packed, static = build_gi(w, h, paths)
    # flagship-resolution steps stack paths x bounce-round AD residuals
    # without path remat (26+ GB at 1080p x 40pp) — see models/packed.py
    static = dataclasses.replace(
        static, use_pallas=True, gi_remat_paths=(w * h) >= (1 << 20)
    )
    key = jax.random.PRNGKey(0)
    target = jnp.zeros((h, w, 3), dtype=jnp.float32)

    def loss(p, k):
        return ((render_frame(p, static, k) - target) ** 2).mean()

    STEPS_PER_CALL = steps_per_call

    def many(p, keys):
        def body(acc, k):
            jit_pos = (jax.random.uniform(k, (3,), jnp.float32) - 0.5) * 1e-4
            p2 = dataclasses.replace(
                p, camera=dataclasses.replace(p.camera, pos=p.camera.pos + jit_pos)
            )
            l, g = jax.value_and_grad(loss)(p2, k)
            gsum = sum(jnp.sum(x) for x in jax.tree.leaves(g))
            return acc + l + 1e-30 * gsum, None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), keys)
        return acc

    vg = jax.jit(many)
    keys = jax.random.split(key, STEPS_PER_CALL)
    l0 = vg(packed, keys)
    assert np.isfinite(float(l0))

    times = []
    for i in range(REPEATS):
        t0 = time.perf_counter()
        float(vg(packed, jax.random.split(jax.random.fold_in(key, i), STEPS_PER_CALL)))
        times.append(time.perf_counter() - t0)
    dt = min(times) / STEPS_PER_CALL

    camera_paths = w * h * paths
    print(
        json.dumps(
            {
                "metric": "gi_grad_paths_per_sec",
                "value": round(camera_paths / dt, 1),
                "unit": "camera paths/s (fwd+bwd, NEE, depth 5)",
                "vs_baseline": None,
            }
        )
    )
    print(
        f"# GI fwd+bwd step {dt*1000:.1f} ms at {w}x{h}, {paths} paths/px "
        f"({camera_paths/1e6:.1f}M camera paths/frame)",
        file=sys.stderr,
    )


def main_grad(w=640, h=480, steps_per_call=8):
    """Secondary metric (BASELINE.md): grad-rays/s — traced rays per second
    for a full value_and_grad step (forward + backward through the whole
    differentiable pipeline) on lecture5 + mirror, AA off.  Default
    640x480; `--grad --size 1920x1080` measures the flagship-resolution
    step (round-3 VERDICT item 3), texel gradients on either way.

    Prints one JSON line: {"metric": "grad_rays_per_sec", ...}."""
    import dataclasses

    from chess2rt_tpu.render.pipeline import render_frame
    from chess2rt_tpu.utils.diagnostics import frame_ray_stats

    packed, static = build(w, h)
    # compaction is differentiable (cond/gather/scatter all have VJPs);
    # continuing set at this resolution is ~14k rays -> capacity //16.
    # Dead bounce rounds are skipped by the differentiable lax.cond in
    # _run_rounds; texel grads use the MXU histogram VJP (default).
    # use_pallas: the forward runs the fused kernel and the backward runs
    # the pinned-discrete XLA re-shade (ops/pallas_grad.py custom VJP) —
    # no shadow scans anywhere in the grad step.
    static = dataclasses.replace(
        static,
        aa_enabled=False,
        bounce_capacity=w * h // 16,
        use_pallas=True,
        bounce_mode="block",  # block-granular compaction (15.7 vs 18.7 ms lane-compact)
    )
    key = jax.random.PRNGKey(0)
    target = jnp.zeros((h, w, 3), dtype=jnp.float32)

    def loss(p, k):
        return ((render_frame(p, static, k) - target) ** 2).mean()

    # STEPS_PER_CALL fwd+bwd steps inside one program (see main(): one
    # program execution carries ~30 ms tunnel roundtrip latency; measuring
    # per-step throughput requires amortizing it — every step is a REAL,
    # distinct step thanks to the key-jittered camera below).  Every grad
    # leaf feeds the checksum so no part of the backward can be DCE'd.
    STEPS_PER_CALL = steps_per_call

    def many(p, keys):
        def body(acc, k):
            # key-jitter the camera so the scan body is NOT loop-invariant
            # (same LICM hazard as main(): the deterministic render ignores
            # the RNG key, and a hoisted body times one step as N)
            jit_pos = (jax.random.uniform(k, (3,), jnp.float32) - 0.5) * 1e-4
            p2 = dataclasses.replace(
                p, camera=dataclasses.replace(p.camera, pos=p.camera.pos + jit_pos)
            )
            l, g = jax.value_and_grad(loss)(p2, k)
            gsum = sum(jnp.sum(x) for x in jax.tree.leaves(g))
            # tiny nonzero weight: keeps every grad leaf live (0.0 * gsum
            # could be algebraically simplified away) without perturbing
            # the finiteness check
            return acc + l + 1e-30 * gsum, None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), keys)
        return acc

    vg = jax.jit(many)
    keys = jax.random.split(key, STEPS_PER_CALL)
    l0 = vg(packed, keys)  # compile
    assert np.isfinite(float(l0))

    times = []
    for i in range(REPEATS):
        t0 = time.perf_counter()
        float(vg(packed, jax.random.split(jax.random.fold_in(key, i), STEPS_PER_CALL)))
        times.append(time.perf_counter() - t0)
    dt = min(times) / STEPS_PER_CALL

    stats = frame_ray_stats(packed, static, key)
    total = stats["total"]
    print(
        json.dumps(
            {
                "metric": "grad_rays_per_sec",
                "value": round(total / dt, 1),
                "unit": "rays/s (fwd+bwd)",
                "vs_baseline": None,
            }
        )
    )
    print(f"# fwd+bwd step {dt*1000:.1f} ms, {total/1e6:.2f}M rays/frame", file=sys.stderr)


def main_check():
    """Real-Mosaic regression check (round-3 VERDICT item 3): compile the
    flagship kernel at reduced resolution on the actual TPU, assert the
    kernel-path frame agrees with the XLA-path frame (the 1.2e-4 checksum
    bound BASELINE.md measured, with slack), and assert one fused
    value_and_grad step is finite.  Prints one JSON verdict line; exits
    nonzero on failure so CI/driver hooks can gate on it.

    All kernel unit tests run interpret=True on CPU — this is the only
    harnessed check of actual Mosaic lowering (retiling, spills,
    polynomial accuracy)."""
    import dataclasses

    from chess2rt_tpu.render.pipeline import render_frame

    w, h = 480, 272
    packed, static = build(w, h)
    static_p = dataclasses.replace(
        static,
        use_pallas=True,
        aa_enabled=False,
        bounce_capacity=w * h // 16,
        bounce_mode="block",  # match the headline bench's flagship config
    )
    static_x = dataclasses.replace(static, use_pallas=False, aa_enabled=False)
    key = jax.random.PRNGKey(0)

    img_p = np.asarray(jax.jit(lambda p: render_frame(p, static_p, key))(packed))
    img_x = np.asarray(jax.jit(lambda p: render_frame(p, static_x, key))(packed))
    rel_checksum = abs(img_p.sum() - img_x.sum()) / max(abs(img_x.sum()), 1e-9)
    close = float(np.mean(np.abs(img_p - img_x) <= 2e-3 + 2e-3 * np.abs(img_x)))

    # adaptiveAA gate: the lane-compacted fused adaptive program (sort +
    # base gather + cap-width taps + scatter-set) must match the XLA
    # adaptive pipeline on real Mosaic, not just in interpret-mode tests
    static_pa = dataclasses.replace(static_p, aa_enabled=True, aa_adaptive=True)
    static_xa = dataclasses.replace(static_x, aa_enabled=True, aa_adaptive=True)
    img_pa = np.asarray(jax.jit(lambda p: render_frame(p, static_pa, key))(packed))
    img_xa = np.asarray(jax.jit(lambda p: render_frame(p, static_xa, key))(packed))
    adaptive_close = float(np.mean(np.abs(img_pa - img_xa) <= 2e-3 + 2e-3 * np.abs(img_xa)))

    # oracle anchor: the TPU f32 XLA frame must match the float64 numpy
    # ground truth to the same u8 tolerance the CPU tests pin.  This is
    # what catches whole-path numeric regressions the kernel-vs-XLA
    # checksum can't (both paths shared the bf16-matmul camera corruption
    # this check was added for — see chess2rt_tpu/__init__.py).
    from chess2rt_tpu.oracle.renderer import render_scene
    from chess2rt_tpu.scene.loader import parse_scene_from_file
    from chess2rt_tpu.utils.color import srgb_u8

    osc = parse_scene_from_file("/root/reference/data/lecture5.sdl")
    ow, oh = 96, 54
    osc.settings.frameWidth, osc.settings.frameHeight = ow, oh
    osc.camera.set_frame_size(ow, oh)
    oref = srgb_u8(render_scene(osc)).astype(int)
    from chess2rt_tpu.models.packed import pack_scene

    opacked2, ostatic2 = pack_scene(osc, dtype=jnp.float32)
    odev = srgb_u8(
        np.asarray(jax.jit(lambda p: render_frame(p, ostatic2, key))(opacked2))
    ).astype(int)
    oracle_within1 = float((np.abs(oref - odev) <= 1).mean())

    def loss(p, k):
        return ((render_frame(p, static_p, k) - jnp.zeros((h, w, 3))) ** 2).mean()

    lv, g = jax.jit(jax.value_and_grad(loss))(packed, key)
    leaves = jax.tree.leaves(g)
    grad_finite = bool(np.isfinite(float(lv))) and all(
        bool(jnp.isfinite(x).all()) for x in leaves
    )
    grad_nonzero = sum(float(jnp.abs(x).sum()) for x in leaves) > 0

    ok = (
        (rel_checksum < 5e-4)
        and (close > 0.99)
        and (adaptive_close > 0.99)
        and grad_finite
        and grad_nonzero
        and (oracle_within1 > 0.99)
    )
    print(
        json.dumps(
            {
                "metric": "mosaic_check",
                "value": round(float(rel_checksum), 8),
                "unit": "rel_checksum_delta",
                "vs_baseline": None,
                "pixels_close": round(close, 5),
                "adaptive_close": round(adaptive_close, 5),
                "oracle_within1": round(oracle_within1, 5),
                "grad_finite": grad_finite,
                "grad_nonzero": grad_nonzero,
                "ok": ok,
            }
        )
    )
    if not ok:
        sys.exit(1)


def main_sharded():
    """The SHARDED fused renderer on a 1-device TPU mesh (round-3 VERDICT
    item 1 done-criterion: the mesh path must carry the fused frame rate,
    within ~10% of the single-chip flagship).  Same flagship config and
    key-jittered amortization as main().

    Prints one JSON line: {"metric": "sharded_frame_ms", ...}."""
    import dataclasses

    from chess2rt_tpu.parallel import make_mesh, make_sharded_render_fn

    packed, static = build()
    static = dataclasses.replace(
        static,
        use_pallas=True,
        fast_forward=True,
        bounce_capacity=2073600 // 16,
        bounce_mode="block",
    )
    mesh = make_mesh(jax.devices()[:1])
    render = make_sharded_render_fn(static, mesh)

    FRAMES_PER_CALL = 4

    def many(p, keys):
        def body(acc, k):
            # key-jittered camera: see main() — LICM would hoist a
            # loop-invariant body and inflate the amortized number
            jit_pos = (jax.random.uniform(k, (3,), jnp.float32) - 0.5) * 1e-4
            p2 = dataclasses.replace(
                p, camera=dataclasses.replace(p.camera, pos=p.camera.pos + jit_pos)
            )
            return acc + render(p2, k).sum(), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), keys)
        return acc

    fn = jax.jit(many)
    key = jax.random.PRNGKey(0)
    checksum = float(fn(packed, jax.random.split(key, FRAMES_PER_CALL)))
    assert np.isfinite(checksum) and checksum > 0, checksum

    times = []
    for i in range(REPEATS):
        t0 = time.perf_counter()
        float(fn(packed, jax.random.split(jax.random.fold_in(key, i), FRAMES_PER_CALL)))
        times.append(time.perf_counter() - t0)
    dt = min(times) / FRAMES_PER_CALL
    print(
        json.dumps(
            {
                "metric": "sharded_frame_ms",
                "value": round(dt * 1000, 2),
                "unit": "ms/frame (1-device mesh, fused)",
                "vs_baseline": None,
            }
        )
    )
    print(f"# sharded fused flagship {WIDTH}x{HEIGHT}: {dt*1000:.1f} ms/frame", file=sys.stderr)


def main():
    import dataclasses

    packed, static = build()
    # round-3 config: the fused Pallas primary kernel covers the full
    # flagship scene (CSG + bitmaps + transforms + mirror); bounce rounds
    # re-enter the ray-input kernel on a BLOCK-compacted buffer
    # (bounce_mode="block"): whole 128-lane blocks with any live lane are
    # gathered into ~n/12 block slots, so the round-1 combine (texel
    # gather dominates) runs at ~8% width while the compaction
    # bookkeeping stays ~free (sort over n/128 block keys, slab
    # gathers/adds).  Measured round 3 (honest, key-jittered):
    # 59 ms/frame vs 117 ms full-width rounds vs ~500 ms-class pure XLA
    # (demos/bounce_mode_probe.py, demos/block_probe.py).
    static = dataclasses.replace(
        static,
        use_pallas=True,
        fast_forward=True,
        bounce_capacity=2073600 // 16,
        bounce_mode="block",
    )
    from chess2rt_tpu.render.pipeline import AA_KERNEL, begin_frame, render_frame, render_samples

    # The timed function reduces the frame to a checksum on-device: timing
    # ends when the scalar arrives on the host, which guarantees the full
    # frame was actually computed (block_until_ready through a remote
    # tunnel can return before device completion).  FRAMES_PER_CALL frames
    # run inside ONE program (lax.scan over keys) so the measurement is
    # per-frame THROUGHPUT: a single program execution through the axon
    # tunnel carries a measured ~30 ms host<->device roundtrip latency
    # (a bare scalar op costs the same), which production pipelining
    # amortizes and a per-frame-call measurement would mis-charge to
    # render work.
    FRAMES_PER_CALL = 4

    def many(p, keys):
        def body(acc, k):
            # Fold the key into the CAMERA, not just the (unused-on-this-
            # deterministic-path) RNG arg: a loop-invariant scan body gets
            # hoisted by XLA's while-loop LICM, so a constant-scene scan
            # would time ONE frame + N-1 adds and report an N-x-inflated
            # throughput (this inflated the round-2 headline ~3.5x).  The
            # ~1e-4-unit camera jitter is visually null but forces every
            # iteration to render.
            jit_pos = (jax.random.uniform(k, (3,), jnp.float32) - 0.5) * 1e-4
            p2 = dataclasses.replace(
                p, camera=dataclasses.replace(p.camera, pos=p.camera.pos + jit_pos)
            )
            return acc + render_frame(p2, static, k).sum(), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), keys)
        return acc

    fn = jax.jit(many)
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, FRAMES_PER_CALL)

    checksum = float(fn(packed, keys))  # warmup / compile
    assert np.isfinite(checksum) and checksum > 0, checksum

    times = []
    for i in range(REPEATS):
        t0 = time.perf_counter()
        float(fn(packed, jax.random.split(jax.random.fold_in(key, i), FRAMES_PER_CALL)))
        times.append(time.perf_counter() - t0)
    dt = min(times) / FRAMES_PER_CALL

    # Exact ray counts via an instrumented (unrolled, untimed) pass at 1/4
    # linear scale, base AA tap only: hit/shadow/bounce fractions are
    # resolution- and sub-pixel-offset-independent to well under a percent,
    # so counts scale by the pixel ratio x the 5 AA taps.
    cw, ch = WIDTH // 4, HEIGHT // 4
    packed_c, static_c = build(cw, ch)

    def counted(p, k):
        stats = {}
        frame = begin_frame(p.camera, static_c.width / static_c.height)
        dtp = p.node_matrix.dtype
        ys, xs = jnp.meshgrid(
            jnp.arange(static_c.height, dtype=dtp), jnp.arange(static_c.width, dtype=dtp), indexing="ij"
        )
        render_samples(p, static_c, frame, xs.reshape(-1), ys.reshape(-1), k, stats=stats)
        return stats

    stats = jax.jit(counted)(packed_c, key)
    aa_taps = 5.0 if static.aa_enabled else 1.0
    scale = (WIDTH * HEIGHT) / (cw * ch) * aa_taps
    stats = {k: float(v) * scale for k, v in stats.items()}
    total_rays = stats.get("camera", 0.0) + stats.get("shadow", 0.0) + stats.get("bounce", 0.0)

    rays_per_sec = total_rays / dt
    dev = jax.devices()[0]
    result = {
        "metric": "rays_per_sec_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / REFERENCE_TOTAL_RAYS_PER_SEC, 2),
    }
    print(json.dumps(result))
    print(
        f"# {dev.platform}:{dev.device_kind} {WIDTH}x{HEIGHT} depth-{static.max_trace_depth} "
        f"AA5: frame {dt*1000:.1f} ms, {total_rays/1e6:.1f}M rays "
        f"(camera {stats.get('camera', 0.0)/1e6:.1f}M, shadow {stats.get('shadow', 0.0)/1e6:.1f}M, "
        f"bounce {stats.get('bounce', 0.0)/1e6:.1f}M)",
        file=sys.stderr,
    )


def main_verify_counts():
    """One-time validation of the 1/4-scale count extrapolation (round-2
    VERDICT item 9): run the instrumented pass at BOTH 1/4 scale and full
    1080p and report the relative delta of the extrapolated vs true
    counts.  Slow (full-res unrolled stats pass) — not part of the normal
    bench."""
    from chess2rt_tpu.render.pipeline import begin_frame, render_samples

    def counted(width, height):
        packed_c, static_c = build(width, height)

        def fn(p, k):
            stats = {}
            frame = begin_frame(p.camera, static_c.width / static_c.height)
            dtp = p.node_matrix.dtype
            ys, xs = jnp.meshgrid(
                jnp.arange(static_c.height, dtype=dtp),
                jnp.arange(static_c.width, dtype=dtp),
                indexing="ij",
            )
            render_samples(p, static_c, frame, xs.reshape(-1), ys.reshape(-1), k, stats=stats)
            return stats

        return {k: float(v) for k, v in jax.jit(fn)(packed_c, jax.random.PRNGKey(0)).items()}

    quarter = counted(WIDTH // 4, HEIGHT // 4)
    full = counted(WIDTH, HEIGHT)
    scale = 16.0
    report = {}
    for k in sorted(full):
        extrap = quarter.get(k, 0.0) * scale
        delta = abs(extrap - full[k]) / max(full[k], 1.0)
        report[k] = round(delta, 5)
        print(f"# {k}: full {full[k]:.0f} vs extrapolated {extrap:.0f} "
              f"(delta {delta*100:.3f}%)", file=sys.stderr)
    total_full = sum(full.values())
    total_ex = sum(quarter.values()) * scale
    print(json.dumps({
        "metric": "count_extrapolation_delta",
        "value": round(abs(total_ex - total_full) / total_full, 6),
        "unit": "relative",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    if "--grad" in sys.argv:
        w, h = 640, 480
        if "--size" in sys.argv:
            w, h = map(int, sys.argv[sys.argv.index("--size") + 1].split("x"))
        if "--gi" in sys.argv:
            steps = 4 if w * h <= 640 * 480 else 1
            if "--steps" in sys.argv:
                steps = int(sys.argv[sys.argv.index("--steps") + 1])
            main_grad_gi(w, h, steps)
        else:
            steps = 8 if w * h <= 640 * 480 else 4
            if "--steps" in sys.argv:
                steps = int(sys.argv[sys.argv.index("--steps") + 1])
            main_grad(w, h, steps)
    elif "--sharded" in sys.argv:
        main_sharded()
    elif "--check" in sys.argv:
        main_check()
    elif "--verify-counts" in sys.argv:
        main_verify_counts()
    else:
        main()
