"""THE apples-to-apples row: the reference's only published benchmark.

perf-results.md:21 — lecture4.json, 640x480, single thread, AA and
prepass disabled, best build (LDC release): 2.417 s on the baseline
machine.  This probe renders the identical scene/config through the
fused TPU pipeline, key-jittered per iteration (LICM-proof) inside one
program so the ~30 ms tunnel roundtrip amortizes.

Usage: python demos/lecture4_probe.py
"""

from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from chess2rt_tpu.models.packed import pack_scene
from chess2rt_tpu.render.pipeline import render_frame
from chess2rt_tpu.scene.loader import parse_scene_from_file

W, H = 640, 480
ITERS = int(sys.argv[sys.argv.index("--iters") + 1]) if "--iters" in sys.argv else 128
# the frame is ~ms-class: needs many iters to clear the ~30 ms tunnel;
# cross-check the slope with two ITERS values (CLAUDE.md rule 0 corollary)
REPEATS = 3
REFERENCE_S = 2.417  # perf-results.md:21


def main():
    # lecture4.JSON is the file perf-results.md measured — it disables AA
    # and prepass (the .sdl variant leaves AA on).
    sc = parse_scene_from_file("/root/reference/data/lecture4.json")
    assert not sc.settings.AAEnabled, "lecture4.json ships AA off"
    sc.settings.frameWidth, sc.settings.frameHeight = W, H
    sc.camera.set_frame_size(W, H)
    packed, static = pack_scene(sc, dtype=jnp.float32)
    static = dataclasses.replace(static, use_pallas=True, fast_forward=True)
    print(f"# devices: {jax.devices()}", flush=True)

    def many(p, keys):
        def body(acc, k):
            d = (jax.random.uniform(k, (3,), jnp.float32) - 0.5) * 1e-4
            pj = dataclasses.replace(
                p, camera=dataclasses.replace(p.camera, pos=p.camera.pos + d)
            )
            return acc + render_frame(pj, static, k).sum(), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), keys)
        return acc

    j = jax.jit(many)
    keys = jax.random.split(jax.random.PRNGKey(0), ITERS)
    t0 = time.perf_counter()
    v = float(np.asarray(j(packed, keys)))
    c = time.perf_counter() - t0
    assert np.isfinite(v) and v > 0
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(np.asarray(j(packed, keys)))
        times.append(time.perf_counter() - t0)
    ms = min(times) / ITERS * 1000
    net = ms - 30.0 / ITERS
    # the multiplier quotes the RAW time (tunnel share included) — at high
    # ITERS the ~30/ITERS ms share can exceed the device time, making the
    # "net" estimate meaningless; the two-point-slope run (--iters A vs B)
    # is how the device-only frame time is actually measured
    net_str = (
        f"~{net:.3f} ms net of tunnel share"
        if net > 0.05
        else "tunnel-share dominated (device time needs a two-point iteration slope)"
    )
    print(
        f"lecture4 640x480 (reference config): {ms:.2f} ms/frame raw — "
        f"{REFERENCE_S * 1000 / ms:.0f}x the reference's {REFERENCE_S}s single-core; "
        f"{net_str} (checksum {v:.4e}; compile {c:.0f}s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
