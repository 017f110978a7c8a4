"""Grad-step cost attribution at the bench config (640x480, AA off,
fused-kernel forward + leaf-pinned VJP backward).

Splits the honest (key-jittered, LICM-proof) step into:
    fwd        — loss value only (the fused forward; bwd ~= vg - fwd)
    vg         — full value_and_grad (the bench number)
    vg_scatter — texel VJP as plain scatter instead of the MXU histogram
    vg_notex   — texture gradients stopped at the source
    vg_xla     — pure-XLA forward AND backward (no fused kernel/custom VJP)

Usage: python demos/grad_probe.py [stage ...]
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

W, H = 640, 480
ITERS = 8
REPEATS = 3


def timeit(name, fn, *args):
    j = jax.jit(fn)
    t0 = time.perf_counter()
    v = float(np.asarray(j(*args)).sum())
    c = time.perf_counter() - t0
    assert np.isfinite(v), (name, v)
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(np.asarray(j(*args)).sum())
        times.append(time.perf_counter() - t0)
    ms = min(times) / ITERS * 1000
    print(f"{name}: {ms:.2f} ms/iter (compile {c:.0f}s, incl ~{30/ITERS:.1f} ms tunnel)", flush=True)


def scanit(body0):
    def fn(*args):
        def body(acc, k):
            return acc + body0(k, *args), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jax.random.split(jax.random.PRNGKey(0), ITERS))
        return acc
    return fn


def jitter(p, k):
    d = (jax.random.uniform(k, (3,), jnp.float32) - 0.5) * 1e-4
    return dataclasses.replace(p, camera=dataclasses.replace(p.camera, pos=p.camera.pos + d))


def main():
    from chess2rt_tpu.render.pipeline import render_frame

    stages = sys.argv[1:] or ["fwd", "vg", "vg_scatter", "vg_notex", "vg_xla", "vg_d0"]
    packed, static0 = build(W, H)
    # pin the bench config explicitly (bounce_mode="block" is also the
    # package default; pinning keeps the probe meaningful if it changes)
    static = dataclasses.replace(
        static0,
        aa_enabled=False,
        bounce_capacity=W * H // 16,
        use_pallas=True,
        bounce_mode="block",
    )
    key = jax.random.PRNGKey(0)
    print(f"# devices: {jax.devices()}", flush=True)

    def loss_for(st):
        def loss(p):
            return ((render_frame(p, st, key)) ** 2).mean()
        return loss

    loss = loss_for(static)

    def fwd(k, p):
        return loss(jitter(p, k))

    def make_vg(st):
        """ONE value_and_grad body shared by every stage: the jitter +
        checksum weighting are the LICM guards this probe exists for —
        a per-stage copy that misses one silently reports inflated
        timings (CLAUDE.md)."""
        l2 = loss_for(st)

        def body(k, p):
            l, g = jax.value_and_grad(l2)(jitter(p, k))
            return l + 1e-30 * sum(jnp.sum(x) for x in jax.tree.leaves(g))

        return body

    # stage -> SceneStatic overrides on top of the pinned bench config
    VARIANTS = {
        "vg_scatter": dict(texel_grad_mode="scatter"),  # naive duplicate scatter
        "vg_sorted": dict(texel_grad_mode="sorted"),  # monotone scatter VJP
        "vg_xla": dict(use_pallas=False),  # pure-XLA fwd+bwd
        # lane-granular compaction A/B partner (vg runs block mode;
        # measured 18.7 ms lane vs 15.7 ms block, round 3)
        "vg_lane": dict(bounce_mode="compact"),
        "vg_full": dict(bounce_mode="full"),  # full-width bounce rounds
        # depth ladder: vg - vg_d1 = dead-round overhead, vg_d1 - vg_d0 =
        # one live block-compacted round fwd+bwd
        "vg_d0": dict(max_trace_depth=0),
        "vg_d1": dict(max_trace_depth=1),
        "vg_d2": dict(max_trace_depth=2),
        "vg_d0_notex": dict(max_trace_depth=0, train_textures=False),
        "vg_notex": dict(train_textures=False),  # texel grads stopped
    }

    fns = {"fwd": fwd, "vg": make_vg(static)}
    for name in stages:
        f = fns.get(name) or make_vg(dataclasses.replace(static, **VARIANTS[name]))
        timeit(name, scanit(f), packed)


if __name__ == "__main__":
    main()
