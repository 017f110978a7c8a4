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

    def vg(k, p):
        l, g = jax.value_and_grad(loss)(jitter(p, k))
        return l + 1e-30 * sum(jnp.sum(x) for x in jax.tree.leaves(g))

    fns = {
        "fwd": (fwd, packed),
        "vg": (vg, packed),
    }
    for name in stages:
        if name == "vg_scatter":
            st = dataclasses.replace(static, texel_grad_mode="scatter")
            l2 = loss_for(st)
            def vg2(k, p, l2=l2):
                l, g = jax.value_and_grad(l2)(jitter(p, k))
                return l + 1e-30 * sum(jnp.sum(x) for x in jax.tree.leaves(g))
            timeit(name, scanit(vg2), packed)
        elif name == "vg_xla":
            st = dataclasses.replace(static, use_pallas=False)
            l2 = loss_for(st)
            def vgx(k, p, l2=l2):
                l, g = jax.value_and_grad(l2)(jitter(p, k))
                return l + 1e-30 * sum(jnp.sum(x) for x in jax.tree.leaves(g))
            timeit(name, scanit(vgx), packed)
        elif name == "vg_lane":
            # lane-granular compaction A/B partner (vg runs block mode;
            # measured 18.7 ms lane vs 15.7 ms block, round 3)
            st = dataclasses.replace(static, bounce_mode="compact")
            l2 = loss_for(st)
            def vgb(k, p, l2=l2):
                l, g = jax.value_and_grad(l2)(jitter(p, k))
                return l + 1e-30 * sum(jnp.sum(x) for x in jax.tree.leaves(g))
            timeit(name, scanit(vgb), packed)
        elif name == "vg_d1":
            # exactly one bounce round: vg - vg_d1 = dead-round overhead,
            # vg_d1 - vg_d0 = one live block-compacted round fwd+bwd
            st1 = dataclasses.replace(static, max_trace_depth=1)
            l2 = loss_for(st1)
            def vg5(k, p, l2=l2):
                l, g = jax.value_and_grad(l2)(jitter(p, k))
                return l + 1e-30 * sum(jnp.sum(x) for x in jax.tree.leaves(g))
            timeit(name, scanit(vg5), packed)
        elif name == "vg_d2":
            # two compiled bounce rounds, second dead at runtime: tests
            # whether cond-skipped rounds really cost ~0 (vg_d2 - vg_d1)
            st2 = dataclasses.replace(static, max_trace_depth=2)
            l2 = loss_for(st2)
            def vg7(k, p, l2=l2):
                l, g = jax.value_and_grad(l2)(jitter(p, k))
                return l + 1e-30 * sum(jnp.sum(x) for x in jax.tree.leaves(g))
            timeit(name, scanit(vg7), packed)
        elif name == "vg_d0":
            # no bounce rounds: isolates the bounce-machinery share of bwd
            st0 = dataclasses.replace(static, max_trace_depth=0)
            l2 = loss_for(st0)
            def vg4(k, p, l2=l2):
                l, g = jax.value_and_grad(l2)(jitter(p, k))
                return l + 1e-30 * sum(jnp.sum(x) for x in jax.tree.leaves(g))
            timeit(name, scanit(vg4), packed)
        elif name == "vg_d0_notex":
            st = dataclasses.replace(static, max_trace_depth=0, train_textures=False)
            l2 = loss_for(st)
            def vg6(k, p, l2=l2):
                l, g = jax.value_and_grad(l2)(jitter(p, k))
                return l + 1e-30 * sum(jnp.sum(x) for x in jax.tree.leaves(g))
            timeit(name, scanit(vg6), packed)
        elif name == "vg_sorted":
            st = dataclasses.replace(static, texel_grad_mode="sorted")
            l2 = loss_for(st)
            def vg7(k, p, l2=l2):
                l, g = jax.value_and_grad(l2)(jitter(p, k))
                return l + 1e-30 * sum(jnp.sum(x) for x in jax.tree.leaves(g))
            timeit(name, scanit(vg7), packed)
        elif name == "vg_full":
            # bounce rounds at full width (no compaction machinery)
            st = dataclasses.replace(static, bounce_mode="full")
            l2 = loss_for(st)
            def vg5(k, p, l2=l2):
                l, g = jax.value_and_grad(l2)(jitter(p, k))
                return l + 1e-30 * sum(jnp.sum(x) for x in jax.tree.leaves(g))
            timeit(name, scanit(vg5), packed)
        elif name == "vg_notex":
            st = dataclasses.replace(static, train_textures=False)
            l2 = loss_for(st)
            def vg3(k, p, l2=l2):
                l, g = jax.value_and_grad(l2)(jitter(p, k))
                return l + 1e-30 * sum(jnp.sum(x) for x in jax.tree.leaves(g))
            timeit(name, scanit(vg3), packed)
        else:
            f, a = fns[name]
            timeit(name, scanit(f), a)


if __name__ == "__main__":
    main()
