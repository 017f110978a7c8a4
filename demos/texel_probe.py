"""Microbenchmark the texel-gradient VJP pieces on the real TPU.

grad_probe.py attributes ~6.4 ms of the 640x480 grad step to the primary
texel VJP (quad_gather_flat backward: 2-op sort + perm row gather + MXU
histogram + layout transposes) and ~3.4 ms to the bounce round's.  This
times each piece at the flagship grad shape (307k keys, 385k-row quad
table) so optimization goes where the time is:

    sort2op     — lax.sort (key, iota) of N keys
    permgather  — row_gather_raw of the [N, 12] cotangents by the perm
    hist        — texel_histogram on presorted inputs (incl. vals_t set-up)
    valst       — the [N, 12] -> [16, N] channel-major transpose alone
    outt        — the [16, R] -> [R, 12] output transpose alone
    vjp         — the whole quad_gather_flat backward via jax.vjp
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from chess2rt_tpu.ops.fastgather import row_gather_raw
from chess2rt_tpu.ops.shade import quad_gather_flat
from chess2rt_tpu.ops.texel_hist import texel_histogram

N = 640 * 480
ROWS = 385_000
ITERS = 16
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
    ms = (min(times) - 0.030) / ITERS * 1000
    print(f"{name}: {ms:.2f} ms/iter (raw {min(times)*1000:.1f} / {ITERS}; compile {c:.0f}s)",
          flush=True)


def scanit(body):
    def fn(*args):
        def sbody(acc, i):
            return acc + body(i, *args), None

        acc, _ = jax.lax.scan(sbody, jnp.float32(0.0), jnp.arange(ITERS))
        return acc

    return fn


def main():
    stages = sys.argv[1:] or ["sort2op", "permgather", "hist", "valst", "outt", "vjp"]
    print(f"# devices: {jax.devices()}  N={N} ROWS={ROWS}", flush=True)
    key = jax.random.PRNGKey(0)
    # clustered keys like real texel hits (sorted pixels hit nearby texels)
    keys = jnp.sort(jax.random.randint(key, (N,), 0, ROWS, jnp.int32))
    g = jax.random.uniform(jax.random.fold_in(key, 1), (N, 12), jnp.float32)
    table = jax.random.uniform(jax.random.fold_in(key, 2), (ROWS, 12), jnp.float32)

    def mkkeys(i, keys):
        return jnp.roll(keys, i)  # iteration-dependent, stays mostly sorted

    def sort2op(i, keys, g):
        kf = mkkeys(i, keys)
        perm = jax.lax.iota(jnp.int32, N)
        sk, sperm = jax.lax.sort((kf, perm), num_keys=1)
        return sk.sum().astype(jnp.float32) + sperm.sum().astype(jnp.float32)

    def permgather(i, keys, g):
        kf = mkkeys(i, keys)
        perm = jax.lax.iota(jnp.int32, N)
        sk, sperm = jax.lax.sort((kf, perm), num_keys=1)
        return row_gather_raw(g, sperm, fold=True).sum() + sk.sum().astype(jnp.float32)

    def hist(i, keys, g):
        sk = mkkeys(i, keys)  # already ~sorted
        return texel_histogram(jax.lax.sort(sk), g, ROWS).sum()

    def valst(i, keys, g):
        gg = g + i.astype(jnp.float32)
        return jnp.zeros((16, N), jnp.float32).at[:12, :].set(gg.T).sum()

    def outt(i, keys, g):
        o = jnp.zeros((16, ROWS), jnp.float32) + i.astype(jnp.float32)
        return o[:12, :].T.sum()

    def vjp(i, keys, g):
        kf = mkkeys(i, keys)
        _, pull = jax.vjp(lambda t: quad_gather_flat("histogram", t, kf), table)
        (dt,) = pull(g)
        return dt.sum()

    fns = {k: v for k, v in locals().items() if callable(v) and k in stages}
    for s in stages:
        timeit(s, scanit(fns[s]), keys, g)


if __name__ == "__main__":
    main()
