"""Microbenchmark the bounce-compaction primitives on the real TPU.

forward_probe.py attributes ~18.7 ms/tap (1080p flagship) to the bounce
machinery: one 2M lax.sort (compact_indices), one [cap]<-[2M,9] row
gather, one bounce round at cap width, and one [2M,3] scatter-add
writeback.  This probe times isolated variants of the gather and the
writeback so the pipeline can pick the measured-fastest forms:

    gather_merged   — row_gather(concat 9-col table)      (current)
    gather_fold     — same with u16 K-row folding
    gather_split    — three separate [cap]<-[2M,3] gathers
    scatter_add     — color.at[tgt].add(sub)              (current)
    scatter_set     — zeros.at[tgt].set(sub) + color      (set is ~9x
                      cheaper per update on v5e per the round-3 cost map;
                      tgt rows are unique so set==add-into-zeros)
    scatter_searchsorted — writeback as searchsorted + u16 row gather +
                      where (no scatter at all)

Every stage runs ITERS iterations inside ONE jit with an
iteration-dependent input (LICM-proof) and ends on a scalar readback.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from chess2rt_tpu.ops.fastgather import row_gather

N = 1920 * 1080
CAP = -(-N // 16 // 2048) * 2048  # tile-rounded flagship capacity (129 792... depends)
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
    ms = (min(times) - 0.030) / ITERS * 1000  # subtract the ~30 ms tunnel
    print(f"{name}: {ms:.2f} ms/iter (raw {min(times)*1000:.1f} ms / {ITERS}; compile {c:.0f}s)",
          flush=True)


def scanit(body):
    """body(i, *args) -> scalar; scanned ITERS times with i varying."""

    def fn(*args):
        def sbody(acc, i):
            return acc + body(i, *args), None

        acc, _ = jax.lax.scan(sbody, jnp.float32(0.0), jnp.arange(ITERS))
        return acc

    return fn


def main():
    stages = sys.argv[1:] or [
        "sort2m",
        "gather_merged",
        "gather_fold",
        "gather_split",
        "scatter_add",
        "scatter_set",
        "scatter_searchsorted",
    ]
    print(f"# devices: {jax.devices()}  N={N} CAP={CAP}", flush=True)
    key = jax.random.PRNGKey(0)
    table = jax.random.uniform(key, (N, 9), jnp.float32)
    color = jax.random.uniform(jax.random.fold_in(key, 1), (N, 3), jnp.float32)
    sub = jax.random.uniform(jax.random.fold_in(key, 2), (CAP, 3), jnp.float32)
    # a sorted unique live selection of ~92k rows padded with the OOB sentinel
    live = jax.random.uniform(jax.random.fold_in(key, 3), (N,)) < (92_000 / N)

    def mksel(i, live):
        # roll the live mask so every iteration's indices differ (LICM-proof)
        keys = jnp.where(jnp.roll(live, i), jnp.arange(N, dtype=jnp.int32), N)
        return jax.lax.sort(keys)[:CAP]

    fns = {
        "sort2m": lambda i, live: mksel(i, live).sum().astype(jnp.float32),
        "gather_merged": lambda i, live, t: row_gather(t, mksel(i, live), True, True).sum(),
        "gather_fold": lambda i, live, t: row_gather(t, mksel(i, live), True, True, True).sum(),
        "gather_split": lambda i, live, t: sum(
            row_gather(t[:, 3 * j : 3 * j + 3], mksel(i, live), True, True).sum()
            for j in range(3)
        ),
        "gather_plain": lambda i, live, t: t[jnp.clip(mksel(i, live), 0, N - 1)].sum(),
    }

    def scatter_add(i, live, color, sub):
        sel = mksel(i, live)
        return color.at[sel].add(sub, mode="drop", indices_are_sorted=True).sum()

    def scatter_set(i, live, color, sub):
        sel = mksel(i, live)
        z = jnp.zeros_like(color).at[sel].set(
            sub, mode="drop", indices_are_sorted=True, unique_indices=True
        )
        return (color + z).sum()

    def scatter_searchsorted(i, live, color, sub):
        sel = mksel(i, live)
        pos = jnp.searchsorted(sel, jnp.arange(N, dtype=jnp.int32))
        posc = jnp.minimum(pos, CAP - 1)
        hit = sel[posc] == jnp.arange(N, dtype=jnp.int32)
        g = row_gather(sub, posc, False, True)
        return (color + jnp.where(hit[:, None], g, 0.0)).sum()

    fns["scatter_add"] = scatter_add
    fns["scatter_set"] = scatter_set
    fns["scatter_searchsorted"] = scatter_searchsorted

    for s in stages:
        f = fns[s]
        if s.startswith("gather"):
            timeit(s, scanit(f), live, table)
        elif s.startswith("scatter"):
            timeit(s, scanit(f), live, color, sub)
        else:
            timeit(s, scanit(f), live)


if __name__ == "__main__":
    main()
