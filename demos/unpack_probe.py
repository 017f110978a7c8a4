"""u16-gather UNPACK strategies at the texel-fetch shape (round 5).

The round-5 profiler trace (artifacts/xprof_flagship) split the ~8 ms/tap
texel fetch into: the raw u16[385k,24] -> u16[2.07M,24] gather at
3.9 ms/tap (1.9 ns/row — already at the index-rate floor) plus an
UNPACK CHAIN costing ~3.7 ms/tap: a {1,0}->{0,1} layout copy (0.73), a
u16->u32 convert (0.31), the [2M,24]->[2M,12,2] reshape that lands a
T(2,128) relayout (1.69!), a shift-or recombine (0.50) and the final
bitcast (0.43).  This probe measures alternative unpacks on the real
chip, each feeding a REAL consumer (the bilinear quad combine, so XLA
can't elide relayouts into a .sum() — CLAUDE.md rule 10):

    cur       row_gather_raw as shipped (reshape-pair bitcast unpack)
    slice     strided-column unpack: u32 math on even/odd columns, no
              3-d reshape anywhere
    g3d       gather from the [n,12,2] 3-d u16 table directly
    u32       bitcast the table to u32[n,12] BEFORE the gather (is the
              2-byte gather speedup element-size-bound or width-bound?)
    f32       the plain f32[n,12] gather (the pre-round-3 baseline)

Usage: python demos/unpack_probe.py [variants...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

ROWS = 385_536  # lecture5's unpadded quad-atlas row count
IDX_N = 2_073_600  # one 1080p tap
ITERS = 8
REPEATS = 3


def consume(q, w):
    """Bilinear-combine twin (fusion.940's role): [N,12] quads x 4 weights
    -> [N,3] texel, reduced to a scalar."""
    t = (
        q[:, 0:3] * w[:, 0:1]
        + q[:, 3:6] * w[:, 1:2]
        + q[:, 6:9] * w[:, 2:3]
        + q[:, 9:12] * w[:, 3:4]
    )
    return t.sum()


def unpack_cur(table):
    from chess2rt_tpu.ops.fastgather import row_gather_raw

    return lambda idx: row_gather_raw(table, idx)


def unpack_slice(table):
    n, c = table.shape
    t16 = jax.lax.bitcast_convert_type(table, jnp.uint16).reshape(n, 2 * c)

    def f(idx):
        g = t16[idx]  # u16 [N, 24]
        gu = g.astype(jnp.uint32)
        lo = gu[:, 0::2]
        hi = gu[:, 1::2]
        return jax.lax.bitcast_convert_type((hi << 16) | lo, jnp.float32)

    return f


def unpack_g3d(table):
    t16 = jax.lax.bitcast_convert_type(table, jnp.uint16)  # [n, 12, 2]

    def f(idx):
        g = t16[idx]  # [N, 12, 2]
        return jax.lax.bitcast_convert_type(g, jnp.float32)

    return f


def unpack_u32(table):
    tu = jax.lax.bitcast_convert_type(table, jnp.uint32)  # [n, 12]

    def f(idx):
        return jax.lax.bitcast_convert_type(tu[idx], jnp.float32)

    return f


def unpack_f32(table):
    return lambda idx: table[idx]


VARIANTS = {
    "cur": unpack_cur,
    "slice": unpack_slice,
    "g3d": unpack_g3d,
    "u32": unpack_u32,
    "f32": unpack_f32,
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((ROWS, 12), np.float32))
    idx0 = jnp.asarray(rng.integers(0, ROWS, IDX_N, np.int32))
    w = jnp.asarray(rng.random((IDX_N, 4), np.float32))
    print(f"# devices: {jax.devices()}", file=sys.stderr)

    # bit-exactness gate first (tiny, CPU-cheap): every variant must equal
    # the plain gather exactly
    small_t = table[:1024]
    small_i = idx0[:4096] % 1024
    ref = np.asarray(jax.jit(lambda: small_t[small_i])())
    for name in names:
        got = np.asarray(jax.jit(VARIANTS[name](small_t))(small_i))
        assert got.shape == ref.shape and (got == ref).all(), f"{name} not bit-exact"
    print("# all variants bit-exact on the small gate", file=sys.stderr)

    for name in names:
        f = VARIANTS[name](table)

        def many(i0, w):
            def body(acc, k):
                i = (i0 + k) % ROWS  # fresh indices every iteration
                return acc + consume(f(i), w), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(ITERS))
            return acc

        j = jax.jit(many)
        v = float(j(idx0, w))
        assert np.isfinite(v)
        times = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            float(j(idx0, w))
            times.append(time.perf_counter() - t0)
        dt = min(times) / ITERS
        print(f"{name}: {dt*1e3:.2f} ms/tap raw ({dt/IDX_N*1e9:.2f} ns/row incl. combine)",
              flush=True)


if __name__ == "__main__":
    main()
