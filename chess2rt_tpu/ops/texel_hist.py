"""Pallas TPU kernel: texel-gradient histogram (scatter-add as MXU matmuls).

The VJP of the bilinear quad gather is a scatter-add of [N, 12] cotangents
into the flat quad atlas.  XLA's TPU scatter serializes on duplicate
indices; pre-sorting helps (ops/shade.quad_gather_flat "sorted" mode) but the
monotone scatter itself remains a serial bottleneck.  This kernel finishes
the job on the MXU:

* rays arrive SORTED by flat texel key (the caller's bitonic lax.sort);
* the texel space is cut into tiles of TEXEL_TILE rows; each grid step
  owns one tile and loops over ray chunks, skipping chunks whose
  (scalar-prefetched) [min, max] key range misses the tile — sorted input
  makes those ranges tight, so almost every (tile, chunk) pair is skipped;
* an overlapping chunk contributes  dTile += G_sub^T @ W  where
  W[n, r] = 1[key_n == tile_lo + r] is built with VPU compares and the
  contraction runs on the MXU — the "scatter-add as one-hot matmuls on
  tiles" formulation;
* chunk data streams HBM -> VMEM with explicit async copies.

Output layout is [16, n_texels] (channel-major: 12 used rows + 4 pad) so
the minor dimension is the long one — a [n_texels, 12] layout would pad
every 12-wide row tile to 128 lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 2048  # rays per streamed chunk
SUB = 512  # rays per one-hot matmul (bounds W's VMEM footprint)
TEXEL_TILE = 2048  # texel rows per output tile
CH = 16  # payload channel capacity incl. padding (12 or 6 used)
BAND = 8  # texel rows packed into the matmul M dim (CH * BAND = 128)


def texel_histogram(sorted_keys, sorted_vals, n_texels: int, interpret: bool = False):
    """sorted_keys [N] int32 (ascending), sorted_vals [N, C<=16] f32 ->
    dq [n_texels, C] with dq[t] = sum of vals whose key == t.

    Keys outside [0, n_texels) are dropped (parity with scatter
    mode="drop")."""
    n = sorted_keys.shape[0]
    n_pad = -(-n // CHUNK) * CHUNK
    tex_pad = -(-n_texels // TEXEL_TILE) * TEXEL_TILE
    n_tiles = tex_pad // TEXEL_TILE
    n_chunks = n_pad // CHUNK

    # pad with an out-of-range key so padding never lands in a tile
    pad_k = jnp.full((n_pad - n,), tex_pad + TEXEL_TILE, jnp.int32)
    keys = jnp.concatenate([sorted_keys.astype(jnp.int32), pad_k]).reshape(1, n_pad)
    vals = jnp.concatenate(
        [sorted_vals, jnp.zeros((n_pad - n, sorted_vals.shape[1]), sorted_vals.dtype)]
    )
    # channel-major [CH, N]: minor dim is the long one (see module docstring)
    n_ch = sorted_vals.shape[1]
    assert n_ch <= CH, n_ch
    vals_t = jnp.zeros((CH, n_pad), jnp.float32).at[:n_ch, :].set(vals.T)

    # With SORTED keys, the chunks overlapping a texel tile form a
    # CONTIGUOUS range — precompute exact per-tile [start, end) chunk
    # bounds in XLA (two searchsorteds over the n_chunks-long monotone
    # chunk min/max arrays) and loop ONLY that range in-kernel.  The
    # previous all-chunks sweep with a pl.when skip test cost
    # n_tiles x n_chunks loop iterations (~6 ms of a 25 ms grad step at
    # 189 x 150; round-3 grad probe) for a handful of true overlaps.
    kc = keys.reshape(n_chunks, CHUNK)  # (row-major over the [1, n_pad] layout)
    lo = kc.min(axis=1)
    hi = kc.max(axis=1)
    tlo = jnp.arange(n_tiles, dtype=jnp.int32) * TEXEL_TILE
    # first chunk whose max reaches the tile, first whose min is past it
    c_start = jnp.searchsorted(hi, tlo, side="left").astype(jnp.int32)
    c_end = jnp.searchsorted(lo, tlo + TEXEL_TILE, side="left").astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # c_start, c_end
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # keys [n_pad] (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # vals_t [CH, n_pad] (HBM)
        ],
        # BANDED output layout: row j*CH + ch, column r8 holds
        # dq[ch, j*P + r8] with P = TILE//BAND — the band packing fills
        # the matmul's M dimension to CH*BAND = 128 (a CH=16-row output
        # uses 12.5% of the MXU; banding made the one-hot contraction ~4x
        # cheaper).  The caller unblocks with one XLA reshape/transpose
        # whose minor axis stays P-wide (row-granular, cheap).
        out_specs=pl.BlockSpec(
            (CH * BAND, TEXEL_TILE // BAND), lambda t, cs, ce: (0, t), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((1, CHUNK), jnp.int32),  # streamed keys
            pltpu.VMEM((CH, CHUNK), jnp.float32),  # streamed payloads
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def kernel(cs_ref, ce_ref, keys_hbm, vals_hbm, out_ref, kbuf, vbuf, sems):
        t = pl.program_id(0)
        tile_lo = t * TEXEL_TILE
        out_ref[...] = jnp.zeros((CH * BAND, TEXEL_TILE // BAND), jnp.float32)

        def chunk_body(c, _):
            kd = pltpu.make_async_copy(
                keys_hbm.at[:, pl.ds(c * CHUNK, CHUNK)], kbuf, sems.at[0]
            )
            vd = pltpu.make_async_copy(
                vals_hbm.at[:, pl.ds(c * CHUNK, CHUNK)], vbuf, sems.at[1]
            )
            kd.start()
            vd.start()
            kd.wait()
            vd.wait()
            acc = jnp.zeros((CH * BAND, TEXEL_TILE // BAND), jnp.float32)
            for s in range(CHUNK // SUB):
                k_sub = kbuf[:, pl.ds(s * SUB, SUB)] - tile_lo  # [1, SUB]
                # Banded one-hot contraction.  Two compounding MXU fixes
                # (round-3 texel_probe: 5.66 -> ~0.8 ms at 307k keys):
                #
                # * bf16 operands: the one-hot W is EXACT in bf16, and the
                #   package-wide jax_default_matmul_precision=highest would
                #   run an f32 dot as SIX bf16 passes.  The f32 cotangents
                #   split into a hi+lo bf16 pair (~16 mantissa bits, error
                #   ~2^-17 — inside the 2e-5 grad parity bound) at TWO
                #   passes, accumulated in f32.
                # * BAND packing: a plain [CH=16, SUB] x [SUB, TILE] uses
                #   16/128 of the MXU's M dim.  Mapping key -> (slab
                #   j = key//P, column r8 = key%P), with each slab owning
                #   its own CH-row block of the lhs, fills M to
                #   CH*BAND = 128 while N stays P = TILE//BAND = 256: full
                #   utilization, identical flops.
                #
                # Band mapping: key -> (slab j = key // P, column r8 =
                # key % P) with P = TILE // BAND.  The j-major choice (NOT
                # key % BAND) is load-bearing: the unblock outside the
                # kernel then only permutes MAJOR axes (rows move whole
                # 128-lane tiles), where the key%BAND mapping forced a
                # minor-dim-8 lane-granular relayout that cost ~12 ms of
                # the 640x480 grad step (round-3 A/B).
                # W[r8, n] = 1[k_sub[n] % P == r8]; out-of-range keys get
                # j outside [0, BAND) so no slab selects them (drop
                # semantics move from W to the slab select).
                p_cols = TEXEL_TILE // BAND
                jb = k_sub // p_cols  # slab index (floor: negatives drop)
                r8 = k_sub - jb * p_cols  # == k_sub % P, in [0, P)
                rows = jax.lax.broadcasted_iota(jnp.int32, (p_cols, SUB), 0)
                w_t = (jnp.broadcast_to(r8, (p_cols, SUB)) == rows).astype(
                    jnp.bfloat16
                )
                g_sub = vbuf[:, pl.ds(s * SUB, SUB)]  # [CH, SUB] f32
                g_hi = g_sub.astype(jnp.bfloat16)
                g_lo = (g_sub - g_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                # lhs [CH*BAND, SUB]: slab j holds g where key//P == j
                # (selects are exact, so banding commutes with the hi/lo split)
                jbb = jnp.broadcast_to(jb, (CH, SUB))
                zero_hi = jnp.zeros((CH, SUB), jnp.bfloat16)
                g8_hi = jnp.concatenate(
                    [jnp.where(jbb == j, g_hi, zero_hi) for j in range(BAND)], axis=0
                )
                g8_lo = jnp.concatenate(
                    [jnp.where(jbb == j, g_lo, zero_hi) for j in range(BAND)], axis=0
                )
                # contract the SUB (ray) axis: [CH*BAND, TILE//BAND].
                # precision=DEFAULT: highest would stamp
                # contract_precision<fp32> on a bf16 matmul, which Mosaic
                # rejects — the hi/lo split IS the precision mechanism.
                dn = (((1,), (1,)), ((), ()))
                acc = (
                    acc
                    + jax.lax.dot_general(
                        g8_hi, w_t, dn,
                        precision=jax.lax.Precision.DEFAULT,
                        preferred_element_type=jnp.float32,
                    )
                    + jax.lax.dot_general(
                        g8_lo, w_t, dn,
                        precision=jax.lax.Precision.DEFAULT,
                        preferred_element_type=jnp.float32,
                    )
                )
            out_ref[...] += acc
            return 0

        jax.lax.fori_loop(cs_ref[t], ce_ref[t], chunk_body, 0)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((CH * BAND, tex_pad // BAND), jnp.float32),
        interpret=interpret,
    )(c_start, c_end, keys, vals_t)
    # unblock the banded layout: row j*CH + ch, col t*P + r8 holds
    # dq[t*TILE + j*P + r8, ch].  One transpose whose MINOR axis stays a
    # full 256-wide P (row-granular tile moves); it also absorbs the final
    # [CH, tex] -> [tex, CH] flip the unbanded layout needed anyway.
    p_cols = TEXEL_TILE // BAND
    out = (
        out.reshape(BAND, CH, tex_pad // TEXEL_TILE, p_cols)
        .transpose(2, 0, 3, 1)
        .reshape(tex_pad, CH)
    )
    return out[:n_texels, :n_ch]
