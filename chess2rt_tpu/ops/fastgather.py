"""Fast row gathers for XLA's TPU lowering.

XLA's TPU gather is index-rate-bound (~7 ns per gathered row at 2M
indices, measured on v5e in round 3) and, crucially, ~2x faster per byte
for 2-byte element types: gathering the same 48-byte rows as u16[24]
instead of f32[12] measured 7.8 ms vs 14.7 ms at 2M indices.  Bitcasting
f32 rows to u16 pairs and back is bit-exact and purely elementwise, so
every hot per-ray row gather (deferred bitmap texels, cubemap quads) goes
through :func:`row_gather` below.

The wrapper is a ``jax.custom_vjp`` because ``bitcast_convert_type`` is
not differentiable: the backward is the standard gather transpose (a
scatter-add of the cotangent rows), identical in value to the plain
gather's VJP.  Callers that need a smarter cotangent accumulation (the
texel histogram) keep their own custom VJP and call :func:`row_gather_raw`
inside its forward.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


# The u16 fast path only wins while the table's ROW COUNT stays under the
# staging limit of the 16-bit gather lowering: measured on v5e at 2M
# indices, tables up to 450k rows gather at ~2-4 ns/row regardless of row
# width (8-22 MB all fast), while >=524,288 rows collapse to ~27 ns/row —
# worse than the plain f32 gather (~7.4 ns/row).  Oversized tables can be
# FOLDED K consecutive rows into one wide row (a free reshape): gather by
# key//K, then select the key%K slice with a short where-chain.  Folding
# multiplies gathered bytes by K, so it only pays for index-heavy gathers
# (the per-ray texel fetch), not for few-index compaction gathers.
U16_FAST_ROWS = 450_000
MAX_FOLD = 8
# Folding multiplies the gathered bytes by K: cap the folded result size
# so index-heavy gathers on HUGE tables (the texel-VJP's [n_pixels, 12]
# permutation gather at 1080p: k=8 -> two 1.48 GB u32 temps, OOM) fall
# back to the plain f32 gather instead.  512 MB keeps the measured wins
# (zaphod's merged bitmap+cubemap table folds k=2 at ~384 MB).
FOLD_BYTES_CAP = 512 * 1024 * 1024


def row_gather_raw(table, idx, fold=False):
    """``table[idx]`` for a 2-D f32 table via the u16-pair fast path.

    Bit-exact, NOT differentiable (bitcast inside) — use inside custom-VJP
    forwards, or call :func:`row_gather` for the AD-complete version.
    Non-f32 dtypes (the f64 oracle-parity path) take the plain gather, as
    do tables beyond the fast zone unless ``fold=True`` lets K-row folding
    bring the row count back under it.
    Out-of-range indices clamp, like jnp basic indexing under jit.
    """
    if table.ndim != 2 or table.dtype != jnp.float32:
        return table[idx]
    n, c = table.shape
    k = 1
    if n > U16_FAST_ROWS:
        if not fold:
            return table[idx]
        while n > k * U16_FAST_ROWS and k < MAX_FOLD:
            k *= 2
        if n > k * U16_FAST_ROWS:
            return table[idx]  # too large even folded: plain gather
        import numpy as np

        if int(np.prod(idx.shape)) * k * c * 4 > FOLD_BYTES_CAP:
            return table[idx]  # folded result too big (see FOLD_BYTES_CAP)
        pad = (-n) % k
        if pad:
            table = jnp.concatenate([table, jnp.zeros((pad, c), table.dtype)])
        table = table.reshape((n + pad) // k, c * k)
    t16 = jax.lax.bitcast_convert_type(table, jnp.uint16).reshape(
        table.shape[0], 2 * table.shape[1]
    )
    if k == 1:
        g = t16[idx]
        return jax.lax.bitcast_convert_type(g.reshape(idx.shape + (c, 2)), jnp.float32)
    idxc = jnp.clip(idx, 0, n - 1)  # preserve the plain path's clamp semantics
    g = t16[idxc // k]
    gf = jax.lax.bitcast_convert_type(g.reshape(idx.shape + (k, c, 2)), jnp.float32)
    rem = idxc % k
    out = gf[..., 0, :]
    for j in range(1, k):
        out = jnp.where((rem == j)[..., None], gf[..., j, :], out)
    return out


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def row_gather(table, idx, unique_indices=False, indices_are_sorted=False, fold=False):
    """Differentiable ``table[idx]`` (2-D table, integer idx) that takes the
    u16-pair fast path forward and the standard scatter-add transpose
    backward.  ``unique_indices`` / ``indices_are_sorted`` describe ``idx``
    and are forwarded to the backward scatter (e.g. compaction selections
    are sorted and unique, which XLA lowers much faster); ``fold`` allows
    K-row folding for oversize tables (see :func:`row_gather_raw`)."""
    return row_gather_raw(table, idx, fold=fold)


def _row_gather_fwd(table, idx, unique_indices, indices_are_sorted, fold):
    # residual leaves must be JAX types: a zero-WIDTH slice of the table
    # carries its row count and dtype statically at zero cost
    return row_gather_raw(table, idx, fold=fold), (idx, table[:, :0])


def _row_gather_bwd(unique_indices, indices_are_sorted, fold, res, g):
    idx, proto = res
    shape = (proto.shape[0], g.shape[-1])
    dtype = proto.dtype
    flat_idx = idx.reshape(-1)
    gf = g.reshape(flat_idx.shape[0], shape[-1]).astype(dtype)
    # mode="drop" (not clip): out-of-range sentinel indices (compaction junk
    # slots) must NOT collapse onto row n-1 — duplicates would break the
    # unique_indices promise and could race a genuine row n-1 update.
    # NOTE the fwd clamps while this drops: OOB rows therefore get zero
    # cotangent, which is correct here because every compaction caller
    # masks junk-lane VALUES out of the loss (their cotangents are zero).
    dt = (
        jnp.zeros(shape, dtype)
        .at[flat_idx]
        .add(gf, mode="drop", unique_indices=unique_indices,
             indices_are_sorted=indices_are_sorted)
    )
    import numpy as np

    dzero = np.zeros(idx.shape, dtype=jax.dtypes.float0)
    return dt, dzero


row_gather.defvjp(_row_gather_fwd, _row_gather_bwd)
