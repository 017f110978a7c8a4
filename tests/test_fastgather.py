"""ops/fastgather: the u16-pair row gather must be BIT-exact vs plain
indexing in every regime (small table, folded oversize table, non-f32
fallthrough), and its custom VJP must match the native gather transpose."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chess2rt_tpu.ops import fastgather as FG


@pytest.mark.parametrize("rows,cols", [(1000, 12), (1000, 9), (7, 3)])
def test_raw_bit_exact_small(rows, cols):
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.standard_normal((rows, cols)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, rows, 4096).astype(np.int32))
    np.testing.assert_array_equal(FG.row_gather_raw(tab, idx), tab[idx])


def test_raw_bit_exact_folded():
    rows = FG.U16_FAST_ROWS + 1017  # odd overflow: exercises fold padding
    rng = np.random.default_rng(1)
    tab = jnp.asarray(rng.standard_normal((rows, 6)).astype(np.float32))
    idx = jnp.asarray(
        np.concatenate([rng.integers(0, rows, 4096), [0, rows - 1]]).astype(np.int32)
    )
    out = jax.jit(lambda t, i: FG.row_gather_raw(t, i, fold=True))(tab, idx)
    np.testing.assert_array_equal(out, tab[idx])


def test_raw_clamps_out_of_range():
    tab = jnp.arange(12.0, dtype=jnp.float32).reshape(4, 3)
    idx = jnp.asarray([-5, 7], jnp.int32)
    out = jax.jit(lambda t, i: FG.row_gather_raw(t, i))(tab, idx)
    np.testing.assert_array_equal(out, tab[jnp.asarray([0, 3])])


def test_raw_folded_clamps_out_of_range():
    rows = FG.U16_FAST_ROWS + 64
    tab = jnp.ones((rows, 3), jnp.float32).at[0].set(2.0).at[rows - 1].set(3.0)
    idx = jnp.asarray([-9, rows + 9], jnp.int32)
    out = jax.jit(lambda t, i: FG.row_gather_raw(t, i, fold=True))(tab, idx)
    np.testing.assert_array_equal(out, tab[jnp.asarray([0, rows - 1])])


def test_f64_falls_through():
    tab = jnp.arange(8, dtype=jnp.float64).reshape(4, 2)
    idx = jnp.asarray([3, 1], jnp.int32)
    np.testing.assert_array_equal(FG.row_gather_raw(tab, idx), tab[idx])


def test_vjp_matches_native():
    rng = np.random.default_rng(2)
    tab = jnp.asarray(rng.standard_normal((257, 9)).astype(np.float32))
    idx = jnp.asarray(np.sort(rng.choice(257, 64, replace=False)).astype(np.int32))
    ct = jnp.asarray(rng.standard_normal((64, 9)).astype(np.float32))

    def via_fast(t):
        return (FG.row_gather(t, idx, True, True) * ct).sum()

    def via_plain(t):
        return (t[idx] * ct).sum()

    ga = jax.grad(via_fast)(tab)
    gb = jax.grad(via_plain)(tab)
    np.testing.assert_array_equal(ga, gb)


def test_vjp_drops_sentinel_rows():
    """Out-of-range sentinel indices (compaction junk slots) must get zero
    cotangent without perturbing row n-1 (the fwd clamps, the bwd drops)."""
    tab = jnp.ones((8, 3), jnp.float32)
    idx = jnp.asarray([2, 8], jnp.int32)  # 8 == sentinel (out of range)
    mask = jnp.asarray([1.0, 0.0])[:, None]  # caller masks junk-lane values

    def f(t):
        return (FG.row_gather(t, idx, True, True) * mask).sum()

    g = jax.grad(f)(tab)
    expect = np.zeros((8, 3), np.float32)
    expect[2] = 1.0
    np.testing.assert_array_equal(g, expect)


def test_raw_bit_exact_max_fold():
    rows = FG.U16_FAST_ROWS * FG.MAX_FOLD - 3  # K = MAX_FOLD with padding
    rng = np.random.default_rng(3)
    tab = jnp.asarray(rng.standard_normal((rows, 3)).astype(np.float32))
    idx = jnp.asarray(
        np.concatenate([rng.integers(0, rows, 2048), [0, rows - 1]]).astype(np.int32)
    )
    out = jax.jit(lambda t, i: FG.row_gather_raw(t, i, fold=True))(tab, idx)
    np.testing.assert_array_equal(out, tab[idx])
