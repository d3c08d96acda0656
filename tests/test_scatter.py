"""MXU scatter/gather vs XLA reference semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dbw_tpu.ops.scatter import gather_rows, one_hot_scatter_add, sorted_segment_sum


def test_sorted_segment_sum_matches_at_add():
    rng = np.random.default_rng(3)
    for n_rows, n in [(50, 4000), (1000, 1), (7, 7)]:
        ids = jnp.asarray(rng.integers(0, n_rows, n), jnp.int32)
        upd = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
        out = sorted_segment_sum(ids, upd, n_rows)
        ref = jnp.zeros((n_rows, 3)).at[ids].add(upd)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_sorted_segment_sum_empty_rows_zero():
    ids = jnp.asarray([2, 2, 5], jnp.int32)
    upd = jnp.ones((3, 2))
    out = sorted_segment_sum(ids, upd, 8)
    np.testing.assert_allclose(np.asarray(out)[[0, 1, 3, 4, 6, 7]], 0.0)
    np.testing.assert_allclose(np.asarray(out)[2], 2.0)
    np.testing.assert_allclose(np.asarray(out)[5], 1.0)


def test_one_hot_scatter_matches_at_add():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 37, 10000), jnp.int32)
    upd = jnp.asarray(rng.random((10000, 5), np.float32))
    out = one_hot_scatter_add(idx, upd, 37, tile=1024)
    ref = jnp.zeros((37, 5)).at[idx].add(upd)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_negative_indices_dropped():
    idx = jnp.asarray([0, -1, 2, -1], jnp.int32)
    upd = jnp.ones((4, 2))
    out = one_hot_scatter_add(idx, upd, 3)
    np.testing.assert_allclose(out, [[1, 1], [0, 0], [1, 1]])


def test_gather_rows_forward():
    table = jnp.arange(12.0).reshape(4, 3)
    idx = jnp.asarray([[2, 0], [3, -1]], jnp.int32)
    out = gather_rows(table, idx)
    np.testing.assert_allclose(out[0, 0], table[2])
    np.testing.assert_allclose(out[1, 1], table[0])  # clamped read


def test_gather_rows_grad_matches_plain():
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.random((29, 4), np.float32))
    idx = jnp.asarray(rng.integers(0, 29, (6, 7)), jnp.int32)
    cot = jnp.asarray(rng.random((6, 7, 4), np.float32))

    g1 = jax.grad(lambda t: (gather_rows(t, idx) * cot).sum())(table)
    g2 = jax.grad(lambda t: (t[idx] * cot).sum())(table)
    np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-5)


def test_gather_rows_negative_no_grad():
    table = jnp.ones((5, 2))
    idx = jnp.asarray([-1, 1], jnp.int32)
    g = jax.grad(lambda t: gather_rows(t, idx).sum())(table)
    # row 0 receives nothing from the clamped -1 read; row 1 gets the grad
    np.testing.assert_allclose(np.asarray(g)[0], 0.0)
    np.testing.assert_allclose(np.asarray(g)[1], 1.0)


@pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="small_table_scatter_add Pallas kernel needs TPU",
)
def test_small_table_scatter_add_matches_at_add():
    from dbw_tpu.ops.segment_sum_pallas import small_table_scatter_add

    rng = np.random.default_rng(3)
    N, R = 50_000, 1600
    base = np.repeat(rng.integers(0, R - 100, N // 500), 500)
    ids = (base + rng.integers(0, 100, N)).clip(0, R - 1).astype(np.int32)
    ids[::11] = -1
    upd = rng.standard_normal((N, 12)).astype(np.float32)
    out = np.asarray(
        jax.jit(lambda i, u: small_table_scatter_add(i, u, R))(ids, upd)
    )
    ref = np.zeros((R, 12))
    m = ids >= 0
    for c in range(12):
        np.add.at(ref[:, c], ids[m], upd[m][:, c])
    np.testing.assert_allclose(out, ref, atol=1e-4)
