"""MXU-native gather/scatter for small tables.

TPU has no fast hardware scatter; XLA lowers ``.at[idx].add`` to a (mostly
serialized) scatter loop, which dominates the rasterizer's backward pass
(gradients w.r.t. per-face attributes are scatter-adds of millions of
fragment cotangents into a table of only a few thousand faces).

When the table is small, the scatter IS a matmul:

    d_table = one_hot(idx)^T @ updates        # (F, N) @ (N, C)

computed in tiles over the fragment axis so the one-hot factor never
materializes at full size — each tile builds a (tile, F) one-hot via an
iota comparison (VPU) and contracts it on the MXU, accumulating (F, C).

``gather_rows`` wraps a standard forward gather with this backward.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Escape hatches for the optimized backward paths (used to bisect
# compile-time/runtime behavior per backend; see BENCH_NOTES.md):
#   DBW_FAST_SCATTER=0       plain XLA scatter-add backward everywhere
#   DBW_FAST_SCATTER=1/all   one-hot-matmul face backward + sort texel backward
#   DBW_FAST_SCATTER=gather  only the face-table one-hot backward
#   DBW_FAST_SCATTER=texel   only the sort-based texel backward
# 'auto' (default): Pallas small-table scatter kernel for the face-table
# backward on TPU, plain XLA scatter on CPU. Legacy values (0/all/gather/
# texel) select the round-1 XLA pipelines.
_MODE = os.environ.get("DBW_FAST_SCATTER", "auto").lower()
FAST_GATHER = _MODE in ("1", "all", "gather", "true")
FAST_TEXEL = _MODE in ("1", "all", "texel", "true", "auto")
FAST_SCATTER = FAST_GATHER  # back-compat alias


def one_hot_scatter_add(idx, updates, n_rows, tile=65536, precision=None):
    """scatter-add of updates (N, C) at rows idx (N,) into (n_rows, C),
    as a tiled one-hot matmul. Rows >= n_rows or < 0 are dropped."""
    N, C = updates.shape
    n_tiles = -(-N // tile)
    pad = n_tiles * tile - N
    idx_p = jnp.pad(idx, (0, pad), constant_values=-1)
    upd_p = jnp.pad(updates, ((0, pad), (0, 0)))
    idx_t = idx_p.reshape(n_tiles, tile)
    upd_t = upd_p.reshape(n_tiles, tile, C)
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, n_rows), 1)

    def body(acc, args):
        ix, up = args
        onehot = (ix[:, None] == rows).astype(upd_p.dtype)  # (tile, n_rows)
        acc = acc + jax.lax.dot_general(
            onehot, up, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, None

    init = jnp.zeros((n_rows, C), jnp.float32)
    out, _ = jax.lax.scan(body, init, (idx_t, upd_t))
    return out.astype(updates.dtype)


def sorted_segment_sum(ids, updates, n_rows):
    """Exact scatter-add via sort + cumulative sums — for LARGE target
    tables where the one-hot matmul is infeasible (e.g. texel gradients:
    ~20M updates into ~1M texels).

    TPU rationale (measured on v5e): XLA's scatter-add serializes
    (~1.5s for 19.2M updates) while lax.sort (120ms) + cumsum (19ms) +
    row-wise boundary gathers (17ms) stay vectorized. Algorithm:

      sort updates by id; prefix-sum them; for each output row t, the
      segment sum is cs[lastpos(t)] - cs[lastpos(t-1)] where lastpos(t) =
      (# ids <= t) - 1 comes from a bincount prefix sum. Absent rows
      produce identical consecutive lastpos -> zero by construction.
    """
    N, C = updates.shape
    cols = [updates[:, c] for c in range(C)]
    sorted_all = jax.lax.sort((ids,) + tuple(cols), num_keys=1)
    s = sorted_all[0]
    u = jnp.stack(sorted_all[1:], axis=-1)
    cs = jnp.cumsum(u, axis=0)
    counts = jnp.bincount(s, length=n_rows)  # ids must lie in [0, n_rows)
    lastpos = jnp.cumsum(counts) - 1
    total_to = jnp.where(
        (lastpos >= 0)[:, None], cs[jnp.clip(lastpos, 0, N - 1)], 0.0
    )
    prev = jnp.concatenate([jnp.zeros((1, C), cs.dtype), total_to[:-1]], axis=0)
    return (total_to - prev).astype(updates.dtype)


from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_rows_partial(table, idx, n_grad_cols):
    """table[(idx,)] with a fast backward that scatters cotangents for the
    FIRST ``n_grad_cols`` columns only (the rest are declared gradient-free
    — e.g. static uv/map-index columns packed next to dynamic geometry in
    one table so the fragment stream pays ONE row gather).

    table: (F, C); idx: any int shape; out: idx.shape + (C,). Negative
    indices read row 0 forward and receive no gradient."""
    return table[jnp.maximum(idx, 0)]


def gather_rows(table, idx):
    """gather_rows_partial with gradients for every column."""
    return gather_rows_partial(table, idx, table.shape[-1])


def _gather_fwd(table, idx, n_grad_cols):
    return gather_rows_partial(table, idx, n_grad_cols), (
        idx, table.shape[0], table.shape[-1]
    )


def _gather_bwd(n_grad_cols, res, g):
    idx, F, C_total = res
    flat_idx = idx.reshape(-1)
    flat_g = g.reshape(-1, g.shape[-1])[:, :n_grad_cols]
    if (
        _MODE in ("auto", "kernel")
        and jax.default_backend() != "cpu"
        and flat_g.shape[-1] <= 16
        and F <= 65536  # (16, R_pad) f32 accumulator must fit VMEM
    ):
        # Pallas windowed one-hot scatter with a VMEM-resident accumulator
        # (fragment face ids are view/block-local per sub-chunk)
        from .segment_sum_pallas import small_table_scatter_add

        d = small_table_scatter_add(flat_idx, flat_g, F)
        return _pad_cols(d, C_total), None
    masked = jnp.where(flat_idx >= 0, flat_idx, F)  # out-of-range -> dropped
    if FAST_GATHER:
        # sort-based segment sum (same pipeline as the texel backward; the
        # earlier one-hot lax.scan matmul variant triggered a pathological
        # server-side compile in the axon environment). Row F catches the
        # clamped negative indices and is dropped.
        d_table = sorted_segment_sum(masked, flat_g, F + 1)[:F]
    else:
        d_table = (
            jnp.zeros((F + 1, flat_g.shape[-1]), flat_g.dtype)
            .at[masked]
            .add(flat_g)[:F]
        )
    return _pad_cols(d_table, C_total), None


def _pad_cols(d, C_total):
    n = d.shape[-1]
    if n == C_total:
        return d
    return jnp.concatenate(
        [d, jnp.zeros((d.shape[0], C_total - n), d.dtype)], axis=1
    )


gather_rows_partial.defvjp(_gather_fwd, _gather_bwd)
