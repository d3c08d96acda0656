"""Pallas TPU kernel: post-sort windowed segment sums for texel gradients.

Replaces the XLA tail of the texel-gradient pipeline (bincount + 12-channel
cumsum + per-texel boundary gather — ~98 ms/step on the DTU workload) with
one kernel over the SORTED fragment stream:

- the caller sorts fragments by base texel id (XLA lax.sort, kept outside),
- the kernel walks the sorted stream in blocks; each sub-chunk of CH rows
  touches only the aligned id windows [w*W, (w+1)*W) its ids span (sorted
  -> typically ONE window),
- per (sub-chunk, window): a (W, CH) one-hot of ids vs the window's iota is
  contracted on the MXU against the 12 per-corner weighted gradient rows
  (12, CH), yielding the window's (W, 12) contribution,
- the contribution is read-modify-write accumulated into the (R_pad, 12)
  output in HBM via async DMA — safe because the TPU grid is sequential.

The consumer applies the 4-offset bilinear stencil to the (R, 12) result
(render/meshes.py:_sample_quad_bwd).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W = 512        # output window width (texel ids)
CH = 1024      # sorted rows per one-hot matmul
SUB = 8        # sub-chunks per program

# Wire format of the packed bilinear-weight payload: wx, wy in [0, 1]
# quantized to 15-bit fixed point and packed (wx << 15) | wy into ONE i32
# sort operand. THE kernel below and every producer/consumer must agree —
# import these helpers, never re-derive the constants.
WQ = 32767.0


def pack_wxy(wx, wy):
    qx = jnp.round(wx * WQ).astype(jnp.int32)
    qy = jnp.round(wy * WQ).astype(jnp.int32)
    return (qx << 15) | qy


def unpack_wxy(p):
    return (
        (p >> 15).astype(jnp.float32) * (1.0 / WQ),
        (p & 0x7FFF).astype(jnp.float32) * (1.0 / WQ),
    )


def _kernel(win_ref, s_ref, p_ref, r_ref, g_ref, b_ref, zeros_ref,
            out_ref, scratch, sem_in, sem_out):
    del zeros_ref  # aliased with out_ref (provides the zero init)
    for sub in range(SUB):
        sl = slice(sub, sub + 1)
        s_blk = s_ref[sl, :]                      # (1, CH) int32
        p = p_ref[sl, :]                          # 15+15-bit packed wx|wy
        wx, wy = unpack_wxy(p)
        r = r_ref[sl, :]
        g = g_ref[sl, :]
        b = b_ref[sl, :]
        w00 = (1.0 - wx) * (1.0 - wy)
        w01 = wx * (1.0 - wy)
        w10 = (1.0 - wx) * wy
        w11 = wx * wy
        zero4 = jnp.zeros((4, r.shape[-1]), jnp.float32)
        updT = jnp.concatenate(
            [
                r * w00, g * w00, b * w00,
                r * w01, g * w01, b * w01,
                r * w10, g * w10, b * w10,
                r * w11, g * w11, b * w11,
                zero4,  # pad channel rows 12 -> 16 (sublane-aligned DMA)
            ],
            axis=0,
        )  # (16, CH)

        w0 = win_ref[0, sub, 0]
        n_win = win_ref[0, sub, 1]

        def win_body(w, _):
            base = (w0 + w) * W
            iota = jax.lax.broadcasted_iota(jnp.int32, (W, CH), 0) + base
            oh = (iota == s_blk).astype(jnp.float32)  # (W, CH)
            contrib = jax.lax.dot_general(
                updT, oh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (16, W)
            cp_in = pltpu.make_async_copy(
                out_ref.at[:, pl.ds(base, W)], scratch, sem_in
            )
            cp_in.start()
            cp_in.wait()
            scratch[:] = scratch[:] + contrib
            cp_out = pltpu.make_async_copy(
                scratch, out_ref.at[:, pl.ds(base, W)], sem_out
            )
            cp_out.start()
            cp_out.wait()
            return 0

        jax.lax.fori_loop(0, n_win, win_body, 0)


def quad_corner_segment_sums(s, packed_wxy, gcols, R):
    """Per-base-id sums of the 4 bilinear-corner weighted gradients.

    s: (N,) int32 base texel ids, SORTED ascending, values in [0, R);
    packed_wxy: (N,) i32 15+15-bit fixed-point (wx << 15) | wy (packed so
    the caller's sort carries ONE weight payload instead of two f32s);
    gcols: tuple of 3 (N,) f32 gradient channels.
    Returns (12, R) f32: rows [c*3:(c+1)*3] hold the RGB sums weighted by
    corner c's bilinear weight, ordered (00, 01, 10, 11). (Transposed so
    the kernel's per-window DMA slices run along the 128-aligned lane
    dimension.)"""
    N = s.shape[0]
    if N == 0:
        return jnp.zeros((12, R), jnp.float32)
    blk = SUB * CH
    n_blk = max(-(-N // blk), 1)
    pad = n_blk * blk - N
    if pad:
        # pad ids with the last (max) id and zero payloads: lands in an
        # already-touched window, contributes exactly zero
        s = jnp.concatenate([s, jnp.broadcast_to(s[-1:], (pad,))])
        zero = jnp.zeros((pad,), jnp.float32)
        packed_wxy = jnp.concatenate(
            [packed_wxy, jnp.zeros((pad,), packed_wxy.dtype)]
        )
        gcols = tuple(jnp.concatenate([c, zero]) for c in gcols)

    R_pad = -(-R // W) * W
    # blocks are (SUB, CH): one sub-chunk per sublane row
    s_mat = s.reshape(n_blk * SUB, CH)
    # per-sub-chunk window ranges (SMEM scalars, computed in XLA)
    w0 = s_mat[:, 0].reshape(n_blk, SUB) // W
    n_win = s_mat[:, -1].reshape(n_blk, SUB) // W - w0 + 1
    win_info = jnp.stack([w0, n_win], axis=-1).astype(jnp.int32)

    args = [s_mat] + [
        a.reshape(n_blk * SUB, CH)
        for a in (packed_wxy,) + tuple(gcols)
    ]
    blk_spec = pl.BlockSpec((SUB, CH), lambda i: (i, 0))
    out = pl.pallas_call(
        _kernel,
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec((1, SUB, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ] + [blk_spec] * 5 + [pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((16, R_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((16, W), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        input_output_aliases={6: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(win_info, *args, jnp.zeros((16, R_pad), jnp.float32))
    return out[:12, :R]


def _small_kernel(win_ref, s_ref, updT_ref, out_ref, acc):
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    for sub in range(SUB):
        s_blk = s_ref[sub:sub + 1, :]                    # (1, CH) int32
        updT = updT_ref[:, pl.ds(sub * CH, CH)]          # (16, CH)
        w0 = win_ref[0, sub, 0]
        n_win = win_ref[0, sub, 1]

        def win_body(w, _):
            base = (w0 + w) * W
            iota = jax.lax.broadcasted_iota(jnp.int32, (W, CH), 0) + base
            oh = (iota == s_blk).astype(jnp.float32)     # (W, CH)
            contrib = jax.lax.dot_general(
                updT, oh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (16, W)
            acc[:, pl.ds(base, W)] = acc[:, pl.ds(base, W)] + contrib
            return 0

        jax.lax.fori_loop(0, n_win, win_body, 0)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc[:]


def small_table_scatter_add(idx, upd, n_rows):
    """UNSORTED scatter-add of upd (N, C<=16) at idx (N,) into (n_rows, C)
    for SMALL tables (n_rows up to a few thousand): the full channel-major
    accumulator lives in VMEM scratch across the sequential grid, and each
    1024-row sub-chunk contracts a windowed one-hot on the MXU.

    Correct for ANY ids in [-1, n_rows) (negatives dropped), but fast only
    when each sub-chunk's ids are LOCALIZED — true for the fragment face
    stream, where consecutive fragments belong to one view and a few
    spatially-coherent blocks. Replaces the XLA scatter in gather_rows'
    backward (ops/scatter.py)."""
    N, C = upd.shape
    assert C <= 16, C
    if N == 0:
        return jnp.zeros((n_rows, C), upd.dtype)
    upd = jnp.where((idx >= 0)[:, None], upd, 0.0)
    idx = jnp.maximum(idx, 0)
    blk = SUB * CH
    n_blk = max(-(-N // blk), 1)
    pad = n_blk * blk - N
    if pad:
        idx = jnp.concatenate([idx, jnp.broadcast_to(idx[-1:], (pad,))])
        upd = jnp.concatenate([upd, jnp.zeros((pad, C), upd.dtype)])
    R_pad = -(-n_rows // W) * W
    s_mat = idx.reshape(n_blk * SUB, CH)
    mn = s_mat.min(axis=1).reshape(n_blk, SUB)
    mx = s_mat.max(axis=1).reshape(n_blk, SUB)
    w0 = mn // W
    n_win = mx // W - w0 + 1
    win_info = jnp.stack([w0, n_win], axis=-1).astype(jnp.int32)
    updT = jnp.concatenate(
        [upd.astype(jnp.float32).T,
         jnp.zeros((16 - C, upd.shape[0]), jnp.float32)],
        axis=0,
    )  # (16, N_pad)

    out = pl.pallas_call(
        _small_kernel,
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec((1, SUB, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((SUB, CH), lambda i: (i, 0)),
            pl.BlockSpec((16, blk), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((16, R_pad), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((16, R_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((16, R_pad), jnp.float32)],
    )(win_info, s_mat, updT)
    return out[:C, :n_rows].T
