"""Fused fragment kernel: face-table gather + fragment math in one pass.

The training-pass shading pipeline (renderer._shade_fused_batched) spends
most of its non-kernel time in XLA's handling of the gathered (N, 20)
face-attribute rows: a row-major->column-major layout copy plus ~20
separate column-slice fusions, then the elementwise bary/edge-distance/
uv/alpha math, then a separate Pallas scatter kernel for the backward
(measured ~40 ms/step of the DTU workload; BENCH_NOTES.md round-3 trace).

This module fuses all of it into two Pallas kernels:

- **forward**: per 1024-fragment sub-chunk, gather the 20 face-attribute
  columns from the VMEM-resident (24, B*F) table with a windowed one-hot
  MXU contraction (exact in f32 via precision=HIGHEST; fragment face ids
  are view/block-local so a sub-chunk touches 1-3 aligned 256-row
  windows), then compute barycentrics, signed squared edge distance,
  perspective-corrected clipped uv, the bilinear base texel id + offsets
  (id00, wx, wy) and the coverage alpha — all as (1, CH) lane-vector math
  identical to the XLA path. An 8-row residual (vertex xy + face alpha)
  is saved for the backward.
- **backward**: recompute d_cols = vjp(alpha-math)(d_alpha) from the
  residual, then accumulate d_table += d_cols @ one_hot^T into a VMEM
  scratch accumulator across the sequential grid (transposed gather).

Gradient structure matches the training configuration it is gated on
(detach_bary=True, raw shading): only the vertex xy columns (soft
silhouette through `dists`) and the per-face alpha column carry
gradients; uv/texel outputs are non-differentiable inputs to the quad
texture sampler (render/meshes.py), whose own custom backward handles
d_maps. Reference semantics: src/model/renderer.py:241-273 (blend alpha),
pytorch3d rasterizer backward with detached barycentrics.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CH = 1024     # fragments per sub-chunk (one MXU contraction)
SUB = 8       # sub-chunks per program
WIN = 256     # face-table window width (lane-aligned dynamic slices)
DR = 24       # padded attribute rows (20 used)

# column layout of the dyn table (renderer._shade_fused_batched)
#  0-5  x0 y0 x1 y1 x2 y2     (NDC vertex xy)    [grad]
#  6-8  z0 z1 z2              (view z)           [no grad: detach_bary]
#  9    face_alpha                               [grad]
#  10-11 pad
#  12-17 u0 v0 u1 v1 u2 v2    (uv corners)       [static]
#  18   map index             (static)
#  19   pad

_MODE = os.environ.get("DBW_FRAG_FUSED", "auto").lower()


def frag_fused_enabled():
    if _MODE in ("0", "off", "false"):
        return False
    if _MODE in ("1", "on", "true"):
        return True
    return jax.default_backend() != "cpu"


def _gather_cols(dynT_ref, s_blk, w0, n_win):
    """Windowed one-hot gather: rows of dynT at ids s_blk (1, CH).

    Returns (DR, CH) f32. Exact: each output element is 1.0 * value
    summed over exactly one nonzero one-hot entry (precision=HIGHEST)."""
    def body(w, acc):
        base = (w0 + w) * WIN
        iota = jax.lax.broadcasted_iota(jnp.int32, (WIN, CH), 0) + base
        oh = (iota == s_blk).astype(jnp.float32)         # (WIN, CH)
        contrib = jax.lax.dot_general(
            dynT_ref[:, pl.ds(base, WIN)], oh,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                # (DR, CH)
        return acc + contrib

    init = jnp.zeros((DR, CH), jnp.float32)
    return jax.lax.fori_loop(0, n_win, body, init)


def _seg_d2(ax, ay, bx, by, px, py):
    """Squared distance from (px, py) to segment (a, b) — identical to
    renderer._shade_fused_batched/rasterize.signed_edge_dist2."""
    abx, aby = bx - ax, by - ay
    apx, apy = px - ax, py - ay
    denom = jnp.maximum(abx * abx + aby * aby, 1e-12)
    t = jnp.clip((apx * abx + apy * aby) / denom, 0.0, 1.0)
    dx = apx - t * abx
    dy = apy - t * aby
    return dx * dx + dy * dy


def _bary2d(x0, y0, x1, y1, x2, y2, px, py):
    """2D barycentric weights — THE one copy of the formula (identical to
    rasterize.py / renderer.py's XLA path numerics)."""
    area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
    inv_area = jnp.where(
        jnp.abs(area) > 1e-12, 1.0 / jnp.where(area == 0.0, 1.0, area), 0.0
    )
    w0 = ((x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)) * inv_area
    w1 = ((x0 - x2) * (py - y2) - (y0 - y2) * (px - x2)) * inv_area
    w2 = ((x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)) * inv_area
    return w0, w1, w2


def _alpha_math(res, px, py, vld, sigma, *, clip_inside):
    """Coverage alpha from the 8-row residual [x0 y0 x1 y1 x2 y2 fa pad].

    All inputs (1, CH)-shaped lane vectors (res is (8, CH)). This is the
    differentiable part of the fragment math (d -> vertex xy, face alpha);
    the backward kernel takes jax.vjp of this function."""
    x0, y0 = res[0:1], res[1:2]
    x1, y1 = res[2:3], res[3:4]
    x2, y2 = res[4:5], res[5:6]
    fa = res[6:7]

    w0, w1, w2 = _bary2d(x0, y0, x1, y1, x2, y2, px, py)
    inside = jnp.minimum(jnp.minimum(w0, w1), w2) >= 0.0

    d2 = jnp.minimum(
        jnp.minimum(
            _seg_d2(x0, y0, x1, y1, px, py), _seg_d2(x1, y1, x2, y2, px, py)
        ),
        _seg_d2(x2, y2, x0, y0, px, py),
    )
    dists = jnp.where(inside, -d2, d2)

    sig = jnp.maximum(sigma, 1e-20)
    if clip_inside:
        soft = jnp.exp(-jnp.clip(dists, 0.0, None) / sig)
    else:
        soft = jax.nn.sigmoid(-dists / sig)
    hard = (dists <= 0.0).astype(jnp.float32)
    alpha = jnp.where(sigma == 0.0, hard, soft) * vld * fa
    return alpha


def _uv_math(cols, px, py, *, persp, clip_bary, TH, TW):
    """Texel id00/wx/wy from the full gathered columns (non-differentiable
    by construction on this path: detach_bary stops bary gradients)."""
    x0, y0 = cols[0:1], cols[1:2]
    x1, y1 = cols[2:3], cols[3:4]
    x2, y2 = cols[4:5], cols[5:6]
    z0, z1, z2 = cols[6:7], cols[7:8], cols[8:9]
    u0, v0 = cols[12:13], cols[13:14]
    u1, v1 = cols[14:15], cols[15:16]
    u2, v2 = cols[16:17], cols[17:18]
    mi = cols[18:19]

    w0, w1, w2 = _bary2d(x0, y0, x1, y1, x2, y2, px, py)
    if persp:
        iw0 = w0 / jnp.maximum(z0, 1e-8)
        iw1 = w1 / jnp.maximum(z1, 1e-8)
        iw2 = w2 / jnp.maximum(z2, 1e-8)
        denom = jnp.maximum(iw0 + iw1 + iw2, 1e-12)
        b0, b1, b2 = iw0 / denom, iw1 / denom, iw2 / denom
    else:
        b0, b1, b2 = w0, w1, w2
    if clip_bary:
        b0 = jnp.clip(b0, 0.0, 1.0)
        b1 = jnp.clip(b1, 0.0, 1.0)
        b2 = jnp.clip(b2, 0.0, 1.0)
        bs = jnp.maximum(b0 + b1 + b2, 1e-6)
        b0, b1, b2 = b0 / bs, b1 / bs, b2 / bs

    uv_u = b0 * u0 + b1 * u1 + b2 * u2
    uv_v = b0 * v0 + b1 * v1 + b2 * v2
    # sample_atlas_bilinear's texel coordinates (meshes.py:366-374)
    u = jnp.clip(uv_u, 0.0, 1.0) * (TW - 1)
    v = (1.0 - jnp.clip(uv_v, 0.0, 1.0)) * (TH - 1)
    x0f = jnp.floor(u)
    y0f = jnp.floor(v)
    id00 = (
        mi.astype(jnp.int32) * (TH * TW)
        + y0f.astype(jnp.int32) * TW
        + x0f.astype(jnp.int32)
    )
    return id00, u - x0f, v - y0f


def _fwd_kernel(sigma_ref, win_ref, ids_ref, vld_ref, px_ref, py_ref,
                dynT_ref, id00_ref, wx_ref, wy_ref, alpha_ref, res_ref,
                *, persp, clip_bary, clip_inside, TH, TW):
    sigma = sigma_ref[0, 0]
    for sub in range(SUB):
        sl = slice(sub, sub + 1)
        s_blk = ids_ref[sl, :]
        w0 = win_ref[0, sub, 0]
        n_win = win_ref[0, sub, 1]
        cols = _gather_cols(dynT_ref, s_blk, w0, n_win)      # (DR, CH)

        px = px_ref[sl, :]
        py = py_ref[sl, :]
        vld = vld_ref[sl, :]
        res = jnp.concatenate(
            [cols[0:6], cols[9:10], jnp.zeros((1, CH), jnp.float32)], axis=0
        )  # (8, CH): x0 y0 x1 y1 x2 y2 fa pad
        alpha = _alpha_math(res, px, py, vld, sigma, clip_inside=clip_inside)
        id00, wx, wy = _uv_math(cols, px, py, persp=persp,
                                clip_bary=clip_bary, TH=TH, TW=TW)

        id00_ref[sl, :] = id00
        wx_ref[sl, :] = wx
        wy_ref[sl, :] = wy
        alpha_ref[sl, :] = alpha
        res_ref[:, pl.ds(sub * CH, CH)] = res


def _bwd_kernel(sigma_ref, win_ref, ids_ref, vld_ref, px_ref, py_ref,
                res_ref, da_ref, out_ref, acc, *, clip_inside):
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    sigma = sigma_ref[0, 0]
    for sub in range(SUB):
        sl = slice(sub, sub + 1)
        s_blk = ids_ref[sl, :]
        px = px_ref[sl, :]
        py = py_ref[sl, :]
        vld = vld_ref[sl, :]
        res = res_ref[:, pl.ds(sub * CH, CH)]               # (8, CH)
        da = da_ref[sl, :]

        _, vjp = jax.vjp(
            lambda r: _alpha_math(r, px, py, vld, sigma,
                                  clip_inside=clip_inside),
            res,
        )
        (d_res,) = vjp(da)                                   # (8, CH)
        # rows [x0 y0 x1 y1 x2 y2 fa pad] scattered as-is; the caller maps
        # accumulator rows back to table rows [0..5, 9] (halves the MXU
        # contraction vs scattering a 16-row layout with zero rows)

        w0 = win_ref[0, sub, 0]
        n_win = win_ref[0, sub, 1]

        def body(w, _):
            base = (w0 + w) * WIN
            iota = jax.lax.broadcasted_iota(jnp.int32, (WIN, CH), 0) + base
            oh = (iota == s_blk).astype(jnp.float32)         # (WIN, CH)
            contrib = jax.lax.dot_general(
                d_res, oh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                                # (8, WIN)
            acc[:, pl.ds(base, WIN)] = acc[:, pl.ds(base, WIN)] + contrib
            return 0

        jax.lax.fori_loop(0, n_win, body, 0)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc[:]


def _pad_streams(ids, vld, px, py):
    N = ids.shape[0]
    blk = SUB * CH
    n_blk = max(-(-N // blk), 1)
    pad = n_blk * blk - N
    if pad:
        # pad with the LAST real id (vld stays 0): the tail sub-chunks'
        # [min, max] window spans stay tight instead of stretching to row 0
        ids = jnp.concatenate(
            [ids, jnp.broadcast_to(ids[-1:], (pad,))]
            if ids.size else [ids, jnp.zeros((pad,), ids.dtype)]
        )
        z = jnp.zeros((pad,), jnp.float32)
        vld = jnp.concatenate([vld, z])
        px = jnp.concatenate([px, z])
        py = jnp.concatenate([py, z])
    shape = (n_blk * SUB, CH)
    return (ids.reshape(shape), vld.reshape(shape), px.reshape(shape),
            py.reshape(shape), n_blk, pad)


def _win_info(ids_mat, n_blk):
    mn = ids_mat.min(axis=1).reshape(n_blk, SUB)
    mx = ids_mat.max(axis=1).reshape(n_blk, SUB)
    w0 = mn // WIN
    n_win = mx // WIN - w0 + 1
    return jnp.stack([w0, n_win], axis=-1).astype(jnp.int32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_fragment_shade(dynT, ids, vld, px, py, sigma, flags):
    """dynT: (DR, F_pad) transposed face table (F_pad multiple of WIN);
    ids: (N,) i32 table row per fragment (invalid fragments clamped to a
    real row with vld=0); vld/px/py: (N,) f32; sigma: traced scalar.
    flags: hashable (persp, clip_bary, clip_inside, TH, TW).

    Returns (id00 i32, wx, wy, alpha), each (N,). Differentiable in dynT
    (vertex-xy + face-alpha rows) and sigma-free in structure; id00/wx/wy
    are non-differentiable (detach_bary training semantics)."""
    out, _ = _fwd(dynT, ids, vld, px, py, sigma, flags)
    return out


def _fwd(dynT, ids, vld, px, py, sigma, flags):
    persp, clip_bary, clip_inside, TH, TW = flags
    N = ids.shape[0]
    F_pad = dynT.shape[1]
    assert dynT.shape[0] == DR and F_pad % WIN == 0, dynT.shape
    ids_m, vld_m, px_m, py_m, n_blk, _ = _pad_streams(ids, vld, px, py)
    win = _win_info(ids_m, n_blk)
    sig = jnp.asarray(sigma, jnp.float32).reshape(1, 1)

    blk = SUB * CH
    stream = pl.BlockSpec((SUB, CH), lambda i: (i, 0))
    kernel = functools.partial(
        _fwd_kernel, persp=persp, clip_bary=clip_bary,
        clip_inside=clip_inside, TH=TH, TW=TW,
    )
    id00, wx, wy, alpha, res = pl.pallas_call(
        kernel,
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, SUB, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            stream, stream, stream, stream,
            pl.BlockSpec((DR, F_pad), lambda i: (0, 0)),
        ],
        out_specs=[
            stream, stream, stream, stream,
            pl.BlockSpec((8, blk), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blk * SUB, CH), jnp.int32),
            jax.ShapeDtypeStruct((n_blk * SUB, CH), jnp.float32),
            jax.ShapeDtypeStruct((n_blk * SUB, CH), jnp.float32),
            jax.ShapeDtypeStruct((n_blk * SUB, CH), jnp.float32),
            jax.ShapeDtypeStruct((8, n_blk * blk), jnp.float32),
        ],
    )(sig, win, ids_m, vld_m, px_m, py_m, dynT)
    out = (id00.reshape(-1)[:N], wx.reshape(-1)[:N], wy.reshape(-1)[:N],
           alpha.reshape(-1)[:N])
    # named for the compact-shade stream-saving remat policy
    # (compact_shade._remat_policy): saving this 8-row residual lets the
    # backward of a rematerialized compact branch skip re-running the fwd
    # kernel. Inert under every other checkpoint policy.
    from jax.ad_checkpoint import checkpoint_name

    res = checkpoint_name(res, "compact_stream")
    return out, (ids_m, vld_m, px_m, py_m, res, sig, n_blk, F_pad, win)


def _fwd_vjp(dynT, ids, vld, px, py, sigma, flags):
    out, resids = _fwd(dynT, ids, vld, px, py, sigma, flags)
    return out, resids


def _bwd_vjp(flags, resids, cts):
    _, _, clip_inside, _, _ = flags
    ids_m, vld_m, px_m, py_m, res, sig, n_blk, F_pad, win = resids
    d_alpha = cts[3]
    N = d_alpha.shape[0]
    blk = SUB * CH
    pad = n_blk * blk - N
    if pad:
        d_alpha = jnp.concatenate(
            [d_alpha, jnp.zeros((pad,), jnp.float32)]
        )
    da_m = d_alpha.reshape(n_blk * SUB, CH)

    stream = pl.BlockSpec((SUB, CH), lambda i: (i, 0))
    kernel = functools.partial(_bwd_kernel, clip_inside=clip_inside)
    d8 = pl.pallas_call(
        kernel,
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, SUB, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            stream, stream, stream, stream,
            pl.BlockSpec((8, blk), lambda i: (0, i)),
            stream,
        ],
        out_specs=pl.BlockSpec((8, F_pad), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, F_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, F_pad), jnp.float32)],
    )(sig, win, ids_m, vld_m, px_m, py_m, res, da_m)
    zrow = jnp.zeros((1, F_pad), jnp.float32)
    d_dynT = jnp.concatenate(
        [d8[0:6], zrow, zrow, zrow, d8[6:7]]
        + [zrow] * (DR - 10),
        axis=0,
    )  # rows [x0..y2] -> 0..5, fa -> 9, rest zero
    # sigma gradient: alpha depends on sigma, but the training schedule
    # treats sigma as a hyperparameter (reference renderer config), so no
    # cotangent is propagated (matches the XLA path where sigma enters as
    # a traced constant w.r.t. params).
    return d_dynT, None, None, None, None, None


fused_fragment_shade.defvjp(_fwd_vjp, _bwd_vjp)


def frag_math_reference(dynT, ids, vld, px, py, sigma, flags):
    """Pure-jnp replica of the fused kernel (gather + math), for tests."""
    persp, clip_bary, clip_inside, TH, TW = flags
    cols = dynT[:, ids]                       # (DR, N)
    res = jnp.concatenate(
        [cols[0:6], cols[9:10], jnp.zeros((1, ids.shape[0]), jnp.float32)],
        axis=0,
    )
    alpha = _alpha_math(res, px[None], py[None], vld[None],
                        jnp.asarray(sigma, jnp.float32),
                        clip_inside=clip_inside)
    id00, wx, wy = _uv_math(cols, px[None], py[None], persp=persp,
                            clip_bary=clip_bary, TH=TH, TW=TW)
    return id00[0], wx[0], wy[0], alpha[0]
