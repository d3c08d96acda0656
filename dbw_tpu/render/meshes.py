"""Static-topology scene mesh pytree.

Replaces PyTorch3D's ``Meshes`` + ``TexturesUV`` object soup (reference:
src/model/dbw.py:7-11): here a scene is a fixed set of flat arrays whose
shapes never change during optimization, so the whole render step traces
once. "Filtering" transparent blocks (reference src/model/dbw.py:316-326)
is expressed by masking — dead faces are parked behind the camera — never
by shape changes.
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

# Texel-gradient backend for the detached-uv (training) path:
#   quad    (default) one base-id sort + 12-channel segment sum + dense
#           4-shift stencil; forward is ONE (N, 12) quad-table gather
#   sort    legacy: 4 corner ids concatenated into one 4N-row sort pipeline
#   scatter plain XLA scatter-add (correctness reference)
# Default 'auto': the Pallas kernel (quadk) on TPU, the XLA pipeline (quad)
# on CPU (the kernel's DMA/RMW semantics need real hardware).
_TEXEL_MODE = os.environ.get("DBW_TEXEL", "auto").lower()


def _texel_mode():
    if _TEXEL_MODE != "auto":
        return _TEXEL_MODE
    return "quad" if jax.default_backend() == "cpu" else "quadk"

# Quad-table dtype knob (DBW_TEXEL_QUAD_DTYPE=bf16 halves the forward
# gather's bytes). Measured on v5e: NO speedup — the (N, 12) row gather is
# bound by per-row gather overhead, not bandwidth — so f32 stays the
# default for full gradient precision.
_QUAD_DTYPE_ENV = os.environ.get("DBW_TEXEL_QUAD_DTYPE", "f32").lower()


def _quad_dtype():
    if _QUAD_DTYPE_ENV in ("bf16", "bfloat16"):
        return jnp.bfloat16
    return jnp.float32


class TextureAtlas(NamedTuple):
    """Stack of equally-sized RGB uv maps; per-face map index selects the map.

    Maps of different native sizes are resized conceptually by uv rescale:
    each map occupies the full [0,1]^2 of its own slot. Bilinear sampling with
    align_corners=True semantics (reference TexturesUV(align_corners=True),
    src/model/dbw.py:280)."""

    maps: jnp.ndarray  # (M, TH, TW, 3) float32, values in [0, 1]


class MeshScene(NamedTuple):
    """One scene's geometry + textures, world space, static shapes."""

    verts: jnp.ndarray       # (V, 3) f32
    faces: jnp.ndarray       # (F, 3) i32
    uv_verts: jnp.ndarray    # (VT, 2) f32
    uv_faces: jnp.ndarray    # (F, 3) i32 into uv_verts
    map_idx: jnp.ndarray     # (F,) i32 into atlas maps
    atlas: TextureAtlas
    faces_alpha: jnp.ndarray  # (F,) f32 per-face opacity


def concat_scenes(scenes: Sequence[MeshScene]) -> MeshScene:
    """Join sub-meshes into one scene (equivalent of join_meshes_as_scene,
    reference: src/model/dbw.py:10). All atlases must share map size."""
    v_off, vt_off, m_off = 0, 0, 0
    verts, faces, uvv, uvf, midx, maps, fal = [], [], [], [], [], [], []
    for s in scenes:
        verts.append(s.verts)
        faces.append(s.faces + v_off)
        uvv.append(s.uv_verts)
        uvf.append(s.uv_faces + vt_off)
        midx.append(s.map_idx + m_off)
        maps.append(s.atlas.maps)
        fal.append(s.faces_alpha)
        v_off += s.verts.shape[0]
        vt_off += s.uv_verts.shape[0]
        m_off += s.atlas.maps.shape[0]
    return MeshScene(
        jnp.concatenate(verts, 0),
        jnp.concatenate(faces, 0),
        jnp.concatenate(uvv, 0),
        jnp.concatenate(uvf, 0),
        jnp.concatenate(midx, 0),
        TextureAtlas(jnp.concatenate(maps, 0)),
        jnp.concatenate(fal, 0),
    )


def face_normals(verts, faces):
    """Per-face unit normals (used by flat shading)."""
    v0 = verts[faces[:, 0]]
    v1 = verts[faces[:, 1]]
    v2 = verts[faces[:, 2]]
    n = jnp.cross(v1 - v0, v2 - v0)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True).clip(1e-12)


def _bilinear_corners(map_idx, uv, TH, TW):
    """Flattened texel ids + weights of the 4 bilinear corners.

    Returns (ids: tuple of 4 (...,) int32 into (M*TH*TW), weights: tuple of
    4 (...,) f32) — kept as separate arrays, NOT stacked, to avoid
    tiny-trailing-dim tile padding on TPU."""
    u = jnp.clip(uv[..., 0], 0.0, 1.0) * (TW - 1)
    v = (1.0 - jnp.clip(uv[..., 1], 0.0, 1.0)) * (TH - 1)
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    wx = u - x0
    wy = v - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, TW - 1)
    y1 = jnp.minimum(y0 + 1, TH - 1)
    base = map_idx * (TH * TW)
    ids = (
        base + y0 * TW + x0, base + y0 * TW + x1,
        base + y1 * TW + x0, base + y1 * TW + x1,
    )
    w = ((1 - wx) * (1 - wy), wx * (1 - wy), (1 - wx) * wy, wx * wy)
    return ids, w


@jax.custom_vjp
def _sample_flat(maps_flat, ids, w):
    """maps_flat: (M*TH*TW, C); ids/w: tuples of 4 per-corner (...,) arrays.

    TPU layout note: corners are processed one at a time — materializing a
    (..., 4, C) tensor gives XLA a rank-6 array with two tiny trailing dims
    whose (8, 128) tile padding explodes HBM (measured 51x expansion -> OOM
    on the DTU workload). Per-corner (..., C) tensors stay in sane layouts.
    """
    out = 0.0
    for k in range(4):
        out = out + maps_flat[ids[k]] * w[k][..., None]
    return out


def _sample_flat_fwd(maps_flat, ids, w):
    return _sample_flat(maps_flat, ids, w), (ids, w, maps_flat.shape[0])


def _sample_flat_bwd(res, g):
    from ..ops.scatter import FAST_TEXEL, sorted_segment_sum

    ids, w, n = res
    C = g.shape[-1]
    # one concatenated segment-sum over all 4 corners (flat 1-D/2-D concats
    # keep layouts sane, and a single sort pipeline compiles/runs faster
    # than four)
    all_ids = jnp.concatenate([i.reshape(-1) for i in ids])
    all_upd = jnp.concatenate(
        [(w[k][..., None] * g).reshape(-1, C) for k in range(4)]
    )
    if FAST_TEXEL:
        d_maps = sorted_segment_sum(all_ids, all_upd, n)
    else:
        d_maps = jnp.zeros((n, C), all_upd.dtype).at[all_ids].add(all_upd)
    # w is treated as non-differentiable here: uv gradients are only needed
    # when detach_bary is False; that path uses diff_uv=True instead.
    return d_maps, None, None


_sample_flat.defvjp(_sample_flat_fwd, _sample_flat_bwd)


def _quad_table(maps_flat, TW):
    """(R, C) flat atlas -> (R, 4C) table of the 2x2 bilinear neighborhoods:
    row t holds texels [t, t+1, t+TW, t+TW+1] (zero-padded past the end).

    Rows whose neighborhood crosses an atlas row / map boundary are only ever
    sampled with EXACTLY zero weight for the crossing corners (x0 == TW-1
    forces wx == 0, y0 == TH-1 forces wy == 0 — see _bilinear_corners), so
    no masking is needed: garbage * 0 == 0."""
    C = maps_flat.shape[-1]

    def shift_up(k):
        return jnp.concatenate(
            [maps_flat[k:], jnp.zeros((k, C), maps_flat.dtype)], axis=0
        )

    return jnp.concatenate(
        [maps_flat, shift_up(1), shift_up(TW), shift_up(TW + 1)], axis=1
    )


def _quad_forward(maps_flat, id00, wx, wy, TW):
    """Bilinear sample via the quad table: ONE row gather per fragment
    (instead of 4 corner gathers).

    maps_flat: (R, C); id00: (...,) i32 base-corner texel id; wx, wy: (...,)
    f32 bilinear offsets in [0, 1]. Returns (..., C)."""
    C = maps_flat.shape[-1]
    table = _quad_table(maps_flat.astype(_quad_dtype()), TW)
    q = table[id00].astype(jnp.float32)  # (..., 4C)
    out = (
        q[..., 0 * C:1 * C] * ((1 - wx) * (1 - wy))[..., None]
        + q[..., 1 * C:2 * C] * (wx * (1 - wy))[..., None]
        + q[..., 2 * C:3 * C] * ((1 - wx) * wy)[..., None]
        + q[..., 3 * C:4 * C] * (wx * wy)[..., None]
    )
    return out


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _sample_quad(maps_flat, id00, wx, wy, TW):
    """_quad_forward with uv treated as non-differentiable (training path);
    d_maps via the sort + segment-sum + stencil backward."""
    return _quad_forward(maps_flat, id00, wx, wy, TW)


def _sample_quad_fwd(maps_flat, id00, wx, wy, TW):
    out = _sample_quad(maps_flat, id00, wx, wy, TW)
    dtype_token = jnp.zeros((0,), maps_flat.dtype)
    return out, (id00, wx, wy, maps_flat.shape[0], dtype_token)


def _sample_quad_bwd(TW, res, g):
    id00, wx, wy, R, dtype_token = res
    d = _quad_maps_grad(TW, id00, wx, wy, g, R, dtype_token.dtype)
    return d, None, None, None


# bilinear weights ride the texel-gradient sort as ONE 15+15-bit
# fixed-point payload (wx, wy in [0, 1]): 2 fewer f32 sort operands at a
# quantization error of 1/32767 ~ 3e-5 texel units (invisible against the
# soft rasterizer's own smoothing; exactness is NOT required here — these
# weights only apportion d_color between the 4 corner texels). The wire
# format is owned by the consuming kernel module.
from ..ops.segment_sum_pallas import pack_wxy as _pack_wxy
from ..ops.segment_sum_pallas import unpack_wxy as _unpack_wxy


def _compact_min():
    """Stream length below which compaction is not attempted."""
    try:
        return int(os.environ.get("DBW_TEXEL_COMPACT_MIN", 1 << 16))
    except ValueError:
        return 1 << 16


def _compact_div():
    """Tightest M_cap divisor for the compacted texel backward (0/1
    disables). The runtime picks the smallest sufficient cap from the
    ladder [N/div, N/3, N] via lax.switch — typical scenes (<10% nonzero
    rows) take the tight cap; denser scenes degrade gracefully instead of
    paying the full-width pipeline the moment the tight cap overflows."""
    import os

    try:
        return int(os.environ.get("DBW_TEXEL_COMPACT_DIV", "8"))
    except ValueError:
        return 8


def _quad_maps_grad(TW, id00, wx, wy, g, R, out_dtype):
    """d_maps via ONE base-id sort + 12-channel segment sum + 4-shift stencil.

    The legacy pipeline sorts 4N concatenated corner rows; here the 4 corner
    ids of a fragment are the fixed stencil {t, t+1, t+TW, t+TW+1} of its
    base id t, so one N-row sort (payloads: packed wx|wy, g) + per-base
    segment sums of the 4 weighted products G_k, then
    d_maps[t] = G0[t] + G1[t-1] + G2[t-TW] + G3[t-TW-1] densely.

    Compaction (quadk mode, large N): the dense (pixel, K) fragment layout
    is mostly empty — typically <10% of slots carry a nonzero gradient
    (invalid faces, zero-alpha, zero cotangent). Instead of sorting 5
    operands over all N rows, sort ONLY (key, row-index) where zero-gradient
    rows get a BIG key (they sort to the end), slice the first
    M = N / DBW_TEXEL_COMPACT_DIV sorted rows, and gather the payload
    columns for just those. If the nonzero count ever exceeds M, a
    lax.cond falls back to the same pipeline over all N rows — bitwise
    identical result, never dropped gradients."""
    C = g.shape[-1]
    N = id00.size
    ids = id00.reshape(N)
    packed = _pack_wxy(
        wx.reshape(N).astype(jnp.float32), wy.reshape(N).astype(jnp.float32)
    )
    gf = g.reshape(N, C)
    div = _compact_div()
    if _texel_mode() == "quadk" and C == 3:
        from ..ops.segment_sum_pallas import quad_corner_segment_sums

        def shift12(A, k):  # A: (C, R) -> rows shifted down the texel axis
            return jnp.concatenate(
                [jnp.zeros((C, k), A.dtype), A[:, :R - k]], axis=1
            )

        def full_width():
            # dense streams (e.g. the env pass, ~100% nonzero): the direct
            # 5-operand sort — no slim sort, no payload gather
            cols = (packed,) + tuple(gf[:, c] for c in range(C))
            sorted_all = jax.lax.sort((ids,) + cols, num_keys=1)
            return quad_corner_segment_sums(
                sorted_all[0], sorted_all[1], sorted_all[2:5], R
            )

        if div > 1 and N >= _compact_min():
            nz = jnp.any(gf != 0.0, axis=-1)
            count = jnp.sum(nz.astype(jnp.int32))

            def compacted(M):
                def f():
                    key = jnp.where(nz, ids, jnp.int32(1 << 30))
                    skey, sidx = jax.lax.sort(
                        (key, jnp.arange(N, dtype=jnp.int32)), num_keys=1
                    )
                    # payloads ride one gather as an (N, 4) f32 matrix
                    # (packed ids bitcast to f32 lanes; bits round-trip
                    # exactly)
                    mat = jnp.concatenate(
                        [
                            jax.lax.bitcast_convert_type(
                                packed, jnp.float32
                            )[:, None],
                            gf,
                        ],
                        axis=1,
                    )
                    rows = mat[sidx[:M]]  # (M, 4)
                    p = jax.lax.bitcast_convert_type(rows[:, 0], jnp.int32)
                    # sentinel-keyed rows have g == 0 (that's WHY they were
                    # dropped): clamp their id into [0, R) for kernel-window
                    # safety; zero g -> zero contribution
                    s = jnp.minimum(skey[:M], R - 1)
                    return quad_corner_segment_sums(
                        s, p, (rows[:, 1], rows[:, 2], rows[:, 3]), R
                    )

                return f

            align = lambda m: min(N, -(-m // 2048) * 2048)
            caps = sorted(
                {align(N // div), align(N // 3)} - {N}
            )  # strictly-smaller caps; full width is the last resort
            branches = [compacted(M) for M in caps] + [full_width]
            which = sum((count > M).astype(jnp.int32) for M in caps)
            G12 = jax.lax.switch(which, branches)
        else:
            G12 = full_width()

        d12 = (
            G12[0 * C:1 * C]
            + shift12(G12[1 * C:2 * C], 1)
            + shift12(G12[2 * C:3 * C], TW)
            + shift12(G12[3 * C:4 * C], TW + 1)
        )
        return d12.T.astype(out_dtype)
    else:
        cols = (packed,) + tuple(gf[:, c] for c in range(C))
        sorted_all = jax.lax.sort((ids,) + cols, num_keys=1)
        s = sorted_all[0]
        swx, swy = _unpack_wxy(sorted_all[1])
        sg = jnp.stack(sorted_all[2:], axis=-1)  # (N, C)
        upd = jnp.concatenate(
            [
                sg * ((1 - swx) * (1 - swy))[:, None],
                sg * (swx * (1 - swy))[:, None],
                sg * ((1 - swx) * swy)[:, None],
                sg * (swx * swy)[:, None],
            ],
            axis=1,
        )  # (N, 4C)
        cs = jnp.cumsum(upd, axis=0)
        counts = jnp.bincount(s, length=R)
        lastpos = jnp.cumsum(counts) - 1
        total_to = jnp.where(
            (lastpos >= 0)[:, None], cs[jnp.clip(lastpos, 0, N - 1)], 0.0
        )
        prev = jnp.concatenate(
            [jnp.zeros((1, 4 * C), cs.dtype), total_to[:-1]], 0
        )
        G = total_to - prev  # (R, 4C) per-base-id corner sums

    def shift_down(A, k):
        return jnp.concatenate([jnp.zeros((k, C), A.dtype), A[:R - k]], axis=0)

    d = (
        G[:, 0 * C:1 * C]
        + shift_down(G[:, 1 * C:2 * C], 1)
        + shift_down(G[:, 2 * C:3 * C], TW)
        + shift_down(G[:, 3 * C:4 * C], TW + 1)
    )
    return d.astype(out_dtype)


_sample_quad.defvjp(_sample_quad_fwd, _sample_quad_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _sample_quad_diff(maps_flat, id00, wx, wy, TW, TH):
    """Quad-table bilinear sample, differentiable in maps AND (wx, wy) —
    the diff_uv path (env pass: ground pose learns through texture
    sampling). d_maps shares the sort+stencil machinery; d_wx/d_wy are
    analytic from a backward regather of the quad rows."""
    return _quad_forward(maps_flat, id00, wx, wy, TW)


def _sample_quad_diff_fwd(maps_flat, id00, wx, wy, TW, TH):
    # gather the quad rows ONCE and keep them as a residual: the backward
    # needs the same (N, 4C) rows for the analytic d_wx/d_wy, and a ~20 MB
    # residual is far cheaper than a second per-row gather
    C = maps_flat.shape[-1]
    q = _quad_table(maps_flat.astype(_quad_dtype()), TW)[id00].astype(
        jnp.float32
    )
    out = (
        q[..., 0 * C:1 * C] * ((1 - wx) * (1 - wy))[..., None]
        + q[..., 1 * C:2 * C] * (wx * (1 - wy))[..., None]
        + q[..., 2 * C:3 * C] * ((1 - wx) * wy)[..., None]
        + q[..., 3 * C:4 * C] * (wx * wy)[..., None]
    )
    dtype_token = jnp.zeros((0,), maps_flat.dtype)
    return out, (q, id00, wx, wy, maps_flat.shape[0], dtype_token)


def _sample_quad_diff_bwd(TW, TH, res, g):
    q, id00, wx, wy, R, dtype_token = res
    C = g.shape[-1]
    d_maps = _quad_maps_grad(
        TW, id00, jax.lax.stop_gradient(wx), jax.lax.stop_gradient(wy),
        g, R, dtype_token.dtype,
    )
    q00, q01 = q[..., 0 * C:1 * C], q[..., 1 * C:2 * C]
    q10, q11 = q[..., 2 * C:3 * C], q[..., 3 * C:4 * C]
    d_wx = (
        g * ((q01 - q00) * (1 - wy)[..., None] + (q11 - q10) * wy[..., None])
    ).sum(-1)
    d_wy = (
        g * ((q10 - q00) * (1 - wx)[..., None] + (q11 - q01) * wx[..., None])
    ).sum(-1)
    # at the exact atlas edge (x0 == TW-1 / y0 == TH-1, reachable only with
    # uv == 0/1 exactly) the +1/+TW quad neighbors are out-of-face texels
    # with weight 0; the correct subgradient there is 0, not the neighbor
    # difference
    x_edge = (id00 % TW) == (TW - 1)
    y_edge = ((id00 // TW) % TH) == (TH - 1)
    d_wx = jnp.where(x_edge, 0.0, d_wx)
    d_wy = jnp.where(y_edge, 0.0, d_wy)
    return d_maps, None, d_wx, d_wy


_sample_quad_diff.defvjp(_sample_quad_diff_fwd, _sample_quad_diff_bwd)


def sample_atlas_bilinear(maps, map_idx, uv, diff_uv=False):
    """Bilinear texture lookup with align_corners=True.

    maps: (M, TH, TW, 3); map_idx: (...,) i32; uv: (..., 2) in [0, 1] with
    v==0 at the BOTTOM of the image (pytorch3d TexturesUV convention:
    texture row 0 is v==1). Returns (..., 3).

    diff_uv=False (default): gradients flow to `maps` only (one fused
    gather/scatter pair). diff_uv=True: fully differentiable in uv as well
    (used when detach_bary is off, e.g. the env pass where ground pose
    learns through texture sampling)."""
    M, TH, TW = maps.shape[0], maps.shape[1], maps.shape[2]
    maps_flat = maps.reshape(M * TH * TW, maps.shape[-1])
    if _texel_mode() in ("quad", "quadk"):
        u = jnp.clip(uv[..., 0], 0.0, 1.0) * (TW - 1)
        v = (1.0 - jnp.clip(uv[..., 1], 0.0, 1.0)) * (TH - 1)
        x0 = jax.lax.stop_gradient(jnp.floor(u))
        y0 = jax.lax.stop_gradient(jnp.floor(v))
        id00 = (
            map_idx * (TH * TW)
            + y0.astype(jnp.int32) * TW
            + x0.astype(jnp.int32)
        )
        if diff_uv:
            # wx/wy keep d/d_uv = scale (floor is piecewise-constant)
            return _sample_quad_diff(maps_flat, id00, u - x0, v - y0, TW, TH)
        wx = jax.lax.stop_gradient(u - x0)
        wy = jax.lax.stop_gradient(v - y0)
        return _sample_quad(maps_flat, id00, wx, wy, TW)
    ids, w = _bilinear_corners(map_idx, uv, TH, TW)
    if diff_uv:
        out = 0.0
        for k in range(4):
            out = out + maps_flat[ids[k]] * w[k][..., None]
        return out
    w_sg = tuple(jax.lax.stop_gradient(wk) for wk in w)
    return _sample_flat(maps_flat, ids, w_sg)
