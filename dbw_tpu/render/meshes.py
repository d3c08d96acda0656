"""Static-topology scene mesh pytree.

Replaces PyTorch3D's ``Meshes`` + ``TexturesUV`` object soup (reference:
src/model/dbw.py:7-11): here a scene is a fixed set of flat arrays whose
shapes never change during optimization, so the whole render step traces
once. "Filtering" transparent blocks (reference src/model/dbw.py:316-326)
is expressed by masking — dead faces are parked behind the camera — never
by shape changes.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp


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
    ids, w = _bilinear_corners(map_idx, uv, TH, TW)
    maps_flat = maps.reshape(M * TH * TW, maps.shape[-1])
    if diff_uv:
        out = 0.0
        for k in range(4):
            out = out + maps_flat[ids[k]] * w[k][..., None]
        return out
    w_sg = tuple(jax.lax.stop_gradient(wk) for wk in w)
    return _sample_flat(maps_flat, ids, w_sg)
