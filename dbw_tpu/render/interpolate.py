"""Stage-2: differentiable fragment attributes from selected face indices.

Given ``pix_to_face`` from the selection kernel, recompute barycentrics,
depth and signed edge distances as smooth functions of the (projected)
vertex positions — XLA autodiff then provides exactly the gradients the
reference gets from PyTorch3D's rasterizer backward (soft silhouette
gradient through ``dists``, appearance gradient through barycentrics,
subject to the ``detach_bary`` flag, reference: src/model/renderer.py:43,
223-224).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .rasterize import (
    FaceGeom,
    RasterConfig,
    interp_z,
    signed_edge_dist2,
)
from .cameras import ndc_pixel_centers


class Fragments(NamedTuple):
    pix_to_face: jnp.ndarray  # (H, W, K) i32, -1 = miss
    bary: jnp.ndarray         # (H, W, K, 3) perspective-corrected, clipped
    z: jnp.ndarray            # (H, W, K)
    dists: jnp.ndarray        # (H, W, K) signed squared NDC edge distance
    valid: jnp.ndarray        # (H, W, K) bool


def interpolate_fragments(
    pix_to_face, geom: FaceGeom, cfg: RasterConfig, detach_bary=False
) -> Fragments:
    H, W = cfg.image_size
    gx, gy = ndc_pixel_centers(cfg.image_size)
    idx = jnp.maximum(pix_to_face, 0)
    fxy = geom.xy[idx]  # (H, W, K, 3, 2)
    fz = geom.z[idx]    # (H, W, K, 3)
    d2, _, bary2d = signed_edge_dist2(gx[..., None], gy[..., None], fxy)
    bary, z = interp_z(bary2d, fz, cfg.perspective_correct, cfg.clip_barycentric)
    if detach_bary:
        bary = jax.lax.stop_gradient(bary)
    valid = pix_to_face >= 0
    return Fragments(pix_to_face, bary, z, d2, valid)


def interpolate_face_attrs(fragments: Fragments, face_vert_attrs):
    """Barycentric interpolation of per-face-vertex attributes.

    face_vert_attrs: (F, 3, C). Returns (H, W, K, C)."""
    idx = jnp.maximum(fragments.pix_to_face, 0)
    a = face_vert_attrs[idx]  # (H, W, K, 3, C)
    return jnp.sum(fragments.bary[..., None] * a, axis=-2)


# ---------------------------------------------------------------------------
# Flat-layout stage 2 (TPU-scale path)
#
# The (H, W, K, 3, 2)-shaped tensors above tile-pad 10-64x on TPU (two tiny
# trailing dims against the (8, 128) tile) — at viz scale (4x supersampled
# 300x400) that is an instant HBM OOM. The flat variants below carry every
# per-fragment quantity as a 1-D (N,) component array (N = H*W*K), exactly
# like the fused raw-shading path (renderer._shade_fused_batched), and only
# reshape at the final image.
# ---------------------------------------------------------------------------


class FlatFragments(NamedTuple):
    idx: jnp.ndarray     # (N,) i32 clamped face ids
    valid: jnp.ndarray   # (N,) bool
    b0: jnp.ndarray      # (N,) perspective-corrected, clipped barycentrics
    b1: jnp.ndarray
    b2: jnp.ndarray
    dists: jnp.ndarray   # (N,) signed squared NDC edge distance
    z: jnp.ndarray       # (N,)


def interpolate_fragments_flat(
    pix_to_face, geom: FaceGeom, cfg: RasterConfig, detach_bary=False
) -> FlatFragments:
    """Flat-layout equivalent of ``interpolate_fragments``: identical
    numerics, (N,) component arrays instead of (H, W, K, ...) tensors."""
    H, W = cfg.image_size
    K = pix_to_face.shape[-1]
    N = H * W * K
    p2f = pix_to_face.reshape(N)
    idx = jnp.maximum(p2f, 0)

    # pixel NDC centers per fragment (pure index math)
    n_idx = jnp.arange(N, dtype=jnp.int32)
    pix = n_idx // K
    row = pix // W
    col = pix % W
    s = min(H, W)
    px = (W - 1.0 - 2.0 * col.astype(jnp.float32)) / s
    py = (H - 1.0 - 2.0 * row.astype(jnp.float32)) / s

    # per-face corner components: ONE (F, 9) table -> one (N, 9) row gather
    tab = jnp.concatenate(
        [geom.xy.reshape(-1, 6), geom.z.reshape(-1, 3)], axis=1
    )[idx]
    x0, y0, x1, y1, x2, y2 = (tab[:, c] for c in range(6))
    z0, z1, z2 = tab[:, 6], tab[:, 7], tab[:, 8]

    # 2D barycentrics + signed squared edge distance (component math,
    # identical numerics to rasterize.signed_edge_dist2)
    area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
    inv_area = jnp.where(
        jnp.abs(area) > 1e-12, 1.0 / jnp.where(area == 0.0, 1.0, area), 0.0
    )
    w0 = ((x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)) * inv_area
    w1 = ((x0 - x2) * (py - y2) - (y0 - y2) * (px - x2)) * inv_area
    w2 = ((x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)) * inv_area
    inside = jnp.minimum(jnp.minimum(w0, w1), w2) >= 0.0

    def seg_d2(ax, ay, bx, by):
        abx, aby = bx - ax, by - ay
        apx, apy = px - ax, py - ay
        denom = jnp.maximum(abx * abx + aby * aby, 1e-12)
        t = jnp.clip((apx * abx + apy * aby) / denom, 0.0, 1.0)
        dx = apx - t * abx
        dy = apy - t * aby
        return dx * dx + dy * dy

    d2 = jnp.minimum(
        jnp.minimum(seg_d2(x0, y0, x1, y1), seg_d2(x1, y1, x2, y2)),
        seg_d2(x2, y2, x0, y0),
    )
    dists = jnp.where(inside, -d2, d2)

    if cfg.perspective_correct:
        iw0 = w0 / jnp.maximum(z0, 1e-8)
        iw1 = w1 / jnp.maximum(z1, 1e-8)
        iw2 = w2 / jnp.maximum(z2, 1e-8)
        denom = jnp.maximum(iw0 + iw1 + iw2, 1e-12)
        b0, b1, b2 = iw0 / denom, iw1 / denom, iw2 / denom
    else:
        b0, b1, b2 = w0, w1, w2
    if cfg.clip_barycentric:
        b0 = jnp.clip(b0, 0.0, 1.0)
        b1 = jnp.clip(b1, 0.0, 1.0)
        b2 = jnp.clip(b2, 0.0, 1.0)
        bs = jnp.maximum(b0 + b1 + b2, 1e-6)
        b0, b1, b2 = b0 / bs, b1 / bs, b2 / bs
    if detach_bary:
        b0 = jax.lax.stop_gradient(b0)
        b1 = jax.lax.stop_gradient(b1)
        b2 = jax.lax.stop_gradient(b2)
    z = b0 * z0 + b1 * z1 + b2 * z2
    return FlatFragments(idx, p2f >= 0, b0, b1, b2, dists, z)


def interp_corner_table(ff: FlatFragments, corner_table):
    """Interpolate per-face corner attributes stored as (F, 3*C) rows
    (corner-major: [a0 | a1 | a2], each C wide). Returns (N, C)."""
    C = corner_table.shape[1] // 3
    rows = corner_table[ff.idx]  # (N, 3C)
    return (
        ff.b0[:, None] * rows[:, :C]
        + ff.b1[:, None] * rows[:, C : 2 * C]
        + ff.b2[:, None] * rows[:, 2 * C :]
    )


def fragment_alpha_flat(ff: FlatFragments, sigma, clip_inside=True):
    """Flat-layout coverage alpha (same semantics as blend.fragment_alpha)."""
    if clip_inside:
        soft = jnp.exp(
            -jnp.clip(ff.dists, 0.0, None) / jnp.maximum(sigma, 1e-20)
        )
    else:
        soft = jax.nn.sigmoid(-ff.dists / jnp.maximum(sigma, 1e-20))
    hard = (ff.dists <= 0.0).astype(soft.dtype)
    alpha = jnp.where(sigma == 0.0, hard, soft)
    return alpha * ff.valid
