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
