"""Stage-1 rasterization: per-pixel top-K face selection.

Replaces PyTorch3D's `rasterize_meshes` CUDA kernel (reference:
src/model/renderer.py:53). TPU-first design:

- the selection (which K faces cover each pixel, sorted near-to-far) is a
  PIECEWISE-CONSTANT function of the geometry, so it runs under
  ``stop_gradient``; every differentiable quantity (barycentrics, depth,
  signed edge distance) is *recomputed* from the selected indices in the
  XLA-autodiff stage (interpolate.py). This mirrors the
  rasterize/interpolate split of modern differentiable rasterizers and
  means no custom VJP is needed for exact PyTorch3D-equivalent gradients.
- shapes are static: K fixed, misses encoded as index -1,
- the XLA path brute-forces pixel-chunk x all-faces scoring and top_k's
  over the face axis; the Pallas kernel (rasterize_pallas.py) is a drop-in
  with face-chunk streaming + iterated-min selection.

Geometry semantics match PyTorch3D: coverage = inside-triangle OR squared
NDC edge distance < blur_radius; fragments ordered by (perspective-correct)
interpolated z; faces entirely behind z_clip are culled (partially-behind
faces are approximated by clamping the projection denominator instead of
polygon clipping).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .cameras import Camera, ndc_pixel_centers, view_to_ndc, world_to_view

BIG = 3.0e38


class RasterConfig(NamedTuple):
    """Static rasterizer settings (shape-affecting / branch-affecting).

    blur_radius is intentionally NOT here: it is a traced scalar so the
    coarse->fine sigma flip (reference: src/model/dbw.py:131-134) does not
    trigger recompilation."""

    image_size: Tuple[int, int]
    faces_per_pixel: int = 10
    z_clip: float = 1e-3
    perspective_correct: bool = True
    clip_barycentric: bool = True
    row_chunk: int = 10
    backend: str = "xla"  # "xla" | "pallas"


class FaceGeom(NamedTuple):
    """Per-face projected geometry for one view."""

    xy: jnp.ndarray     # (F, 3, 2) NDC xy of the 3 verts
    z: jnp.ndarray      # (F, 3) view-space z
    valid: jnp.ndarray  # (F,) bool


def project_faces(verts, faces, R, T, cam: Camera, z_clip=1e-3) -> FaceGeom:
    """World-space mesh -> per-face NDC geometry for one view (R, T)."""
    v_view = world_to_view(verts, R, T)
    # clamp z from below for the projection only: verts behind the camera
    # project to large coordinates on the correct side (cheap approximation
    # of pytorch3d's z-clipping that splits triangles, z_clip_value semantics
    # reference: src/model/renderer.py:46).
    z_raw = v_view[..., 2]
    v_proj = jnp.concatenate(
        [v_view[..., :2], jnp.maximum(z_raw, z_clip)[..., None]], axis=-1
    )
    ndc = view_to_ndc(v_proj, cam)
    fv_xy = ndc[..., :2][faces]        # (F, 3, 2)
    fv_z = jnp.maximum(z_raw, z_clip)[faces]  # (F, 3)
    # cull faces fully behind the near plane or degenerate in NDC
    behind = (z_raw[faces] < z_clip).all(axis=-1)
    area = _cross2(
        fv_xy[:, 1] - fv_xy[:, 0], fv_xy[:, 2] - fv_xy[:, 0]
    )
    valid = (~behind) & (jnp.abs(area) > 1e-12)
    return FaceGeom(fv_xy, fv_z, valid)


def _cross2(a, b):
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def barycentrics_2d(px, py, xy):
    """Unnormalized-safe 2D barycentrics of pixel p w.r.t. triangle xy.

    px, py: (...,); xy: (..., 3, 2). Returns (..., 3)."""
    p = jnp.stack([px, py], axis=-1)
    v0, v1, v2 = xy[..., 0, :], xy[..., 1, :], xy[..., 2, :]
    area = _cross2(v1 - v0, v2 - v0)
    inv = jnp.where(jnp.abs(area) > 1e-12, 1.0 / jnp.where(area == 0, 1.0, area), 0.0)
    w0 = _cross2(v2 - v1, p - v1) * inv
    w1 = _cross2(v0 - v2, p - v2) * inv
    w2 = _cross2(v1 - v0, p - v0) * inv
    return jnp.stack([w0, w1, w2], axis=-1)


def _point_seg_dist2(p, a, b):
    """Squared distance point->segment in 2D. p/a/b: (..., 2)."""
    ab = b - a
    ap = p - a
    t = jnp.sum(ap * ab, -1) / jnp.sum(ab * ab, -1).clip(1e-12)
    t = jnp.clip(t, 0.0, 1.0)
    proj = a + t[..., None] * ab
    d = p - proj
    return jnp.sum(d * d, -1)


def signed_edge_dist2(px, py, xy, bary=None):
    """PyTorch3D-style ``dists``: squared NDC distance to the nearest triangle
    edge, NEGATIVE inside the face (reference use sites:
    src/model/renderer.py:141, 253-257)."""
    if bary is None:
        bary = barycentrics_2d(px, py, xy)
    inside = jnp.min(bary, axis=-1) >= 0.0
    p = jnp.stack([px, py], axis=-1)
    v0, v1, v2 = xy[..., 0, :], xy[..., 1, :], xy[..., 2, :]
    d = jnp.minimum(
        jnp.minimum(_point_seg_dist2(p, v0, v1), _point_seg_dist2(p, v1, v2)),
        _point_seg_dist2(p, v2, v0),
    )
    return jnp.where(inside, -d, d), inside, bary


def interp_z(bary, fz, perspective_correct=True, clip=True):
    """Fragment depth from 2D barycentrics (+ optional perspective
    correction and [0,1] clipping, matching pytorch3d's
    clip_barycentric_coords). Returns (corrected+clipped bary, z)."""
    if perspective_correct:
        w = bary / fz.clip(1e-8)
        bary = w / jnp.sum(w, axis=-1, keepdims=True).clip(1e-12)
    if clip:
        bary = jnp.clip(bary, 0.0, 1.0)
        bary = bary / jnp.sum(bary, axis=-1, keepdims=True).clip(1e-6)
    z = jnp.sum(bary * fz, axis=-1)
    return bary, z


# ---------------------------------------------------------------------------
# XLA selection backend
# ---------------------------------------------------------------------------


def _score_chunk(px, py, geom: FaceGeom, blur_radius, cfg: RasterConfig):
    """Coverage + depth key for a chunk of pixels against all faces.

    px, py: (P,) pixel NDC centers. Returns key (P, F): z where covered,
    +BIG where not."""
    xy = geom.xy[None]          # (1, F, 3, 2)
    fz = geom.z[None]           # (1, F, 3)
    d2, inside, bary = signed_edge_dist2(
        px[:, None], py[:, None], xy
    )  # (P, F)
    covered = inside | (d2 < blur_radius)
    _, z = interp_z(bary, fz, cfg.perspective_correct, cfg.clip_barycentric)
    ok = covered & geom.valid[None] & (z > cfg.z_clip)
    return jnp.where(ok, z, BIG)


def _rasterize_xla(geom: FaceGeom, blur_radius, cfg: RasterConfig,
                   row_range=None):
    H, W = cfg.image_size
    if row_range is not None:
        H = row_range[1]  # band height; NDC scale stays full-image
    K = cfg.faces_per_pixel
    gx, gy = ndc_pixel_centers(cfg.image_size, row_range=row_range)
    px, py = gx.reshape(-1), gy.reshape(-1)

    rows = cfg.row_chunk * W
    n_chunks = -(-H * W // rows)
    pad = n_chunks * rows - H * W
    px = jnp.pad(px, (0, pad))
    py = jnp.pad(py, (0, pad))
    px = px.reshape(n_chunks, rows)
    py = py.reshape(n_chunks, rows)

    def body(args):
        cpx, cpy = args
        key = _score_chunk(cpx, cpy, geom, blur_radius, cfg)  # (P, F)
        if key.shape[-1] < K:  # fewer faces than layers: pad with misses
            key = jnp.pad(key, ((0, 0), (0, K - key.shape[-1])), constant_values=BIG)
        neg, idx = lax.top_k(-key, K)
        return jnp.where(neg > -BIG, idx, -1).astype(jnp.int32)

    p2f = lax.map(body, (px, py))  # (n_chunks, rows, K)
    return p2f.reshape(-1, K)[: H * W].reshape(H, W, K)


def rasterize(geom: FaceGeom, blur_radius, cfg: RasterConfig, row_range=None):
    """Top-K face selection for one view: (H, W, K) int32 ``pix_to_face``
    (-1 = no face), sorted near-to-far. Non-differentiable by construction.

    ``row_range=(row0, Hb)``: rasterize only the Hb-row band starting at
    row0 (traced ok) of the full image — (Hb, W, K), bit-identical to the
    corresponding rows of the full raster (pixel-band sharding)."""
    geom = jax.tree_util.tree_map(lax.stop_gradient, geom)
    blur_radius = lax.stop_gradient(blur_radius)
    if cfg.backend == "pallas":
        from .rasterize_pallas import rasterize_pallas

        return rasterize_pallas(geom, blur_radius, cfg, row_range=row_range)
    return _rasterize_xla(geom, blur_radius, cfg, row_range=row_range)
