"""Camera model and convention conversions.

ONE internal convention (matching the reference's PyTorch3D NDC convention so
the shipped configs' poses transfer, reference: src/dataset/dtu.py:75-124):

- world -> view: row-vector action ``x_view = x_world @ R + T``; camera looks
  along +Z, +X is LEFT, +Y is UP in view space,
- view -> NDC: ``x_ndc = fx * x/z + px``; the SHORT image side spans [-1, 1],
  the long side spans [-u, u] with u = long/short,
- pixel (i=row, j=col) centers: ``x = (W - 1 - 2j) / S, y = (H - 1 - 2i) / S``
  with ``S = min(H, W)`` (so column 0 is +x / left, row 0 is +y / top).

All dataset loaders convert into this convention on host.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np


class Camera(NamedTuple):
    """Pinhole camera intrinsics in NDC units (shared across views; the
    reference likewise uses the first view's K for all renders,
    src/model/dbw.py:204-208)."""

    fx: jnp.ndarray  # scalar
    fy: jnp.ndarray
    px: jnp.ndarray
    py: jnp.ndarray

    @staticmethod
    def from_fov(fov_deg=60.0):
        """FoV camera equivalent (reference renderer default 'fov',
        src/model/renderer.py:65): f = 1/tan(fov/2), principal at 0."""
        f = 1.0 / np.tan(np.deg2rad(fov_deg) / 2.0)
        return Camera(
            jnp.float32(f), jnp.float32(f), jnp.float32(0.0), jnp.float32(0.0)
        )


def world_to_view(verts, R, T):
    """(..., V, 3) @ (3, 3) + (3,) -> view-space points."""
    return verts @ R + T


def view_to_ndc(v_view, cam: Camera, eps=1e-8):
    """Project view-space points to (x_ndc, y_ndc, z_view); z sign-preserving
    clamped at |z| >= eps (pytorch3d transform eps semantics)."""
    z = v_view[..., 2]
    z_safe = jnp.where(jnp.abs(z) < eps, jnp.where(z < 0, -eps, eps), z)
    x = cam.fx * v_view[..., 0] / z_safe + cam.px
    y = cam.fy * v_view[..., 1] / z_safe + cam.py
    return jnp.stack([x, y, z], axis=-1)


def ndc_pixel_centers(image_size: Tuple[int, int], dtype=jnp.float32,
                      row_range=None):
    """NDC coordinates of all pixel centers: returns (H, W) arrays x, y.

    ``row_range=(row0, Hb)`` restricts to the Hb rows starting at row0
    (row0 may be a traced scalar — used by the spatial/pixel-band sharding
    of the render, parallel/seeds.py): the NDC scale stays that of the
    FULL image, so band pixels get bit-identical coordinates."""
    H, W = image_size
    s = min(H, W)
    j = jnp.arange(W, dtype=dtype)
    if row_range is not None:
        row0, Hb = row_range
        i = jnp.asarray(row0, dtype) + jnp.arange(Hb, dtype=dtype)
    else:
        Hb = H
        i = jnp.arange(H, dtype=dtype)
    x = (W - 1.0 - 2.0 * j) / s  # +x at column 0 (left)
    y = (H - 1.0 - 2.0 * i) / s  # +y at row 0 (top)
    return jnp.meshgrid(x, y, indexing="xy")[0], jnp.broadcast_to(
        y[:, None], (Hb, W)
    )


# ---------------------------------------------------------------------------
# Host-side conversions (numpy; used by dataset loaders)
# ---------------------------------------------------------------------------


def decompose_projection(P):
    """3x4 projection matrix -> OpenCV (K 4x4, R 3x3, T 3) on host.

    Same contract as the reference's cv2-based decomposition
    (src/dataset/dtu.py:118-124); implemented with an RQ decomposition so we
    do not depend on cv2 at import time."""
    P = np.asarray(P, dtype=np.float64)
    M = P[:3, :3]
    # RQ decomposition of M: M = K @ R with K upper-triangular
    # via QR of the flipped transpose.
    rev = np.eye(3)[::-1]
    q, r = np.linalg.qr((rev @ M).T)
    K = rev @ r.T @ rev
    R = rev @ q.T
    # enforce positive diagonal of K
    sgn = np.sign(np.diag(K))
    sgn[sgn == 0] = 1.0
    D = np.diag(sgn)
    K = K @ D
    R = D @ R
    if np.linalg.det(R) < 0:
        K = -K
        R = -R
    # camera center: c = -M^-1 p4 ; opencv T returns the center (homogeneous)
    c = -np.linalg.inv(M) @ P[:3, 3]
    K4 = np.eye(4, dtype=np.float32)
    K4[:3, :3] = (K / K[2, 2]).astype(np.float32)
    # match the reference's output convention: R transposed, T = camera center
    return K4, R.T.astype(np.float32), c.astype(np.float32)


def camera_from_opencv_projection(P, image_size_hw):
    """3x4 P (in pixels, OpenCV convention) -> (K_ndc 4x4, R, T) in the
    internal convention. Mirrors the reference's pipeline
    (src/dataset/dtu.py:75-115): world->cam inversion, axis flips for the
    screen-orientation difference, pixel->NDC rescale of K."""
    K, R, T = decompose_projection(P)
    # dataset convention: x_world = R @ x_cam + T  ->  x_cam = R.T (x_world - T)
    R = R.T
    T = -R @ T

    H, W = image_size_hw
    s = min(H, W) / 2.0
    cx, cy = W / 2.0, H / 2.0
    fx_ndc = K[0, 0] / s
    fy_ndc = K[1, 1] / s
    px_ndc = -(K[0, 2] - cx) / s
    py_ndc = -(K[1, 2] - cy) / s
    K_ndc = np.zeros((4, 4), dtype=np.float32)
    K_ndc[0, 0], K_ndc[1, 1] = fx_ndc, fy_ndc
    K_ndc[0, 2], K_ndc[1, 2] = px_ndc, py_ndc
    K_ndc[2, 3] = 1.0
    K_ndc[3, 2] = 1.0

    # flip x, y axes (OpenCV screen orientation is opposite) and transpose R
    # into row-vector convention.
    R_out = R.T.copy()
    T_out = T.copy()
    R_out[:, :2] *= -1
    T_out[:2] *= -1
    return K_ndc.astype(np.float32), R_out.astype(np.float32), T_out.astype(np.float32)


def camera_from_K_ndc(K_ndc) -> Camera:
    K_ndc = jnp.asarray(K_ndc)
    return Camera(K_ndc[0, 0], K_ndc[1, 1], K_ndc[0, 2], K_ndc[1, 2])
