"""Chamfer distance via MXU-tiled brute-force 1-NN.

Replaces PyTorch3D's CUDA ``knn_points`` (reference: src/utils/chamfer.py).
TPU-first: the (P1, P2) squared-distance matrix is a rank-3 matmul
(|x|^2 + |y|^2 - 2 x.y^T) that maps directly onto the MXU; argmin over the
second cloud replaces the KNN tree. For the sizes in play (<= 1e5 points)
a chunked scan keeps peak memory at chunk x P2.

Semantics match the reference's modified chamfer: optional L1 (sqrt of
squared dists), direction_reduction sum/mean/none, optional normal cosine
distance through gathered nearest indices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def nn_dist2_idx(x, y, chunk=4096):
    """For each point in x (P1, D): squared distance to and index of its
    nearest neighbor in y (P2, D). Returns (dist2 (P1,), idx (P1,)).

    The requested chunk is clamped so the per-chunk (chunk, P2) f32
    distance block stays near 1 GB — large baseline clouds (5e5 x 5e5)
    would otherwise materialize ~8 GB blocks and OOM."""
    P1 = x.shape[0]
    P2 = y.shape[0]
    chunk = max(128, min(chunk, (1 << 28) // max(P2, 1)))
    y2 = jnp.sum(y * y, axis=-1)  # (P2,)
    n_chunks = -(-P1 // chunk)
    pad = n_chunks * chunk - P1
    xp = jnp.pad(x, ((0, pad), (0, 0)))

    def body(xc):
        x2 = jnp.sum(xc * xc, axis=-1, keepdims=True)  # (C, 1)
        d2 = x2 + y2[None] - 2.0 * jnp.dot(
            xc, y.T, preferred_element_type=jnp.float32
        )
        idx = jnp.argmin(d2, axis=-1)
        return jnp.take_along_axis(d2, idx[:, None], axis=-1)[:, 0], idx

    d2, idx = lax.map(body, xp.reshape(n_chunks, chunk, -1))
    d2 = jnp.maximum(d2.reshape(-1)[:P1], 0.0)
    return d2, idx.reshape(-1)[:P1].astype(jnp.int32)


def chamfer_distance(
    x,
    y,
    x_normals=None,
    y_normals=None,
    batch_reduction="mean",
    point_reduction="mean",
    direction_reduction="sum",
    return_L1=False,
    chunk=4096,
):
    """x: (N, P1, D), y: (N, P2, D). Returns (cham, cham_normals|None) with the
    reference's reduction semantics (src/utils/chamfer.py:7-160)."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    if x.ndim == 2:
        x, y = x[None], y[None]
        if x_normals is not None:
            x_normals, y_normals = x_normals[None], y_normals[None]

    def one(xb, yb, xn, yn):
        dx2, ix = nn_dist2_idx(xb, yb, chunk)
        dy2, iy = nn_dist2_idx(yb, xb, chunk)
        cx = jnp.sqrt(dx2) if return_L1 else dx2
        cy = jnp.sqrt(dy2) if return_L1 else dy2
        if xn is not None:
            xnn = yn[ix]
            ynn = xn[iy]
            cs = lambda a, b: jnp.abs(
                jnp.sum(a * b, -1)
                / (jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1)).clip(1e-6)
            )
            nx = 1.0 - cs(xn, xnn)
            ny = 1.0 - cs(yn, ynn)
        else:
            nx = ny = jnp.zeros(())
        return cx, cy, nx, ny

    if x_normals is None:
        cx, cy, nx, ny = jax.vmap(lambda a, b: one(a, b, None, None))(x, y)
        return_normals = False
    else:
        cx, cy, nx, ny = jax.vmap(one)(x, y, x_normals, y_normals)
        return_normals = True

    # point reduction
    cham_x = cx.sum(-1)
    cham_y = cy.sum(-1)
    if return_normals:
        cham_nx, cham_ny = nx.sum(-1), ny.sum(-1)
    if point_reduction == "mean":
        cham_x = cham_x / x.shape[1]
        cham_y = cham_y / y.shape[1]
        if return_normals:
            cham_nx = cham_nx / x.shape[1]
            cham_ny = cham_ny / y.shape[1]

    # batch reduction
    if batch_reduction is not None:
        cham_x, cham_y = cham_x.sum(), cham_y.sum()
        if return_normals:
            cham_nx, cham_ny = cham_nx.sum(), cham_ny.sum()
        if batch_reduction == "mean":
            n = x.shape[0]
            cham_x, cham_y = cham_x / n, cham_y / n
            if return_normals:
                cham_nx, cham_ny = cham_nx / n, cham_ny / n

    if direction_reduction in (None, "none"):
        return (cham_x, cham_y), ((cham_nx, cham_ny) if return_normals else None)
    cham = cham_x + cham_y
    cham_n = (cham_nx + cham_ny) if return_normals else None
    if direction_reduction == "mean":
        cham = 0.5 * cham
        cham_n = 0.5 * cham_n if return_normals else None
    return cham, cham_n
