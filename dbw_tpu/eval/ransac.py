"""Batched least-squares plane fit + RANSAC inlier maximization (reference:
src/utils/ransac.py; used to strip the ground plane from DTU GT clouds for
the EMS/MBF baseline preprocessing, reference dtu_3d_process.py:36-41)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def ls_plane_fit(points):
    """Fit z = a x + b y + c by least squares for a batch of candidate sets.
    points: (B, K, 3). Returns (B, 3) coefficients (a, b, c)."""
    A = jnp.concatenate(
        [points[..., :2], jnp.ones_like(points[..., :1])], axis=-1
    )  # (B, K, 3)
    z = points[..., 2:3]
    AtA = jnp.swapaxes(A, -1, -2) @ A
    Atz = jnp.swapaxes(A, -1, -2) @ z
    coef = jnp.linalg.solve(AtA + 1e-8 * jnp.eye(3), Atz)
    return coef[..., 0]


def ransac_plane(points, n_trials=100, n_samples=3, threshold=0.01, key=None):
    """RANSAC plane: maximize inliers of |z - (a x + b y + c)| < threshold.
    points: (P, 3). Returns (coef (3,), inlier_mask (P,))."""
    key = key if key is not None else jax.random.PRNGKey(0)
    P = points.shape[0]
    idx = jax.random.randint(key, (n_trials, n_samples), 0, P)
    candidates = points[idx]  # (T, K, 3)
    coefs = ls_plane_fit(candidates)  # (T, 3)
    pred_z = (
        coefs[:, 0:1] * points[None, :, 0]
        + coefs[:, 1:2] * points[None, :, 1]
        + coefs[:, 2:3]
    )
    resid = jnp.abs(points[None, :, 2] - pred_z)
    inliers = resid < threshold
    best = jnp.argmax(inliers.sum(axis=1))
    return coefs[best], inliers[best]


def remove_ground_plane(points, axis=2, n_trials=100, threshold=0.001 ** 0.5,
                        seed=0):
    """Defaults mirror the reference Ransac(thresh=0.001 on SQUARED residual,
    n_iter=100; src/utils/ransac.py:31,50): |residual| < sqrt(1e-3).
    Remove the dominant plane orthogonal-ish to `axis` (host helper for
    dtu_3d_process)."""
    pts = np.asarray(points, np.float32)
    perm = [i for i in range(3) if i != axis] + [axis]
    coef, inl = ransac_plane(
        jnp.asarray(pts[:, perm]), n_trials=n_trials, threshold=threshold,
        key=jax.random.PRNGKey(seed),
    )
    keep = ~np.asarray(inl)
    return pts[keep], np.asarray(coef)
