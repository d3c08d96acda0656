"""Rotation parameterizations (pure JAX).

Replaces the PyTorch3D transforms the reference consumes
(rotation_6d_to_matrix / matrix_to_rotation_6d / random_rotations,
reference: src/model/dbw.py:12) and the euler helpers
(reference: src/model/tools.py:173-207).

Convention: matrices act on ROW vectors, ``x' = x @ R`` — same as the
reference's use sites (e.g. src/model/dbw.py:264,285,311).
"""


import jax
import jax.numpy as jnp
import numpy as np


def rotation_6d_to_matrix(d6):
    """Zhou et al. 6D -> 3x3 via Gram-Schmidt; rows of R are the two
    orthonormalized vectors plus their cross product, so d6 = [1,0,0,0,1,0]
    gives identity (matches the ground-rotation init, reference
    src/model/dbw.py:99)."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True).clip(1e-12)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.linalg.norm(a2p, axis=-1, keepdims=True).clip(1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(R):
    """Inverse of rotation_6d_to_matrix: first two rows, flattened."""
    return jnp.concatenate([R[..., 0, :], R[..., 1, :]], axis=-1)


def quaternion_to_matrix(q):
    """Unit quaternion (w, x, y, z) -> rotation matrix (row-vector action)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two = 2.0
    m = jnp.stack(
        [
            1 - two * (y * y + z * z), two * (x * y + z * w), two * (x * z - y * w),
            two * (x * y - z * w), 1 - two * (x * x + z * z), two * (y * z + x * w),
            two * (x * z + y * w), two * (y * z - x * w), 1 - two * (x * x + y * y),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def random_rotations(n, key_or_rng):
    """N uniform random rotations via normalized Gaussian quaternions.

    Accepts a jax PRNG key or a numpy Generator (host init path)."""
    if isinstance(key_or_rng, np.random.Generator):
        q = key_or_rng.standard_normal((n, 4)).astype(np.float32)
        q = q / np.linalg.norm(q, axis=-1, keepdims=True)
        return np.asarray(quaternion_to_matrix(jnp.asarray(q)))
    q = jax.random.normal(key_or_rng, (n, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-12)
    return quaternion_to_matrix(q)


def azim_to_matrix(azim_deg):
    """Rotation about +Y (angle with +X in the XZ plane), row-vector action.
    Reference: src/model/tools.py:173-186."""
    a = jnp.deg2rad(jnp.asarray(azim_deg, dtype=jnp.float32))
    c, s = jnp.cos(a), jnp.sin(a)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack(
        [c, z, s, z, o, z, -s, z, c], axis=-1
    ).reshape(a.shape + (3, 3))


def elev_to_matrix(elev_deg):
    """Rotation about +X (angle with +Z in the YZ plane), reference
    src/model/tools.py:189-198 (note the internal negation of the angle)."""
    a = -jnp.deg2rad(jnp.asarray(elev_deg, dtype=jnp.float32))
    c, s = jnp.cos(a), jnp.sin(a)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack(
        [o, z, z, z, c, s, z, -s, c], axis=-1
    ).reshape(a.shape + (3, 3))


def roll_to_matrix(roll_deg):
    """Rotation about +Z (angle with +X in the XY plane), reference
    src/model/tools.py:201-207."""
    a = jnp.deg2rad(jnp.asarray(roll_deg, dtype=jnp.float32))
    c, s = jnp.cos(a), jnp.sin(a)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack(
        [c, s, z, -s, c, z, z, z, o], axis=-1
    ).reshape(a.shape + (3, 3))


def euler_world_matrix(elev_deg, azim_deg, roll_deg):
    """World-frame rotation from the config's ``R_world: [elev, azim, roll]``
    triple: elev @ azim @ roll (reference: src/model/dbw.py:58-59)."""
    return elev_to_matrix(elev_deg) @ azim_to_matrix(azim_deg) @ roll_to_matrix(roll_deg)


def look_at_rotation(dist, elev_deg, azim_deg, device_dtype=jnp.float32):
    """Camera (R, T) looking at the origin from spherical coordinates —
    equivalent of pytorch3d.look_at_view_transform used by the trajectory
    helpers (reference: src/model/renderer.py:319-324, 411-414).

    Returns R (..., 3, 3) with row-vector action and T (..., 3)."""
    elev = jnp.deg2rad(jnp.asarray(elev_deg, dtype=device_dtype))
    azim = jnp.deg2rad(jnp.asarray(azim_deg, dtype=device_dtype))
    elev, azim = jnp.broadcast_arrays(elev, azim)
    # camera position on the sphere (pytorch3d convention: +Z forward scene)
    x = dist * jnp.cos(elev) * jnp.sin(azim)
    y = dist * jnp.sin(elev)
    z = dist * jnp.cos(elev) * jnp.cos(azim)
    eye = jnp.stack([x, y, z], axis=-1)
    at = jnp.zeros_like(eye)
    up = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], device_dtype), eye.shape)

    z_axis = at - eye
    z_axis = z_axis / jnp.linalg.norm(z_axis, axis=-1, keepdims=True).clip(1e-12)
    x_axis = jnp.cross(up, z_axis)
    x_norm = jnp.linalg.norm(x_axis, axis=-1, keepdims=True)
    # degenerate when up parallel to z: fall back to +X
    x_axis = jnp.where(
        x_norm > 1e-5, x_axis / x_norm.clip(1e-12),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], device_dtype), eye.shape),
    )
    y_axis = jnp.cross(z_axis, x_axis)
    # Rows are world-frame camera axes; world->view for row vectors is x @ R
    # with R = [x_axis, y_axis, z_axis] stacked as COLUMNS of the row-action
    # matrix, i.e. R[i, j] = axis_j[i].
    R = jnp.stack([x_axis, y_axis, z_axis], axis=-1)
    T = -jnp.einsum("...i,...ij->...j", eye, R)
    return R, T


def so3_relative_angle_deg(R1, R2):
    """Angle between rotations in degrees (reference src/model/tools.py:210)."""
    tr = jnp.einsum("...ii->...", jnp.swapaxes(R1, -1, -2) @ R2)
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    return jnp.rad2deg(jnp.arccos(cos))
