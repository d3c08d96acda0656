"""Superquadric surface / implicit field math (pure JAX).

Reimplements the reference's superquadric library (src/utils/superquadric.py)
on top of the gradient-safe powers in ``safe_math``. The parameterization:
a unit sphere point at spherical angles (eta, omega) is warped by the two
shape exponents (eps1, eps2) via signed powers; eps == 1 recovers the sphere,
eps -> 0.1 squares off the block.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from .safe_math import safe_pow, signed_pow


def parametric_sq(eta, omega, eps1, eps2):
    """Superquadric surface point for spherical angles.

    eta in [-pi/2, pi/2], omega in [-pi, pi]; eps broadcast against them.
    Axis convention matches the reference (y = "up" axis uses eps1;
    reference: src/utils/superquadric.py:10-14).

    Returns (..., 3) points.
    """
    ce, se = signed_pow(jnp.cos(eta), eps1), signed_pow(jnp.sin(eta), eps1)
    co, so = signed_pow(jnp.cos(omega), eps2), signed_pow(jnp.sin(omega), eps2)
    return jnp.stack([ce * so, se, ce * co], axis=-1)


def implicit_sq(points, eps1=1.0, eps2=1.0, safe=True, as_sdf=False):
    """Inside-outside function F(x) - 1 (or a pseudo-SDF variant).

    Only valid for eps in [0.1, 2] (exponents up to 20 appear internally);
    points are clamped to [-5, 5] to keep x**20 finite, and the even powers
    are computed as (x^2)^(1/eps) to keep gradients NaN-free on negatives —
    both guards mirror the reference (src/utils/superquadric.py:17-38).

    as_sdf=False -> F - 1;  as_sdf=True -> radial Euclidean distance;
    as_sdf=2 -> F**(eps1/2) - 1 (monotone, used by the overlap loss,
    reference: src/model/dbw.py:400).
    """
    pow_func = safe_pow if safe else jnp.power
    if safe:
        points = jnp.clip(points, -5.0, 5.0)
    x2 = points[..., 0] ** 2
    y2 = points[..., 1] ** 2
    z2 = points[..., 2] ** 2
    x = pow_func(x2, 1.0 / eps2)
    y = pow_func(y2, 1.0 / eps1)
    z = pow_func(z2, 1.0 / eps2)
    res = pow_func(x + z, eps2 / eps1) + y
    if as_sdf:
        if as_sdf is True:
            r = jnp.linalg.norm(points, axis=-1)
            return r * (1.0 - 1.0 / (pow_func(res, eps1 / 2.0) + 1e-6))
        return pow_func(res, eps1 / 2.0) - 1.0
    return res - 1.0


def sq_mesh_verts(verts_unit_sphere, eps1, eps2):
    """Warp precomputed unit-sphere vertices into superquadric vertices.

    The model caches (eta, omega) per icosphere vertex at init (reference:
    src/model/dbw.py:85-87) so this is the only per-step geometry math.

    verts: (V, 3) or (N, V, 3); eps: scalars or (N, 1).
    """
    eta = jnp.arcsin(jnp.clip(verts_unit_sphere[..., 1], -1.0, 1.0))
    omega = jnp.arctan2(verts_unit_sphere[..., 0], verts_unit_sphere[..., 2])
    return parametric_sq(eta, omega, eps1, eps2)


def sample_sq(key, eps1, eps2, scale, n_points):
    """Random (non-uniform) surface samples; axis order differs from
    parametric_sq exactly as in the reference (z = sin eta there;
    src/utils/superquadric.py:50-57).

    eps1/eps2/scale: (N, 1)/(N, 1)/(N, 3). Returns (N, P, 3)."""
    n = eps1.shape[0]
    k1, k2 = jax.random.split(key)
    eta = jax.random.uniform(k1, (n, n_points)) * jnp.pi - jnp.pi / 2
    omega = jax.random.uniform(k2, (n, n_points)) * 2 * jnp.pi - jnp.pi
    ce, se = signed_pow(jnp.cos(eta), eps1), signed_pow(jnp.sin(eta), eps1)
    co, so = signed_pow(jnp.cos(omega), eps2), signed_pow(jnp.sin(omega), eps2)
    points = jnp.stack([ce * so, ce * co, se], axis=-1)
    return points * scale[:, None]


# ---------------------------------------------------------------------------
# Arclength-uniform sampling (host-side numpy; used only by the EMS baseline
# eval path, reference: src/utils/superquadric.py:66-148). Vectorized where
# possible but inherently sequential in the theta march.
# ---------------------------------------------------------------------------


def _dtheta(theta, arclength, threshold, scale, epsilon):
    if theta < threshold:
        return abs(
            (arclength / scale[1] + theta**epsilon) ** (1.0 / epsilon) - theta
        )
    num = math.cos(theta) ** 2 * math.sin(theta) ** 2
    den = (
        scale[0] ** 2 * math.cos(theta) ** (2 * epsilon) * math.sin(theta) ** 4
        + scale[1] ** 2 * math.sin(theta) ** (2 * epsilon) * math.cos(theta) ** 4
    )
    return arclength / epsilon * math.sqrt(num / den)


def _angle2points(theta, scale, epsilon):
    theta = np.asarray(theta)
    p = np.zeros((2, theta.shape[0]))
    p[0] = scale[0] * np.sign(np.cos(theta)) * np.abs(np.cos(theta)) ** epsilon
    p[1] = scale[1] * np.sign(np.sin(theta)) * np.abs(np.sin(theta)) ** epsilon
    return p


def _uniform_superellipse(epsilon, scale, threshold=1e-2, num_limit=10000, arclength=0.02):
    epsilon = float(epsilon)
    scale = [float(scale[0]), float(scale[1])]
    theta = np.zeros(num_limit)
    critical = num_limit - 1
    for i in range(num_limit - 1):
        dt = _dtheta(theta[i], arclength, threshold, scale, epsilon)
        nxt = theta[i] + dt
        if nxt > np.pi / 4:
            theta[i + 1] = np.pi / 4
            critical = i + 1
            break
        theta[i + 1] = nxt
    else:
        raise RuntimeError(f"superellipse sampling exceeded limit {num_limit}")
    j = critical
    flipped = scale[::-1]
    for j in range(critical + 1, num_limit - 1):
        dt = _dtheta(theta[j], arclength, threshold, flipped, epsilon)
        nxt = theta[j] + dt
        if nxt > np.pi / 4:
            break
        theta[j + 1] = nxt
    num_pt = j
    theta = theta[: num_pt + 1]

    p_fw = _angle2points(theta[: critical + 1], scale, epsilon)
    p_bw = np.flip(_angle2points(theta[critical + 1 : num_pt + 1], flipped, epsilon), (0, 1))
    point = np.concatenate([p_fw, p_bw], 1)
    # mirror the quarter arc into the full superellipse
    point = np.concatenate(
        [
            point,
            np.flip(point[:, :num_pt], 1) * np.array([[-1], [1]]),
            point[:, 1 : num_pt + 1] * np.array([[-1], [-1]]),
            np.flip(point[:, :num_pt], 1) * np.array([[1], [-1]]),
        ],
        1,
    )
    return point


def sample_uniform_sq(eps1, eps2, scale, n_points=1000, threshold=1e-2,
                      num_limit=10000, arclength=0.02, rng=None):
    """EMS-style arclength-uniform superquadric surface sampling (host).

    eps1/eps2: (N,), scale: (N, 3). Returns (N, n_points, 3) numpy."""
    rng = rng or np.random.default_rng(0)
    eps1 = np.clip(np.asarray(eps1, dtype=np.float64), 0.01, None)
    eps2 = np.clip(np.asarray(eps2, dtype=np.float64), 0.01, None)
    out = []
    for e1, e2, s in zip(eps1, eps2, np.asarray(scale, dtype=np.float64)):
        pe = _uniform_superellipse(e1, [1.0, s[2]], threshold, num_limit, arclength)
        po = _uniform_superellipse(e2, [s[0], s[1]], threshold, num_limit, arclength)
        pe, po = pe[:, None, :], po[:, :, None]
        xy = po * pe[0:1]
        z = np.broadcast_to(pe[1:2], (1, po.shape[1], pe.shape[2]))
        pc = np.concatenate([xy, z], axis=0).reshape(3, -1).T
        pc = pc[rng.permutation(len(pc))]
        if n_points is not None:
            pc = pc[:n_points]
        out.append(pc)
    return np.stack(out).astype(np.float32)
