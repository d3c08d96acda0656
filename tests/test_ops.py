"""Unit tests for the geometry core against closed-form cases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dbw_tpu.ops import (
    azim_to_matrix,
    cube_mesh,
    elev_to_matrix,
    euler_world_matrix,
    icosphere,
    icosphere_uv_atlas,
    implicit_sq,
    matrix_to_rotation_6d,
    parametric_sq,
    plane_mesh,
    points_from_spherical_uv,
    random_rotations,
    roll_to_matrix,
    rotation_6d_to_matrix,
    safe_pow,
    sample_sq,
    signed_pow,
    spherical_uv_from_points,
    sq_mesh_verts,
)
from dbw_tpu.ops.rotations import look_at_rotation
from dbw_tpu.ops.uv import pad_u_atlas


class TestSafeMath:
    def test_signed_pow_values(self):
        t = jnp.array([-8.0, 0.0, 27.0])
        np.testing.assert_allclose(
            signed_pow(t, jnp.float32(1 / 3)), [-2.0, 0.0, 3.0], atol=1e-5
        )

    def test_signed_pow_grad_exponent_finite_at_zero(self):
        # torch defines d/dp |0|**p == 0; jnp.power would give NaN.
        g = jax.grad(lambda p: signed_pow(jnp.array(0.0), p))(jnp.float32(0.5))
        assert np.isfinite(g) and g == 0.0

    def test_safe_pow_clamps(self):
        assert safe_pow(jnp.float32(-3.0), 0.5) == pytest.approx(1e-3, rel=1e-5)
        g = jax.grad(lambda t: safe_pow(t, 0.5))(jnp.float32(-1.0))
        assert g == 0.0
        g2 = jax.grad(lambda t: safe_pow(t, 2.0))(jnp.float32(3.0))
        assert g2 == pytest.approx(6.0, rel=1e-5)


class TestRotations:
    def test_6d_identity(self):
        R = rotation_6d_to_matrix(jnp.array([1.0, 0, 0, 0, 1, 0]))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)

    def test_6d_roundtrip(self):
        rng = np.random.default_rng(0)
        R = random_rotations(16, rng)
        d6 = matrix_to_rotation_6d(jnp.asarray(R))
        R2 = rotation_6d_to_matrix(d6)
        np.testing.assert_allclose(R, R2, atol=1e-5)

    def test_random_rotations_are_orthonormal(self):
        R = random_rotations(8, jax.random.PRNGKey(0))
        eye = jnp.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)

    def test_euler_axes(self):
        # row-vector action: x' = x @ R
        x = jnp.array([1.0, 0.0, 0.0])
        np.testing.assert_allclose(x @ azim_to_matrix(90.0), [0, 0, 1], atol=1e-6)
        y = jnp.array([0.0, 1.0, 0.0])
        np.testing.assert_allclose(y @ roll_to_matrix(90.0), [-1, 0, 0], atol=1e-6)
        z = jnp.array([0.0, 0.0, 1.0])
        out = z @ elev_to_matrix(90.0)
        np.testing.assert_allclose(out, [0, 1, 0], atol=1e-6)

    def test_world_matrix_composes(self):
        R = euler_world_matrix(10.0, 20.0, 30.0)
        Rc = elev_to_matrix(10.0) @ azim_to_matrix(20.0) @ roll_to_matrix(30.0)
        np.testing.assert_allclose(R, Rc, atol=1e-6)

    def test_look_at_camera_maps_eye_to_origin_axis(self):
        R, T = look_at_rotation(2.0, 30.0, 45.0)
        # the eye must land on the camera axis at distance `dist`
        eye_cam = (-T) @ jnp.linalg.inv(R)  # world eye: x_cam = x @ R + T = 0
        cam = eye_cam @ R + T
        np.testing.assert_allclose(cam, [0, 0, 0], atol=1e-5)
        origin_cam = jnp.zeros(3) @ R + T
        np.testing.assert_allclose(origin_cam, [0, 0, 2.0], atol=1e-5)


class TestIcosphere:
    def test_counts(self):
        for level, (nv, nf) in enumerate([(12, 20), (42, 80), (162, 320)]):
            v, f = icosphere(level)
            assert v.shape == (nv, 3) and f.shape == (nf, 3)
            np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-6)

    def test_watertight_euler_characteristic(self):
        v, f = icosphere(2)
        edges = set()
        for a, b, c in f:
            for e in [(a, b), (b, c), (c, a)]:
                edges.add((min(e), max(e)))
        assert len(v) - len(edges) + len(f) == 2  # sphere topology

    def test_flip_reverses_orientation(self):
        v, f = icosphere(1)
        _, ff = icosphere(1, flip=True)
        n = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
        c = (v[f[:, 0]] + v[f[:, 1]] + v[f[:, 2]]) / 3
        nf_ = np.cross(v[ff[:, 1]] - v[ff[:, 0]], v[ff[:, 2]] - v[ff[:, 0]])
        cf = (v[ff[:, 0]] + v[ff[:, 1]] + v[ff[:, 2]]) / 3
        assert (np.sum(n * c, axis=1) > 0).all()  # outward
        assert (np.sum(nf_ * cf, axis=1) < 0).all()  # inward

    def test_primitives(self):
        v, f = plane_mesh()
        assert v.shape == (4, 3) and f.shape == (2, 3)
        n = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
        assert (n[:, 1] > 0).all()  # +Y normal
        v, f = cube_mesh()
        assert v.shape == (8, 3) and f.shape == (12, 3)


class TestUV:
    def test_spherical_roundtrip(self):
        rng = np.random.default_rng(1)
        p = rng.standard_normal((100, 3))
        p /= np.linalg.norm(p, axis=1, keepdims=True)
        uv = spherical_uv_from_points(p)
        p2 = points_from_spherical_uv(uv)
        np.testing.assert_allclose(p, p2, atol=1e-3)

    def test_atlas_fixes_seam(self):
        v, f = icosphere(1)
        faces_uvs, verts_uvs = icosphere_uv_atlas(v, f)
        fu = verts_uvs[faces_uvs][..., 0]
        spread = np.abs(np.diff(np.concatenate([fu, fu[:, :1]], 1), axis=1)).max(1)
        assert (spread <= 0.5).all(), "seam-crossing faces remain"

    def test_atlas_fixes_poles(self):
        v, f = icosphere(1)
        faces_uvs, verts_uvs = icosphere_uv_atlas(v, f)
        fu = verts_uvs[faces_uvs]
        polar = np.logical_or(fu[..., 1] > 0.99, fu[..., 1] < 0.01)
        # polar uv-verts must have u centered between their face's other corners
        for i in range(len(faces_uvs)):
            for j in range(3):
                if polar[i, j]:
                    others = [fu[i, k, 0] for k in range(3) if not polar[i, k]]
                    assert fu[i, j, 0] == pytest.approx(sum(others) / 2, abs=1e-5)

    def test_pad_u_atlas_in_range(self):
        v, f = icosphere(1)
        _, verts_uvs = icosphere_uv_atlas(v, f)
        out, (pl, pr) = pad_u_atlas(verts_uvs, 256)
        assert pl >= 0 and pr >= 0
        assert out[..., 0].min() >= 0.0 and out[..., 0].max() <= 1.0


class TestSuperquadric:
    def test_sphere_case(self):
        # eps1 = eps2 = 1 must reproduce the unit sphere
        v, _ = icosphere(1)
        out = sq_mesh_verts(jnp.asarray(v), 1.0, 1.0)
        np.testing.assert_allclose(out, v, atol=1e-5)

    def test_implicit_sphere(self):
        p = jnp.array([[2.0, 0, 0], [0.5, 0, 0], [1.0, 0, 0]])
        f = implicit_sq(p, 1.0, 1.0)
        assert f[0] > 0 and f[1] < 0 and abs(f[2]) < 1e-5

    def test_surface_points_on_zero_level_set(self):
        eps1, eps2 = jnp.float32(0.7), jnp.float32(1.3)
        eta = jnp.linspace(-1.2, 1.2, 13)
        omega = jnp.linspace(-3.0, 3.0, 13)
        pts = parametric_sq(eta, omega, eps1, eps2)
        f = implicit_sq(pts, eps1, eps2)
        np.testing.assert_allclose(f, 0.0, atol=1e-3)

    def test_implicit_grad_finite(self):
        def loss(e):
            p = jnp.array([[0.3, -0.2, 0.0], [0.0, 0.0, 0.0], [3.0, 3.0, 3.0]])
            return implicit_sq(p, e, e, as_sdf=2).sum()

        for e in [0.1, 0.5, 1.0, 2.0]:
            g = jax.grad(loss)(jnp.float32(e))
            assert np.isfinite(g)

    def test_parametric_grad_wrt_eps_finite(self):
        v, _ = icosphere(1)
        v = jnp.asarray(v)

        def loss(e):
            return sq_mesh_verts(v, e, e).sum()

        g = jax.grad(loss)(jnp.float32(0.3))
        assert np.isfinite(g)

    def test_sample_sq_shapes(self):
        pts = sample_sq(
            jax.random.PRNGKey(0),
            jnp.ones((4, 1)) * 0.8,
            jnp.ones((4, 1)) * 1.2,
            jnp.ones((4, 3)),
            128,
        )
        assert pts.shape == (4, 128, 3)
        # samples lie near the unit superquadric surface; sample_sq puts the
        # eps1 ("up") axis at z (reference: src/utils/superquadric.py:56) while
        # implicit_sq puts it at y — permute before checking.
        pts_yz = pts[..., [0, 2, 1]]
        f = implicit_sq(pts_yz, 0.8 * jnp.ones((4, 1)), 1.2 * jnp.ones((4, 1)))
        assert float(jnp.abs(f).max()) < 2e-2
