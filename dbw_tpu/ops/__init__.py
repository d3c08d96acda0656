"""Geometry and math primitives (pure JAX + host-side topology builders)."""

from .safe_math import safe_pow, signed_pow, safe_sqrt
from .rotations import (
    rotation_6d_to_matrix,
    matrix_to_rotation_6d,
    random_rotations,
    azim_to_matrix,
    elev_to_matrix,
    roll_to_matrix,
    euler_world_matrix,
)
from .icosphere import icosphere, subdivide, plane_mesh, cube_mesh
from .uv import (
    spherical_uv_from_points,
    points_from_spherical_uv,
    icosphere_uv_atlas,
    cube_uv_atlas,
)
from .superquadric import (
    parametric_sq,
    implicit_sq,
    sample_sq,
    sample_uniform_sq,
    sq_mesh_verts,
)
