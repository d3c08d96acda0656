"""Fragment shading primitives: texture sampling + the light model.

The training path uses 'raw' shading (textures straight through, scaled by
ambient color when != 1 — reference: src/model/renderer.py:225-228). The
lit shading types (flat/phong/gouraud, reference renderer.py:195-204) live
in Renderer._shade_lit_flat (renderer.py) on the flat (N,)-component
fragment layout — the (H, W, K, ...) layout tile-pads up to 64x on TPU and
OOMs at viz scale — sharing this module's ``_light`` / ``vertex_normals``.
Specular is always zero in the shipped configs so only ambient + diffuse
are implemented.
"""

from __future__ import annotations

import jax.numpy as jnp

from .interpolate import Fragments, interpolate_face_attrs
from .meshes import MeshScene, sample_atlas_bilinear


def sample_texture_colors(fragments: Fragments, scene: MeshScene):
    """UV-interpolate and bilinearly sample the texture atlas per fragment.

    Returns (H, W, K, 3)."""
    uv_face_verts = scene.uv_verts[scene.uv_faces]  # (F, 3, 2)
    uv = interpolate_face_attrs(fragments, uv_face_verts)  # (H, W, K, 2)
    idx = jnp.maximum(fragments.pix_to_face, 0)
    map_idx = scene.map_idx[idx]
    return sample_atlas_bilinear(scene.atlas.maps, map_idx, uv, diff_uv=True)


def shade_raw(fragments: Fragments, scene: MeshScene, ambient_color=None):
    colors = sample_texture_colors(fragments, scene)
    if ambient_color is not None:
        colors = colors * jnp.asarray(ambient_color)
    return colors


def _light(normals, points, R, light_type, light_direction_cam,
           light_location, ambient_color, diffuse_color):
    """Ambient / directional / point lighting (reference renderer.py:69-78
    light registry). Directional lights live in the CAMERA frame and rotate
    into world per view (reference renderer.py:87-89); point lights are a
    fixed world-frame location (pytorch3d PointLights semantics)."""
    ambient = jnp.asarray(ambient_color)
    if light_type == "ambient":
        return jnp.broadcast_to(ambient, normals.shape)
    if light_type == "directional":
        d_cam = jnp.asarray(light_direction_cam, dtype=jnp.float32)
        d_world = d_cam @ R.T  # view->world for row vectors (R orthogonal)
        d_world = d_world / jnp.linalg.norm(d_world).clip(1e-12)
    elif light_type == "point":
        d_world = jnp.asarray(light_location, jnp.float32) - points
        d_world = d_world / jnp.linalg.norm(
            d_world, axis=-1, keepdims=True
        ).clip(1e-12)
    else:  # pragma: no cover - validated at renderer construction
        raise NotImplementedError(f"unknown light type: {light_type}")
    lam = jnp.maximum(jnp.sum(normals * d_world, axis=-1, keepdims=True), 0.0)
    return ambient + jnp.asarray(diffuse_color) * lam


def vertex_normals(verts, faces):
    """Area-weighted vertex normals (scatter-add over faces)."""
    fn = jnp.cross(
        verts[faces[:, 1]] - verts[faces[:, 0]],
        verts[faces[:, 2]] - verts[faces[:, 0]],
    )  # area-weighted
    vn = jnp.zeros_like(verts)
    for k in range(3):
        vn = vn.at[faces[:, k]].add(fn)
    return vn / jnp.linalg.norm(vn, axis=-1, keepdims=True).clip(1e-12)
