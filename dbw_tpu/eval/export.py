"""Host-side scene export: REAL transparency filtering (dynamic shapes are
fine off-device) + packed texture atlas OBJ writing.

Equivalent of the reference's build_scene/build_blocks(+as_scene) ->
save_mesh_as_obj path (dbw.py:495-514, mesh.py:286-302): the joined scene's
per-mesh uv maps are packed into one texture image (stacked vertically)
with uvs offset accordingly, so a single OBJ+MTL+PNG round-trips in any
viewer."""

from __future__ import annotations

import numpy as np


from ..utils.obj_io import save_obj


def _np(x):
    return np.asarray(x)


def export_blocks_mesh(model, params, filter_transparent=True, world_coord=True):
    """Filtered blocks as (verts, faces) numpy arrays (no texture) — used by
    the DTU eval (reference trainer.py:260-264)."""
    from ..models.dbw import Phase

    phase = Phase.eval_phase(filter_transparent=filter_transparent)
    scene, aux = model.build_blocks(params, phase, world_coord=world_coord)
    mask = _np(aux["mask"])
    verts = _np(scene.verts).reshape(model.n_blocks, -1, 3)
    V = verts.shape[1]
    keep = np.where(mask)[0]
    out_v, out_f = [], []
    bf = _np(model.statics.block_faces)
    off = 0
    for b in keep:
        out_v.append(verts[b])
        out_f.append(bf + off)
        off += V
    if not out_v:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    return np.concatenate(out_v), np.concatenate(out_f)


def export_scene_obj(model, params, path, filter_transparent=True, w_bkg=True,
                     reduce_ground=False):
    """Full textured scene -> OBJ + MTL + packed PNG atlas."""
    from ..models.dbw import Phase

    phase = Phase.eval_phase(filter_transparent=filter_transparent)
    sub_meshes = []  # (verts, faces, uv_verts, uv_faces, map_image)

    if w_bkg:
        bkg, _ = model.build_bkg(params, phase)
        sub_meshes.append(_submesh_single(model, bkg, 0))
    ground, _ = model.build_ground(params, phase, reduced=reduce_ground)
    sub_meshes.append(_submesh_single(model, ground, 0))

    blocks, aux = model.build_blocks(params, phase)
    mask = _np(aux["mask"])
    verts = _np(blocks.verts).reshape(model.n_blocks, -1, 3)
    maps = _np(blocks.atlas.maps)
    bf = _np(model.statics.block_faces)
    buf = _np(model.statics.block_uv_faces)
    buv = _np(model.statics.block_uv_verts)
    for b in np.where(mask)[0]:
        sub_meshes.append((verts[b], bf, buv, buf, maps[b]))

    _write_packed_obj(path, sub_meshes)


def _submesh_single(model, scene, map_id):
    return (
        _np(scene.verts), _np(scene.faces), _np(scene.uv_verts),
        _np(scene.uv_faces), _np(scene.atlas.maps)[map_id],
    )


def _write_packed_obj(path, sub_meshes):
    """Stack per-submesh texture maps vertically into one atlas; remap uvs."""
    heights = [m[4].shape[0] for m in sub_meshes]
    width = max(m[4].shape[1] for m in sub_meshes)
    total_h = sum(heights)
    atlas = np.zeros((total_h, width, 3), np.float32)
    v_off, vt_off, y_off = 0, 0, 0
    all_v, all_f, all_uv, all_uvf = [], [], [], []
    for (verts, faces, uv_verts, uv_faces, tex) in sub_meshes:
        h, w = tex.shape[:2]
        atlas[y_off : y_off + h, :w] = tex
        # uv v==1 is texture row 0 within the submap; remap into the packed
        # atlas (v==1 at atlas row 0).
        u = uv_verts[:, 0] * (w - 1) / max(width - 1, 1)
        row_in_map = (1.0 - uv_verts[:, 1]) * (h - 1)
        v = 1.0 - (y_off + row_in_map) / max(total_h - 1, 1)
        all_v.append(verts)
        all_f.append(faces + v_off)
        all_uv.append(np.stack([u, v], axis=-1))
        all_uvf.append(uv_faces + vt_off)
        v_off += len(verts)
        vt_off += len(uv_verts)
        y_off += h
    save_obj(
        path,
        np.concatenate(all_v), np.concatenate(all_f),
        verts_uvs=np.concatenate(all_uv), faces_uvs=np.concatenate(all_uvf),
        texture_map=atlas,
    )
