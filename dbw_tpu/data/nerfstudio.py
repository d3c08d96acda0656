"""Nerfstudio capture loader (reference: src/dataset/nerfstudio.py).

The reference loads a *trained nerfacto pipeline* to (a) read the camera
trajectory and (b) generate a pseudo-GT point cloud from the NeRF. That
path requires the nerfstudio package (not available here), so this loader
supports the standard ``transforms.json`` layout that nerfstudio data
processing produces (colmap-style poses + intrinsics) and leaves the
NeRF-generated point cloud as an optional ``point_cloud.ply`` file next to
it. Conversion: cam2world OpenGL-style c2w -> internal convention with the
same sign flips the reference applies (nerfstudio.py:70-77)."""

from __future__ import annotations

import json

import numpy as np

from ..utils.misc import path_exists
from ..utils.path import DATASETS_PATH
from ..utils.obj_io import load_ply
from .base import MultiViewDataset, load_image


def load_nerfstudio(split, img_size=None, tag="", downscale_factor=1,
                    root=None, **kwargs):
    kwargs.pop("view_ids", None)
    assert not kwargs, f"unknown nerfstudio dataset keys: {kwargs}"
    root = root or (DATASETS_PATH / "nerfstudio")
    base = path_exists(root / tag)
    meta = json.loads((base / "transforms.json").read_text())

    fl_x, fl_y = meta["fl_x"], meta["fl_y"]
    cx, cy = meta["cx"], meta["cy"]
    W, H = int(meta["w"]), int(meta["h"])
    out_hw = (
        (H // downscale_factor, W // downscale_factor)
        if img_size is None else tuple(img_size)
    )

    frames = sorted(meta["frames"], key=lambda f: f["file_path"])
    if split == "val":
        frames = frames[:0]  # reference: empty val split (nerfstudio.py:88-89)
    imgs, K_list, R_list, T_list = [], [], [], []
    s = min(H, W) / 2.0
    K_ndc = np.zeros((4, 4), np.float32)
    K_ndc[0, 0] = fl_x / s
    K_ndc[1, 1] = fl_y / s
    K_ndc[0, 2] = -(cx - W / 2.0) / s
    K_ndc[1, 2] = -(cy - H / 2.0) / s
    K_ndc[2, 3] = K_ndc[3, 2] = 1.0

    for fr in frames:
        c2w = np.asarray(fr["transform_matrix"], np.float64)
        # OpenGL camera (x right, y up, z backward) -> internal row-vector
        # convention with +x left, +y up, +z forward:
        R_c2w = c2w[:3, :3]
        t = c2w[:3, 3]
        # world->cam (column convention): R_wc = R_c2w.T, t_wc = -R_c2w.T t
        R_wc = R_c2w.T
        t_wc = -R_wc @ t
        # flip camera x (right->left is implicit via the NDC +x-left screen
        # flip) and z (backward->forward), matching the reference's sign
        # pattern (nerfstudio.py:70-77): negate rows 0 is NOT needed because
        # our screen +x already points left; negate rows 1,2 handled below.
        F = np.diag([-1.0, 1.0, -1.0])  # OpenGL cam -> CV cam (y down... )
        R_cv = F @ R_wc
        t_cv = F @ t_wc
        # CV cam (x right, y down, z forward) -> internal (x left, y up):
        G = np.diag([-1.0, -1.0, 1.0])
        R_int = (G @ R_cv).T  # row-vector action
        t_int = G @ t_cv
        R_list.append(R_int.astype(np.float32))
        T_list.append(t_int.astype(np.float32))
        K_list.append(K_ndc)
        imgs.append(load_image(base / fr["file_path"], out_hw))

    pc_path = base / "point_cloud.ply"
    pc = load_ply(pc_path) if pc_path.exists() else None
    if not frames:  # empty split (reference's val, nerfstudio.py:88-89)
        H2, W2 = out_hw
        return MultiViewDataset(
            np.zeros((0, H2, W2, 3), np.float32), np.zeros((0, 4, 4), np.float32),
            np.zeros((0, 3, 3), np.float32), np.zeros((0, 3), np.float32),
            pc_gt=pc, tag=tag, name="nerfstudio",
        )
    return MultiViewDataset(
        np.stack(imgs), np.stack(K_list), np.stack(R_list), np.stack(T_list),
        pc_gt=pc, tag=tag, name="nerfstudio",
    )
