"""BlendedMVS loader (reference: src/dataset/bmvs.py) — same IDR camera
layout as DTU, no GT point cloud, val capped at 5 / test at 10 views."""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..render.cameras import camera_from_opencv_projection
from ..utils.misc import get_files_from, path_exists
from ..utils.path import DATASETS_PATH
from .base import IMG_EXTENSIONS, MultiViewDataset, load_image

RAW_IMG_SIZE = (576, 768)


def load_bmvs(split, img_size, tag, view_ids=None, root=None, **kwargs):
    assert not kwargs, f"unknown bmvs dataset keys: {kwargs}"
    # Path() so a YAML-config string root works (cfg['dataset']['root'])
    root = Path(root) if root else (DATASETS_PATH / "BlendedMVS")
    data_path = path_exists(root / tag / "image")
    files = get_files_from(data_path, IMG_EXTENSIONS, recursive=True, sort=True)
    n = len(files)
    img_size = (img_size, img_size) if isinstance(img_size, int) else tuple(img_size)
    ids = list(view_ids) if view_ids is not None else list(range(n))
    if split == "val":
        ids = ids[: min(5, len(ids))]
    elif split == "test":
        ids = ids[: min(10, len(ids))]

    cam = np.load(data_path.parent / "cameras.npz")
    K_list, R_list, T_list = [], [], []
    for i in ids:
        P = (cam[f"world_mat_{i}"] @ cam[f"scale_mat_{i}"])[:3, :4]
        K, R, T = camera_from_opencv_projection(P, RAW_IMG_SIZE)
        K_list.append(K), R_list.append(R), T_list.append(T)
    imgs = np.stack([load_image(files[i], img_size) for i in ids])
    return MultiViewDataset(
        imgs, np.stack(K_list), np.stack(R_list), np.stack(T_list),
        pc_gt=None, tag=tag, name="bmvs",
    )
