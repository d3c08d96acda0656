"""DTU dataset loader (reference: src/dataset/dtu.py).

IDR-convention layout: ``datasets/DTU/<scanXX>/image/*.png`` +
``cameras.npz`` with per-view ``world_mat_i`` / ``scale_mat_i``; GT point
clouds at ``datasets/DTU/Points/stl/stlXXX_total.ply`` normalized by the
inverse scale matrix. All host-side numpy."""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..render.cameras import camera_from_opencv_projection
from ..utils.misc import get_files_from, path_exists, use_seed
from ..utils.path import DATASETS_PATH
from ..utils.obj_io import load_ply
from .base import IMG_EXTENSIONS, MultiViewDataset, load_image

EVAL_SCAN_IDS = [f"scan{i}" for i in [24, 31, 40, 45, 55, 59, 63, 75, 83, 105]]
RAW_IMG_SIZE = (1200, 1600)


def load_dtu(split, img_size, tag, view_ids=None, root=None, **kwargs):
    assert not kwargs, f"unknown dtu dataset keys: {kwargs}"
    # Path() so a YAML-config string root works (cfg['dataset']['root'])
    root = Path(root) if root else (DATASETS_PATH / "DTU")
    data_path = path_exists(root / tag / "image")
    files = get_files_from(data_path, IMG_EXTENSIONS, recursive=True, sort=True)
    n = len(files)
    img_size = (img_size, img_size) if isinstance(img_size, int) else tuple(img_size)

    ids = list(range(n)) if (split == "test" or view_ids is None) else list(view_ids)
    if split != "train":
        # deterministic shuffle keyed on split+tag (reference dtu.py:38-40)
        with use_seed(len(split + tag)):
            np.random.shuffle(ids)

    cam = np.load(data_path.parent / "cameras.npz")
    K_list, R_list, T_list = [], [], []
    for i in ids:
        P = (cam[f"world_mat_{i}"] @ cam[f"scale_mat_{i}"])[:3, :4]
        K, R, T = camera_from_opencv_projection(P, RAW_IMG_SIZE)
        K_list.append(K), R_list.append(R), T_list.append(T)

    imgs = np.stack([load_image(files[i], img_size) for i in ids])

    scan_num = tag.replace("scan", "").zfill(3)
    ply_path = root / "Points" / "stl" / f"stl{scan_num}_total.ply"
    scale_mat = cam["scale_mat_0"].astype(np.float32)
    if ply_path.exists():
        points = load_ply(ply_path)
        inv = np.linalg.inv(scale_mat)
        pc_gt = points @ inv[:3, :3].T + inv[:3, 3]
    else:
        pc_gt = None

    ds = MultiViewDataset(
        imgs, np.stack(K_list), np.stack(R_list), np.stack(T_list),
        pc_gt=pc_gt, scale_mat=scale_mat, tag=tag, name="dtu",
    )
    return ds
