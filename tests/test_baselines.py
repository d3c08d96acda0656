"""EMS / MBF baseline pipelines end-to-end on synthetic DTU fixtures
(reference: dtu_3d_process.py, ems_eval.py, mbf_eval.py)."""

import json

import numpy as np
import pytest
from scipy.io import savemat

from dbw_tpu.ops.icosphere import icosphere
from dbw_tpu.utils.obj_io import save_ply
from tests.test_datasets import make_fake_idr_scan

SCAN = "scan7"


@pytest.fixture()
def dtu_root(tmp_path):
    """Fake DTU layout: one scan + GT sphere cloud + permissive ObsMask."""
    root = tmp_path / "datasets"
    make_fake_idr_scan(root, "DTU", SCAN, with_points=False)
    v, _ = icosphere(2)
    gt = (np.asarray(v) * 20.0).astype(np.float32)
    pts_dir = root / "DTU" / "Points" / "stl"
    pts_dir.mkdir(parents=True, exist_ok=True)
    save_ply(pts_dir / "stl007_total.ply", gt)
    (root / "DTU" / "ObsMask").mkdir()
    savemat(root / "DTU" / "ObsMask" / "ObsMask7_10.mat", {
        "ObsMask": np.ones((60, 60, 60), np.uint8),
        "BB": np.array([[-30.0, -30.0, -30.0], [30.0, 30.0, 30.0]]),
        "Res": np.array([[1.0]]),
    })
    savemat(root / "DTU" / "ObsMask" / "Plane7.mat",
            {"P": np.array([[0.0], [0.0], [1.0], [100.0]])})
    return root


def _patch_paths(monkeypatch, tmp_path, dtu_root):
    import dbw_tpu.data.dtu as dtu_mod
    import dbw_tpu.eval.baselines as bl

    monkeypatch.setattr(dtu_mod, "DATASETS_PATH", dtu_root)
    monkeypatch.setattr(bl, "DATASETS_PATH", dtu_root)
    monkeypatch.setattr(bl, "EVAL_SCAN_IDS", [SCAN])
    monkeypatch.setattr(bl, "EMS_PATH", tmp_path / "external" / "ems")
    monkeypatch.setattr(bl, "MBF_PATH", tmp_path / "external" / "mbf")
    monkeypatch.setattr(bl, "N_POINTS_EVAL", 5000)
    return bl


def test_process_then_ems_eval(tmp_path, monkeypatch, dtu_root):
    bl = _patch_paths(monkeypatch, tmp_path, dtu_root)

    # 1. preprocessing: standardized cloud + scale record
    pre_dir = tmp_path / "external" / "ems" / "dtu" / "run1"
    bl.DTU3DPreprocess(pre_dir, "ems").run(seed=0)
    assert (pre_dir / f"{SCAN}.ply").exists()
    scale = np.load(pre_dir / f"{SCAN}_scale.npy")
    assert scale.shape == (4,) and scale[3] > 0

    # 2. fake EMS fit: one superquadric roughly covering the GT sphere
    #    (params: eps1, eps2, S(3), euler(3), T(3)) in the FITTER's frame
    sq = np.array([[1.0, 1.0, 20 * scale[3], 20 * scale[3], 20 * scale[3],
                    0.0, 0.0, 0.0,
                    -scale[0] * scale[3], -scale[1] * scale[3],
                    -scale[2] * scale[3]]], np.float32)
    np.save(pre_dir / f"{SCAN}_spq.npy", sq)

    ev_dir = tmp_path / "runs" / "ems" / "run1"
    bl.EMSEvaluator(ev_dir, "run1").run(seed=0)
    assert (ev_dir / f"{SCAN}_scores.tsv").exists()
    assert (ev_dir / f"dtu_scores_{SCAN}.tsv").exists()
    rows = (ev_dir / f"{SCAN}_scores.tsv").read_text().splitlines()
    names = rows[0].split("\t")
    vals = dict(zip(names, map(float, rows[1].split("\t"))))
    assert vals["n_blocks"] == 1
    # unit sphere SQ at the GT sphere's pose: chamfer-L1 x10 well under the
    # GT radius
    assert vals["chL1_acc"] < 60 and vals["chL1_comp"] < 60


def test_mbf_eval(tmp_path, monkeypatch, dtu_root):
    bl = _patch_paths(monkeypatch, tmp_path, dtu_root)

    pre_dir = tmp_path / "external" / "mbf" / "dtu" / "run1"
    bl.DTU3DPreprocess(pre_dir, "mbf").run(seed=0)
    scale = np.load(pre_dir / f"{SCAN}_scale.npy")

    # fake MBF fit: one box containing the (standardized) sphere
    h = 20 * scale[3]
    c = -scale[:3] * scale[3]
    corners = np.array([
        [x, y, z] for x in (-h, h) for y in (-h, h) for z in (-h, h)
    ]) + c
    (pre_dir / SCAN).mkdir()
    with open(pre_dir / SCAN / "UH.json", "w") as f:
        json.dump({"bbox": [corners.tolist()]}, f)

    ev_dir = tmp_path / "runs" / "mbf" / "run1"
    bl.MBFEvaluator(ev_dir, "run1").run(seed=0)
    assert (ev_dir / f"{SCAN}_scores.tsv").exists()
    assert (ev_dir / f"dtu_scores_{SCAN}.tsv").exists()
