"""Dataset loaders + official DTU eval on a synthetic on-disk scan."""

import numpy as np
import pytest
from PIL import Image

from dbw_tpu.data.base import Loader, MultiViewDataset
from dbw_tpu.data.dtu import load_dtu
from dbw_tpu.data.bmvs import load_bmvs
from dbw_tpu.utils.obj_io import save_ply
from dbw_tpu.ops.icosphere import icosphere


def make_fake_idr_scan(root, name, tag, n_views=4, hw=(24, 32),
                       with_points=True):
    """Minimal IDR-layout scan: image/ + cameras.npz (+ DTU Points)."""
    scan = root / name / tag
    (scan / "image").mkdir(parents=True)
    rng = np.random.default_rng(0)
    H, W = hw
    cams = {}
    for i in range(n_views):
        img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(scan / "image" / f"{i:06d}.png")
        K = np.array(
            [[400.0, 0, W * 18], [0, 400.0, H * 18], [0, 0, 1.0]]
        )  # raw-size intrinsics (loaders assume raw 1200x1600 / 576x768)
        angle = i * 0.3
        R = np.array(
            [
                [np.cos(angle), 0, np.sin(angle)],
                [0, 1, 0],
                [-np.sin(angle), 0, np.cos(angle)],
            ]
        )
        t = np.array([0.1 * i, 0.0, 3.0])
        P = K @ np.concatenate([R, t[:, None]], 1)
        world_mat = np.eye(4)
        world_mat[:3, :4] = P
        cams[f"world_mat_{i}"] = world_mat
        cams[f"scale_mat_{i}"] = np.eye(4)
    np.savez(scan / "cameras.npz", **cams)
    if with_points:
        pts_dir = root / name / "Points" / "stl"
        pts_dir.mkdir(parents=True, exist_ok=True)
        num = tag.replace("scan", "").zfill(3)
        pts = rng.random((500, 3)).astype(np.float32)
        save_ply(pts_dir / f"stl{num}_total.ply", pts)
    return scan


class TestDTULoader:
    def test_load(self, tmp_path):
        make_fake_idr_scan(tmp_path, "DTU", "scan1")
        ds = load_dtu("train", (24, 32), "scan1", root=tmp_path / "DTU")
        assert len(ds) == 4
        assert ds.imgs.shape == (4, 24, 32, 3)
        assert ds.K.shape == (4, 4, 4)
        assert ds.R.shape == (4, 3, 3)
        assert np.isfinite(ds.pc_gt).all() and len(ds.pc_gt) == 500
        # rotations orthonormal
        eye = np.einsum("nij,nkj->nik", ds.R, ds.R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (4, 3, 3)),
                                   atol=1e-4)

    def test_split_shuffle_deterministic(self, tmp_path):
        make_fake_idr_scan(tmp_path, "DTU", "scan1")
        d1 = load_dtu("val", (24, 32), "scan1", root=tmp_path / "DTU")
        d2 = load_dtu("val", (24, 32), "scan1", root=tmp_path / "DTU")
        np.testing.assert_array_equal(d1.imgs, d2.imgs)

    def test_loader_batching(self, tmp_path):
        make_fake_idr_scan(tmp_path, "DTU", "scan1")
        ds = load_dtu("train", (24, 32), "scan1", root=tmp_path / "DTU")
        loader = Loader(ds, batch_size=3, shuffle=True, seed=0)
        batches = list(loader)
        assert len(batches) == 2
        assert batches[0][0]["imgs"].shape[0] == 3
        assert batches[1][0]["imgs"].shape[0] == 1


class TestBMVSLoader:
    def test_load_and_split_caps(self, tmp_path):
        make_fake_idr_scan(tmp_path, "BlendedMVS", "scan2", n_views=12,
                           with_points=False)
        tr = load_bmvs("train", (24, 32), "scan2", root=tmp_path / "BlendedMVS")
        va = load_bmvs("val", (24, 32), "scan2", root=tmp_path / "BlendedMVS")
        te = load_bmvs("test", (24, 32), "scan2", root=tmp_path / "BlendedMVS")
        assert len(tr) == 12 and len(va) == 5 and len(te) == 10
        assert (va.pc_gt == 0).all()  # no GT cloud


class TestDTUOfficialEval:
    def test_protocol_end_to_end(self, tmp_path):
        """Run evaluate_mesh on a synthetic mesh whose surface IS the GT
        cloud -> chamfer must be near zero; a shifted mesh must be worse."""
        from scipy.io import savemat

        from dbw_tpu.eval.dtu_eval import evaluate_mesh
        from dbw_tpu.eval.metrics import sample_points_from_mesh

        scan_id = 7
        root = tmp_path / "DTU"
        (root / "ObsMask").mkdir(parents=True)
        (root / "Points" / "stl").mkdir(parents=True)

        v, f = icosphere(2)
        v = v * 20.0  # DTU scale is mm
        gt = sample_points_from_mesh(v, f, 30000)
        save_ply(root / "Points" / "stl" / f"stl{scan_id:03}_total.ply", gt)

        # ObsMask grid covering everything; Res 1mm
        bb = np.array([[-30.0, -30.0, -30.0], [30.0, 30.0, 30.0]])
        shape = (60, 60, 60)
        savemat(
            root / "ObsMask" / f"ObsMask{scan_id}_10.mat",
            {"ObsMask": np.ones(shape, np.uint8), "BB": bb, "Res": np.array([[1.0]])},
        )
        # ground plane far below -> keeps all GT points
        savemat(
            root / "ObsMask" / f"Plane{scan_id}.mat",
            {"P": np.array([[0.0], [0.0], [1.0], [100.0]])},
        )

        out = tmp_path / "out"
        out.mkdir()
        res = evaluate_mesh(v, f, scan_id, root, out, save_viz=True)
        assert res["avg"] < 0.5
        assert (out / "dtu_scores.tsv").exists()
        assert (out / f"vis_{scan_id:03}_d2s.ply").exists()

        res_shift = evaluate_mesh(
            v + np.array([5.0, 0, 0]), f, scan_id, root, out, suffix="_s",
            save_viz=False,
        )
        assert res_shift["avg"] > res["avg"] + 1.0


class TestNerfstudioLoader:
    def test_load_transforms_json(self, tmp_path):
        import json

        from dbw_tpu.data.nerfstudio import load_nerfstudio

        base = tmp_path / "ns" / "scene"
        (base / "images").mkdir(parents=True)
        rng = np.random.default_rng(0)
        H, W = 32, 48
        frames = []
        for i in range(3):
            name = f"images/frame_{i:05d}.png"
            Image.fromarray(
                (rng.random((H, W, 3)) * 255).astype(np.uint8)
            ).save(base / name)
            angle = 0.4 * i
            c2w = np.eye(4)
            c2w[:3, :3] = np.array(
                [
                    [np.cos(angle), 0, np.sin(angle)],
                    [0, 1, 0],
                    [-np.sin(angle), 0, np.cos(angle)],
                ]
            )
            c2w[:3, 3] = [0.1 * i, 0.0, 2.0]
            frames.append({"file_path": name, "transform_matrix": c2w.tolist()})
        meta = {
            "fl_x": 40.0, "fl_y": 41.0, "cx": W / 2, "cy": H / 2,
            "w": W, "h": H, "frames": frames,
        }
        (base / "transforms.json").write_text(json.dumps(meta))

        ds = load_nerfstudio("train", (H, W), "scene", root=tmp_path / "ns")
        assert len(ds) == 3
        assert ds.imgs.shape == (3, H, W, 3)
        eye = np.einsum("nij,nkj->nik", ds.R, ds.R)
        np.testing.assert_allclose(
            eye, np.broadcast_to(np.eye(3), (3, 3, 3)), atol=1e-5
        )
        # val split empty (reference nerfstudio.py:88-89)
        dval = load_nerfstudio("val", (H, W), "scene", root=tmp_path / "ns")
        assert len(dval) == 0

    def test_c2w_conversion_roundtrips_look_at(self):
        """OpenGL c2w -> internal (R, T) must invert our own camera math:
        build c2w from look_at_rotation, convert back, compare."""
        import jax.numpy as jnp

        from dbw_tpu.data.nerfstudio import _c2w_to_internal
        from dbw_tpu.ops.rotations import look_at_rotation

        R0, T0 = look_at_rotation(3.0, 20.0, jnp.asarray([35.0, -60.0]))
        S = np.diag([-1.0, 1.0, -1.0])
        for i in range(2):
            R = np.asarray(R0[i], np.float64)
            T = np.asarray(T0[i], np.float64)
            w2c_gl = S @ R.T
            t_gl = S @ T
            c2w = np.eye(4)
            c2w[:3, :3] = np.linalg.inv(w2c_gl)
            c2w[:3, 3] = -np.linalg.inv(w2c_gl) @ t_gl
            R_i, T_i = _c2w_to_internal(c2w)
            np.testing.assert_allclose(R_i, R, atol=1e-5)
            np.testing.assert_allclose(T_i, T, atol=1e-5)

    def test_trained_pipeline_path_with_mock(self, tmp_path, monkeypatch):
        """Reference-parity path (nerfstudio.py:36,81-86) with a mocked
        nerfstudio package: cameras/images from the pipeline datamanager,
        GT point cloud generated from the NeRF."""
        import sys
        import types

        from dbw_tpu.data.nerfstudio import load_nerfstudio

        H, W = 24, 32
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        rng = np.random.default_rng(0)
        files = []
        c2ws = []
        for i in range(4):
            p = img_dir / f"f{i}.png"
            Image.fromarray(
                (rng.random((H, W, 3)) * 255).astype(np.uint8)
            ).save(p)
            files.append(p)
            c2w = np.eye(4)[:3]
            c2w[:3, 3] = [0.0, 0.0, 2.0 + i]
            c2ws.append(c2w)

        class Cameras:
            fx = np.array([40.0]); fy = np.array([41.0])
            cx = np.array([W / 2]); cy = np.array([H / 2])
            width = np.array([W]); height = np.array([H])
            camera_to_worlds = np.stack(c2ws)

        outputs = types.SimpleNamespace(
            image_filenames=files, cameras=Cameras()
        )
        dataset = types.SimpleNamespace(_dataparser_outputs=outputs)
        pipeline = types.SimpleNamespace(
            datamanager=types.SimpleNamespace(
                train_dataset=dataset, eval_dataset=dataset
            )
        )
        calls = {}

        def eval_setup(cfg_path):
            calls["config"] = cfg_path
            return None, pipeline, None

        def generate_point_cloud(pipeline, bounding_box_min, bounding_box_max):
            calls["bbox"] = (bounding_box_min, bounding_box_max)
            return types.SimpleNamespace(points=rng.random((500, 3)))

        ns = types.ModuleType("nerfstudio")
        ns_utils = types.ModuleType("nerfstudio.utils")
        ns_eval = types.ModuleType("nerfstudio.utils.eval_utils")
        ns_eval.eval_setup = eval_setup
        ns_exp = types.ModuleType("nerfstudio.exporter")
        ns_exp_utils = types.ModuleType("nerfstudio.exporter.exporter_utils")
        ns_exp_utils.generate_point_cloud = generate_point_cloud
        for name, mod in [
            ("nerfstudio", ns), ("nerfstudio.utils", ns_utils),
            ("nerfstudio.utils.eval_utils", ns_eval),
            ("nerfstudio.exporter", ns_exp),
            ("nerfstudio.exporter.exporter_utils", ns_exp_utils),
        ]:
            monkeypatch.setitem(sys.modules, name, mod)

        model_dir = tmp_path / "outputs" / "scene" / "nerfacto" / "run0"
        model_dir.mkdir(parents=True)
        (model_dir / "config.yml").write_text("x: 1")

        # explicit model_dir
        ds = load_nerfstudio("train", (H, W), "scene", root=tmp_path,
                             model_dir=model_dir)
        assert len(ds) == 4 and ds.imgs.shape == (4, H, W, 3)
        assert len(ds.pc_gt) == 500
        assert calls["bbox"] == ((-4.0,) * 3, (4.0,) * 3)
        assert str(calls["config"]).endswith("config.yml")
        # auto-discovery under <root>/outputs/<tag>
        ds2 = load_nerfstudio("train", (H, W), "scene", root=tmp_path)
        assert len(ds2) == 4
        # test split: deterministic seeded shuffle (reference use_seed(len(tag)))
        t1 = load_nerfstudio("test", (H, W), "scene", root=tmp_path)
        t2 = load_nerfstudio("test", (H, W), "scene", root=tmp_path)
        np.testing.assert_array_equal(t1.T, t2.T)
        # the order must be exactly the reference's use_seed(len(tag)) shuffle
        from dbw_tpu.utils.misc import use_seed

        ids = list(range(4))
        with use_seed(len("scene")):
            np.random.shuffle(ids)
        np.testing.assert_allclose(t1.T, ds.T[ids], atol=1e-6)


class TestSyntheticGTGeometry:
    def test_gt_points_lie_on_anisotropic_block_surface(self):
        """sample_gt_points must be geometrically consistent with the
        rendered blocks for ANISOTROPIC scales (regression: the sample_sq
        axis permutation must carry the scale components with it)."""
        import jax
        import jax.numpy as jnp

        from dbw_tpu.data.synthetic import sample_gt_points
        from dbw_tpu.models.dbw import BlocksWorld, Phase

        m = BlocksWorld(
            (16, 24),
            mesh=dict(n_blocks=1, txt_size=16),
            renderer=dict(faces_per_pixel=2),
            rend_optim=dict(decouple_rendering=True),
        )
        K = np.zeros((4, 4), np.float32)
        K[0, 0] = K[1, 1] = 2.0
        m.set_camera(K)
        params = m.init_params(0)
        # strongly anisotropic: up-axis scale 4x the others
        params = params._replace(
            S=jnp.log(jnp.asarray([[0.5, 2.0, 0.5]])),
            T=jnp.zeros((1, 3)),
            R_6d=jnp.asarray([[1.0, 0, 0, 0, 1.0, 0]]),
        )
        phase = Phase.eval_phase()
        scene, _ = m.build_blocks(params, phase)
        verts = np.asarray(scene.verts)
        pts = np.asarray(sample_gt_points(m, params, n_points=500))
        # each GT sample must be close to SOME mesh vertex (icosphere level
        # 1 edge length ~ 0.5 * local radius; axis swap would put points
        # ~3x scale away)
        d = np.linalg.norm(pts[:, None] - verts[None], axis=-1).min(1)
        scale_span = np.abs(verts).max()
        assert d.max() < 0.35 * scale_span, (d.max(), scale_span)


class TestSyntheticGTKnobs:
    def test_gt_scale_grows_block_footprint(self):
        """The divergence-demo knobs (gt_n_blocks / gt_scale / gt_dist,
        VERDICT r3 #9): a larger gt_scale must grow the GT block's image
        footprint, and the knobs must flow through load_synthetic."""
        from dbw_tpu.data.synthetic import load_synthetic, make_synthetic_scene

        fracs = []
        for sc in (1.0, 2.2):
            ds, _, _ = make_synthetic_scene(
                (32, 40), n_views=4, n_blocks=1, seed=3, block_scale=sc
            )
            bg = ds.imgs[:, 0, 0, :]
            fracs.append(
                (np.abs(ds.imgs - bg[:, None, None, :]).max(-1) > 0.05).mean()
            )
        assert fracs[1] > 1.3 * fracs[0], fracs

        ds = load_synthetic(
            "train", (32, 40), n_views=4, seed=3,
            gt_n_blocks=1, gt_scale=2.2, gt_dist=3.0,
        )
        bg = ds.imgs[:, 0, 0, :]
        frac = (np.abs(ds.imgs - bg[:, None, None, :]).max(-1) > 0.05).mean()
        assert abs(frac - fracs[1]) < 1e-6, (frac, fracs[1])
