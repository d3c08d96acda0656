"""Visualization / reporting utilities."""

import numpy as np

from dbw_tpu.utils.html import gallery_from_run_dir, write_gallery
from dbw_tpu.utils.image import (
    MAX_GIF_FRAMES, ImageLogger, convert_to_img, save_gif, save_video,
)
from dbw_tpu.utils.visualizer import Visualizer


class TestImage:
    def test_convert_layouts(self):
        hwc = np.random.default_rng(0).random((8, 6, 3)).astype(np.float32)
        img = convert_to_img(hwc)
        assert img.size == (6, 8)
        chw = np.transpose(hwc, (2, 0, 1))
        assert convert_to_img(chw).size == (6, 8)
        gray = hwc[..., 0]
        assert convert_to_img(gray).mode == "L"

    def test_image_logger_stream(self, tmp_path):
        targets = np.random.default_rng(0).random((2, 8, 8, 3)).astype(np.float32)
        logger = ImageLogger(tmp_path / "rec", target_images=targets)
        assert (tmp_path / "rec" / "img0" / "input.png").exists()
        for it in [1, 2, 3]:
            logger.save(targets, it)
        logger.save_gif(rmtree=True)
        assert (tmp_path / "rec" / "img0" / "evolution.gif").exists()
        assert not (tmp_path / "rec" / "img0" / "evolution").exists()

    def test_save_gif(self, tmp_path):
        d = tmp_path / "frames"
        d.mkdir()
        for i in range(3):
            convert_to_img(np.full((8, 8, 3), i / 3)).save(d / f"{i}.jpg")
        save_gif(d, "out.gif")
        assert (tmp_path / "out.gif").exists()

    def test_save_video_gif_fallback_caps_frames(self, tmp_path):
        # no ffmpeg in this env -> GIF fallback; a long trajectory must be
        # strided to <= MAX_GIF_FRAMES with playback time preserved
        from PIL import Image

        n, fps = 4 * MAX_GIF_FRAMES, 24
        frames = np.stack([np.full((8, 8, 3), i / n) for i in range(n)])
        save_video(frames, name=str(tmp_path / "traj.mp4"), fps=fps)
        if (tmp_path / "traj.mp4").exists():  # ffmpeg present: no fallback
            import pytest

            pytest.skip("mp4 encoder available; GIF fallback not exercised")
        out = tmp_path / "traj.gif"
        assert out.exists()
        with Image.open(out) as im:
            assert im.n_frames <= MAX_GIF_FRAMES
            # duration scaled by the stride: real-time playback (GIF
            # stores durations in 10ms ticks -> compare coarsely)
            assert abs(im.info["duration"] - 1000 * 4 / fps) <= 10


class TestVisualizer:
    def test_noop_when_disabled(self, tmp_path):
        v = Visualizer(None, tmp_path)
        v.upload_images(np.zeros((2, 4, 4, 3)), "x")  # must not raise
        assert not (tmp_path / "dashboard").exists()

    def test_dashboard_written(self, tmp_path):
        v = Visualizer(8888, tmp_path)
        v.upload_images(np.random.default_rng(0).random((4, 8, 8, 3)), "recons", 2)
        v.upload_lineplot(1, [("loss", 1.0), ("psnr", 20.0)], "train")
        v.upload_lineplot(2, [("loss", 0.5), ("psnr", 22.0)], "train")
        v.upload_barplot([("a", 1.0), ("b", 2.0)], "bars")
        v.upload_pointcloud(np.zeros((10, 3)), "pc")
        dash = tmp_path / "dashboard"
        assert (dash / "index.html").exists()
        assert (dash / "recons.png").exists()
        assert (dash / "train.png").exists()
        assert (dash / "pc.ply").exists()


class TestHTML:
    def test_write_gallery(self, tmp_path):
        (tmp_path / "a.png").write_bytes(b"")
        out = write_gallery(tmp_path / "g.html", [["a.png"]], title="t")
        html = out.read_text()
        assert "a.png" in html and "<table>" in html

    def test_gallery_from_run_dir(self, tmp_path):
        convert_to_img(np.zeros((4, 4, 3))).save(tmp_path / "x.png")
        out = gallery_from_run_dir(tmp_path)
        assert out.exists()
        assert "x.png" in out.read_text()


class TestDevicePack:
    """utils/device_pack.py: one-buffer checkpoint snapshots must be
    bitwise round-trippable for every dtype the (params, opt_state) trees
    contain."""

    def test_roundtrip_bitwise(self):
        import jax
        import jax.numpy as jnp
        from dbw_tpu.utils.device_pack import make_packer

        rng = np.random.default_rng(0)
        tree = {
            "w": jnp.asarray(rng.standard_normal((3, 5), np.float32)),
            "nested": (
                jnp.asarray(rng.integers(-9, 9, (7,)), jnp.int32),
                jnp.asarray(np.float32(3.25)),  # scalar leaf
            ),
            "flags": jnp.asarray([True, False, True]),
        }
        pack, unpack = make_packer(tree)
        buf = pack(tree)
        assert buf.dtype == jnp.uint8 and buf.ndim == 1
        out = unpack(np.asarray(buf))
        flat_in = jax.tree_util.tree_leaves(tree)
        flat_out = jax.tree_util.tree_leaves(out)
        assert len(flat_in) == len(flat_out)
        for a, b in zip(flat_in, flat_out):
            a = np.asarray(a)
            assert a.dtype == b.dtype and a.shape == b.shape
            assert np.array_equal(a, b)

    def test_fresh_buffer_is_donation_safe(self):
        import jax.numpy as jnp
        from dbw_tpu.utils.device_pack import make_packer

        tree = {"x": jnp.arange(4, dtype=jnp.float32)}
        pack, unpack = make_packer(tree)
        buf = pack(tree)
        # the packed buffer must not alias the live leaf: mutating the
        # "live" state (simulated by a fresh overwrite) cannot change it
        before = np.asarray(buf).copy()
        tree["x"] = tree["x"] * 0 - 1
        assert np.array_equal(np.asarray(buf), before)
