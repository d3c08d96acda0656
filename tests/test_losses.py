"""Loss stack tests: SSIM, VGG perceptual, LPIPS, weight loading."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dbw_tpu.losses import get_loss, mse_loss
from dbw_tpu.losses.basic import mse2psnr, total_variation, tv_norm_funcs
from dbw_tpu.losses.ssim import SSIM, ssim_loss
from dbw_tpu.losses.vgg import (
    LPIPSLoss,
    PerceptualLoss,
    VGG16Features,
    _CFG,
)


class TestBasics:
    def test_mse2psnr(self):
        assert float(mse2psnr(jnp.float32(0.01))) == pytest.approx(20.0)

    def test_tv_norms(self):
        t = jnp.asarray([[3.0, 4.0]])
        assert float(tv_norm_funcs["l1"](t)[0]) == pytest.approx(7.0)
        assert float(tv_norm_funcs["l2"](t)[0]) == pytest.approx(5.0)
        assert float(tv_norm_funcs["l2sq"](t)[0]) == pytest.approx(25.0)

    def test_total_variation_flat_zero(self):
        img = jnp.full((1, 8, 8, 3), 0.7)
        assert float(total_variation(img)) == 0.0

    def test_registry(self):
        assert get_loss("mse") is mse_loss
        # class entries come back instantiated: directly callable on (imgs, rec)
        assert isinstance(get_loss("ssim"), SSIM)


class TestSSIM:
    def test_identical_images(self):
        img = jnp.asarray(np.random.default_rng(0).random((2, 16, 16, 3)),
                          jnp.float32)
        out = ssim_loss(img, img)
        np.testing.assert_allclose(out, 0.0, atol=1e-4)

    def test_different_images_positive(self):
        rng = np.random.default_rng(1)
        a = jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)
        b = jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)
        assert float(ssim_loss(a, b).mean()) > 0.1

    def test_padding_flag_changes_shape_only(self):
        img = jnp.ones((1, 16, 16, 3)) * 0.5
        assert float(ssim_loss(img, img, padding=False).mean()) == pytest.approx(
            0.0, abs=1e-5
        )


class TestVGG:
    def test_feature_shapes(self):
        vgg = VGG16Features(seed=0)
        x = jnp.zeros((1, 64, 64, 3))
        feats = jax.jit(lambda xx: vgg(xx, max_level=5))(x)
        assert len(feats) == 5
        assert feats[0].shape == (1, 64, 64, 64)   # relu1_2
        assert feats[2].shape == (1, 16, 16, 256)  # relu3_3
        assert feats[4].shape == (1, 4, 4, 512)    # relu5_3

    def test_perceptual_zero_for_identical(self):
        p = PerceptualLoss(vgg=VGG16Features(seed=0))
        img = jnp.asarray(np.random.default_rng(0).random((1, 32, 32, 3)),
                          jnp.float32)
        pj = jax.jit(p)
        assert float(pj(img, img)) == pytest.approx(0.0, abs=1e-6)
        other = jnp.asarray(np.random.default_rng(1).random((1, 32, 32, 3)),
                            jnp.float32)
        assert float(pj(img, other)) > 0

    def test_perceptual_grad_flows(self):
        p = PerceptualLoss(vgg=VGG16Features(seed=0))
        img = jnp.full((1, 32, 32, 3), 0.3)

        g = jax.jit(jax.grad(lambda r: p(img, r)))(jnp.full((1, 32, 32, 3), 0.7))
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0

    def test_lpips_runs(self):
        l = jax.jit(LPIPSLoss(vgg=VGG16Features(seed=0)))
        a = jnp.zeros((1, 32, 32, 3))
        b = jnp.ones((1, 32, 32, 3))
        assert float(l(a, a)) == pytest.approx(0.0, abs=1e-6)
        assert float(l(a, b)) > 0

    def test_load_torch_state_dict(self, tmp_path):
        torch = pytest.importorskip("torch")
        # fabricate a torchvision-layout checkpoint
        sd = {}
        li, c_in = 0, 3
        for c in _CFG:
            if c == "M":
                li += 1
                continue
            sd[f"features.{li}.weight"] = torch.randn(c, c_in, 3, 3)
            sd[f"features.{li}.bias"] = torch.randn(c)
            li += 2
            c_in = c
        path = tmp_path / "vgg16.pth"
        torch.save(sd, path)
        ws = VGG16Features.load_torch_state_dict(path)
        vgg = VGG16Features(ws)
        assert vgg.pretrained
        np.testing.assert_allclose(
            np.asarray(vgg.weights[0][0]),
            sd["features.0.weight"].numpy().transpose(2, 3, 1, 0),
            atol=1e-6,
        )
        out = vgg(jnp.zeros((1, 32, 32, 3)), max_level=1)
        assert out[0].shape == (1, 32, 32, 64)

    def test_env_or_random_fallback(self, monkeypatch):
        monkeypatch.delenv("DBW_VGG_WEIGHTS", raising=False)
        vgg = VGG16Features.from_env_or_random(seed=3)
        assert not vgg.pretrained


class TestWeightConversion:
    """scripts/convert_vgg.py: torch checkpoints -> .npz artifacts
    (VERDICT r1 item #6)."""

    def _fake_vgg16_sd(self, rng):
        import torch

        from dbw_tpu.losses.vgg import _CFG

        sd, li, c_in = {}, 0, 3
        for c in _CFG:
            if c == "M":
                li += 1
                continue
            sd[f"features.{li}.weight"] = torch.from_numpy(
                rng.standard_normal((c, c_in, 3, 3)).astype(np.float32) * 0.05
            )
            sd[f"features.{li}.bias"] = torch.from_numpy(
                rng.standard_normal(c).astype(np.float32) * 0.01
            )
            li += 2
            c_in = c
        return sd

    def test_vgg_roundtrip_matches_torch_loader(self, tmp_path):
        import sys

        import torch

        sys.path.insert(0, "scripts")
        from convert_vgg import convert_vgg

        from dbw_tpu.losses.vgg import VGG16Features

        rng = np.random.default_rng(0)
        pth = tmp_path / "vgg16.pth"
        torch.save(self._fake_vgg16_sd(rng), pth)
        npz = tmp_path / "vgg16.npz"
        convert_vgg(pth, npz)

        v_t = VGG16Features(VGG16Features.load_torch_state_dict(pth))
        v_n = VGG16Features(VGG16Features.load_npz(npz))
        assert v_t.pretrained and v_n.pretrained
        x = jnp.asarray(rng.random((1, 32, 32, 3), np.float32))
        f_t = v_t(x, max_level=3)
        f_n = v_n(x, max_level=3)
        for a, b in zip(f_t, f_n):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_lpips_lins_conversion_and_label(self, tmp_path, monkeypatch):
        import sys

        import torch

        sys.path.insert(0, "scripts")
        from convert_vgg import convert_lpips

        from dbw_tpu.losses.vgg import LPIPSLoss, VGG16Features

        rng = np.random.default_rng(1)
        chans = [64, 128, 256, 512, 512]
        sd = {
            f"lin{i}.model.1.weight": torch.from_numpy(
                rng.random((1, c, 1, 1)).astype(np.float32)
            )
            for i, c in enumerate(chans)
        }
        pth = tmp_path / "lpips.pth"
        torch.save(sd, pth)
        npz = tmp_path / "lpips_lin.npz"
        convert_lpips(pth, npz)

        # random VGG -> labeled fallback regardless of lins
        l_rand = LPIPSLoss()
        assert l_rand.label == "LPIPS_randvgg"
        # pretrained VGG without lins -> uniform label
        fake_w = VGG16Features._random_weights(0)
        l_uni = LPIPSLoss(vgg=VGG16Features(fake_w))
        assert l_uni.label == "LPIPS_uniform"
        # pretrained VGG + converted lins -> the real column name
        l_full = LPIPSLoss(vgg=VGG16Features(fake_w), lin_path=str(npz))
        assert l_full.label == "LPIPS"
        assert len(l_full.lins) == 5 and l_full.lins[2].shape == (256,)
        # env-var flow
        monkeypatch.setenv("DBW_LPIPS_WEIGHTS", str(npz))
        l_env = LPIPSLoss(vgg=VGG16Features(fake_w))
        assert l_env.label == "LPIPS"
        # weighted LPIPS still runs
        x = jnp.asarray(rng.random((1, 16, 16, 3), np.float32))
        y = jnp.asarray(rng.random((1, 16, 16, 3), np.float32))
        val = float(l_full(x, y))
        assert np.isfinite(val) and val > 0
