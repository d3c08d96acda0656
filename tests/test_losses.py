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
        assert get_loss("ssim") is SSIM


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
        feats = vgg(x, max_level=5)
        assert len(feats) == 5
        assert feats[0].shape == (1, 64, 64, 64)   # relu1_2
        assert feats[2].shape == (1, 16, 16, 256)  # relu3_3
        assert feats[4].shape == (1, 4, 4, 512)    # relu5_3

    def test_perceptual_zero_for_identical(self):
        p = PerceptualLoss(vgg=VGG16Features(seed=0))
        img = jnp.asarray(np.random.default_rng(0).random((1, 32, 32, 3)),
                          jnp.float32)
        assert float(p(img, img)) == pytest.approx(0.0, abs=1e-6)
        other = jnp.asarray(np.random.default_rng(1).random((1, 32, 32, 3)),
                            jnp.float32)
        assert float(p(img, other)) > 0

    def test_perceptual_grad_flows(self):
        p = PerceptualLoss(vgg=VGG16Features(seed=0))
        img = jnp.full((1, 32, 32, 3), 0.3)

        g = jax.grad(lambda r: p(img, r))(jnp.full((1, 32, 32, 3), 0.7))
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0

    def test_lpips_runs(self):
        l = LPIPSLoss(vgg=VGG16Features(seed=0))
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
