"""SSIM with 11x11 gaussian window (reference: src/model/loss.py:119-156).

Implemented with depthwise ``lax.conv_general_dilated`` (maps straight onto
the TPU convolution units). Images are (B, H, W, C) in [0, 1]; returns the
per-image DISSIMILARITY 1 - SSIM like the reference's forward."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_window(window_size=11, sigma=1.5):
    g = np.exp(
        -((np.arange(window_size) - window_size // 2) ** 2) / (2 * sigma**2)
    )
    g = g / g.sum()
    w2d = np.outer(g, g).astype(np.float32)
    return jnp.asarray(w2d)


def _depthwise_conv(x, w2d, channels, padding):
    # x: (B, H, W, C); w2d: (k, k) -> depthwise filters (k, k, 1, C)
    k = w2d.shape[0]
    filt = jnp.broadcast_to(w2d[:, :, None, None], (k, k, 1, channels))
    # HIGHEST precision is load-bearing on TPU: the default bf16 conv makes
    # the variance estimate conv(x*x) - mu*mu catastrophically cancel
    # (bf16 has ~3 significant digits; s1/s2 come out NEGATIVE at the
    # -1e-2 scale >> c2 = 9e-4), which drives the SSIM map outside [-1, 1]
    # (measured: "SSIM=1.442" in a real TPU eval). f32 MXU passes cost
    # microseconds at metric-eval rates.
    return jax.lax.conv_general_dilated(
        x,
        filt,
        window_strides=(1, 1),
        padding=[(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=channels,
        precision=jax.lax.Precision.HIGHEST,
    )


def ssim_loss(img1, img2, window_size=11, padding=True):
    """Per-image 1 - SSIM map mean: (B,) array."""
    C = img1.shape[-1]
    w = _gaussian_window(window_size)
    pad = window_size // 2 if padding else 0
    conv = partial(_depthwise_conv, w2d=w, channels=C, padding=pad)
    mu1, mu2 = conv(img1), conv(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = conv(img1 * img1) - mu1_sq
    s2 = conv(img2 * img2) - mu2_sq
    s12 = conv(img1 * img2) - mu12
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu12 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)
    )
    return (1.0 - ssim_map).reshape(img1.shape[0], -1).mean(axis=1)


class SSIM:
    """Callable wrapper mirroring the reference's SSIMLoss module."""

    def __init__(self, window_size=11, padding=True):
        self.window_size = window_size
        self.padding = padding

    def __call__(self, img1, img2):
        return ssim_loss(img1, img2, self.window_size, self.padding)
