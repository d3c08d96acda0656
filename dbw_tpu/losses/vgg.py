"""VGG16 feature stack, perceptual loss, LPIPS — pure JAX.

Replaces torchvision VGG16 + the lpips package (reference:
src/model/loss.py:32-40, 66-111). This machine has no pretrained weights
and no egress, so:

- `VGG16Features.load_torch_state_dict` / `.load_npz` ingest standard
  torchvision ``vgg16`` checkpoints (or numpy conversions) when the user
  provides one (path via config ``vgg_weights`` or $DBW_VGG_WEIGHTS),
- otherwise filters fall back to a SEEDED He-normal random init — random
  multi-scale conv features are a known usable perceptual prior; the choice
  is logged so runs are comparable.

Convs run in bfloat16 on TPU (f32 accumulation) — this is MXU food.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# torchvision VGG16 `features` conv channel plan; 'M' = 2x2 maxpool.
_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512]
# relu indices (after which conv, 0-based conv counter) ending each slice:
# relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
_SLICE_END_CONV = [2, 4, 7, 10, 13]

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
# lpips scaling layer constants (the lpips package's published shift/scale)
_LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b):
    # inputs/weights share a dtype (bf16 on TPU); no preferred_element_type
    # so the VJP's transposed conv also sees matching dtypes (the MXU still
    # accumulates partial products in f32 internally)
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b.astype(y.dtype)


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


class VGG16Features:
    """Frozen VGG16 feature extractor; weights are a host-built constant
    pytree folded into jit."""

    def __init__(self, weights: Optional[List[Tuple[np.ndarray, np.ndarray]]] = None,
                 seed: int = 0, dtype=jnp.float32):
        self.dtype = dtype
        if weights is None:
            weights = self._random_weights(seed)
            self.pretrained = False
        else:
            self.pretrained = True
        self.weights = [
            (jnp.asarray(w, dtype), jnp.asarray(b, jnp.float32)) for w, b in weights
        ]

    # -- weight sources ---------------------------------------------------

    @staticmethod
    def _random_weights(seed):
        rng = np.random.default_rng(seed)
        ws, c_in = [], 3
        for c in _CFG:
            if c == "M":
                continue
            fan_in = 3 * 3 * c_in
            w = rng.standard_normal((3, 3, c_in, c)).astype(np.float32) * np.sqrt(
                2.0 / fan_in
            )
            b = np.zeros(c, np.float32)
            ws.append((w, b))
            c_in = c
        return ws

    @staticmethod
    def load_torch_state_dict(path):
        """Read a torchvision vgg16 .pth checkpoint (host, torch-cpu)."""
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        ws, li = [], 0
        for c in _CFG:
            if c == "M":
                li += 1
                continue
            w = sd[f"features.{li}.weight"].numpy().transpose(2, 3, 1, 0)
            b = sd[f"features.{li}.bias"].numpy()
            ws.append((w, b))
            li += 2  # conv + relu
        return ws

    @staticmethod
    def load_npz(path):
        d = np.load(path)
        n = sum(1 for c in _CFG if c != "M")
        return [(d[f"w{i}"], d[f"b{i}"]) for i in range(n)]

    @classmethod
    def from_env_or_random(cls, seed=0, dtype=None, path=None):
        if dtype is None:
            # bf16 on TPU (MXU-native convs; features are loss-only so the
            # reduced precision is inconsequential), f32 elsewhere
            import jax

            dtype = (
                jnp.bfloat16
                if jax.default_backend() not in ("cpu",) else jnp.float32
            )
        path = path or os.environ.get("DBW_VGG_WEIGHTS")
        if path:
            if os.path.exists(path):
                if path.endswith(".npz"):
                    return cls(cls.load_npz(path), dtype=dtype)
                return cls(cls.load_torch_state_dict(path), dtype=dtype)
            # a configured-but-missing path must not silently train against
            # random features — that invalidates every perceptual metric
            from ..utils.logger import print_warning

            print_warning(
                f"VGG weights path {path!r} does not exist — FALLING BACK "
                "to seeded random features (perceptual/LPIPS values are "
                "not comparable to pretrained-VGG runs)"
            )
        return cls(None, seed=seed, dtype=dtype)

    # -- forward ----------------------------------------------------------

    def __call__(self, x, max_level=5):
        """x: (B, H, W, 3) float32 (already normalized). Returns the list of
        slice outputs [relu1_2, relu2_2, relu3_3, relu4_3, relu5_3][:max_level].
        """
        x = x.astype(self.dtype)
        feats, conv_i = [], 0
        for c in _CFG:
            if c == "M":
                x = _maxpool2(x)
                continue
            w, b = self.weights[conv_i]
            x = jax.nn.relu(_conv(x, w, b)).astype(self.dtype)
            conv_i += 1
            if conv_i in _SLICE_END_CONV:
                feats.append(x.astype(jnp.float32))
                if len(feats) >= max_level:
                    break
        return feats


class PerceptualLoss:
    """VGG16 perceptual loss with channel-normalized features, default level
    relu3_3 (reference: src/model/loss.py:66-111)."""

    def __init__(self, feature_levels=None, normalize_input=True,
                 normalize_features=True, sum_channels=False,
                 vgg: Optional[VGG16Features] = None):
        self.feature_levels = list(feature_levels or [3])
        self.max_level = max(self.feature_levels)
        self.normalize_input = normalize_input
        self.normalize_features = normalize_features
        self.sum_channels = sum_channels
        self.vgg = vgg or VGG16Features.from_env_or_random()

    def __call__(self, imgs, rec):
        """imgs, rec: (B, H, W, 3) in [0, 1].

        The GT side runs as its OWN stop-gradiented VGG pass: its features
        carry no parameter dependence, so XLA prunes that half's backward
        conv chain entirely (the concat-then-split layout paid transposed
        convs for the full doubled batch)."""
        if self.normalize_input:
            imgs = (imgs - _IMAGENET_MEAN) / _IMAGENET_STD
            rec = (rec - _IMAGENET_MEAN) / _IMAGENET_STD
        feats1 = self.vgg(jax.lax.stop_gradient(imgs), self.max_level)
        feats2 = self.vgg(rec, self.max_level)
        losses = []
        for lvl, (f1, f2) in enumerate(zip(feats1, feats2), start=1):
            if lvl not in self.feature_levels:
                continue
            if self.normalize_features:
                f1 = f1 / (jnp.linalg.norm(f1, axis=-1, keepdims=True) + 1e-10)
                f2 = f2 / (jnp.linalg.norm(f2, axis=-1, keepdims=True) + 1e-10)
            d = (f1 - f2) ** 2
            if self.sum_channels:
                losses.append(d.sum(-1).reshape(d.shape[0], -1).mean(1))
            else:
                losses.append(d.reshape(d.shape[0], -1).mean(1))
        return sum(losses).mean()


class LPIPSLoss:
    """LPIPS (VGG flavor): unit-normalized features at 5 levels, squared
    diff, per-layer linear weighting, spatial mean, layer sum.

    Without the published linear-head weights we fall back to uniform channel
    averaging (weights ~ 1/C) — set $DBW_LPIPS_WEIGHTS to an .npz of
    ``lin{i}`` (C_i,) arrays to use learned weights."""

    def __init__(self, vgg: Optional[VGG16Features] = None, lin_path=None):
        self.vgg = vgg or VGG16Features.from_env_or_random()
        lin_path = lin_path or os.environ.get("DBW_LPIPS_WEIGHTS")
        self.lins = None
        if lin_path and os.path.exists(lin_path):
            d = np.load(lin_path)
            self.lins = [jnp.asarray(d[f"lin{i}"]).reshape(-1) for i in range(5)]

    @property
    def label(self):
        """Feature-source label for eval outputs: the LPIPS column is only
        comparable to published numbers with pretrained VGG + learned
        linear heads; anything else is labeled explicitly."""
        if not self.vgg.pretrained:
            return "LPIPS_randvgg"
        if self.lins is None:
            return "LPIPS_uniform"
        return "LPIPS"

    def __call__(self, imgs, rec, normalize=True, reduce=True):
        """LPIPS distance; ``reduce=False`` returns the per-view (B,) vector
        (used by eval to score padded static-shape batches exactly)."""
        if normalize:  # [0,1] -> [-1,1] (lpips normalize=True semantics)
            imgs = imgs * 2.0 - 1.0
            rec = rec * 2.0 - 1.0
        imgs = (imgs - _LPIPS_SHIFT) / _LPIPS_SCALE
        rec = (rec - _LPIPS_SHIFT) / _LPIPS_SCALE
        # GT features are parameter-free: separate stop-gradiented pass so
        # the backward transposed convs only run over the rec half
        feats1 = self.vgg(jax.lax.stop_gradient(imgs), 5)
        feats2 = self.vgg(rec, 5)
        total = 0.0
        for i, (f1, f2) in enumerate(zip(feats1, feats2)):
            f1 = f1 / (jnp.linalg.norm(f1, axis=-1, keepdims=True) + 1e-10)
            f2 = f2 / (jnp.linalg.norm(f2, axis=-1, keepdims=True) + 1e-10)
            d = (f1 - f2) ** 2
            if self.lins is not None:
                d = (d * self.lins[i]).sum(-1)
            else:
                d = d.mean(-1)
            total = total + d.reshape(d.shape[0], -1).mean(1)
        return total.mean() if reduce else total
