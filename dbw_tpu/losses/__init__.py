"""Loss registry (reference: src/model/loss.py:12-25)."""

from .basic import (
    mse_loss,
    l1_loss,
    huber_loss,
    bce_with_logits_loss,
    mse2psnr,
    tv_norm_funcs,
    total_variation,
)
from .ssim import ssim_loss, SSIM
from .vgg import PerceptualLoss, LPIPSLoss, VGG16Features
from .chamfer import chamfer_distance


def get_loss(name):
    """Name -> ready-to-call loss (reference instantiates uniformly:
    ``get_loss(name)()``, src/model/dbw.py:161 — class entries here are
    instantiated with their defaults so every entry is directly callable
    on (imgs, rec))."""
    entry = {
        "bce": bce_with_logits_loss,
        "mse": mse_loss,
        "l2": mse_loss,
        "l1": l1_loss,
        "huber": huber_loss,
        "perceptual": PerceptualLoss,
        "lpips": LPIPSLoss,
        "ssim": SSIM,
        "chamfer": chamfer_distance,
        "tv": total_variation,
    }[name]
    return entry() if isinstance(entry, type) else entry
