"""Pixel losses and TV norms (reference: src/model/loss.py:28-54)."""

import jax.numpy as jnp

from ..ops.safe_math import safe_pow


def mse_loss(a, b):
    return jnp.mean((a - b) ** 2)


def l1_loss(a, b):
    return jnp.mean(jnp.abs(a - b))


def huber_loss(a, b, delta=1.0):
    d = a - b
    ad = jnp.abs(d)
    return jnp.mean(jnp.where(ad < delta, 0.5 * d * d, delta * (ad - 0.5 * delta)))


def bce_with_logits_loss(logits, targets):
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def mse2psnr(x):
    return -10.0 * jnp.log(x) / jnp.log(10.0)


# TV norms reduce the CHANNEL axis of a diff tensor (..., C) -> (...)
# (reference: src/model/loss.py:43-47; l2 uses safe_pow to avoid gradient
# overflow at 0).
tv_norm_funcs = {
    "l1": lambda t: jnp.abs(t).sum(-1),
    "l2": lambda t: safe_pow((t**2).sum(-1), 0.5),
    "l2sq": lambda t: (t**2).sum(-1),
}


def total_variation(imgs):
    """Isotropic squared TV for (B, H, W, C) images (reference loss.py:50-54
    operates on BCHW; ours is channels-last)."""
    dx = jnp.diff(imgs, axis=2) ** 2
    dy = jnp.diff(imgs, axis=1) ** 2
    return dx.mean() + dy.mean()
