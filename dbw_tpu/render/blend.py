"""Layered soft alpha compositing.

Reimplements the reference's ``layered_rgb_blend`` (src/model/renderer.py:
241-273) as pure jnp: per-fragment coverage alpha from the signed edge
distance, optional per-face opacity, front-to-back ``cumprod(1 - alpha)``
occlusion over the K layers plus a background term. Fully differentiable;
XLA fuses the whole thing into the surrounding computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .interpolate import Fragments


def fragment_alpha(fragments: Fragments, sigma, clip_inside=True, hard=None):
    """Coverage alpha per fragment.

    sigma == 0 -> hard coverage (dists <= 0); otherwise
    clip_inside -> exp(-clamp(dists, 0)/sigma) (1 inside, decaying outside),
    else sigmoid(-dists/sigma). Matches reference renderer.py:252-257.

    `hard` optionally overrides the sigma==0 test with a traced boolean so
    hard/soft can be switched without recompiling."""
    mask = fragments.valid
    if clip_inside:
        soft_alpha = jnp.exp(
            -jnp.clip(fragments.dists, 0.0, None) / jnp.maximum(sigma, 1e-20)
        )
    else:
        soft_alpha = jax.nn.sigmoid(-fragments.dists / jnp.maximum(sigma, 1e-20))
    hard_alpha = (fragments.dists <= 0.0).astype(soft_alpha.dtype)
    use_hard = (sigma == 0.0) if hard is None else hard
    alpha = jnp.where(use_hard, hard_alpha, soft_alpha)
    return alpha * mask


def layered_blend(colors, alpha, background_color):
    """Front-to-back composite.

    colors: (H, W, K, 3); alpha: (H, W, K); background_color: (3,).
    Returns RGBA (H, W, 4): rgb = sum_k prod_{j<k}(1-a_j) a_k c_k + prod(1-a) bkg,
    alpha channel = 1 - prod_k (1 - a_k)."""
    occ = jnp.cumprod(1.0 - alpha, axis=-1)
    occ_before = jnp.concatenate(
        [jnp.ones_like(occ[..., :1]), occ[..., :-1]], axis=-1
    )
    rgb = jnp.sum(occ_before[..., None] * alpha[..., None] * colors, axis=-2)
    bg = occ[..., -1:]
    rgb = rgb + bg * jnp.asarray(background_color)
    a = 1.0 - occ[..., -1]
    return jnp.concatenate([rgb, a[..., None]], axis=-1)
