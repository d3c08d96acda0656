"""Quantitative image evaluation (reference: src/model/dbw.py:465-493):
hard antialiased renders of the filtered scene on the test views, scored
with PSNR / SSIM / LPIPS + the training losses, plus block-count and
per-block opacities."""

from __future__ import annotations

from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

from ..losses.basic import mse2psnr, mse_loss
from ..losses.ssim import ssim_loss
from ..losses.vgg import LPIPSLoss
from ..models.dbw import Phase
from .metrics import AverageMeter


def quantitative_eval(model, params, loader, hard_inference=True, lpips=None):
    opacities = np.asarray(model.get_opacities(params))
    n_blocks = model.get_nb_opaque_blocks(params)
    lpips = lpips or LPIPSLoss(
        vgg=model.perceptual_loss.vgg if model.perceptual_loss else None
    )
    lpips_col = lpips.label  # labels the random-VGG / uniform-head fallback

    phase = Phase.eval_phase(filter_transparent=True)
    scene, _, _ = model.build_scene(params, phase)

    @jax.jit
    def render_hard(R, T):
        return model.renderer_viz.render(scene, R, T)[..., :3]

    @jax.jit
    def score(imgs, rec):
        mse = mse_loss(imgs, rec)
        return {
            "psnr": mse2psnr(mse),
            "ssim": 1.0 - ssim_loss(imgs, rec, padding=False).mean(),
            "mse": mse,
        }

    meters = {
        k: AverageMeter()
        for k in ["L_tot", "L_rec", "PSNR", "SSIM", lpips_col]
    }
    key = jax.random.PRNGKey(0)
    # scene/aux depend only on (params, phase): build once, not per batch
    aux = _loss_aux(model, params, phase)
    for inp, labels in loader:
        imgs = jnp.asarray(inp["imgs"])
        R, T = jnp.asarray(inp["R"]), jnp.asarray(inp["T"])
        n = len(imgs)
        if hard_inference:
            rec = render_hard(R, T)
        else:
            rec, _ = model.predict(params, phase, R, T)
        losses = model.compute_losses(imgs, rec, params, phase, aux, key=key)
        s = score(imgs, rec)
        meters["L_tot"].update(float(losses["total"]), N=n)
        rec_terms = sum(
            float(losses.get(name, 0.0)) for name in ["rgb", "perceptual"]
        )
        meters["L_rec"].update(rec_terms, N=n)
        meters["PSNR"].update(float(s["psnr"]), N=n)
        meters["SSIM"].update(float(s["ssim"]), N=n)
        meters[lpips_col].update(float(lpips(imgs, rec)), N=n)

    return OrderedDict(
        [("n_blocks", n_blocks)]
        + [
            (k, meters[k].avg)
            for k in ["L_tot", "L_rec", "PSNR", "SSIM", lpips_col]
        ]
        + [(f"alpha{k}", float(a)) for k, a in enumerate(opacities)]
    )


def _loss_aux(model, params, phase):
    """Loss-side aux (alphas, SRT, raw maps) for eval-time loss computation."""
    _, aux = model.build_blocks(params, phase)
    _, env_raws = model.build_env(params, phase)
    aux["env_raw_maps"] = env_raws
    return aux
