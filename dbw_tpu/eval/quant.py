"""Quantitative image evaluation (reference: src/model/dbw.py:465-493):
hard antialiased renders of the filtered scene on the test views, scored
with PSNR / SSIM / LPIPS + the training losses, plus block-count and
per-block opacities."""

from __future__ import annotations

from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

from ..data.base import pad_batch
from ..losses.basic import mse2psnr
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

    # scene enters as an ARGUMENT (not a jit-closure constant) so the
    # lowered HLO — and thus the AOT executable-cache key — is identical
    # across processes of the same model config (protocol seeds, A/B arms)
    from ..utils.aot_cache import aot_jit

    @aot_jit(label="quant_render_hard")
    def render_hard(scene, R, T):
        return model.renderer_viz.render(scene, R, T)[..., :3]

    # Per-view scores on STATIC padded shapes: ragged final batches are
    # padded to the loader batch size (so every jitted fn compiles exactly
    # once for a e.g. 49-view loader) and the pad views are sliced off on
    # host before the meters — batch-mean numerics over the real views stay
    # identical to the reference's ragged batches (dbw.py:476-488).
    @aot_jit(label="quant_score")
    def score_per_view(imgs, rec):
        mse_v = jnp.mean((imgs - rec) ** 2, axis=(1, 2, 3))
        return {
            "mse_v": mse_v,
            "ssim_v": 1.0 - ssim_loss(imgs, rec, padding=False),
            "lpips_v": lpips(imgs, rec, reduce=False),
        }

    # jitted loss stack: the previous eager call paid per-op tunnel
    # dispatch for the full loss graph (incl. the VGG convs) every batch
    @aot_jit(label="quant_losses")
    def losses_fn(imgs, rec, params, phase, aux, key):
        return model.compute_losses(imgs, rec, params, phase, aux, key=key)

    meters = {
        k: AverageMeter()
        for k in ["L_tot", "L_rec", "PSNR", "SSIM", lpips_col]
    }
    key = jax.random.PRNGKey(0)
    # scene/aux depend only on (params, phase): build once, not per batch
    aux = _loss_aux(model, params, phase)
    bs = getattr(loader, "batch_size", None)
    for inp, labels in loader:
        n = len(inp["imgs"])
        if bs:
            imgs, _ = pad_batch(np.asarray(inp["imgs"]), bs)
            R, _ = pad_batch(np.asarray(inp["R"]), bs)
            T, _ = pad_batch(np.asarray(inp["T"]), bs)
            imgs, R, T = jnp.asarray(imgs), jnp.asarray(R), jnp.asarray(T)
        else:
            imgs = jnp.asarray(inp["imgs"])
            R, T = jnp.asarray(inp["R"]), jnp.asarray(inp["T"])
        if hard_inference:
            rec = render_hard(scene, R, T)
        else:
            rec, _ = model.predict(params, phase, R, T)
        s = jax.tree_util.tree_map(lambda v: np.asarray(v)[:n],
                                   score_per_view(imgs, rec))
        imgs, rec = imgs[:n], rec[:n]
        losses = losses_fn(imgs, rec, params, phase, aux, key)
        meters["L_tot"].update(float(losses["total"]), N=n)
        rec_terms = sum(
            float(losses.get(name, 0.0)) for name in ["rgb", "perceptual"]
        )
        meters["L_rec"].update(rec_terms, N=n)
        meters["PSNR"].update(float(mse2psnr(s["mse_v"].mean())), N=n)
        meters["SSIM"].update(float(s["ssim_v"].mean()), N=n)
        meters[lpips_col].update(float(s["lpips_v"].mean()), N=n)

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
