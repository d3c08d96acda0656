"""Synthetic multi-view dataset rendered from a random ground-truth block
scene — the framework's CPU-runnable smoke/e2e workload (no reference
analogue; SURVEY.md §4 calls for an end-to-end smoke config, and BASELINE.md
derives the benchmark workload shape from it)."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..models.dbw import BlocksWorld, Phase
from ..ops.rotations import look_at_rotation
from .base import MultiViewDataset


def make_synthetic_scene(img_size=(64, 80), n_views=12, n_blocks=3,
                         txt_size=32, seed=0, dist=3.0, block_scale=1.0,
                         backend="xla"):
    """Render `n_views` cameras on a circle around a random GT block scene.

    ``block_scale`` scales the GT blocks (1.0 = the default unit block):
    large values make the scene *block-dominated*, so a model block that
    never lands on the GT gets no recon gradient while a missed GT block
    leaves a large photometric residual — the regime where seed placement
    genuinely decides the outcome (the multi-seed protocol's raison
    d'être, reference scripts/multi_pipeline.sh).

    Returns (MultiViewDataset, gt_model, gt_params)."""
    cfg = dict(
        mesh=dict(
            n_blocks=n_blocks, S_world=1.0, R_world=[0, 0, 0],
            txt_size=txt_size, T_range=[0.5, 0.5, 0.5],
        ),
        renderer=dict(faces_per_pixel=1, z_clip=0.001),
        rend_optim=dict(decouple_rendering=True),
        loss=dict(rgb_weight=1),
    )
    model = BlocksWorld(img_size, backend=backend, **cfg)
    K = np.zeros((4, 4), np.float32)
    K[0, 0] = K[1, 1] = 2.5
    K[2, 3] = K[3, 2] = 1.0
    model.set_camera(K)

    params = model.init_params(seed=seed)
    # make GT blocks clearly visible: opaque, moderately sized, near origin
    rng = np.random.default_rng(seed + 1)
    params = params._replace(
        alpha_logit=jnp.full((n_blocks,), 8.0),
        T=jnp.asarray(rng.uniform(-0.4, 0.4, (n_blocks, 3)), jnp.float32),
        S=jnp.full((n_blocks, 3), np.log(block_scale), jnp.float32),
        # smooth, saturated textures so photometric loss is informative
        textures=jnp.asarray(
            rng.uniform(-2.0, 2.0, (n_blocks, 1, 1, 3))
            * np.ones((1, txt_size, txt_size, 1)),
            jnp.float32,
        ),
    )

    azim = np.linspace(-180, 180, n_views, endpoint=False)
    elev = 25.0 + 10.0 * np.sin(np.linspace(0, 2 * np.pi, n_views, endpoint=False))
    R, T = look_at_rotation(dist, elev, azim)

    phase = Phase.eval_phase()

    # params/R/T enter as ARGUMENTS (not jit-closure constants) and the
    # program is AOT-cached: the GT render was a plain jax.jit, and the
    # axon path bypasses XLA's persistent compile cache, so EVERY process
    # using a synthetic dataset re-compiled it remotely — three times (one
    # per train/val/test split shape), 12-21 min of silent startup stall
    # measured on the flagship/eval runs (BENCH_NOTES round-5). Model
    # topology not captured by the argument signature (img_size, backend)
    # goes in the label; phase is a fixed eval-phase constant.
    from ..utils.aot_cache import aot_jit

    H, W = img_size

    @aot_jit(label=f"synthetic_gen_{H}x{W}_{backend}")
    def _gen(params, R, T):
        return model.predict(params, phase, R, T)[0]

    imgs = np.asarray(
        _gen(params, jnp.asarray(R, jnp.float32), jnp.asarray(T, jnp.float32))
    )
    Ks = np.broadcast_to(K, (n_views, 4, 4))
    pts = np.asarray(
        sample_gt_points(model, params, n_points=2000, seed=seed)
    )
    ds = MultiViewDataset(
        imgs, Ks, np.asarray(R), np.asarray(T), pc_gt=pts, tag=f"synthetic{seed}",
        name="synthetic",
    )
    return ds, model, params


def sample_gt_points(model, params, n_points=2000, seed=0):
    """Surface samples of the GT blocks in world coordinates."""
    from ..ops.superquadric import sample_sq

    eps1, eps2 = model.block_sq_eps(params)
    S = jnp.exp(params.S) + model.scale_min
    from ..ops.rotations import rotation_6d_to_matrix

    Rm = rotation_6d_to_matrix(params.R_6d)
    # sample_sq's axis order puts the up (sin eta) component at z while the
    # block convention has it at y — permute the SCALE into sample_sq's
    # order so each anisotropic component lands on the axis it scales,
    # then permute the points back to block convention
    S_sq = (S * model.ratio_block_scene)[:, jnp.asarray([0, 2, 1])]
    pts = sample_sq(
        jax.random.PRNGKey(seed), eps1, eps2,
        S_sq, n_points // max(model.n_blocks, 1),
    )
    pts = pts[..., jnp.asarray([0, 2, 1])]
    pts = pts @ Rm + params.T[:, None]
    pts = pts.reshape(-1, 3)
    return (pts * model.S_world) @ model.statics.R_world + model.statics.T_world


def load_synthetic(split, img_size, tag="", n_views=12, seed=0,
                   gt_n_blocks=3, gt_scale=1.0, gt_dist=3.0, **kwargs):
    kwargs.pop("view_ids", None)
    assert not kwargs, f"unknown synthetic dataset keys: {kwargs}"
    n = {"train": n_views, "val": max(2, n_views // 4), "test": max(2, n_views // 3)}[
        split
    ]
    ds, _, _ = make_synthetic_scene(
        img_size, n_views=n, seed=seed, n_blocks=gt_n_blocks,
        block_scale=gt_scale, dist=gt_dist,
    )
    return ds
