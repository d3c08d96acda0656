"""Gradient ICP: Adam on (R_6d, T, s) minimizing chamfer, keeping the best
iterate (reference: src/utils/icp.py). Pure JAX — the whole optimization is
one jitted lax.scan, so it runs in a single device program instead of 100
python-side steps."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..losses.chamfer import nn_dist2_idx
from ..ops.rotations import rotation_6d_to_matrix


def _chamfer_mean(x, y, chunk=2048):
    dx, _ = nn_dist2_idx(x, y, chunk)
    dy, _ = nn_dist2_idx(y, x, chunk)
    return dx.mean() + dy.mean()


def gradient_icp(pc_pred, pc_gt, estimate_scale=True, anisotropic_scale=False,
                 lr=0.01, n_iter=100, chunk=2048):
    """pc_pred/pc_gt: (N, P, 3). Returns (aligned pred, [R, T, s])."""
    pc_pred = jnp.asarray(pc_pred, jnp.float32)
    pc_gt = jnp.asarray(pc_gt, jnp.float32)
    n = pc_pred.shape[0]
    s_dim = 3 if anisotropic_scale else 1
    params = {
        "R_6d": jnp.tile(jnp.array([[1.0, 0, 0, 0, 1.0, 0]]), (n, 1)),
        "T": jnp.zeros((n, 3)),
        "s": jnp.ones((n, s_dim)),
    }

    def transform(p, pc):
        R = rotation_6d_to_matrix(p["R_6d"])
        s = p["s"] if estimate_scale else jnp.ones_like(p["s"])
        return s[:, None] * pc @ R + p["T"][:, None]

    def loss_fn(p):
        moved = transform(p, pc_pred)
        return jax.vmap(lambda a, b: _chamfer_mean(a, b, chunk))(moved, pc_gt).mean()

    opt = optax.adam(lr)

    @jax.jit
    def run(params):
        opt_state = opt.init(params)

        def body(carry, _):
            p, st, best_loss, best_p = carry
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, st = opt.update(grads, st)
            p2 = optax.apply_updates(p, updates)
            improved = loss < best_loss
            best_loss = jnp.where(improved, loss, best_loss)
            best_p = jax.tree_util.tree_map(
                lambda b, c: jnp.where(improved, c, b), best_p, p
            )
            return (p2, st, best_loss, best_p), loss

        init = (params, opt_state, jnp.float32(1e6), params)
        (p, _, best_loss, best_p), _ = jax.lax.scan(
            body, init, None, length=n_iter
        )
        return best_p, best_loss

    best_p, _ = run(params)
    R = rotation_6d_to_matrix(best_p["R_6d"])
    s = best_p["s"] if estimate_scale else jnp.ones_like(best_p["s"])
    aligned = s[:, None] * pc_pred @ R + best_p["T"][:, None]
    return aligned, [R, best_p["T"], s]
