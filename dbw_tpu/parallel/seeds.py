"""Seed-parallel training: the reference's 5-seed protocol
(multi_pipeline.sh + min-train-loss auto selection, README.md:152-157) as
ONE compiled multi-chip program.

Layout: params get a leading seed axis sharded over the mesh ``seed`` axis;
the per-step view batch is sharded over the ``data`` axis inside each seed
column. The step is a shard_map: each device computes its seeds' gradients
on its view shard, pmean's them over ``data`` (ICI all-reduce inserted by
XLA), and applies Adam locally. Selection at the end is a device argmin
over the all-gathered per-seed losses.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map


def _seed_exec_mode():
    return os.environ.get("DBW_SEED_EXEC", "auto").lower()


def seed_axis_exec(fn, *xs):
    """Execute ``fn`` over the leading (local) seed axis of ``xs``.

    ``vmap`` fuses all local seeds into one batched program — but it turns
    every intermediate into a BatchTracer, which forces the compact-shade
    ladder into its dense fallback (a lax.switch whose predicate is batched
    executes EVERY branch — render/compact_shade.py). That tax is paid even
    for a size-1 seed axis, i.e. the multi-chip 1-seed-per-device layout.

    ``lax.map`` runs the seeds sequentially inside the same compiled step:
    each per-seed program traces UNBATCHED, so the full compact ladder (its
    ~1.5x measured step win and its ~K-fold smaller live fragment set)
    applies per seed. Sequential seeds also cap the peak memory at ONE
    seed's program instead of S_local stacked dense fragment tensors.

    Modes (env DBW_SEED_EXEC): ``vmap`` | ``map`` | ``auto`` (default).
    auto = direct call for a single local seed (no batching machinery),
    lax.map on accelerator backends where the compact pipeline is live,
    vmap otherwise (CPU; the suite pins map == vmap explicitly).
    """
    n = jax.tree_util.tree_leaves(xs[0])[0].shape[0]
    mode = _seed_exec_mode()
    if mode not in ("vmap", "map"):  # auto
        if n == 1:
            ys = fn(*jax.tree_util.tree_map(lambda a: a[0], xs))
            return jax.tree_util.tree_map(lambda a: a[None], ys)
        from ..render.compact_shade import _compact_mode

        on_accel = jax.default_backend() != "cpu"
        compact_live = _compact_mode() not in ("0", "off", "false")
        mode = "map" if (on_accel and compact_live) else "vmap"
    if mode == "vmap":
        from ..render.meshes import _texel_mode

        if _texel_mode() == "quadk":
            # measured on the chip (round 4): the batched block specs vmap
            # puts on the texel segment-sum pallas kernel cannot lower
            # (Mosaic: non-trivial index_map on ANY-space operands) — the
            # 5-seed vmap protocol arm crashed in _sample_quad's backward.
            # Fail loudly instead of letting Mosaic's error surface.
            raise ValueError(
                "DBW_SEED_EXEC=vmap is incompatible with the pallas texel "
                "kernels (DBW_TEXEL=quadk, the accelerator default): "
                "Mosaic cannot lower vmapped block specs. Use the map "
                "executor (default on accelerators; measured equal-cost — "
                "BENCH_NOTES '5-seed protocol ON the TPU'), or force "
                "DBW_TEXEL=quad to A/B vmap on the XLA texel path."
            )
    if mode == "map":
        return jax.lax.map(lambda args: fn(*args), xs)
    return jax.vmap(fn)(*xs)


def stack_params(params_list):
    """Stack per-seed SceneParams into one pytree with leading seed axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params_list)


def unstack_params(stacked, i):
    return jax.tree_util.tree_map(lambda x: x[i], stacked)


def pad_seeds(seeds, n_slots):
    """Pad a seed list to fill the mesh seed axis (e.g. 5 seeds on a v5e-8
    -> 8 slots): extra slots replicate seeds cyclically and are excluded
    from best-selection via the ``n_valid`` mask. Returns
    (padded_seeds, n_valid)."""
    seeds = list(seeds)
    n_valid = len(seeds)
    assert n_slots >= n_valid, (n_slots, n_valid)
    padded = seeds + [seeds[i % n_valid] for i in range(n_slots - n_valid)]
    return padded, n_valid


def select_best_seed(stacked_params, losses, n_valid=None):
    """min-train-loss auto selection (reference README.md:152-157); padded
    duplicate-seed slots beyond ``n_valid`` are masked out."""
    losses = jnp.asarray(losses)
    if n_valid is not None:
        mask = jnp.arange(losses.shape[0]) >= n_valid
        losses = jnp.where(mask, jnp.inf, losses)
    best = int(jnp.argmin(losses))
    return unstack_params(stacked_params, best), best


class MultiSeedRunner:
    """Compiles and runs the (seed, data[, sp]) sharded train step."""

    def __init__(self, model, optimizer, mesh):
        self.model = model
        self.optimizer = optimizer
        self.mesh = mesh
        self.n_seed_devices = mesh.shape["seed"]
        self.n_data = mesh.shape["data"]
        self.n_spatial = dict(mesh.shape).get("sp", 1)
        self._step = self._build_step()
        self._multi = self._build_multi_step()
        self._step_idx = self._build_step_idx()
        self._multi_idx = self._build_multi_step_idx()

    def _per_seed(self):
        model, optimizer = self.model, self.optimizer
        n_sp = self.n_spatial
        # gradients reduce over every non-seed axis: data shards views,
        # sp shards pixel rows within each view shard
        red_axes = ("data", "sp") if n_sp > 1 else "data"
        if n_sp > 1:
            H = model.img_size[0]
            Hb = -(-H // n_sp)  # band height (last band may overhang; the
            #                     gathered image is cropped back to H rows)

        def per_seed(params, opt_state, imgs, R, T, phase, lrs, key):
            def loss_fn(p):
                if n_sp > 1:
                    # pixel-band sharding: render ONLY this device's rows;
                    # all_gather the (tiny) band images so the cross-pixel
                    # losses see the full frame. The gather's transpose
                    # (psum_scatter) routes each band's loss cotangent back
                    # to the device that rendered it; pmean over sp then
                    # sums the per-band parameter gradients exactly (each
                    # device's grad is n_sp x its band's true contribution).
                    row0 = (
                        jax.lax.axis_index("sp") * Hb
                    ).astype(jnp.float32)
                    gather = lambda rec: jax.lax.all_gather(
                        rec, "sp", axis=1, tiled=True
                    )[:, :H]
                    losses = model.forward(
                        p, phase, imgs, R, T, key,
                        row_range=(row0, Hb), rec_gather=gather,
                    )
                else:
                    losses = model.forward(p, phase, imgs, R, T, key)
                return losses["total"], losses

            grads, losses = jax.grad(loss_fn, has_aux=True)(params)
            grads = jax.lax.pmean(grads, red_axes)
            losses = jax.tree_util.tree_map(
                lambda l: jax.lax.pmean(l, red_axes), losses
            )
            updates, opt_state = optimizer.update(grads, opt_state, lrs)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
            return params, opt_state, losses["total"]

        return per_seed

    def _build_step(self):
        mesh = self.mesh
        per_seed = self._per_seed()

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(
                P("seed"), P("seed"),                  # params, opt_state
                P("data"), P("data"), P("data"),       # imgs, R, T (view batch)
                P(), P(), P("seed"),                   # phase, lrs, keys
            ),
            out_specs=(P("seed"), P("seed"), P("seed")),
            check_vma=False,
        )
        def sharded_step(params, opt_state, imgs, R, T, phase, lrs, keys):
            # params: (S_local, ...); imgs: (B_local, H, W, 3)
            return seed_axis_exec(
                lambda p, o, k: per_seed(p, o, imgs, R, T, phase, lrs, k),
                params, opt_state, keys,
            )

        return jax.jit(sharded_step, donate_argnums=(0, 1))

    def _build_multi_step(self):
        mesh = self.mesh
        per_seed = self._per_seed()

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(
                P("seed"), P("seed"),                         # params, opt
                P(None, "data"), P(None, "data"), P(None, "data"),
                P(), P(), P(None, "seed"),                    # phase, lrs, keys
            ),
            out_specs=(P("seed"), P("seed"), P(None, "seed")),
            check_vma=False,
        )
        def sharded_multi(params, opt_state, imgs_s, R_s, T_s, phase, lrs,
                          keys_s):
            # leading axis of imgs_s/R_s/T_s/keys_s = scanned optimizer steps
            def body(carry, xs):
                p, o = carry
                imgs, R, T, keys = xs
                p, o, loss = seed_axis_exec(
                    lambda pp, oo, k: per_seed(pp, oo, imgs, R, T, phase,
                                               lrs, k),
                    p, o, keys,
                )
                return (p, o), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (imgs_s, R_s, T_s, keys_s)
            )
            return params, opt_state, losses  # (SPC, S_local)

        return jax.jit(sharded_multi, donate_argnums=(0, 1))

    def _build_step_idx(self):
        """Device-resident data variant: the WHOLE scene (imgs/R/T) is a
        replicated device array; the step receives only a (B,) view-index
        vector sharded over ``data`` and gathers its local view shard on
        device — no per-step host->device image transfer."""
        mesh = self.mesh
        per_seed = self._per_seed()

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(
                P("seed"), P("seed"),            # params, opt_state
                P(), P(), P(),                   # imgs_all, R_all, T_all
                P("data"),                       # idx (view batch indices)
                P(), P(), P("seed"),             # phase, lrs, keys
            ),
            out_specs=(P("seed"), P("seed"), P("seed")),
            check_vma=False,
        )
        def sharded_step(params, opt_state, imgs_all, R_all, T_all, idx,
                         phase, lrs, keys):
            imgs, R, T = imgs_all[idx], R_all[idx], T_all[idx]
            return seed_axis_exec(
                lambda p, o, k: per_seed(p, o, imgs, R, T, phase, lrs, k),
                params, opt_state, keys,
            )

        return jax.jit(sharded_step, donate_argnums=(0, 1))

    def _build_multi_step_idx(self):
        mesh = self.mesh
        per_seed = self._per_seed()

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(
                P("seed"), P("seed"),            # params, opt
                P(), P(), P(),                   # imgs_all, R_all, T_all
                P(None, "data"),                 # idx_s (SPC, B)
                P(), P(), P(None, "seed"),       # phase, lrs, keys
            ),
            out_specs=(P("seed"), P("seed"), P(None, "seed")),
            check_vma=False,
        )
        def sharded_multi(params, opt_state, imgs_all, R_all, T_all, idx_s,
                          phase, lrs, keys_s):
            def body(carry, xs):
                p, o = carry
                idx, keys = xs
                imgs, R, T = imgs_all[idx], R_all[idx], T_all[idx]
                p, o, loss = seed_axis_exec(
                    lambda pp, oo, k: per_seed(pp, oo, imgs, R, T, phase,
                                               lrs, k),
                    p, o, keys,
                )
                return (p, o), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (idx_s, keys_s)
            )
            return params, opt_state, losses  # (SPC, S_local)

        return jax.jit(sharded_multi, donate_argnums=(0, 1))

    def step_idx(self, stacked_params, stacked_opt, imgs_all, R_all, T_all,
                 idx, phase, lrs, keys):
        """One step with device-resident data; idx: (B,) int32 view ids."""
        return self._step_idx(stacked_params, stacked_opt, imgs_all, R_all,
                              T_all, idx, phase, lrs, keys)

    def multi_step_idx(self, stacked_params, stacked_opt, imgs_all, R_all,
                       T_all, idx_s, phase, lrs, keys_s):
        """SPC scanned steps with device-resident data; idx_s: (SPC, B)."""
        return self._multi_idx(stacked_params, stacked_opt, imgs_all, R_all,
                               T_all, idx_s, phase, lrs, keys_s)

    def multi_step(self, stacked_params, stacked_opt, imgs_s, R_s, T_s,
                   phase, lrs, keys_s):
        """SPC scanned optimizer steps in ONE device program: imgs_s/R_s/T_s
        have a leading (SPC,) axis over batches, keys_s is (SPC, S, 2).
        Returns (params, opt, losses (SPC, S))."""
        return self._multi(stacked_params, stacked_opt, imgs_s, R_s, T_s,
                           phase, lrs, keys_s)

    def step(self, stacked_params, stacked_opt, imgs, R, T, phase, lrs, keys):
        """stacked_params/opt: leading S axis; imgs/R/T: (B, ...) global batch
        sharded over data; keys: (S, 2) uint32. Returns (params, opt, losses
        (S,))."""
        return self._step(stacked_params, stacked_opt, imgs, R, T, phase, lrs, keys)

    def select_best(self, stacked_params, losses, n_valid=None):
        """min-train-loss auto selection (reference README.md:152-157)."""
        return select_best_seed(stacked_params, losses, n_valid)
