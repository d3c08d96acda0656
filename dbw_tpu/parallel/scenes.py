"""Scene-axis scale-out (SURVEY §5.8c): multiple scenes (e.g. DTU scans)
optimized as ONE sharded program over a ("scene", "seed", "data") mesh.

On a multi-host pod the scene axis is the natural DCN axis — scenes never
communicate, so only the intra-scene data-axis gradient pmean rides ICI.
The reference runs scans as separate jobs (scripts/*.sh); here a scan-sweep
is a single compiled program.

Per-scene state that the single-scene path treats as host constants —
the camera intrinsics — becomes a traced input: the model's camera is a
pytree of scalars, so `model.set_camera` is re-invoked INSIDE the traced,
scene-vmapped function with the per-scene K (tracing-time Python, no
recompile per scene), and restored after tracing."""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from .seeds import seed_axis_exec

_CAMERA_ATTRS = (
    "camera", "renderer", "renderer_env", "renderer_viz", "renderer_light"
)


def make_scene_mesh(n_scene, n_seed=None, n_data=None, devices=None):
    """("scene", "seed", "data") mesh; remaining devices factor over
    seed (preferred: zero ICI traffic) then data."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert n % n_scene == 0, (n, n_scene)
    per_scene = n // n_scene
    if n_seed is None and n_data is None:
        from .mesh import factor_devices

        n_seed, n_data = factor_devices(per_scene)
    elif n_seed is None:  # derive the missing axis, don't discard the given
        if per_scene % n_data:
            raise ValueError(
                f"n_data={n_data} does not divide {per_scene} devices/scene"
            )
        n_seed = per_scene // n_data
    elif n_data is None:
        if per_scene % n_seed:
            raise ValueError(
                f"n_seed={n_seed} does not divide {per_scene} devices/scene"
            )
        n_data = per_scene // n_seed
    assert n_seed * n_data == per_scene, (n_seed, n_data, per_scene)
    arr = np.asarray(devices).reshape(n_scene, n_seed, n_data)
    return Mesh(arr, ("scene", "seed", "data"))


class MultiSceneRunner:
    """Compiles and runs the scene x seed x data sharded train step.

    Inputs per step (leading axes = mesh axes):
      K:      (n_scene, 4, 4)   per-scene NDC intrinsics
      params: (n_scene, S, ...) per-scene, per-seed SceneParams
      opt:    same structure as params
      imgs:   (n_scene, B, H, W, 3); R: (n_scene, B, 3, 3); T: (n_scene, B, 3)
      keys:   (n_scene, S, 2)
    Returns (params, opt, losses (n_scene, S))."""

    def __init__(self, model, optimizer, mesh):
        assert tuple(mesh.axis_names) == ("scene", "seed", "data"), mesh
        self.model = model
        self.optimizer = optimizer
        self.mesh = mesh
        self._step = self._build_step()
        self._multi = self._build_multi_step()
        self._step_idx = self._build_step_idx()
        self._multi_idx = self._build_multi_step_idx()

    def _build_step(self):
        model, optimizer = self.model, self.optimizer
        mesh = self.mesh

        def scene_fn(K, p_seeds, o_seeds, imgs, R, T, phase, lrs, keys):
            snapshot = {a: getattr(model, a) for a in _CAMERA_ATTRS}
            model.set_camera(K)
            try:
                def per_seed(p, o, k):
                    def loss_fn(pp):
                        losses = model.forward(pp, phase, imgs, R, T, k)
                        return losses["total"], losses

                    grads, losses = jax.grad(loss_fn, has_aux=True)(p)
                    grads = jax.lax.pmean(grads, "data")
                    loss_t = jax.lax.pmean(losses["total"], "data")
                    updates, o = optimizer.update(grads, o, lrs)
                    p = jax.tree_util.tree_map(lambda a, u: a + u, p, updates)
                    return p, o, loss_t

                return seed_axis_exec(per_seed, p_seeds, o_seeds, keys)
            finally:
                for a, v in snapshot.items():
                    setattr(model, a, v)

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(
                P("scene"),                        # K
                P("scene", "seed"), P("scene", "seed"),    # params, opt
                P("scene", "data"), P("scene", "data"), P("scene", "data"),
                P(), P(),                          # phase, lrs
                P("scene", "seed"),                # keys
            ),
            out_specs=(
                P("scene", "seed"), P("scene", "seed"), P("scene", "seed")
            ),
            check_vma=False,
        )
        def sharded(K, params, opt, imgs, R, T, phase, lrs, keys):
            return seed_axis_exec(
                lambda k, p, o, im, r, t, ky: scene_fn(
                    k, p, o, im, r, t, phase, lrs, ky
                ),
                K, params, opt, imgs, R, T, keys,
            )

        self._sharded_raw = sharded  # un-jitted: reused by the scanned path
        return jax.jit(sharded, donate_argnums=(1, 2))

    def _build_multi_step(self):
        step_inner = self._sharded_raw

        @partial(jax.jit, donate_argnums=(1, 2))
        def multi(K, params, opt, imgs_s, R_s, T_s, phase, lrs, keys_s):
            def body(carry, xs):
                p, o = carry
                imgs, R, T, keys = xs
                p, o, loss = step_inner(K, p, o, imgs, R, T, phase, lrs, keys)
                return (p, o), loss

            (params, opt), losses = jax.lax.scan(
                body, (params, opt), (imgs_s, R_s, T_s, keys_s)
            )
            return params, opt, losses

        return multi

    def _scene_fn_idx(self):
        """scene_fn variant gathering the view batch on device from the
        scene's HBM-resident view stack by a (B_local,) index vector."""
        model, optimizer = self.model, self.optimizer

        def scene_fn(K, p_seeds, o_seeds, imgs_all, R_all, T_all, idx, phase,
                     lrs, keys):
            imgs, R, T = imgs_all[idx], R_all[idx], T_all[idx]
            snapshot = {a: getattr(model, a) for a in _CAMERA_ATTRS}
            model.set_camera(K)
            try:
                def per_seed(p, o, k):
                    def loss_fn(pp):
                        losses = model.forward(pp, phase, imgs, R, T, k)
                        return losses["total"], losses

                    grads, losses = jax.grad(loss_fn, has_aux=True)(p)
                    grads = jax.lax.pmean(grads, "data")
                    loss_t = jax.lax.pmean(losses["total"], "data")
                    updates, o = optimizer.update(grads, o, lrs)
                    p = jax.tree_util.tree_map(lambda a, u: a + u, p, updates)
                    return p, o, loss_t

                return seed_axis_exec(per_seed, p_seeds, o_seeds, keys)
            finally:
                for a, v in snapshot.items():
                    setattr(model, a, v)

        return scene_fn

    def _build_step_idx(self):
        """Device-resident data variant: per-scene view stacks
        (n_scene, N_views, ...) are sharded over ``scene`` only (replicated
        within a scene's seed x data block); the step receives (n_scene, B)
        view indices sharded over (scene, data) and gathers locally."""
        mesh = self.mesh
        scene_fn = self._scene_fn_idx()

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(
                P("scene"),                              # K
                P("scene", "seed"), P("scene", "seed"),  # params, opt
                P("scene"), P("scene"), P("scene"),      # imgs/R/T view stacks
                P("scene", "data"),                      # idx
                P(), P(),                                # phase, lrs
                P("scene", "seed"),                      # keys
            ),
            out_specs=(
                P("scene", "seed"), P("scene", "seed"), P("scene", "seed")
            ),
            check_vma=False,
        )
        def sharded(K, params, opt, imgs_all, R_all, T_all, idx, phase, lrs,
                    keys):
            return seed_axis_exec(
                lambda k, p, o, ia, ra, ta, ix, ky: scene_fn(
                    k, p, o, ia, ra, ta, ix, phase, lrs, ky
                ),
                K, params, opt, imgs_all, R_all, T_all, idx, keys,
            )

        self._sharded_idx_raw = sharded
        return jax.jit(sharded, donate_argnums=(1, 2))

    def _build_multi_step_idx(self):
        step_inner = self._sharded_idx_raw

        @partial(jax.jit, donate_argnums=(1, 2))
        def multi(K, params, opt, imgs_all, R_all, T_all, idx_s, phase, lrs,
                  keys_s):
            def body(carry, xs):
                p, o = carry
                idx, keys = xs
                p, o, loss = step_inner(K, p, o, imgs_all, R_all, T_all, idx,
                                        phase, lrs, keys)
                return (p, o), loss

            (params, opt), losses = jax.lax.scan(
                body, (params, opt), (idx_s, keys_s)
            )
            return params, opt, losses

        return multi

    def step_idx(self, K, params, opt, imgs_all, R_all, T_all, idx, phase,
                 lrs, keys):
        """One step with device-resident per-scene view stacks; idx:
        (n_scene, B) int32 view ids."""
        return self._step_idx(K, params, opt, imgs_all, R_all, T_all, idx,
                              phase, lrs, keys)

    def multi_step_idx(self, K, params, opt, imgs_all, R_all, T_all, idx_s,
                       phase, lrs, keys_s):
        """SPC scanned steps with device-resident data; idx_s:
        (SPC, n_scene, B)."""
        return self._multi_idx(K, params, opt, imgs_all, R_all, T_all, idx_s,
                               phase, lrs, keys_s)

    def step(self, K, params, opt, imgs, R, T, phase, lrs, keys):
        return self._step(K, params, opt, imgs, R, T, phase, lrs, keys)

    def multi_step(self, K, params, opt, imgs_s, R_s, T_s, phase, lrs,
                   keys_s):
        """SPC scanned optimizer steps in one program: imgs_s/R_s/T_s carry
        a leading (SPC,) axis over batches, keys_s is (SPC, n_scene, S, 2).
        Returns (params, opt, losses (SPC, n_scene, S))."""
        return self._multi(K, params, opt, imgs_s, R_s, T_s, phase, lrs,
                           keys_s)


def stack_scene_params(per_scene_params_lists):
    """[[seed params...] per scene] -> pytree with (n_scene, S, ...) leaves."""
    from .seeds import stack_params

    return stack_params([stack_params(pl) for pl in per_scene_params_lists])
