"""Multi-scene training driver (SURVEY §5.8c): N scenes (e.g. DTU scans)
optimized as ONE program over a ("scene", "seed", "data") mesh — the
reference runs them as N sequential jobs (reference scripts/dtu.sh).

Static-shape requirements for one compiled program: every scene must share
the model config, schedule, image size and view count (true for the 10 DTU
eval scans — configs/dtu/scan*.yml differ only in dataset tag/seed).
Per-scene camera intrinsics become traced inputs via the scene-vmapped
``set_camera`` re-invocation (parallel/scenes.py).

Output surface: each scene gets its own run dir with the single-scene
trainer's artifacts — train/val metric TSVs, model.pkl (best seed when
multiple seeds per scene), and ``evaluate()`` writes the full reference
eval surface per scene (final_scores.tsv, quali_eval/, DTU protocol).

Checkpoint/resume mirrors MultiSeedTrainer: a stacked
``multi_scene_model.pkl`` written at every val interval carries
params/opt for all (scene, seed) slots + the epoch/batch cursor, RNG and
loss accounting; the loaders' (seed, epoch)-keyed shuffle makes a resume
replay the uninterrupted batch order exactly.
"""

from __future__ import annotations

import pickle
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data import create_train_val_test_loader
from ..eval.metrics import Metrics
from ..models import create_model
from ..train.checkpoint import save_checkpoint
from ..train.optimizer import create_optimizer
from ..train.scheduler import create_scheduler
from ..utils.logger import print_log
from ..utils.misc import path_mkdir
from ..parallel.seeds import seed_axis_exec, stack_params, unstack_params
from ..parallel.scenes import _CAMERA_ATTRS, stack_scene_params
from .multi_seed import _pad_ids

MULTI_SCENE_CKPT = "multi_scene_model.pkl"


def _require_equal(cfgs, pick, what):
    vals = [pick(c) for c in cfgs]
    if any(v != vals[0] for v in vals[1:]):
        raise ValueError(
            f"multi-scene program requires identical {what} across scenes; "
            f"got {vals}"
        )
    return vals[0]


class MultiSceneTrainer:
    """Trains N scenes x S seeds simultaneously as one compiled program.

    cfgs: one merged config dict per scene. run_dirs: one run dir per
    scene. n_seeds: seeds per scene (each scene uses its config seed +
    offsets 0..n_seeds-1); with n_seeds > 1 the best seed per scene is
    auto-selected by min train loss like the multi-seed protocol.
    """

    def __init__(self, cfgs, run_dirs, n_seeds=1, n_data=None, resume=False):
        assert len(cfgs) == len(run_dirs) and len(cfgs) >= 1
        self.cfgs = cfgs
        self.run_dirs = [path_mkdir(d) for d in run_dirs]
        self.n_scene = len(cfgs)

        _require_equal(cfgs, lambda c: c["model"], "model config")
        _require_equal(
            cfgs,
            lambda c: {k: v for k, v in c["training"].items() if k != "seed"},
            "training config (except seed)",
        )
        tcfg = cfgs[0]["training"]
        self.batch_size = tcfg.get("batch_size", 4)
        self.n_epoches = tcfg["n_epoches"]
        self.steps_per_call = int(tcfg.get("steps_per_call", 1))
        self.train_stat_interval = tcfg.get("train_stat_interval", 0)
        self.val_stat_interval = tcfg.get("val_stat_interval", 0)

        ckpt = None
        if resume:
            path = self.run_dirs[0] / MULTI_SCENE_CKPT
            if not path.exists():
                raise FileNotFoundError(
                    f"resume requested but {path} does not exist")
            with open(path, "rb") as f:
                ckpt = pickle.load(f)
            print_log(
                f"[multi-scene] resuming from {path}: epoch={ckpt['epoch']}, "
                f"batch={ckpt['batch']}"
            )

        # per-scene loaders; view counts must match for one program
        self.loaders = [create_train_val_test_loader(c) for c in cfgs]
        self.datasets = [ld[0].dataset for ld in self.loaders]
        self.n_batches = _require_equal(
            [ld[0] for ld in self.loaders], len, "train batch count"
        )
        _require_equal(self.datasets, lambda d: d.img_size, "image size")

        self.model = create_model(cfgs[0], self.datasets[0].img_size)
        self.model.set_camera(self.datasets[0].K[0])
        self.K = jnp.asarray(np.stack([d.K[0] for d in self.datasets]))

        # Device-resident per-scene view stacks (n_scene, N_views, ...):
        # batches are gathered on device by view index (see train/trainer.py).
        # Scenes with fewer views are padded by repeating the last view —
        # indices from each scene's loader only ever reference real views.
        n_views = max(len(d) for d in self.datasets)

        def _stack(get):
            padded = []
            for d in self.datasets:
                a = get(d)
                if len(a) < n_views:
                    a = np.concatenate(
                        [a, np.repeat(a[-1:], n_views - len(a), axis=0)]
                    )
                padded.append(a)
            return jnp.asarray(np.stack(padded))

        self._dev_imgs = _stack(lambda d: d.imgs)
        self._dev_R = _stack(lambda d: d.R)
        self._dev_T = _stack(lambda d: d.T)

        # seeds per scene: config seed + offsets (reference multi_pipeline
        # uses independent random seeds; offsets keep them reproducible)
        self.scene_seeds = [
            [c["training"].get("seed", 4321) + k for k in range(n_seeds)]
            for c in cfgs
        ]

        # mesh: scene axis mandatory; fall back to a pure-vmap program on a
        # single device (or when scenes don't divide the device count)
        n_dev = len(jax.devices())
        self._mesh = None
        self.S = n_seeds
        if n_dev > 1 and n_dev % self.n_scene == 0:
            from ..parallel.scenes import MultiSceneRunner, make_scene_mesh
            from ..parallel.seeds import pad_seeds

            per_scene = n_dev // self.n_scene
            nd = n_data
            if nd is None:
                # smallest seed axis that fits all requested seeds (seed
                # columns are free — zero ICI traffic); leftover devices
                # become the data axis when the view batch divides them,
                # else they become extra padded seed slots
                nd = 1
                for cand_seed in sorted(
                    d for d in range(1, per_scene + 1) if per_scene % d == 0
                ):
                    if cand_seed >= n_seeds:
                        cand_data = per_scene // cand_seed
                        if self.batch_size % cand_data == 0:
                            nd = cand_data
                            break
            if per_scene % nd:
                raise ValueError(
                    f"n_data={nd} does not divide {per_scene} devices/scene")
            seed_ax = per_scene // nd
            slots = -(-n_seeds // seed_ax) * seed_ax
            self.scene_seeds = [
                pad_seeds(s, slots)[0] for s in self.scene_seeds
            ]
            self.n_valid = n_seeds
            self.S = slots
            self._mesh = make_scene_mesh(self.n_scene, seed_ax, nd)
            print_log(
                f"[multi-scene] mesh (scene={self.n_scene}, seed={seed_ax}, "
                f"data={nd}): {n_seeds} seeds in {slots} slots per scene"
            )
        else:
            self.n_valid = n_seeds
            print_log(
                f"[multi-scene] single-device vmap program: "
                f"{self.n_scene} scenes x {n_seeds} seeds"
            )
            if n_dev > 1:
                from ..utils.logger import print_warning

                # not an error (tiny CPU sweeps are fine) but at DTU scale
                # stacking every scene onto one chip OOMs or crawls
                print_warning(
                    f"[multi-scene] {self.n_scene} scenes do not divide the "
                    f"{n_dev} available devices — falling back to a SINGLE-"
                    "device vmap program holding all scenes' state. For "
                    "real workloads pick a scene count that divides the "
                    "device count (or run groups of scenes separately)."
                )

        params_lists = [
            [self.model.init_params(seed=s) for s in seeds]
            for seeds in self.scene_seeds
        ]
        self.params = stack_scene_params(params_lists)
        self.optimizer = create_optimizer(cfgs[0], params_lists[0][0])
        self.opt_state = stack_scene_params(
            [[self.optimizer.init(p) for p in pl] for pl in params_lists]
        )
        self.scheduler = create_scheduler(cfgs[0], self.optimizer.base_lrs)
        self._key = jax.random.PRNGKey(
            max(max(s) for s in self.scene_seeds) + 1
        )
        self.dead = np.zeros((self.n_scene, self.S), bool)
        self.epoch_start, self.batch_start = 1, 1
        self.loss_sums = np.zeros((self.n_scene, self.S))
        # per-scene real-view counts: scenes may have different view totals
        # (only ceil(n/bs) must match), so ragged tails differ per scene
        self.n_seen = np.zeros(self.n_scene, np.int64)

        if ckpt is not None:
            self._restore(ckpt)
        if self._mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            shard = NamedSharding(self._mesh, P("scene", "seed"))
            self.params = jax.device_put(self.params, shard)
            self.opt_state = jax.device_put(self.opt_state, shard)
        for ld in self.loaders:
            ld[0].set_epoch(self.epoch_start - 1)

        # async host pipeline (see train/trainer.py): losses stay device
        # futures until a log/val interval; checkpoint pickling runs on a
        # background worker over ONE packed byte buffer
        from ..utils.device_pack import make_packer
        from .trainer import _HostWorker

        self._host = _HostWorker()
        self._loss_buffer = []
        self._opacity_fn = None
        self._ckpt_pack, self._ckpt_unpack = make_packer(
            (self.params, self.opt_state)
        )

        append = self.epoch_start > 1 or self.batch_start > 1
        resume_iter = (
            (self.epoch_start - 1) * self.n_batches + self.batch_start - 1
        )
        self.train_metrics = [
            Metrics(
                *[f"loss_s{s}" for s in self.scene_seeds[i][: self.n_valid]],
                log_file=self.run_dirs[i] / "train_metrics.tsv",
                append=append, truncate_iter=resume_iter,
            )
            for i in range(self.n_scene)
        ]
        alpha_names = [f"alpha{k}" for k in range(self.model.n_blocks)]
        self.val_metrics = []
        for i in range(self.n_scene):
            per_seed = []
            for s in self.scene_seeds[i][: self.n_valid]:
                d = (self.run_dirs[i] if self.n_valid == 1
                     else path_mkdir(self.run_dirs[i] / f"seed{s}"))
                per_seed.append(
                    Metrics(*alpha_names, log_file=d / "val_metrics.tsv",
                            append=append, truncate_iter=resume_iter)
                )
            self.val_metrics.append(per_seed)

        if self._mesh is not None:
            from ..parallel.scenes import MultiSceneRunner

            runner = MultiSceneRunner(self.model, self.optimizer, self._mesh)
            self._step = runner.step_idx
            self._multi_step = runner.multi_step_idx
        else:
            self._step, self._multi_step = self._build_vmap_steps()

    # ------------------------------------------------------------------

    def _build_vmap_steps(self):
        """Single-device path: the same (scene, seed) program as a plain
        nested vmap (no data axis, no collectives)."""
        from functools import partial

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
                    updates, o = optimizer.update(grads, o, lrs)
                    p = jax.tree_util.tree_map(
                        lambda a, u: a + u, p, updates
                    )
                    return p, o, losses["total"]

                return seed_axis_exec(per_seed, p_seeds, o_seeds, keys)
            finally:
                for a, v in snapshot.items():
                    setattr(model, a, v)

        def one_step(K, params, opt, imgs_all, R_all, T_all, idx, phase, lrs,
                     keys):
            return seed_axis_exec(
                lambda k, p, o, ia, ra, ta, ix, ky: scene_fn(
                    k, p, o, ia, ra, ta, ix, phase, lrs, ky
                ),
                K, params, opt, imgs_all, R_all, T_all, idx, keys,
            )

        from ..utils.aot_cache import aot_jit

        step = aot_jit(one_step, donate_argnums=(1, 2), label="scene_step")

        @aot_jit(donate_argnums=(1, 2), label="scene_multi_step")
        def multi(K, params, opt, imgs_all, R_all, T_all, idx_s, phase, lrs,
                  keys_s):
            def body(carry, xs):
                p, o = carry
                idx, keys = xs
                p, o, loss = one_step(K, p, o, imgs_all, R_all, T_all, idx,
                                      phase, lrs, keys)
                return (p, o), loss

            (params, opt), losses = jax.lax.scan(
                body, (params, opt), (idx_s, keys_s)
            )
            return params, opt, losses

        return step, multi

    # ------------------------------------------------------------------
    # checkpoint / resume
    # ------------------------------------------------------------------

    def save(self, epoch, batch):
        """Snapshot in ONE packed dispatch; the pickle write (and the
        single byte-buffer pull) runs on the background worker."""
        packed = self._ckpt_pack((self.params, self.opt_state))
        meta = {
            "epoch": epoch, "batch": batch,
            "scene_seeds": self.scene_seeds, "n_valid": self.n_valid,
            "key": np.asarray(self._key), "dead": self.dead.copy(),
            "loss_sums": self.loss_sums.copy(), "n_seen": self.n_seen.copy(),
        }

        def _write():
            params, opt_state = self._ckpt_unpack(np.asarray(packed))
            to_np = lambda t: jax.tree_util.tree_map(np.asarray, t)
            state = dict(meta, params=to_np(params),
                         opt_state=to_np(opt_state))
            tmp = self.run_dirs[0] / (MULTI_SCENE_CKPT + ".tmp")
            with open(tmp, "wb") as f:
                pickle.dump(state, f)
            tmp.replace(self.run_dirs[0] / MULTI_SCENE_CKPT)

        self._host.submit(_write, fatal=True)

    def _restore(self, ckpt):
        if [list(s) for s in ckpt["scene_seeds"]] != [
            list(s) for s in self.scene_seeds
        ]:
            raise ValueError(
                "resume on a different topology: checkpoint seeds "
                f"{ckpt['scene_seeds']} != current {self.scene_seeds}"
            )
        to_j = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
        self.params = to_j(ckpt["params"])
        self.opt_state = to_j(ckpt["opt_state"])
        self._key = jnp.asarray(ckpt["key"])
        self.dead = np.asarray(ckpt["dead"], bool).copy()
        self.loss_sums = np.asarray(ckpt["loss_sums"]).copy()
        self.n_seen = (
            np.broadcast_to(np.asarray(ckpt["n_seen"], np.int64),
                            (self.n_scene,)).copy()
        )
        if ckpt["batch"] >= self.n_batches:
            self.epoch_start, self.batch_start = ckpt["epoch"] + 1, 1
        else:
            self.epoch_start, self.batch_start = (
                ckpt["epoch"], ckpt["batch"] + 1
            )

    # ------------------------------------------------------------------
    # interval actions
    # ------------------------------------------------------------------

    def _val_and_log(self, it, epoch, batch):
        if self._opacity_fn is None:
            self._opacity_fn = jax.jit(
                jax.vmap(jax.vmap(self.model.get_opacities))
            )
        alphas = np.asarray(self._opacity_fn(self.params))  # (n_scene, S, N)
        alive = (alphas > 0.01).sum(axis=2) > 0
        for i in range(self.n_scene):
            for j in range(self.n_valid):
                if not alive[i, j] and not self.dead[i, j]:
                    self.dead[i, j] = True
                    print_log(
                        f"[multi-scene] scene {i} seed "
                        f"{self.scene_seeds[i][j]} has no more blocks at "
                        f"epoch {epoch} — excluded from selection"
                    )
                self.val_metrics[i][j].update({
                    f"alpha{k}": float(a) for k, a in enumerate(alphas[i, j])
                })
                self.val_metrics[i][j].log_and_reset(
                    it=it, epoch=epoch, batch=batch
                )
        if self.dead[:, : self.n_valid].all():
            raise RuntimeError("No more blocks....")

    # ------------------------------------------------------------------
    # training
    # ------------------------------------------------------------------

    def run(self):
        try:
            return self._run()
        except BaseException:
            # async checkpoint saves must land before the exception
            # propagates — a killed sweep resumes from that file
            self._host.join(raise_fatal=False)
            raise

    def _run(self):
        t0 = time.time()
        for epoch in range(self.epoch_start, self.n_epoches + 1):
            phase = self.model.phase_for_epoch(epoch - 1, training=True)
            lrs = {
                k: jnp.float32(v)
                for k, v in self.scheduler.lrs(epoch - 1).items()
            }
            if epoch != self.epoch_start or self.batch_start == 1:
                # buffered loss futures belong to the PREVIOUS epoch's
                # accounting — drain before resetting the sums
                self._drain_losses()
                self.loss_sums[:] = 0.0
                self.n_seen[:] = 0
            batch_start = (
                self.batch_start if epoch == self.epoch_start else 1
            )
            cur_iter = (epoch - 1) * self.n_batches + batch_start

            def run_group(group):
                """group: list of (batch_idx, (n_scene, B) view-id arrays)."""
                idx_l, n_reals = [], []
                for _, ids_sc in group:
                    padded = [
                        _pad_ids(ids, self.batch_size) for ids in ids_sc
                    ]
                    idx_l.append(np.stack([p[0] for p in padded]))
                    n_reals.append(
                        np.array([p[1] for p in padded], np.int64)
                    )
                spc = len(group)
                n_keys = spc * self.n_scene * self.S
                # one split + slices (star-unpacking a device array would
                # issue n_keys tiny slice dispatches per call)
                all_keys = jax.random.split(self._key, n_keys + 1)
                self._key = all_keys[0]
                keys_s = all_keys[1:].reshape(spc, self.n_scene, self.S, 2)
                if spc == 1:
                    self.params, self.opt_state, losses = self._step(
                        self.K, self.params, self.opt_state,
                        self._dev_imgs, self._dev_R, self._dev_T,
                        jnp.asarray(idx_l[0]), phase, lrs, keys_s[0],
                    )
                else:
                    self.params, self.opt_state, losses = self._multi_step(
                        self.K, self.params, self.opt_state,
                        self._dev_imgs, self._dev_R, self._dev_T,
                        jnp.asarray(np.stack(idx_l)), phase, lrs, keys_s,
                    )
                # no sync: the (spc, n_scene, S) losses stay device futures
                # until the next log/val interval (_drain_losses)
                self._loss_buffer.append((losses, n_reals))

            SPC = max(self.steps_per_call, 1)
            pending = []
            iters = [ld[0].iter_indices() for ld in self.loaders]
            for batch in range(1, self.n_batches + 1):
                ids_sc = [next(it) for it in iters]
                if batch < batch_start:
                    continue
                pending.append((batch, ids_sc))
                if len(pending) < SPC:
                    continue
                cur_iter = self._flush(pending, run_group, cur_iter, epoch)
                pending = []
            if pending:
                cur_iter = self._flush(pending, run_group, cur_iter, epoch)
            if epoch % max(self.n_epoches // 10, 1) == 0 or epoch == 1:
                means = (
                    self.loss_sums / np.maximum(self.n_seen, 1)[:, None]
                )
                print_log(
                    f"[multi-scene] epoch {epoch}/{self.n_epoches} "
                    f"losses={np.round(means[:, : self.n_valid], 5).tolist()}"
                    f" ({time.time() - t0:.1f}s)"
                )

        self._drain_losses()
        final_losses = (
            self.loss_sums / np.maximum(self.n_seen, 1)[:, None]
        )
        masked = np.where(
            (np.arange(self.S)[None, :] < self.n_valid) & ~self.dead,
            final_losses, np.inf,
        )
        self.best = masked.argmin(axis=1)  # per-scene best seed slot
        self.save(self.n_epoches, self.n_batches)
        for i in range(self.n_scene):
            scene_params = unstack_params(self.params, i)
            scene_opt = unstack_params(self.opt_state, i)
            if self.n_valid > 1:
                for j, s in enumerate(self.scene_seeds[i][: self.n_valid]):
                    save_checkpoint(
                        self.run_dirs[i] / f"seed{s}" / "model.pkl",
                        unstack_params(scene_params, j),
                        unstack_params(scene_opt, j),
                        self.n_epoches, self.n_batches,
                        model_kwargs=self.cfgs[i].get("model", {}),
                    )
            b = int(self.best[i])
            save_checkpoint(
                self.run_dirs[i] / "model.pkl",
                unstack_params(scene_params, b),
                unstack_params(scene_opt, b),
                self.n_epoches, self.n_batches,
                model_kwargs=self.cfgs[i].get("model", {}),
            )
            print_log(
                f"[multi-scene] scene {i} ({self.datasets[i].tag}): "
                f"losses={final_losses[i, : self.n_valid].round(5).tolist()}"
                f" -> seed {self.scene_seeds[i][b]}"
            )
        self._host.join()  # protocol checkpoint on disk before returning
        return self.params, self.best, final_losses[:, : self.n_valid]

    def _flush(self, pending, run_group, cur_iter, epoch):
        run_group(pending)
        last_batch = pending[-1][0]
        do_log = do_val = False
        for _ in pending:
            if self.train_stat_interval:
                do_log |= cur_iter % self.train_stat_interval == 0
            if self.val_stat_interval:
                do_val |= cur_iter % self.val_stat_interval == 0
            cur_iter += 1
        if do_log:
            self._drain_losses()
            for i in range(self.n_scene):
                self.train_metrics[i].log_and_reset(
                    it=cur_iter - 1, epoch=epoch, batch=last_batch
                )
        if do_val:
            self._drain_losses()  # selection state must be current
            self._val_and_log(cur_iter - 1, epoch, last_batch)
            self.save(epoch, last_batch)
        return cur_iter

    def _drain_losses(self):
        """Force buffered per-group losses (ONE device concat + ONE
        transfer per interval) into the per-scene/seed accounting."""
        if not self._loss_buffer:
            return
        buf, self._loss_buffer = self._loss_buffer, []
        mats = [v if v.ndim == 3 else v[None] for v, _ in buf]
        rows = np.asarray(
            jnp.concatenate(mats) if len(mats) > 1 else mats[0]
        )  # (total_steps, n_scene, S)
        n_reals = [n for _, ns in buf for n in ns]
        for g, n_real in enumerate(n_reals):  # n_real: (n_scene,)
            self.loss_sums += rows[g] * n_real[:, None]
            self.n_seen += n_real
            for i in range(self.n_scene):
                self.train_metrics[i].update({
                    f"loss_s{s}": float(rows[g, i, j])
                    for j, s in enumerate(
                        self.scene_seeds[i][: self.n_valid])
                }, N=int(n_real[i]))

    # ------------------------------------------------------------------
    # evaluation: the reference's full per-scan surface, per scene
    # ------------------------------------------------------------------

    def evaluate(self, quali=True, quali_kwargs=None):
        from ..eval.full import evaluate_run
        from ..losses.vgg import LPIPSLoss

        assert hasattr(self, "best"), "evaluate() requires a finished run()"
        lpips = LPIPSLoss(
            vgg=self.model.perceptual_loss.vgg
            if self.model.perceptual_loss else None
        )
        results = []
        snapshot = {a: getattr(self.model, a) for a in _CAMERA_ATTRS}
        try:
            for i in range(self.n_scene):
                # per-scene camera for eval renders
                self.model.set_camera(self.datasets[i].K[0])
                p = unstack_params(
                    unstack_params(self.params, i), int(self.best[i])
                )
                results.append(evaluate_run(
                    self.model, p, self.loaders[i][2], self.datasets[i],
                    self.run_dirs[i], quali=quali, lpips=lpips,
                    label=self.datasets[i].tag or f"scene{i}",
                    quali_kwargs=quali_kwargs,
                ))
        finally:
            for a, v in snapshot.items():
                setattr(self.model, a, v)
        return results


