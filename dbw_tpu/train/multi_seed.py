"""Multi-seed training driver: the reference's multi_pipeline.sh (5
sequential seeded runs + manual min-loss selection, scripts/
multi_pipeline.sh:12-23) as one seed-parallel program.

On an S-seed mesh each optimization runs on its own devices with zero
cross-seed traffic; on a single chip the seed axis is just a vmapped
leading dimension (still one compiled program — far cheaper than S
sequential runs because the per-step launch overhead amortizes and XLA
overlaps the independent seeds' compute).

Trainer-parity features (reference src/trainer.py, applied to the stacked
program):
- periodic checkpoint of the stacked params/opt with a mid-epoch batch
  cursor, and exact resume (``multi_model.pkl``; the loader's shuffle
  stream is keyed by (seed, epoch) so a resumed run replays the
  uninterrupted batch order bit for bit),
- per-seed val opacity streams (``seed{s}/val_metrics.tsv``) and a shared
  per-seed train-loss stream (``train_metrics.tsv``),
- dead-seed tracking: a seed whose blocks have all collapsed (reference's
  ``RuntimeError('No more blocks....')``, trainer.py:153-154) is excluded
  from auto-selection; if EVERY seed dies the protocol aborts like the
  reference run would,
- final evaluation surface per seed (``evaluate``): each run dir gets the
  reference's ``final_scores.tsv``; the auto-selected best seed gets the
  full artifact set (quali_eval/, DTU protocol) via ``eval.full``.
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
from ..parallel.seeds import stack_params, unstack_params
from .trainer import _HostWorker

MULTI_CKPT = "multi_model.pkl"


class MultiSeedTrainer:
    """Trains S seeds of one scene simultaneously; selects min train loss.

    On a multi-device host the seed axis is sharded over the mesh: the
    requested seeds are padded to the mesh's seed-axis size with duplicates
    (``parallel.seeds.pad_seeds``) that are masked out of selection, and
    the stacked params/opt get a ``NamedSharding`` over their leading axis —
    XLA then runs each seed's optimization on its own device group with
    zero cross-seed traffic."""

    def __init__(self, cfg, run_dir, seeds, resume=False, n_data=None,
                 n_spatial=None):
        """``n_data``: explicit data-axis width (devices sharding the view
        batch; gradients pmean over it). This is the production mode for
        single-scene wall-clock scaling — the seed/scene axes multiply
        THROUGHPUT across independent optimizations, but only the data
        axis shortens ONE scan's optimization (BASELINE.md north-star):
        ``multi_pipeline.py --seeds 4321 --n-data 8`` trains one seed with
        the B-view batch split over 8 devices. Divisibility is validated
        loudly (no silent fallback for an explicitly requested axis).

        ``n_spatial``: pixel-band axis width — each band device renders
        H/n_spatial image rows of its seed/view shard and the band images
        are all_gathered for the cross-pixel losses (parallel/seeds.py).
        Unlike the data axis this is not capped by the view batch size, so
        ``--seeds 4321 --n-spatial 8`` puts all 8 devices on ONE scan even
        at the reference's B=4."""
        self.run_dir = path_mkdir(run_dir)
        self.cfg = cfg
        ckpt = None
        if resume:
            path = self.run_dir / MULTI_CKPT
            if not path.exists():
                raise FileNotFoundError(
                    f"resume requested but {path} does not exist")
            with open(path, "rb") as f:
                ckpt = pickle.load(f)
            seeds = ckpt["orig_seeds"]
            print_log(
                f"[multi-seed] resuming from {path}: epoch={ckpt['epoch']}, "
                f"batch={ckpt['batch']}, seeds={seeds}"
            )
        self.orig_seeds = list(seeds)
        self.seeds = list(seeds)
        self.n_valid = len(self.seeds)
        self.batch_size = cfg["training"].get("batch_size", 4)
        self._shard = None
        self._mesh = None
        n_dev = len(jax.devices())
        # loud-validation contract: EVERY invalid axis value gets a clear
        # ValueError (n_data=0 used to slip past to a ZeroDivisionError)
        if n_data is not None and n_data < 1:
            raise ValueError(f"n_data must be >= 1, got {n_data}")
        if n_spatial is not None and int(n_spatial) < 1:
            raise ValueError(f"n_spatial must be >= 1, got {n_spatial}")
        if n_data is not None and n_data > 1 and n_dev == 1:
            raise ValueError(
                f"n_data={n_data} requested but only {n_dev} device present")
        n_sp = int(n_spatial) if n_spatial else 1
        if n_sp > 1 and n_dev == 1:
            raise ValueError(
                f"n_spatial={n_sp} requested but only {n_dev} device present")
        if n_dev > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import factor_devices, make_mesh
            from ..parallel.seeds import pad_seeds

            if n_sp > 1:
                # explicit spatial axis: validate loudly, like n_data
                if n_dev % n_sp:
                    raise ValueError(
                        f"n_spatial={n_sp} does not divide {n_dev} devices")
                n_dev = n_dev // n_sp
                if n_data is None and self.n_valid > n_dev:
                    raise ValueError(
                        f"n_spatial={n_sp} leaves {n_dev} device group(s) "
                        f"for {self.n_valid} seeds — reduce seeds or "
                        f"n_spatial")
            if n_data is not None:
                # explicit data axis: validate, never silently fall back
                if n_dev % n_data:
                    raise ValueError(
                        f"n_data={n_data} does not divide {n_dev} devices")
                if self.batch_size % n_data:
                    raise ValueError(
                        f"batch_size={self.batch_size} is not divisible by "
                        f"n_data={n_data} (each data-axis device takes "
                        f"B/n_data views)")
                seed_ax = n_dev // n_data
            else:
                # leftover devices beyond the seed count become a data axis
                # (gradient pmean over views); if the view batch doesn't
                # divide it, fall back to all-seed with padded duplicate
                # slots. Seed slots round up to a multiple of the seed axis
                # (a slot per device group; duplicates are masked at
                # selection).
                seed_ax, n_data = factor_devices(n_dev, n_seeds=self.n_valid)
                if self.batch_size % n_data != 0:
                    seed_ax, n_data = n_dev, 1
            slots = -(-self.n_valid // seed_ax) * seed_ax
            self.seeds, self.n_valid = pad_seeds(self.seeds, slots)
            self._mesh = make_mesh(seed_ax, n_data, n_spatial=n_sp)
            self._shard = NamedSharding(self._mesh, P("seed"))
            print_log(
                f"[multi-seed] mesh (seed={seed_ax}, data={n_data}"
                + (f", sp={n_sp}" if n_sp > 1 else "")
                + f"): {self.n_valid} seeds in {slots} slots "
                f"({slots - self.n_valid} padded)"
            )
        S = len(self.seeds)
        self.train_loader, self.val_loader, self.test_loader = (
            create_train_val_test_loader(cfg)
        )
        self.dataset = self.train_loader.dataset
        self.model = create_model(cfg, self.dataset.img_size)
        self.model.set_camera(self.dataset.K[0])
        self.n_epoches = cfg["training"]["n_epoches"]
        self.n_batches = len(self.train_loader)
        tcfg = cfg["training"]
        self.train_stat_interval = tcfg.get("train_stat_interval", 0)
        self.val_stat_interval = tcfg.get("val_stat_interval", 0)

        params_list = [self.model.init_params(seed=s) for s in self.seeds]
        self.params = stack_params(params_list)
        self.optimizer = create_optimizer(cfg, params_list[0])
        self.opt_state = stack_params(
            [self.optimizer.init(p) for p in params_list]
        )
        self.scheduler = create_scheduler(cfg, self.optimizer.base_lrs)
        self._key = jax.random.PRNGKey(max(self.seeds) + 1)
        self.dead = np.zeros(S, bool)
        self.epoch_start, self.batch_start = 1, 1
        self.loss_sums, self.n_seen = np.zeros(S), 0

        if ckpt is not None:
            self._restore(ckpt)
        if self._shard is not None:
            self.params = jax.device_put(self.params, self._shard)
            self.opt_state = jax.device_put(self.opt_state, self._shard)
        # replay the uninterrupted batch order after a resume
        self.train_loader.set_epoch(self.epoch_start - 1)

        append = self.epoch_start > 1 or self.batch_start > 1
        resume_iter = (
            (self.epoch_start - 1) * self.n_batches + self.batch_start - 1
        )
        self.train_metrics = Metrics(
            *[f"loss_s{s}" for s in self.orig_seeds],
            log_file=self.run_dir / "train_metrics.tsv", append=append,
            truncate_iter=resume_iter,
        )
        alpha_names = [f"alpha{k}" for k in range(self.model.n_blocks)]
        self.val_metrics = [
            Metrics(*alpha_names,
                    log_file=path_mkdir(self.run_dir / f"seed{s}")
                    / "val_metrics.tsv", append=append,
                    truncate_iter=resume_iter)
            for s in self.orig_seeds
        ]

        # visual evolution streams of the current-best seed (the reference
        # protocol gets per-run ImageLogger streams from each trainer,
        # trainer.py:66-69; here one stream tracks the auto-selection)
        self.viz = bool(tcfg.get("multi_seed_viz", True))
        if self.viz:
            from ..utils.image import ImageLogger
            from ..utils.misc import use_seed

            with use_seed(12345):
                src = (self.val_loader if len(self.val_loader) > 0
                       else self.train_loader)
                samples, _ = next(iter(src))
            self.viz_samples = {k: v[:4] for k, v in samples.items()}
            self.rec_logger = ImageLogger(
                self.run_dir / "reconstructions_best", self.viz_samples
            )
            self._predict = None

        model, optimizer = self.model, self.optimizer

        # Device-resident dataset: batches are gathered ON DEVICE by view
        # index inside the jitted step (see train/trainer.py — the host
        # ships B int32s per step instead of the stacked images).
        self._dev_imgs = jnp.asarray(self.dataset.imgs)
        self._dev_R = jnp.asarray(self.dataset.R)
        self._dev_T = jnp.asarray(self.dataset.T)
        # async host pipeline (see train/trainer.py): per-call losses stay
        # device futures until a log interval — the old per-call np.asarray
        # stalled the dispatch pipeline once per call — and checkpoint
        # pickling runs on a background worker over ONE packed byte buffer
        from ..utils.device_pack import make_packer

        self._host = _HostWorker()
        self._loss_buffer = []
        self._ckpt_pack, self._ckpt_unpack = make_packer(
            (self.params, self.opt_state)
        )

        self.steps_per_call = int(tcfg.get("steps_per_call", 1))
        if self._mesh is not None:
            from ..parallel.seeds import MultiSeedRunner

            runner = MultiSeedRunner(model, optimizer, self._mesh)
            self._step = runner.step_idx
            self._multi_step = runner.multi_step_idx
        else:
            from functools import partial

            def one_step(params_S, opt_S, imgs_all, R_all, T_all, idx, phase,
                         lrs, keys):
                imgs, R, T = imgs_all[idx], R_all[idx], T_all[idx]

                def one(p, o, k):
                    def loss_fn(pp):
                        losses = model.forward(pp, phase, imgs, R, T, k)
                        return losses["total"], losses

                    grads, losses = jax.grad(loss_fn, has_aux=True)(p)
                    updates, o = optimizer.update(grads, o, lrs)
                    p = jax.tree_util.tree_map(
                        lambda a, u: a + u, p, updates
                    )
                    return p, o, losses["total"]

                from ..parallel.seeds import seed_axis_exec

                return seed_axis_exec(one, params_S, opt_S, keys)

            # AOT executable cache: every protocol process was paying the
            # full ~8-min remote compile for the scanned seed step
            from ..utils.aot_cache import aot_jit

            self._step = aot_jit(
                one_step, donate_argnums=(0, 1), label="seed_step"
            )

            @aot_jit(donate_argnums=(0, 1), label="seed_multi_step")
            def multi_step(params_S, opt_S, imgs_all, R_all, T_all, idx_s,
                           phase, lrs, keys_s):
                def body(carry, xs):
                    p, o = carry
                    idx, keys = xs
                    p, o, loss = one_step(p, o, imgs_all, R_all, T_all, idx,
                                          phase, lrs, keys)
                    return (p, o), loss

                (params_S, opt_S), losses = jax.lax.scan(
                    body, (params_S, opt_S), (idx_s, keys_s)
                )
                return params_S, opt_S, losses

            self._multi_step = multi_step

    # ------------------------------------------------------------------
    # checkpoint / resume
    # ------------------------------------------------------------------

    def save(self, epoch, batch):
        """Stacked-protocol checkpoint: params/opt for ALL seed slots plus
        the epoch/batch cursor, RNG key and running loss accounting — a
        resume reproduces the uninterrupted run exactly.

        The device state is snapshotted in ONE packed dispatch and the
        pickle runs on the background worker (one transfer; the main
        thread keeps dispatching train steps — see train/trainer.py)."""
        packed = self._ckpt_pack((self.params, self.opt_state))
        key = np.asarray(self._key)
        meta = {
            "epoch": epoch, "batch": batch,
            "orig_seeds": self.orig_seeds, "seeds": self.seeds,
            "n_valid": self.n_valid,
            "key": key, "dead": self.dead.copy(),
            "loss_sums": self.loss_sums.copy(), "n_seen": self.n_seen,
            "model_kwargs": self.cfg.get("model", {}),
        }

        def _write():
            params, opt_state = self._ckpt_unpack(np.asarray(packed))
            to_np = lambda t: jax.tree_util.tree_map(np.asarray, t)
            state = dict(meta, params=to_np(params),
                         opt_state=to_np(opt_state))
            tmp = self.run_dir / (MULTI_CKPT + ".tmp")
            with open(tmp, "wb") as f:
                pickle.dump(state, f)
            tmp.replace(self.run_dir / MULTI_CKPT)

        self._host.submit(_write, fatal=True)

    def _restore(self, ckpt):
        if list(ckpt["seeds"]) != list(self.seeds):
            raise ValueError(
                "resume on a different device topology: checkpoint seed "
                f"slots {ckpt['seeds']} != current {self.seeds}"
            )
        to_j = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
        self.params = to_j(ckpt["params"])
        self.opt_state = to_j(ckpt["opt_state"])
        self._key = jnp.asarray(ckpt["key"])
        self.dead = np.asarray(ckpt["dead"], bool).copy()
        self.loss_sums = np.asarray(ckpt["loss_sums"]).copy()
        self.n_seen = int(ckpt["n_seen"])
        if ckpt["batch"] >= self.n_batches:
            self.epoch_start, self.batch_start = ckpt["epoch"] + 1, 1
        else:
            self.epoch_start, self.batch_start = (
                ckpt["epoch"], ckpt["batch"] + 1
            )

    # ------------------------------------------------------------------
    # validation-interval actions
    # ------------------------------------------------------------------

    def _val_and_log(self, it, epoch, batch):
        """Per-seed opacity streams + dead-seed tracking (reference
        trainer.py:149-161 per run)."""
        alphas = np.asarray(
            jax.vmap(self.model.get_opacities)(self.params)
        )  # (S, N)
        alive = (alphas > 0.01).sum(axis=1) > 0
        for i in range(self.n_valid):
            if not alive[i] and not self.dead[i]:
                self.dead[i] = True
                print_log(
                    f"[multi-seed] seed {self.seeds[i]} has no more blocks "
                    f"at epoch {epoch} — excluded from selection"
                )
            self.val_metrics[i].update(
                {f"alpha{k}": float(a) for k, a in enumerate(alphas[i])}
            )
            self.val_metrics[i].log_and_reset(it=it, epoch=epoch, batch=batch)
        if self.dead[: self.n_valid].all():
            # every seed collapsed: abort like the reference's runs would
            raise RuntimeError("No more blocks....")
        if self.viz:
            self._log_best_recon(it, epoch)

    def _log_best_recon(self, it, epoch):
        """Evolution snapshot of the current-best (min running loss) live
        seed's reconstruction on the fixed viz views. ONE jitted dispatch
        (the best-slot gather happens inside the program) returning uint8;
        the pull/encode runs on the background worker."""
        masked = np.where(
            (np.arange(len(self.seeds)) < self.n_valid) & ~self.dead,
            self.loss_sums, np.inf,
        )
        best = int(np.argmin(masked))
        if self._predict is None:
            model = self.model

            @jax.jit
            def predict_best(params_S, best, phase, R, T):
                p = jax.tree_util.tree_map(lambda x: x[best], params_S)
                rec = model.predict(p, phase, R, T)[0]
                return (jnp.clip(rec, 0.0, 1.0) * 255.0 + 0.5).astype(
                    jnp.uint8
                )

            self._predict = predict_best
            self._viz_R = jnp.asarray(self.viz_samples["R"])
            self._viz_T = jnp.asarray(self.viz_samples["T"])
        phase = self.model.phase_for_epoch(epoch - 1, training=False)
        rec = self._predict(
            self.params, np.int32(best), phase, self._viz_R, self._viz_T
        )
        self._host.submit(lambda: self.rec_logger.save(np.asarray(rec), it))

    def _log_train(self, it, epoch, batch):
        print_log(
            f"[multi-seed] epoch {epoch}/{self.n_epoches} "
            f"batch {batch}/{self.n_batches} "
            f"train_metrics: {self.train_metrics}"[:1000]
        )
        self.train_metrics.log_and_reset(it=it, epoch=epoch, batch=batch)

    # ------------------------------------------------------------------
    # training
    # ------------------------------------------------------------------

    def run(self):
        try:
            return self._run()
        except BaseException:
            # async checkpoint saves must land before the exception
            # propagates — a killed protocol resumes from that file
            self._host.join(raise_fatal=False)
            raise

    def _run(self):
        S = len(self.seeds)
        t0 = time.time()
        for epoch in range(self.epoch_start, self.n_epoches + 1):
            phase = self.model.phase_for_epoch(epoch - 1, training=True)
            lrs = {
                k: jnp.float32(v)
                for k, v in self.scheduler.lrs(epoch - 1).items()
            }
            if epoch != self.epoch_start or self.batch_start == 1:
                # any still-buffered loss futures belong to the PREVIOUS
                # epoch's accounting — drain before resetting the sums
                self._drain_losses()
                self.loss_sums[:] = 0.0
                self.n_seen = 0
            batch_start = (
                self.batch_start if epoch == self.epoch_start else 1
            )
            cur_iter = (epoch - 1) * self.n_batches + batch_start

            def run_group(group):
                """group: list of (batch_idx, view_ids)."""
                idx_l, n_reals = [], []
                for _, ids in group:
                    idx, n_real = _pad_ids(ids, self.batch_size)
                    idx_l.append(idx)
                    n_reals.append(n_real)
                spc = len(group)
                # one split + slices (NOT `self._key, *keys = split(...)`:
                # star-unpacking a device array issues spc*S tiny slice
                # dispatches per call on the high-latency axon runtime)
                all_keys = jax.random.split(self._key, spc * S + 1)
                self._key = all_keys[0]
                keys_s = all_keys[1:].reshape(spc, S, 2)
                if spc == 1:
                    self.params, self.opt_state, losses = self._step(
                        self.params, self.opt_state,
                        self._dev_imgs, self._dev_R, self._dev_T,
                        jnp.asarray(idx_l[0]), phase, lrs, keys_s[0],
                    )
                else:
                    self.params, self.opt_state, losses = self._multi_step(
                        self.params, self.opt_state,
                        self._dev_imgs, self._dev_R, self._dev_T,
                        jnp.asarray(np.stack(idx_l)), phase, lrs, keys_s,
                    )
                # no sync here: the (spc, S) losses stay a device future
                # until the next log/val interval (_drain_losses) so the
                # host keeps dispatching and XLA pipelines the calls
                self._loss_buffer.append((losses, n_reals))

            SPC = max(self.steps_per_call, 1)
            pending = []
            for batch, ids in enumerate(self.train_loader.iter_indices(),
                                        start=1):
                if batch < batch_start:
                    continue
                pending.append((batch, ids))
                if len(pending) < SPC:
                    continue
                cur_iter = self._flush(pending, run_group, cur_iter, epoch)
                pending = []
            if pending:
                cur_iter = self._flush(pending, run_group, cur_iter, epoch)
            if epoch % max(self.n_epoches // 10, 1) == 0 or epoch == 1:
                print_log(
                    f"[multi-seed] epoch {epoch}/{self.n_epoches} "
                    f"losses="
                    f"{np.round(self.loss_sums / max(self.n_seen, 1), 5).tolist()} "
                    f"({time.time() - t0:.1f}s)"
                )

        self._drain_losses()
        final_losses = self.loss_sums / max(self.n_seen, 1)
        # padded duplicate-seed slots and dead seeds are excluded
        masked = np.where(
            (np.arange(len(self.seeds)) < self.n_valid) & ~self.dead,
            final_losses, np.inf,
        )
        best = int(np.argmin(masked))
        self.best = best
        print_log(
            f"[multi-seed] final per-seed loss="
            f"{final_losses[: self.n_valid].round(5).tolist()}"
            f" -> auto-selected seed {self.seeds[best]} (min train loss)"
        )
        self.save(self.n_epoches, self.n_batches)
        for i, s in enumerate(self.seeds[: self.n_valid]):
            p_i = unstack_params(self.params, i)
            o_i = unstack_params(self.opt_state, i)
            save_checkpoint(
                self.run_dir / f"seed{s}" / "model.pkl", p_i, o_i,
                self.n_epoches, self.n_batches,
                model_kwargs=self.cfg.get("model", {}),
            )
        best_params = unstack_params(self.params, best)
        save_checkpoint(
            self.run_dir / "model.pkl", best_params,
            unstack_params(self.opt_state, best), self.n_epoches,
            self.n_batches, model_kwargs=self.cfg.get("model", {}),
        )
        with open(self.run_dir / "seed_selection.tsv", "w") as f:
            f.write("seed\tfinal_train_loss\tdead\tselected\n")
            for i, s in enumerate(self.seeds[: self.n_valid]):
                f.write(
                    f"{s}\t{final_losses[i]:.6f}\t{int(self.dead[i])}"
                    f"\t{int(i == best)}\n"
                )
        self._host.join()  # checkpoint + viz frames on disk before videos
        if self.viz:
            try:
                self.rec_logger.save_video()
            except Exception as e:  # pragma: no cover - viz is best-effort
                print_log(f"[multi-seed] evolution video failed: {e}")
        return best_params, self.seeds[best], final_losses[: self.n_valid]

    def _drain_losses(self):
        """Force buffered per-group losses (ONE device concat + ONE
        transfer per interval) and feed the running per-seed accounting.

        Per-batch weighting: each row is the model's mean over the PADDED
        batch (a ragged tail's pad views duplicate its last view, so that
        view is slightly over-weighted — matching the single-seed trainer's
        documented <1% bias); weighting by n_real keeps whole-batch vs
        tail-batch accounting right."""
        if not self._loss_buffer:
            return
        buf, self._loss_buffer = self._loss_buffer, []
        mats = [v if v.ndim == 2 else v[None] for v, _ in buf]
        rows = np.asarray(jnp.concatenate(mats) if len(mats) > 1 else mats[0])
        n_reals = [n for _, ns in buf for n in ns]
        for row, n_real in zip(rows, n_reals):
            self.loss_sums[:] = self.loss_sums + row * n_real
            self.n_seen += n_real
            self.train_metrics.update({
                f"loss_s{s}": float(row[j])
                for j, s in enumerate(self.orig_seeds)
            }, N=n_real)

    def _flush(self, pending, run_group, cur_iter, epoch):
        """Run a buffered batch group and fire interval actions crossed by
        it (metrics/val/checkpoint — the single-seed trainer's cadence).

        A ragged epoch tail (len(pending) < steps_per_call) runs as its own
        scanned program: ONE extra compile for the tail size, reused every
        epoch. The alternative (the single-seed trainer replays tails
        through the 1-step program) pays (tail-1) extra dispatches per
        epoch — with axon's ~100ms dispatch latency over hundreds of
        epochs that costs as much as the extra compile, and the scanned
        tail keeps the buffered loss shapes uniform."""
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
            self._log_train(cur_iter - 1, epoch, last_batch)
        if do_val:
            self._drain_losses()  # selection state must be current
            self._val_and_log(cur_iter - 1, epoch, last_batch)
            self.save(epoch, last_batch)
        return cur_iter

    # ------------------------------------------------------------------
    # final evaluation surface (reference: every run of multi_pipeline.sh
    # runs Trainer.evaluate — trainer.py:241-272)
    # ------------------------------------------------------------------

    def evaluate(self, per_seed_full=False, quali_kwargs=None):
        """Per-seed ``final_scores.tsv`` + the FULL artifact set (quali,
        DTU protocol, gallery) for the auto-selected best seed in the
        protocol run dir. ``per_seed_full=True`` additionally gives every
        seed the full surface (the reference's exact per-run behavior, at
        5x the eval wall-clock)."""
        from ..eval.full import evaluate_run
        from ..losses.vgg import LPIPSLoss

        assert hasattr(self, "best"), "evaluate() requires a finished run()"
        lpips = LPIPSLoss(
            vgg=self.model.perceptual_loss.vgg
            if self.model.perceptual_loss else None
        )
        results = {}
        for i, s in enumerate(self.seeds[: self.n_valid]):
            p_i = unstack_params(self.params, i)
            results[s] = evaluate_run(
                self.model, p_i, self.test_loader, self.dataset,
                self.run_dir / f"seed{s}",
                quali=per_seed_full, lpips=lpips, label=f"seed{s}",
                quali_kwargs=quali_kwargs,
            )
        best_params = unstack_params(self.params, self.best)
        results["best"] = evaluate_run(
            self.model, best_params, self.test_loader, self.dataset,
            self.run_dir, quali=True, lpips=lpips,
            label=f"best=seed{self.seeds[self.best]}",
            quali_kwargs=quali_kwargs,
        )
        return results


def _pad_ids(ids, bs):
    """Pad a ragged final batch's view-index vector by repeating the last
    view (same semantics as padding the materialized arrays)."""
    n = len(ids)
    ids = np.asarray(ids, np.int32)
    if n < bs:
        ids = np.concatenate([ids, np.repeat(ids[-1:], bs - n)])
    return ids, n
