"""Training driver (reference: src/trainer.py).

Host loop design: the device sees ONE jitted function per phase-shape
(build scene -> render -> losses -> Adam update, donated buffers); the host
computes the curriculum Phase and per-group LRs per epoch, streams fixed-
shape batches, and handles metrics/checkpoints/visualization at the
reference's intervals. Ragged final batches are padded to the static batch
size with a per-view validity mask folded into the photometric losses'
weighting (pad views repeat the last view; their weight is kept — matching
the reference's smaller-final-batch average within <1% — see
``run_single_batch_train``).
"""

from __future__ import annotations

import argparse
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..data import create_train_val_test_loader
from ..eval.metrics import Metrics
from ..models import create_model

from ..utils.aot_cache import aot_jit
from ..utils.config import dump_yaml, load_yaml
from ..utils.image import ImageLogger
from ..utils.logger import create_logger, print_log, print_warning
from ..utils.misc import path_exists, path_mkdir, use_seed
from ..utils.path import CONFIGS_PATH, RUNS_PATH
from .checkpoint import load_checkpoint, save_checkpoint
from .optimizer import create_optimizer
from .scheduler import create_scheduler

LOG_FMT = "Epoch [{}/{}], Iter [{}/{}], {}".format
N_VIZ_SAMPLES = 4
LIGHT_MEMORY_RESULTS = True


class _HostWorker:
    """Single background thread for host-side interval work (checkpoint
    pickling, image encoding, dashboard writes).

    The device path never waits for disk/encode: the main thread hands the
    worker device arrays (snapshots or fresh outputs — never buffers that a
    later donated step could invalidate) and keeps dispatching train steps;
    the worker's np.asarray pulls overlap device compute. One thread, FIFO,
    so artifact writes keep their order; ``join`` drains before anything
    that must observe the files (final plots, eval, end of run)."""

    def __init__(self):
        import queue
        import threading

        self._q = queue.Queue()
        self._fatal = None  # first exception from a fatal=True task
        self._t = threading.Thread(target=self._loop, daemon=True)
        self._t.start()

    def _loop(self):
        while True:
            item = self._q.get()
            if item is None:
                self._q.task_done()
                break
            fn, fatal = item
            try:
                fn()
            except Exception as e:
                # cosmetic tasks (dashboard/viz encodes) only warn, but a
                # failed CHECKPOINT write must stop the run at the next
                # interval — otherwise it trains for hours and leaves no
                # resumable/evaluable state on disk
                if fatal and self._fatal is None:
                    self._fatal = e
                print_warning(f"host worker task failed: {e}")
            finally:
                self._q.task_done()

    def submit(self, fn, fatal=False):
        self._check_fatal()
        self._q.put((fn, fatal))

    def join(self, raise_fatal=True):
        self._q.join()
        if raise_fatal:  # False on exception paths: don't mask the cause
            self._check_fatal()

    def _check_fatal(self):
        if self._fatal is not None:
            e, self._fatal = self._fatal, None
            raise RuntimeError(
                "async checkpoint write failed earlier (see warning above); "
                "the run has no usable saved state past that point"
            ) from e


class Trainer:
    """Pipeline to optimize one scene from a config dict (reference
    trainer.py:34-135)."""

    @use_seed()
    def __init__(self, cfg, run_dir):
        self.run_dir = path_mkdir(run_dir)
        self.cfg = cfg
        if cfg.get("training", {}).get("debug_nans"):
            # NaN anomaly detection (the reference keeps torch's
            # set_detect_anomaly toggle in comments, trainer.py:31; the JAX
            # equivalent re-runs offending primitives eagerly on NaN)
            jax.config.update("jax_debug_nans", True)
        self.train_loader, self.val_loader, self.test_loader = (
            create_train_val_test_loader(cfg)
        )
        self.dataset = self.train_loader.dataset
        self.model = create_model(cfg, self.dataset.img_size)
        self.model.set_camera(self.dataset.K[0])

        self.batch_size = cfg["training"].get("batch_size", 4)
        self.steps_per_call = int(cfg["training"].get("steps_per_call", 1))
        self.n_epoches = cfg["training"].get("n_epoches", 1)
        self.n_batches = len(self.train_loader)
        self.epoch_start, self.batch_start = 1, 1

        self.params = self.model.init_params(
            seed=cfg["training"].get("seed", 4321)
        )
        self.optimizer = create_optimizer(cfg, self.params)
        self.opt_state = self.optimizer.init(self.params)
        self.scheduler = create_scheduler(cfg, self.optimizer.base_lrs)
        self.load_from(cfg)
        self.cur_lr = self.scheduler.lrs(self.epoch_start - 1)["main"]
        print_log(
            f"Training state: epoch={self.epoch_start}, "
            f"batch={self.batch_start}, lr={self.cur_lr}"
        )

        # Per-step RNG is derived INSIDE the jitted step from a resident
        # base key and an int32 step counter (fold_in) — the old host-side
        # split chain cost one device dispatch per key, ~6 dispatches per
        # scanned call on the high-latency axon runtime. The counter is the
        # global step index, so a resumed run replays the exact key stream.
        self._base_key = jax.random.PRNGKey(cfg["training"].get("seed", 4321))
        self._step_ctr = (self.epoch_start - 1) * self.n_batches + (
            self.batch_start - 1
        )
        self._viz_ctr = 0
        # Device-resident dataset (SURVEY §7: a whole scene fits in HBM —
        # 49x300x400x3 f32 ~ 70 MB). Batches are gathered ON DEVICE by view
        # index inside the jitted step; the host ships B int32s per step
        # instead of ~7 MB of images (29 MB per 5-step scanned call), which
        # on the axon tunnel costs more than the device math itself.
        self._dev_imgs = jnp.asarray(self.dataset.imgs)
        self._dev_R = jnp.asarray(self.dataset.R)
        self._dev_T = jnp.asarray(self.dataset.T)
        # fixed loss-vector order: steps return ONE stacked (S, L) array
        # instead of a dict of S-vectors (one transfer per log window
        # instead of one per loss per call)
        self._loss_keys = [n[len("loss_"):] for n in self.model.loss_names]
        self._train_step = self._make_train_step()
        # Phase/LR device scalars change once per EPOCH; rebuilding them per
        # call shipped ~8 tiny host->device transfers per dispatch
        self._epoch_consts_cache = None
        # async host pipeline: train-step losses stay device futures until
        # the next log interval (the host keeps dispatching, XLA pipelines),
        # and checkpoint/viz host work runs on a background worker
        self._host = _HostWorker()
        self._loss_buffer = []
        self._window_t0 = time.time()
        self._window_imgs = 0
        self._predict_fn = None
        self._predict_syn_fn = None
        self._viz_fn = None
        self._viz_fn_failed = False
        self._opacity_fn = None
        # checkpoint snapshots: ONE jitted pack dispatch + ONE byte-buffer
        # pull instead of per-leaf copies/transfers (utils/device_pack.py)
        from ..utils.device_pack import make_packer

        self._ckpt_pack, self._ckpt_unpack = make_packer(
            (self.params, self.opt_state)
        )

        # metric streams: append whenever ANY prior progress exists (a
        # mid-first-epoch resume must not truncate the logged history)
        append = self.epoch_start > 1 or self.batch_start > 1
        # last iteration the checkpoint actually completed — TSV rows past
        # it are orphans of the interrupted run (they will be re-logged)
        resume_iter = (
            (self.epoch_start - 1) * self.n_batches + self.batch_start - 1
        )
        self.train_stat_interval = cfg["training"]["train_stat_interval"]
        self.val_stat_interval = cfg["training"]["val_stat_interval"]
        self.save_epoches = cfg["training"].get("save_epoches", [])
        # optional final-eval knobs forwarded to qualitative_eval (e.g.
        # n_traj_videos caps the per-view trajectory videos — each is 240
        # rendered frames, the dominant eval cost without a hw encoder)
        self.eval_kwargs = dict(cfg["training"].get("eval", {}))
        names = ["time/img"] + self.model.loss_names
        self.train_metrics = Metrics(
            *names, log_file=self.run_dir / "train_metrics.tsv",
            append=append, truncate_iter=resume_iter,
        )
        alpha_names = [f"alpha{k}" for k in range(self.model.n_blocks)]
        self.val_metrics = Metrics(
            *alpha_names, log_file=self.run_dir / "val_metrics.tsv",
            append=append, truncate_iter=resume_iter,
        )

        # visual streams (reference trainer.py:61-74)
        with use_seed(12345):
            src = self.val_loader if len(self.val_loader) > 0 else self.train_loader
            samples, _ = next(iter(src))
        self.viz_samples = {
            k: v[:N_VIZ_SAMPLES] for k, v in samples.items()
        }
        # device-resident viz cameras + uint8 GT: the viz streams transfer
        # uint8 (4x less tunnel traffic than f32) so GT must match dtype
        self._viz_R = jnp.asarray(self.viz_samples["R"])
        self._viz_T = jnp.asarray(self.viz_samples["T"])
        self._viz_gt_u8 = (
            np.clip(np.asarray(self.viz_samples["imgs"]), 0, 1) * 255 + 0.5
        ).astype(np.uint8)
        out_ext = "jpg" if LIGHT_MEMORY_RESULTS else "png"
        self.rec_logger = ImageLogger(
            self.run_dir / "reconstructions", self.viz_samples, out_ext=out_ext
        )
        self.rec2_logger = ImageLogger(
            self.run_dir / "reconstructions_hard", self.viz_samples, out_ext=out_ext
        )
        self.rec3_logger = ImageLogger(
            self.run_dir / "reconstructions_syn", self.viz_samples, out_ext="png"
        )
        self.txt_logger = ImageLogger(self.run_dir / "txt_blocks", out_ext=out_ext)
        from ..utils.visualizer import Visualizer

        viz_on = cfg["training"].get("visualizer_port") if self.with_training else None
        self.visualizer = Visualizer(viz_on, self.run_dir)

    # ------------------------------------------------------------------

    @property
    def with_training(self):
        # the epoch loop runs range(epoch_start, n_epoches + 1), so a resume
        # AT the final epoch still trains it
        return self.epoch_start <= self.n_epoches

    def load_from(self, cfg):
        """pretrained = weights only; resume = full state + curriculum cursor
        (reference trainer.py:84-107)."""
        pretrained = cfg["training"].get("pretrained")
        resume = cfg["training"].get("resume")
        assert not (pretrained is not None and resume is not None)
        tag = pretrained or resume
        if tag is None:
            return
        path = Path(tag)
        if not path.exists():
            path = path_exists(RUNS_PATH / self.dataset.name / tag / "model.pkl")
        ckpt = load_checkpoint(path)
        self.params = jax.tree_util.tree_map(jnp.asarray, ckpt["model_state"])
        if resume is not None:
            if ckpt["batch"] == self.n_batches:
                self.epoch_start, self.batch_start = ckpt["epoch"] + 1, 1
            else:
                self.epoch_start, self.batch_start = ckpt["epoch"], ckpt["batch"] + 1
            try:
                if ckpt["optimizer_state"] is None:
                    # imported reference checkpoints carry no optax state
                    # (scripts/import_reference_ckpt.py)
                    raise ValueError("checkpoint has no optimizer state")
                self.opt_state = jax.tree_util.tree_map(
                    jnp.asarray, ckpt["optimizer_state"]
                )
            except Exception:
                print_warning("resume: optimizer state mismatch, reinitializing")
                self.opt_state = self.optimizer.init(self.params)
            # replay the uninterrupted run's batch order: the shuffle stream
            # is keyed by (seed, epoch), so fast-forwarding the epoch counter
            # makes the resumed epoch see the exact same permutation
            if hasattr(self.train_loader, "set_epoch"):
                self.train_loader.set_epoch(self.epoch_start - 1)
        print_log(f"Checkpoint {tag} loaded")

    # ------------------------------------------------------------------

    def _make_train_step(self):
        model, optimizer = self.model, self.optimizer
        loss_keys = self._loss_keys

        def one_step(p, o, imgs_all, R_all, T_all, payload, phase, lrs,
                     base_key):
            """One optimizer step. ``payload`` is (B+1,) int32: B view
            indices (the batch is gathered on device from the HBM-resident
            dataset) + the global step counter the per-step RNG key is
            folded from. Returns the losses as ONE (L,) vector in
            ``self._loss_keys`` order so the host pulls a single array per
            log window instead of a dict of scalars per step."""
            idx, ctr = payload[:-1], payload[-1]
            key = jax.random.fold_in(base_key, ctr)
            imgs, R, T = imgs_all[idx], R_all[idx], T_all[idx]

            def loss_fn(pp):
                losses = model.forward(pp, phase, imgs, R, T, key)
                return losses["total"], losses

            grads, losses = jax.grad(loss_fn, has_aux=True)(p)
            updates, o = optimizer.update(grads, o, lrs)
            p = jax.tree_util.tree_map(lambda a, u: a + u, p, updates)
            return p, o, jnp.stack([losses[k] for k in loss_keys])

        # AOT executable cache: axon bypasses the persistent compile cache,
        # so the scanned step's first window costs ~19 min of remote compile
        # per process (BENCH_NOTES round 3). aot_jit serializes the compiled
        # executable once and later processes load it in seconds
        # (utils/aot_cache.py; falls back to plain jit on any failure).
        step = aot_jit(
            lambda params, opt_state, imgs_all, R_all, T_all, payload, phase,
            lrs, base_key: one_step(params, opt_state, imgs_all, R_all,
                                    T_all, payload, phase, lrs, base_key),
            donate_argnums=(0, 1), label="train_step",
        )

        @aot_jit(donate_argnums=(0, 1), label="train_multi_step")
        def multi_step(params, opt_state, imgs_all, R_all, T_all, payload_s,
                       phase, lrs, base_key):
            """S optimizer steps scanned in ONE device program (payload_s is
            (S, B+1) view indices + step counters). Amortizes per-dispatch
            host overhead — on the benched v5e the device step is ~260 ms
            but each dispatch costs ~500 ms through the host runtime
            (BENCH_NOTES.md) — and avoids shipping S×B images host→device
            per call. Returns (S, L) stacked loss vectors."""

            def body(carry, payload):
                p, o = carry
                p, o, vec = one_step(p, o, imgs_all, R_all, T_all, payload,
                                     phase, lrs, base_key)
                return (p, o), vec

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), payload_s
            )
            return params, opt_state, losses

        self._multi_step = multi_step
        return step

    def _epoch_consts(self):
        """Phase + LR device scalars for the current epoch (cached: they
        only change at epoch boundaries; rebuilding per call costs ~8 tiny
        host->device transfers on the axon tunnel)."""
        e = self.cur_epoch
        if self._epoch_consts_cache is None or self._epoch_consts_cache[0] != e:
            phase = self.model.phase_for_epoch(e - 1, training=True)
            lrs = {
                k: jnp.float32(v) for k, v in self.scheduler.lrs(e - 1).items()
            }
            self._epoch_consts_cache = (e, phase, lrs)
        return self._epoch_consts_cache[1], self._epoch_consts_cache[2]

    def _pad_ids(self, ids):
        """Pad a ragged final batch's index vector to the static batch size
        by repeating the last view (same semantics as the old array pad)."""
        B = self.batch_size
        n = len(ids)
        ids = np.asarray(ids, np.int32)
        if n < B:
            ids = np.concatenate([ids, np.repeat(ids[-1:], B - n)])
        return ids, n

    def run_single_batch_train(self, ids):
        idx, n_real = self._pad_ids(ids)
        phase, lrs = self._epoch_consts()
        payload = np.append(idx, np.int32(self._step_ctr)).astype(np.int32)
        self._step_ctr += 1
        self.params, self.opt_state, losses = self._train_step(
            self.params, self.opt_state,
            self._dev_imgs, self._dev_R, self._dev_T, jnp.asarray(payload),
            phase, lrs, self._base_key,
        )
        # no sync here: losses stay device futures until the log interval
        self._loss_buffer.append((losses, [n_real]))
        self._window_imgs += n_real

    def _drain_losses(self):
        """Force buffered per-step losses (ONE pipeline sync per log
        interval instead of per call) and feed the metric meters. time/img
        is the window's amortized wall-clock per real view — it includes
        host-side interval work, i.e. true end-to-end throughput."""
        if not self._loss_buffer:
            return
        buf, self._loss_buffer = self._loss_buffer, []
        # each entry is an (L,) or (S, L) stacked loss vector; ONE device
        # concat + ONE transfer drains the whole window
        mats = [v if v.ndim == 2 else v[None] for v, _ in buf]
        rows = np.asarray(jnp.concatenate(mats) if len(mats) > 1 else mats[0])
        n_reals = [n for _, ns in buf for n in ns]
        dt_img = (time.time() - self._window_t0) / max(self._window_imgs, 1)
        for vec, n_real in zip(rows, n_reals):
            self.train_metrics.update(
                {"time/img": dt_img,
                 **{f"loss_{k}": float(v)
                    for k, v in zip(self._loss_keys, vec)}},
                N=n_real,
            )
        self._window_t0 = time.time()
        self._window_imgs = 0

    def _flush_scanned(self, pending, cur_iter, epoch):
        """Run buffered batches (scanned when a full group, single-step for
        ragged tails) and fire any interval actions crossed by the group."""
        if len(pending) == self.steps_per_call:
            self.run_scanned_batches([ids for _, ids in pending])
        else:  # ragged tail: reuse the single-step program
            for _, ids in pending:
                self.run_single_batch_train(ids)
        last_batch = pending[-1][0]
        do_log = do_val = False
        for _ in pending:
            do_log |= cur_iter % self.train_stat_interval == 0
            do_val |= cur_iter % self.val_stat_interval == 0
            cur_iter += 1
        if do_log:
            self.log_train_metrics(cur_iter - 1, epoch, last_batch)
        if do_val:
            # reference order (trainer.py:122-125): val check BEFORE the viz
            # dispatch — also keeps the opacity sync from waiting behind the
            # multi-second fused viz render in the FIFO device queue
            self.run_val_and_log(cur_iter - 1, epoch, last_batch)
            self.log_visualizations(cur_iter - 1)
            self.save(epoch=epoch, batch=last_batch)
        return cur_iter

    def run_scanned_batches(self, ids_list):
        """S batches in one scanned device call (training.steps_per_call > 1).
        Metric streams stay per-step; interval actions fire at call
        boundaries (at most S-1 iterations late)."""
        S = len(ids_list)
        padded = [self._pad_ids(ids) for ids in ids_list]
        n_reals = [n for _, n in padded]
        ctrs = np.arange(self._step_ctr, self._step_ctr + S, dtype=np.int32)
        self._step_ctr += S
        payload_s = jnp.asarray(np.concatenate(
            [np.stack([p[0] for p in padded]), ctrs[:, None]], axis=1
        ).astype(np.int32))
        phase, lrs = self._epoch_consts()
        self.params, self.opt_state, losses = self._multi_step(
            self.params, self.opt_state,
            self._dev_imgs, self._dev_R, self._dev_T, payload_s, phase, lrs,
            self._base_key,
        )
        # no sync here (see _drain_losses)
        self._loss_buffer.append((losses, n_reals))
        self._window_imgs += sum(n_reals)

    # ------------------------------------------------------------------

    @use_seed()
    def run(self):
        try:
            self._run()
        except BaseException:
            # checkpoint writes are async (background worker): a run that
            # dies right after save() must still land the file on disk —
            # that checkpoint is exactly what a resume will read
            self._host.join(raise_fatal=False)
            raise

    def _run(self):
        cur_iter = (self.epoch_start - 1) * self.n_batches + self.batch_start
        self.cur_epoch = self.epoch_start
        self.log_visualizations(cur_iter)
        S = self.steps_per_call
        for epoch in range(self.epoch_start, self.n_epoches + 1):
            self.cur_epoch = epoch
            batch_start = self.batch_start if epoch == self.epoch_start else 1
            pending = []  # (batch_idx, view_ids) buffered for a scanned call
            for batch, ids in enumerate(self.train_loader.iter_indices(), start=1):
                if batch < batch_start:
                    continue
                if S > 1:
                    pending.append((batch, ids))
                    if len(pending) < S:
                        continue
                    cur_iter = self._flush_scanned(pending, cur_iter, epoch)
                    pending = []
                    continue
                self.run_single_batch_train(ids)
                if cur_iter % self.train_stat_interval == 0:
                    self.log_train_metrics(cur_iter, epoch, batch)
                if cur_iter % self.val_stat_interval == 0:
                    # reference order: val check before the viz dispatch
                    self.run_val_and_log(cur_iter, epoch, batch)
                    self.log_visualizations(cur_iter)
                    self.save(epoch=epoch, batch=batch)
                cur_iter += 1
            if pending:
                cur_iter = self._flush_scanned(pending, cur_iter, epoch)
            if epoch != self.n_epoches:
                self.step(epoch + 1)
            if epoch in self.save_epoches:
                self.save(epoch=epoch, batch=self.n_batches, checkpoint=True)

        if self.with_training:
            N, B = self.n_epoches, self.n_batches
        else:  # eval-only resume of a completed run: keep the true cursor
            N, B = self.epoch_start - 1, self.n_batches
        self._drain_losses()
        self.save(epoch=N, batch=B)
        self.save_metric_plots()
        self.evaluate()
        self._host.join()
        print_log("Training over")

    def step(self, epoch):
        lr = self.scheduler.lrs(epoch - 1)["main"]
        if lr != self.cur_lr:
            self.cur_lr = lr
            print_log(
                LOG_FMT(epoch, self.n_epoches, 1, self.n_batches, f"LR update: lr={lr}")
            )

    def run_val_and_log(self, it, epoch, batch):
        # tiny dedicated program: the dead-scene check must NOT sync on the
        # big viz render program dispatched just before (that would stall
        # train-step dispatch for the full render time every val interval)
        if self._opacity_fn is None:
            self._opacity_fn = jax.jit(self.model.get_opacities)
        opacities = np.asarray(self._opacity_fn(self.params))
        if (opacities > 0.01).sum() == 0:
            raise RuntimeError("No more blocks....")
        self.val_metrics.update(
            {f"alpha{k}": float(a) for k, a in enumerate(opacities)}
        )
        print_log(
            LOG_FMT(epoch, self.n_epoches, batch, self.n_batches,
                    f"val_metrics: {self.val_metrics}")[:1000]
        )
        from ..utils.colors import fancy_colormap

        colors = (fancy_colormap(
            np.linspace(0, 1, len(opacities) + 1)[1:]) * 255).astype(np.uint8)
        values = self.val_metrics.get_named_values()
        self._host.submit(lambda: self.visualizer.upload_lineplot(
            it, values, title="opacities", colors=colors,
        ))
        self.val_metrics.log_and_reset(it=it, epoch=epoch, batch=batch)

    def log_train_metrics(self, it, epoch, batch):
        self._drain_losses()
        print_log(
            LOG_FMT(epoch, self.n_epoches, batch, self.n_batches,
                    f"train_metrics: {self.train_metrics}")[:1000]
        )
        values = self.train_metrics.get_named_values(lambda s: "loss" in s)
        self._host.submit(lambda: self.visualizer.upload_lineplot(
            it, values, title="train_losses",
        ))
        self.train_metrics.log_and_reset(it=it, epoch=epoch, batch=batch)

    # ------------------------------------------------------------------

    def _get_predict_fns(self):
        if self._predict_fn is None:
            model = self.model

            @aot_jit(label="trainer_predict")
            def predict(params, phase, R, T, key):
                return model.predict(params, phase, R, T, key=key)[0]

            @aot_jit(label="trainer_predict_syn")
            def predict_syn(params, phase, R, T):
                return model.predict_synthetic(params, phase, R, T)

            self._predict_fn, self._predict_syn_fn = predict, predict_syn
        return self._predict_fn, self._predict_syn_fn

    def _get_viz_fn(self):
        """ONE jitted program for all viz streams: soft recon + edge
        overlay, hard recon, synthetic-color recon, texture grid.
        Collapses ~6 dispatches per val interval into one (each dispatch
        costs 100s of ms through the axon runtime) and returns uint8 so the
        background pull ships 4x fewer bytes. The main thread never syncs
        on its outputs — only the background worker pulls them."""
        if self._viz_fn is None:
            model = self.model
            from ..utils.colors import fancy_colormap

            vals = np.linspace(0, 1, model.n_blocks + 1)[1:]
            base_colors = jnp.asarray(fancy_colormap(vals), jnp.float32)
            nfe = model.env_n_faces
            ncol = min(5, model.n_blocks)
            nrow = max(model.n_blocks // ncol, 1)
            kill = model.kill_blocks

            @aot_jit(label="trainer_viz_all")
            def viz_all(params, phase, R, T, vctr, base_key):
                # viz RNG stream: disjoint from training (training counters
                # are global step indices folded directly)
                k1 = jax.random.fold_in(base_key, -(2 * vctr + 1))
                k2 = jax.random.fold_in(base_key, -(2 * vctr + 2))
                op = model.get_opacities(params)  # face palette masking
                to8 = lambda x: (
                    jnp.clip(x, 0.0, 1.0) * 255.0 + 0.5
                ).astype(jnp.uint8)
                rec = model.predict(params, phase, R, T, key=k1)[0]
                # edge overlay (reference dbw.py:234-238); face palette =
                # get_scene_face_colors inlined in jnp (dead blocks black)
                scene, _, _ = model.build_scene(params, phase)
                cols = base_colors
                if kill:
                    cols = jnp.where((op > 0.01)[:, None], cols, 0.0)
                face_cols = jnp.concatenate(
                    [jnp.zeros((nfe, 3)), jnp.repeat(cols, model.BNF, axis=0)]
                )
                rec = model.renderer_viz.draw_edges(rec, scene, R, T, face_cols)
                phase_hard = phase._replace(
                    filter_transparent=jnp.asarray(True)
                )
                rec2 = model.predict(params, phase_hard, R, T, key=k2)[0]
                rec3 = model.predict_synthetic(params, phase, R, T)
                # texture grid (get_arranged_block_txt inlined in jnp)
                maps = jax.nn.sigmoid(params.textures)
                rows = [
                    jnp.concatenate(
                        [maps[k] for k in range(ncol * i, ncol * (i + 1))],
                        axis=1,
                    )
                    for i in range(nrow)
                ]
                txt = jnp.concatenate(rows) if len(rows) > 1 else rows[0]
                return to8(rec), to8(rec2), to8(rec3), to8(txt)

            self._viz_fn = viz_all
        return self._viz_fn

    def log_visualizations(self, cur_iter):
        """Device renders are dispatched here (fresh output buffers, safe
        against later donation); the host-side pulls/encodes/writes run on
        the background worker so training keeps dispatching; the main
        thread never waits for the render."""
        epoch = getattr(self, "cur_epoch", self.epoch_start) - 1
        phase = self.model.phase_for_epoch(epoch, training=False)
        vctr = self._viz_ctr
        self._viz_ctr += 1
        if not self._viz_fn_failed:
            try:
                rec, rec2, rec3, txt = self._get_viz_fn()(
                    self.params, phase, self._viz_R, self._viz_T,
                    np.int32(vctr), self._base_key,
                )
            except Exception as e:  # pragma: no cover - viz must not kill training
                print_warning(f"fused viz failed ({e}); using modular path")
                self._viz_fn_failed = True
        if self._viz_fn_failed:
            return self._log_visualizations_fallback(cur_iter, phase, vctr)
        gt = self._viz_gt_u8

        def _host():
            for arr, logger, title in (
                (rec, self.rec_logger, "recons"),
                (rec2, self.rec2_logger, "recons_hard"),
                (rec3, self.rec3_logger, "recons_syn"),
            ):
                r = np.asarray(arr)
                logger.save(r, cur_iter)
                self.visualizer.upload_images(
                    np.stack([gt, r], 1).reshape(-1, *gt.shape[1:]), title, 2
                )
            t = np.asarray(txt)
            self.txt_logger.save(t[None], cur_iter)
            self.visualizer.upload_images(t[None], "textures", 1, max_size=256)

        self._host.submit(_host)

    def _log_visualizations_fallback(self, cur_iter, phase, vctr):
        """Modular multi-dispatch viz (pre-fusion path), kept as a safety
        net if the fused program fails to compile on a backend."""
        predict, predict_syn = self._get_predict_fns()
        R, T = self._viz_R, self._viz_T
        gt = np.asarray(self.viz_samples["imgs"])
        k1 = jax.random.fold_in(self._base_key, -(2 * vctr + 1))
        k2 = jax.random.fold_in(self._base_key, -(2 * vctr + 2))

        rec = predict(self.params, phase, R, T, k1)
        rec = self._with_edges(rec, R, T, phase)
        phase_hard = phase._replace(filter_transparent=jnp.asarray(True))
        rec2 = predict(self.params, phase_hard, R, T, k2)
        rec3 = predict_syn(self.params, phase, R, T)
        txt = self.model.get_arranged_block_txt(self.params)

        def _host():
            r = np.asarray(rec)
            self.rec_logger.save(r, cur_iter)
            self.visualizer.upload_images(
                np.stack([gt, r], 1).reshape(-1, *gt.shape[1:]), "recons", 2
            )
            r2 = np.asarray(rec2)
            self.rec2_logger.save(r2, cur_iter)
            self.visualizer.upload_images(
                np.stack([gt, r2], 1).reshape(-1, *gt.shape[1:]),
                "recons_hard", 2,
            )
            r3 = np.asarray(rec3)
            self.rec3_logger.save(r3, cur_iter)
            self.visualizer.upload_images(
                np.stack([gt, r3], 1).reshape(-1, *gt.shape[1:]),
                "recons_syn", 2,
            )
            t = np.asarray(txt)
            self.txt_logger.save(t[None], cur_iter)
            self.visualizer.upload_images(t[None], "textures", 1, max_size=256)

        self._host.submit(_host)

    def _with_edges(self, rec, R, T, phase):
        """Overlay per-block wireframes on the soft reconstruction (reference
        dbw.py:234-238). Device in, device out."""
        try:
            scene, _, _ = self.model.build_scene(self.params, phase)
            colors = self.model.get_scene_face_colors(self.params)
            return self.model.renderer_viz.draw_edges(
                jnp.asarray(rec), scene, R, T, colors
            )
        except Exception as e:  # pragma: no cover - viz must not kill training
            print_warning(f"edge overlay failed: {e}")
            return rec

    # ------------------------------------------------------------------

    def save(self, epoch, batch, checkpoint=False):
        name = f"model_{epoch}.pkl" if checkpoint else "model.pkl"
        # device-side snapshot packed into ONE byte buffer (one dispatch;
        # the jit output is a fresh buffer, safe against the next step's
        # donation). The background writer pulls it in ONE transfer and
        # unpacks to numpy for pickling — per-leaf copies/pulls cost ~40
        # tunnel round trips each save (utils/device_pack.py).
        packed = self._ckpt_pack((self.params, self.opt_state))
        path = self.run_dir / name
        model_name = self.model.name
        model_kwargs = self.cfg.get("model", {})

        def _write():
            params, opt_state = self._ckpt_unpack(np.asarray(packed))
            save_checkpoint(
                path, params, opt_state, epoch, batch,
                model_name=model_name, model_kwargs=model_kwargs,
            )
            print_log(f"Model saved at {path}")

        self._host.submit(_write, fatal=True)

    def save_metric_plots(self):
        try:
            from ..utils.plot import plot_lines
        except Exception:
            print_warning("matplotlib unavailable; skipping metric plots")
            return
        df = self.train_metrics.read_log()
        if len(df) == 0:
            print_log("No metrics or plots to save")
            return
        loss_names = [c for c in df.columns if "loss" in c]
        fig = plot_lines(df, loss_names, title="Loss")
        if fig is not None:
            fig.savefig(self.run_dir / "loss.pdf")
        dfv = self.val_metrics.read_log()
        alpha_names = [c for c in dfv.columns if "alpha" in c]
        if alpha_names:
            from ..utils.colors import fancy_colormap

            colors = fancy_colormap(np.linspace(0, 1, len(alpha_names) + 1)[1:])
            fig = plot_lines(dfv, alpha_names, title="Opacity", colors=colors)
            if fig is not None:
                fig.savefig(self.run_dir / "opacity.pdf")

        self.log_visualizations(None)
        self._host.join()  # all frames on disk before video assembly
        for logger in [self.rec_logger, self.rec2_logger, self.rec3_logger,
                       self.txt_logger]:
            logger.save_video(rmtree=LIGHT_MEMORY_RESULTS)
        print_log("Metrics and plots saved")

    # ------------------------------------------------------------------

    def evaluate(self):
        from ..eval.full import evaluate_run

        evaluate_run(
            self.model, self.params, self.test_loader, self.dataset,
            self.run_dir, quali_kwargs=self.eval_kwargs or None,
        )
        print_log("Evaluation over")


def main():
    parser = argparse.ArgumentParser(
        description="Optimize a Differentiable Blocks World scene from a YML config"
    )
    parser.add_argument("-t", "--tag", type=str, required=True)
    parser.add_argument("-c", "--config", type=str, required=True)
    parser.add_argument("-d", "--default", type=str, default=None)
    parser.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (this host's sitecustomize pins the "
        "axon TPU platform, so JAX_PLATFORMS=cpu alone is ignored)")
    args = parser.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    default_path = (
        None if not args.default else CONFIGS_PATH / args.default
    )
    cfg = load_yaml(CONFIGS_PATH / args.config, default_path)
    seed = cfg["training"].get("seed", 4321)
    dataset = cfg["dataset"]["name"]
    run_dir = path_mkdir(RUNS_PATH / dataset / args.tag)
    create_logger(run_dir)
    dump_yaml(cfg, run_dir / Path(args.config).name)
    print_log(f"Trainer init: config_file={args.config}, run_dir={run_dir}")
    trainer = Trainer(cfg, run_dir, seed=seed)
    trainer.run(seed=seed)


if __name__ == "__main__":
    main()
