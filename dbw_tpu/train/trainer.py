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
        self._t = threading.Thread(target=self._loop, daemon=True)
        self._t.start()

    def _loop(self):
        while True:
            fn = self._q.get()
            if fn is None:
                self._q.task_done()
                break
            try:
                fn()
            except Exception as e:  # pragma: no cover - logged, not fatal
                print_warning(f"host worker task failed: {e}")
            finally:
                self._q.task_done()

    def submit(self, fn):
        self._q.put(fn)

    def join(self):
        self._q.join()


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

        self._key = jax.random.PRNGKey(cfg["training"].get("seed", 4321))
        # Device-resident dataset (SURVEY §7: a whole scene fits in HBM —
        # 49x300x400x3 f32 ~ 70 MB). Batches are gathered ON DEVICE by view
        # index inside the jitted step; the host ships B int32s per step
        # instead of ~7 MB of images (29 MB per 5-step scanned call), which
        # on the axon tunnel costs more than the device math itself.
        self._dev_imgs = jnp.asarray(self.dataset.imgs)
        self._dev_R = jnp.asarray(self.dataset.R)
        self._dev_T = jnp.asarray(self.dataset.T)
        self._train_step = self._make_train_step()
        # async host pipeline: train-step losses stay device futures until
        # the next log interval (the host keeps dispatching, XLA pipelines),
        # and checkpoint/viz host work runs on a background worker
        self._host = _HostWorker()
        self._loss_buffer = []
        self._window_t0 = time.time()
        self._window_imgs = 0
        self._predict_fn = None
        self._predict_syn_fn = None

        # metric streams: append whenever ANY prior progress exists (a
        # mid-first-epoch resume must not truncate the logged history)
        append = self.epoch_start > 1 or self.batch_start > 1
        self.train_stat_interval = cfg["training"]["train_stat_interval"]
        self.val_stat_interval = cfg["training"]["val_stat_interval"]
        self.save_epoches = cfg["training"].get("save_epoches", [])
        names = ["time/img"] + self.model.loss_names
        self.train_metrics = Metrics(
            *names, log_file=self.run_dir / "train_metrics.tsv", append=append
        )
        alpha_names = [f"alpha{k}" for k in range(self.model.n_blocks)]
        self.val_metrics = Metrics(
            *alpha_names, log_file=self.run_dir / "val_metrics.tsv", append=append
        )

        # visual streams (reference trainer.py:61-74)
        with use_seed(12345):
            src = self.val_loader if len(self.val_loader) > 0 else self.train_loader
            samples, _ = next(iter(src))
        self.viz_samples = {
            k: v[:N_VIZ_SAMPLES] for k, v in samples.items()
        }
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

        @partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, imgs_all, R_all, T_all, idx, phase, lrs, key):
            """One optimizer step; the batch is gathered on device from the
            HBM-resident dataset arrays by the (B,) view-index vector."""
            imgs, R, T = imgs_all[idx], R_all[idx], T_all[idx]

            def loss_fn(p):
                losses = model.forward(p, phase, imgs, R, T, key)
                return losses["total"], losses

            grads, losses = jax.grad(loss_fn, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state, lrs)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
            return params, opt_state, losses

        @partial(jax.jit, donate_argnums=(0, 1))
        def multi_step(params, opt_state, imgs_all, R_all, T_all, idx_s, phase,
                       lrs, keys):
            """S optimizer steps scanned in ONE device program (idx_s is
            (S, B) view indices). Amortizes per-dispatch host overhead — on
            the benched v5e the device step is ~260 ms but each dispatch
            costs ~500 ms through the host runtime (BENCH_NOTES.md) — and
            avoids shipping S×B images host→device per call."""

            def body(carry, xs):
                p, o = carry
                idx, key = xs
                imgs, R, T = imgs_all[idx], R_all[idx], T_all[idx]

                def loss_fn(pp):
                    losses = model.forward(pp, phase, imgs, R, T, key)
                    return losses["total"], losses

                grads, losses = jax.grad(loss_fn, has_aux=True)(p)
                updates, o = optimizer.update(grads, o, lrs)
                p = jax.tree_util.tree_map(lambda a, u: a + u, p, updates)
                return (p, o), losses

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (idx_s, keys)
            )
            return params, opt_state, losses

        self._multi_step = multi_step
        return step

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

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
        phase = self.model.phase_for_epoch(self.cur_epoch - 1, training=True)
        lrs = {
            k: jnp.float32(v)
            for k, v in self.scheduler.lrs(self.cur_epoch - 1).items()
        }
        self.params, self.opt_state, losses = self._train_step(
            self.params, self.opt_state,
            self._dev_imgs, self._dev_R, self._dev_T, jnp.asarray(idx),
            phase, lrs, self._next_key(),
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
        forced = [
            ({k: np.atleast_1d(np.asarray(v)) for k, v in losses.items()}, n)
            for losses, n in buf
        ]
        dt_img = (time.time() - self._window_t0) / max(self._window_imgs, 1)
        for arrs, n_reals in forced:
            for s, n_real in enumerate(n_reals):
                self.train_metrics.update(
                    {"time/img": dt_img,
                     **{f"loss_{k}": float(v[s]) for k, v in arrs.items()}},
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
        idx_s = jnp.asarray(np.stack([p[0] for p in padded]))
        phase = self.model.phase_for_epoch(self.cur_epoch - 1, training=True)
        lrs = {
            k: jnp.float32(v)
            for k, v in self.scheduler.lrs(self.cur_epoch - 1).items()
        }
        keys = jnp.stack([self._next_key() for _ in range(S)])
        self.params, self.opt_state, losses = self._multi_step(
            self.params, self.opt_state,
            self._dev_imgs, self._dev_R, self._dev_T, idx_s, phase, lrs, keys,
        )
        # no sync here (see _drain_losses)
        self._loss_buffer.append((losses, n_reals))
        self._window_imgs += sum(n_reals)

    # ------------------------------------------------------------------

    @use_seed()
    def run(self):
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
        opacities = np.asarray(self.model.get_opacities(self.params))
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

            @jax.jit
            def predict(params, phase, R, T, key):
                return model.predict(params, phase, R, T, key=key)[0]

            @jax.jit
            def predict_syn(params, phase, R, T):
                return model.predict_synthetic(params, phase, R, T)

            self._predict_fn, self._predict_syn_fn = predict, predict_syn
        return self._predict_fn, self._predict_syn_fn

    def log_visualizations(self, cur_iter):
        """Device renders are dispatched here (fresh output buffers, safe
        against later donation); the host-side pulls/encodes/writes run on
        the background worker so training keeps dispatching."""
        predict, predict_syn = self._get_predict_fns()
        epoch = getattr(self, "cur_epoch", self.epoch_start) - 1
        phase = self.model.phase_for_epoch(epoch, training=False)
        R = jnp.asarray(self.viz_samples["R"])
        T = jnp.asarray(self.viz_samples["T"])
        gt = np.asarray(self.viz_samples["imgs"])

        rec = predict(self.params, phase, R, T, self._next_key())
        rec = self._with_edges(rec, R, T, phase)
        phase_hard = phase._replace(filter_transparent=jnp.asarray(True))
        rec2 = predict(self.params, phase_hard, R, T, self._next_key())
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
        # device-side snapshot (HBM copy, ~free): the live buffers are
        # donated by the next train step, so the background writer pickles
        # the copy while training keeps dispatching
        snap = lambda t: jax.tree_util.tree_map(
            lambda x: x.copy() if isinstance(x, jax.Array) else x, t
        )
        params, opt_state = snap(self.params), snap(self.opt_state)
        path = self.run_dir / name
        model_name = self.model.name
        model_kwargs = self.cfg.get("model", {})

        def _write():
            save_checkpoint(
                path, params, opt_state, epoch, batch,
                model_name=model_name, model_kwargs=model_kwargs,
            )
            print_log(f"Model saved at {path}")

        self._host.submit(_write)

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
            self.run_dir,
        )
        print_log("Evaluation over")


def main():
    parser = argparse.ArgumentParser(
        description="Optimize a Differentiable Blocks World scene from a YML config"
    )
    parser.add_argument("-t", "--tag", type=str, required=True)
    parser.add_argument("-c", "--config", type=str, required=True)
    parser.add_argument("-d", "--default", type=str, default=None)
    args = parser.parse_args()
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
