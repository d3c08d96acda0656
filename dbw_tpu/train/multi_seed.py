"""Multi-seed training driver: the reference's multi_pipeline.sh (5
sequential seeded runs + manual min-loss selection, scripts/
multi_pipeline.sh:12-23) as one seed-parallel program.

On an S-seed mesh each optimization runs on its own devices with zero
cross-seed traffic; on a single chip the seed axis is just a vmapped
leading dimension (still one compiled program — far cheaper than S
sequential runs because the per-step launch overhead amortizes and XLA
overlaps the independent seeds' compute)."""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..data import create_train_val_test_loader
from ..models import create_model
from ..train.checkpoint import save_checkpoint
from ..train.optimizer import create_optimizer
from ..train.scheduler import create_scheduler
from ..utils.logger import print_log
from ..utils.misc import path_mkdir
from ..parallel.seeds import stack_params, unstack_params


class MultiSeedTrainer:
    """Trains S seeds of one scene simultaneously; selects min train loss.

    On a multi-device host the seed axis is sharded over the mesh: the
    requested seeds are padded to the mesh's seed-axis size with duplicates
    (``parallel.seeds.pad_seeds``) that are masked out of selection, and
    the stacked params/opt get a ``NamedSharding`` over their leading axis —
    XLA then runs each seed's optimization on its own device group with
    zero cross-seed traffic."""

    def __init__(self, cfg, run_dir, seeds):
        self.run_dir = path_mkdir(run_dir)
        self.cfg = cfg
        self.seeds = list(seeds)
        self.n_valid = len(self.seeds)
        self.batch_size = cfg["training"].get("batch_size", 4)
        self._shard = None
        self._mesh = None
        if len(jax.devices()) > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import factor_devices, make_mesh
            from ..parallel.seeds import pad_seeds

            n_dev = len(jax.devices())
            # leftover devices beyond the seed count become a data axis
            # (gradient pmean over views); if the view batch doesn't divide
            # it, fall back to all-seed with padded duplicate slots. Seed
            # slots round up to a multiple of the seed axis (a slot per
            # device group; duplicates are masked at selection).
            seed_ax, n_data = factor_devices(n_dev, n_seeds=self.n_valid)
            if self.batch_size % n_data != 0:
                seed_ax, n_data = n_dev, 1
            slots = -(-self.n_valid // seed_ax) * seed_ax
            self.seeds, self.n_valid = pad_seeds(self.seeds, slots)
            self._mesh = make_mesh(seed_ax, n_data)
            self._shard = NamedSharding(self._mesh, P("seed"))
            print_log(
                f"[multi-seed] mesh (seed={seed_ax}, data={n_data}): "
                f"{self.n_valid} seeds in {slots} slots "
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

        params_list = [self.model.init_params(seed=s) for s in self.seeds]
        self.params = stack_params(params_list)
        self.optimizer = create_optimizer(cfg, params_list[0])
        self.opt_state = stack_params(
            [self.optimizer.init(p) for p in params_list]
        )
        if self._shard is not None:
            self.params = jax.device_put(self.params, self._shard)
            self.opt_state = jax.device_put(self.opt_state, self._shard)
        self.scheduler = create_scheduler(cfg, self.optimizer.base_lrs)
        self._key = jax.random.PRNGKey(max(self.seeds) + 1)

        model, optimizer = self.model, self.optimizer

        self.steps_per_call = int(
            cfg["training"].get("steps_per_call", 1)
        )
        if self._mesh is not None:
            from ..parallel.seeds import MultiSeedRunner

            runner = MultiSeedRunner(model, optimizer, self._mesh)
            self._step = runner.step
            self._multi_step = runner.multi_step
        else:
            def one_step(params_S, opt_S, imgs, R, T, phase, lrs, keys):
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

                return jax.vmap(one)(params_S, opt_S, keys)

            self._step = jax.jit(one_step, donate_argnums=(0, 1))

            @partial(jax.jit, donate_argnums=(0, 1))
            def multi_step(params_S, opt_S, imgs_s, R_s, T_s, phase, lrs,
                           keys_s):
                def body(carry, xs):
                    p, o = carry
                    imgs, R, T, keys = xs
                    p, o, loss = one_step(p, o, imgs, R, T, phase, lrs, keys)
                    return (p, o), loss

                (params_S, opt_S), losses = jax.lax.scan(
                    body, (params_S, opt_S), (imgs_s, R_s, T_s, keys_s)
                )
                return params_S, opt_S, losses

            self._multi_step = multi_step

    def run(self):
        S = len(self.seeds)
        t0 = time.time()
        loss_sums = np.zeros(S)
        for epoch in range(1, self.n_epoches + 1):
            phase = self.model.phase_for_epoch(epoch - 1, training=True)
            lrs = {
                k: jnp.float32(v)
                for k, v in self.scheduler.lrs(epoch - 1).items()
            }
            loss_sums[:] = 0.0
            n_seen = 0
            pending = []
            batches = list(self.train_loader)

            def run_group(group):
                nonlocal n_seen
                imgs_l, R_l, T_l, n_reals = [], [], [], []
                for inp, _ in group:
                    imgs, n_real = _pad(inp["imgs"], self.batch_size)
                    R, _ = _pad(inp["R"], self.batch_size)
                    T, _ = _pad(inp["T"], self.batch_size)
                    imgs_l.append(imgs)
                    R_l.append(R)
                    T_l.append(T)
                    n_reals.append(n_real)
                spc = len(group)
                self._key, *keys = jax.random.split(self._key, spc * S + 1)
                keys_s = jnp.stack(keys).reshape(spc, S, 2)
                if spc == 1:
                    self.params, self.opt_state, losses = self._step(
                        self.params, self.opt_state,
                        jnp.asarray(imgs_l[0]), jnp.asarray(R_l[0]),
                        jnp.asarray(T_l[0]), phase, lrs, keys_s[0],
                    )
                    losses = np.asarray(losses)[None]
                else:
                    self.params, self.opt_state, losses = self._multi_step(
                        self.params, self.opt_state,
                        jnp.asarray(np.stack(imgs_l)),
                        jnp.asarray(np.stack(R_l)),
                        jnp.asarray(np.stack(T_l)),
                        phase, lrs, keys_s,
                    )
                    losses = np.asarray(losses)
                # per-view weighting: a padded remainder batch (duplicates
                # of its last view) counts only its real views, so the
                # logged/selected per-seed loss is the mean over views seen
                for i, n_real in enumerate(n_reals):
                    loss_sums[:] = loss_sums + losses[i] * n_real
                    n_seen += n_real

            SPC = max(self.steps_per_call, 1)
            for b in batches:
                pending.append(b)
                if len(pending) == SPC:
                    run_group(pending)
                    pending = []
            for b in pending:  # ragged tail: single-step program
                run_group([b])
            if epoch % max(self.n_epoches // 10, 1) == 0 or epoch == 1:
                print_log(
                    f"[multi-seed] epoch {epoch}/{self.n_epoches} "
                    f"losses={np.round(loss_sums / max(n_seen, 1), 5).tolist()} "
                    f"({time.time() - t0:.1f}s)"
                )

        final_losses = loss_sums / max(n_seen, 1)
        # padded duplicate-seed slots are excluded from selection
        masked = np.where(
            np.arange(len(self.seeds)) < self.n_valid, final_losses, np.inf
        )
        best = int(np.argmin(masked))
        print_log(
            f"[multi-seed] final per-seed loss="
            f"{final_losses[: self.n_valid].round(5).tolist()}"
            f" -> auto-selected seed {self.seeds[best]} (min train loss)"
        )
        for i, s in enumerate(self.seeds[: self.n_valid]):
            p_i = unstack_params(self.params, i)
            o_i = unstack_params(self.opt_state, i)
            save_checkpoint(
                self.run_dir / f"seed{s}" / "model.pkl", p_i, o_i,
                self.n_epoches, 1, model_kwargs=self.cfg.get("model", {}),
            )
        best_params = unstack_params(self.params, best)
        save_checkpoint(
            self.run_dir / "model.pkl", best_params,
            unstack_params(self.opt_state, best), self.n_epoches, 1,
            model_kwargs=self.cfg.get("model", {}),
        )
        with open(self.run_dir / "seed_selection.tsv", "w") as f:
            f.write("seed\tfinal_train_loss\tselected\n")
            for i, s in enumerate(self.seeds[: self.n_valid]):
                f.write(f"{s}\t{final_losses[i]:.6f}\t{int(i == best)}\n")
        return best_params, self.seeds[best], final_losses[: self.n_valid]


def _pad(arr, bs):
    n = len(arr)
    if n == bs:
        return arr, n
    reps = np.repeat(arr[-1:], bs - n, axis=0)
    return np.concatenate([arr, reps], 0), n
