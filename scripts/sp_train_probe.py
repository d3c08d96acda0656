"""Banded TRAINING at scale: the sp axis's graduation from unit tests.

Two arms (VERDICT r4 next #3):

``--mode banded``  (run on the chip): train the flagship-shape model for
  N real optimizer steps with the render computed in ``--bands`` row
  bands (traced row0, full_h cropping — the exact per-band program each
  sp device runs), vs the unbanded full-frame program, same init and key
  stream. Band concatenation is linear, so the banded arm's gradient is
  mathematically the sp mesh's psum — the arms must track to float
  association noise. Writes a per-step loss TSV.

``--mode mesh``  (8-device virtual CPU mesh): the REAL shard_map trainer
  over mesh (seed=1, data=2, sp=4) at 300x400 for N steps vs a
  single-device step loop — the true collective path (band all_gather,
  psum_scatter transpose, pmean over data+sp) at flagship spatial shape,
  not the 24x32 dryrun shape. Writes a per-step loss TSV.

Usage:
  python scripts/sp_train_probe.py --mode banded --steps 200
  XLA_FLAGS="--xla_force_host_platform_device_count=8 \
      --xla_cpu_collective_call_terminate_timeout_seconds=3600" \
      python scripts/sp_train_probe.py --mode mesh --cpu --steps 50

The terminate-timeout flag matters on a 1-core host: XLA's in-process CPU
communicator aborts the whole process (SIGABRT, rendezvous.cc) if the 8
virtual-device threads spread more than 40 s (default) around a
collective, which timeslicing 4 band renders on one core routinely does.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _write_tsv(path, rows, header):
    with open(path, "w") as f:
        f.write("\t".join(header) + "\n")
        for r in rows:
            f.write("\t".join(f"{v:.8f}" if isinstance(v, float) else str(v)
                              for v in r) + "\n")
    print(f"wrote {path} ({len(rows)} rows)")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["banded", "mesh"], required=True)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--bands", type=int, default=4)
    p.add_argument("--img", type=int, nargs=2, default=[300, 400])
    p.add_argument("--tiny", action="store_true",
                   help="small shapes (CPU smoke test of the probe itself)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (this host's sitecustomize "
                   "pins the axon TPU platform; JAX_PLATFORMS alone is "
                   "ignored — required for --mode mesh virtual devices)")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax

    if args.tiny or args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.tiny:
        args.img, args.steps = [24, 32], 4
    import jax.numpy as jnp

    import __graft_entry__ as graft
    from dbw_tpu.train.optimizer import create_optimizer

    if args.tiny:
        model = graft._make_model(img_size=tuple(args.img), n_blocks=3,
                                  txt_size=16, fpp=3, with_perceptual=True)
    else:
        model = graft._make_model(img_size=tuple(args.img),
                                  with_perceptual=True)
    backend = "pallas" if jax.default_backend() in ("tpu", "axon") else "xla"
    for r in (model.renderer, model.renderer_env, model.renderer_viz,
              model.renderer_light):
        r.config = r.config._replace(backend=backend)
    H, W = model.img_size
    B = 4
    R, T = graft._cams(B)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((B, H, W, 3), np.float32))
    phase = model.phase_for_epoch(0, training=True)
    cfg = {"training": {"optimizer": {"name": "adam", "lr": 5e-3}}}
    lrs = {"main": jnp.float32(5e-3), "texture": jnp.float32(5e-2)}
    base_key = jax.random.PRNGKey(11)

    out = Path(args.out or (Path(__file__).resolve().parents[1]
                            / f"runs/synthetic/sp_train_{args.mode}.tsv"))
    out.parent.mkdir(parents=True, exist_ok=True)

    if args.mode == "banded":
        n_bands = args.bands
        Hb = -(-H // n_bands)
        params0 = model.init_params(seed=0)
        opt = create_optimizer(cfg, params0)

        def make_step(banded):
            def loss_fn(p, key):
                k1, k2 = jax.random.split(key)
                if banded:
                    # per-band program of the sp axis (traced row0); bands
                    # reassembled on-device — the gradient equals the
                    # mesh's per-band psum exactly (concat is linear)
                    aux = None
                    recs = []
                    for b in range(n_bands):
                        rec_b, aux = model.predict(
                            p, phase, R, T, key=k1,
                            row_range=(jnp.float32(b * Hb), Hb))
                        recs.append(rec_b)
                    rec = jnp.concatenate(recs, axis=1)[:, :H]
                else:
                    rec, aux = model.predict(p, phase, R, T, key=k1)
                losses = model.compute_losses(imgs, rec, p, phase, aux,
                                              key=k2)
                return losses["total"]

            def step(p, o, key):
                l, grads = jax.value_and_grad(loss_fn)(p, key)
                updates, o = opt.update(grads, o, lrs)
                p = jax.tree_util.tree_map(lambda a, u: a + u, p, updates)
                return p, o, l

            return jax.jit(step, donate_argnums=(0, 1))

        rows = []
        arms = {}
        for label, banded in (("full", False), ("banded", True)):
            step = make_step(banded)
            p_ = model.init_params(seed=0)  # fresh: steps donate buffers
            o_ = opt.init(p_)
            losses, t0 = [], None
            for s in range(args.steps):
                key = jax.random.fold_in(base_key, s)
                p_, o_, l = step(p_, o_, key)
                losses.append(float(l))
                if s == 0:
                    jax.block_until_ready(l)
                    t0 = time.perf_counter()
            jax.block_until_ready(l)
            dt = (time.perf_counter() - t0) / max(args.steps - 1, 1)
            arms[label] = losses
            print(f"[{label}] {args.steps} steps, {dt * 1e3:.1f} ms/step "
                  f"post-compile, final loss {losses[-1]:.6f}")
        rel = [abs(a - b) / max(abs(b), 1e-12)
               for a, b in zip(arms["banded"], arms["full"])]
        rows = [(s, arms["full"][s], arms["banded"][s], rel[s])
                for s in range(args.steps)]
        _write_tsv(out, rows, ["step", "loss_full", "loss_banded", "rel_dev"])
        print(f"max rel dev over {args.steps} steps: {max(rel):.3e}")

    else:  # mesh
        from dbw_tpu.parallel.mesh import make_mesh
        from dbw_tpu.parallel.seeds import (MultiSeedRunner, stack_params,
                                            unstack_params)

        n_dev = len(jax.devices())
        n_sp = 4 if n_dev >= 8 else max(n_dev // 2, 1)
        n_data = 2 if n_dev >= 8 else 1
        mesh = make_mesh(n_seed=1, n_data=n_data, n_spatial=n_sp)
        print(f"mesh: {dict(mesh.shape)} over {n_dev} devices, "
              f"img {H}x{W}")
        params0 = model.init_params(seed=0)
        opt = create_optimizer(cfg, params0)
        runner = MultiSeedRunner(model, opt, mesh)
        stacked = stack_params([params0])
        opt_sh = stack_params([opt.init(params0)])

        def single_step(p, o, key):
            def loss_fn(pp):
                losses = model.forward(pp, phase, imgs, R, T, key)
                return losses["total"], losses

            grads, losses = jax.grad(loss_fn, has_aux=True)(p)
            updates, o = opt.update(grads, o, lrs)
            p = jax.tree_util.tree_map(lambda a, u: a + u, p, updates)
            return p, o, losses["total"]

        single_step = jax.jit(single_step)
        ref_p, ref_o = params0, opt.init(params0)

        rows, rels = [], []
        # incremental write: an 8-thread CPU-collective rendezvous can be
        # starved to death by host contention (40 s hard timeout in XLA's
        # in-process communicator) — keep the evidence gathered so far
        with open(out, "w") as f:
            f.write("step\tloss_single\tloss_mesh\trel_dev\n")
            for s in range(args.steps):
                keys = jax.random.fold_in(base_key, s)[None]
                stacked, opt_sh, losses = runner.step(
                    stacked, opt_sh, imgs, R, T, phase, lrs, keys)
                ref_p, ref_o, l_ref = single_step(ref_p, ref_o, keys[0])
                l_mesh, l_ref = float(np.asarray(losses)[0]), float(l_ref)
                rel = abs(l_mesh - l_ref) / max(abs(l_ref), 1e-12)
                rels.append(rel)
                rows.append((s, l_ref, l_mesh, rel))
                f.write(f"{s}\t{l_ref:.8f}\t{l_mesh:.8f}\t{rel:.8f}\n")
                f.flush()
                if s % 10 == 0 or s == args.steps - 1:
                    print(f"step {s}: single={l_ref:.6f} mesh={l_mesh:.6f} "
                          f"rel={rel:.2e}")
        print(f"wrote {out} ({len(rows)} rows)")
        print(f"max rel dev over {args.steps} steps: {max(rels):.3e}")
        got = unstack_params(stacked, 0)
        worst = max(
            float(np.max(np.abs(np.asarray(getattr(got, n))
                                - np.asarray(getattr(ref_p, n)))))
            for n in got._fields)
        print(f"max |param diff| after {args.steps} steps: {worst:.3e}")


if __name__ == "__main__":
    main()
