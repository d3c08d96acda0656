"""Capture a device trace of the bench step and print a per-op breakdown.

Runs a few DTU-shaped optimizer steps (same workload as bench.py) under
jax.profiler, parses the xplane.pb with tensorboard_plugin_profile's
protobuf, and prints the top ops by total device time — the working tool
behind BENCH_NOTES.md's trace tables.

Usage: python scripts/trace_bench.py [--steps 3] [--top 40] [--out DIR]

``--band Hb [--batch B]`` traces the BANDED loss+grad program instead
(the per-device program of an sp pixel-band shard at the worst band
offset, same construction as scripts/sp_band_probe.py) — used to
decompose the measured per-band fixed floor (BENCH_NOTES "sp band-height
ladder"): full-face geometry vs replicated param-space losses
(TV/overlap/parsimony) vs kernel fixed costs.
"""

import argparse
import glob
import os
import sys
from collections import defaultdict

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)


def capture(out_dir, steps, band=None, batch=4):
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as graft
    from dbw_tpu.train.optimizer import create_optimizer

    model = graft._make_model(with_perceptual=True)
    backend = "pallas" if jax.default_backend() in ("tpu", "axon") else "xla"
    for r in (model.renderer, model.renderer_env, model.renderer_viz,
              model.renderer_light):
        r.config = r.config._replace(backend=backend)

    params = model.init_params(seed=0)
    cfg = {"training": {"optimizer": {"name": "adam", "lr": 5e-3,
                                      "texture": {"lr": 5e-2}}}}
    optimizer = create_optimizer(cfg, params)
    opt_state = optimizer.init(params)
    phase = model.phase_for_epoch(0, training=True)
    lrs = {"main": jnp.float32(5e-3), "texture": jnp.float32(5e-2)}
    B, (H, W) = batch, model.img_size
    R, T = graft._cams(B)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((B, H, W, 3), np.float32))

    from functools import partial

    if band is not None:
        # banded per-device program (sp shard stand-in): render only Hb
        # rows at the worst (block-dense, centered) offset; pixel losses on
        # the band, param-space losses full — same as sp_band_probe.py
        Hb = min(band, H)
        row0 = jnp.float32(max(0, min(H // 2 - Hb // 2, H - Hb)))
        imgs = jax.lax.dynamic_slice_in_dim(imgs, int(row0), Hb, axis=1)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, key):
        def loss_fn(pp):
            if band is not None:
                rec, aux = model.predict(
                    pp, phase, R, T, key=key, row_range=(row0, Hb)
                )
                losses = model.compute_losses(imgs, rec, pp, phase, aux,
                                              key=key)
            else:
                losses = model.forward(pp, phase, imgs, R, T, key)
            return losses["total"], losses

        grads, losses = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, lrs)
        params = jax.tree_util.tree_map(lambda a, u: a + u, params, updates)
        return params, opt_state, losses["total"]

    key = jax.random.PRNGKey(0)
    for i in range(2):  # warmup/compile
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
    jax.block_until_ready(loss)

    jax.profiler.start_trace(out_dir)
    for i in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
    jax.block_until_ready(loss)
    jax.profiler.stop_trace()


def parse(out_dir, top, steps):
    import gzip
    import json

    paths = glob.glob(os.path.join(out_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace.json.gz under {out_dir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)

    # device-thread ids: pid whose process_name mentions TPU, tid for XLA Ops
    proc = {}
    tids = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            proc[ev["pid"]] = ev["args"]["name"]
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tids[(ev["pid"], ev["tid"])] = ev["args"]["name"]

    op_total = defaultdict(float)
    op_count = defaultdict(int)
    total = 0.0
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X":
            continue
        pname = proc.get(ev.get("pid"), "")
        tname = tids.get((ev.get("pid"), ev.get("tid")), "")
        if "TPU" not in pname and "tpu" not in pname.lower():
            continue
        if "XLA Ops" not in tname:
            continue
        name = ev.get("name", "?")
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        op_total[name] += dur
        op_count[name] += 1
        total += dur

    rows = sorted(op_total.items(), key=lambda kv: -kv[1])
    print(f"\ntrace: {path}")
    print(f"total device op time: {total:.1f} ms over {steps} steps "
          f"({total / steps:.1f} ms/step)\n")
    print(f"{'ms/step':>9}  {'count':>6}  op")
    for name, ms in rows[:top]:
        print(f"{ms / steps:9.2f}  {op_count[name] // steps:6d}  {name[:110]}")
    other = sum(ms for _, ms in rows[top:])
    print(f"{other / steps:9.2f}  {'':>6}  [{len(rows) - top} other ops]")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--out", type=str, default="/tmp/dbw_trace")
    p.add_argument("--parse-only", action="store_true")
    p.add_argument("--band", type=int, default=None,
                   help="trace the banded (sp per-device) program at this "
                   "band height instead of the full frame")
    p.add_argument("--batch", type=int, default=4,
                   help="views per device (pairs with --band to match an "
                   "(data, sp) mesh's per-device shape)")
    args = p.parse_args()
    if not args.parse_only:
        capture(args.out, args.steps, band=args.band, batch=args.batch)
    parse(args.out, args.top, args.steps)
