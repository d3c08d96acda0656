"""Benchmark: DTU-shaped optimization step throughput on one chip.

Workload mirrors the reference's derived throughput row (BASELINE.md):
300x400 px render, batch of 4 views, 10 blocks + env, faces_per_pixel 10,
full loss stack, fwd+bwd+Adam — the reference does ~1.54 steps/s on one
GPU (4h / 22k steps). Prints ONE JSON line.

Usage: python bench.py [--steps N] [--backend xla|pallas]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

# persistent compile cache: first-compile of the full step graph is minutes
# on this hardware; subsequent runs (including the driver's) hit the cache.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
# Backward defaults: DBW_TEXEL=auto (quadk Pallas texel kernel) and
# DBW_FAST_SCATTER=auto (Pallas small-table face backward) — see
# BENCH_NOTES.md for the measured ladder and the legacy escape hatches.


REFERENCE_STEPS_PER_SEC = 1.0 / 0.65  # BASELINE.md derived: ~0.65 s/step


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=40)
    parser.add_argument(
        "--max-warmup-calls", type=int, default=40,
        help="cap on stability-seeking warmup calls")
    parser.add_argument(
        "--max-warmup-s", type=float, default=900.0,
        help="wall-clock cap on the warmup phase (cold compiles through "
        "the axon remote-compile tunnel can take many minutes)")
    parser.add_argument(
        "--steps-per-call", type=int, default=5,
        help="optimizer steps lax.scan'd inside one device program "
        "(amortizes host dispatch; device math identical)",
    )
    parser.add_argument("--backend", type=str, default=None,
                        help="rasterizer backend override (xla|pallas)")
    parser.add_argument("--no-perceptual", action="store_true")
    parser.add_argument("--blocks", type=int, default=10,
                        help="number of superquadric blocks (reference max 50)")
    parser.add_argument("--img-size", type=int, nargs=2, default=(300, 400),
                        metavar=("H", "W"),
                        help="render size (default: the baseline 300x400; "
                        "smaller sizes are for CPU smokes, not benching)")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (sitecustomize pins the "
                        "axon TPU platform, so JAX_PLATFORMS=cpu is ignored)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, ".")
    import __graft_entry__ as graft
    from dbw_tpu.train.optimizer import create_optimizer

    backend = args.backend
    if backend is None:
        backend = "pallas" if jax.default_backend() in ("tpu", "axon") else "xla"

    model = graft._make_model(img_size=tuple(args.img_size),
                              n_blocks=args.blocks,
                              with_perceptual=not args.no_perceptual)
    for r in (model.renderer, model.renderer_env, model.renderer_viz,
              model.renderer_light):
        r.config = r.config._replace(backend=backend)
    try:
        model.renderer.config.raster_config()  # sanity
    except Exception:
        backend = "xla"

    params = model.init_params(seed=0)
    cfg = {"training": {"optimizer": {"name": "adam", "lr": 5e-3,
                                      "texture": {"lr": 5e-2}}}}
    optimizer = create_optimizer(cfg, params)
    opt_state = optimizer.init(params)
    phase = model.phase_for_epoch(0, training=True)
    lrs = {"main": jnp.float32(5e-3), "texture": jnp.float32(5e-2)}

    B, (H, W) = 4, args.img_size
    R, T = graft._cams(B)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((B, H, W, 3), np.float32))

    from dbw_tpu.utils.aot_cache import aot_jit

    SPC = max(args.steps_per_call, 1)

    # AOT executable cache (utils/aot_cache.py): the axon platform bypasses
    # the persistent compile cache, so without this every bench process pays
    # ~209 s of remote compile (BENCH_r03 cold_start_s). With it, the first
    # run serializes the compiled executable and later runs load it in
    # seconds. DBW_AOT=0 restores the plain jit path.
    @aot_jit(donate_argnums=(0, 1), label="bench_multi_step")
    def multi_step(params, opt_state, ctrs):
        """lax.scan of SPC optimizer steps in ONE device program — the
        trainer-shaped inner loop (same batch each step here; throughput
        is batch-content independent). Per-step RNG keys are folded from
        step counters INSIDE the program (like train/trainer.py) so the
        timed region contains zero host-side key dispatches."""

        def body(carry, ctr):
            p, o = carry
            key = jax.random.fold_in(base_key, ctr)

            def loss_fn(pp):
                losses = model.forward(pp, phase, imgs, R, T, key)
                return losses["total"], losses

            grads, losses = jax.grad(loss_fn, has_aux=True)(p)
            updates, o = optimizer.update(grads, o, lrs)
            p = jax.tree_util.tree_map(lambda a, u: a + u, p, updates)
            return (p, o), losses["total"]

        (params, opt_state), losses = jax.lax.scan(body, (params, opt_state), ctrs)
        return params, opt_state, losses[-1]

    base_key = jax.random.PRNGKey(0)
    step_ctr = [0]

    def run_call(params, opt_state):
        ctrs = np.arange(step_ctr[0], step_ctr[0] + SPC, dtype=np.int32)
        step_ctr[0] += SPC
        return multi_step(params, opt_state, ctrs)

    def timed_call(params, opt_state):
        t0 = time.perf_counter()
        params, opt_state, loss = run_call(params, opt_state)
        jax.block_until_ready(loss)
        return time.perf_counter() - t0, params, opt_state, loss

    # --- Cold-run-proof warmup ------------------------------------------
    # The first call pays tracing + compilation (minutes through the axon
    # remote-compile service, which bypasses the persistent cache), and the
    # first few executions can pay tunnel/executable-paging overheads.  A
    # fixed warmup count is NOT safe here (round 2's official capture caught
    # ~70 s of one-time overhead inside its timed region).  Instead: time
    # every call individually and keep warming until two consecutive calls
    # agree within 10%, bounded by --max-warmup-calls / --max-warmup-s.
    warmup_times = []
    warmup_t0 = time.perf_counter()
    warmup_stable = False
    while len(warmup_times) < args.max_warmup_calls:
        dt, params, opt_state, loss = timed_call(params, opt_state)
        warmup_times.append(dt)
        if len(warmup_times) >= 2:
            a, b = warmup_times[-2], warmup_times[-1]
            if abs(a - b) <= 0.10 * min(a, b):
                warmup_stable = True
                break
        if time.perf_counter() - warmup_t0 > args.max_warmup_s:
            break
    cold_start_s = time.perf_counter() - warmup_t0

    # --- Timed phase: per-call timing, report the MEDIAN -----------------
    # The median sheds any residual one-time outlier (GC pause, tunnel
    # hiccup) that a mean over one long region would absorb.
    n_calls = max(args.steps // SPC, 4)
    call_times = []
    for _ in range(n_calls):
        dt, params, opt_state, loss = timed_call(params, opt_state)
        call_times.append(dt)

    median_call = float(np.median(call_times))
    steps_per_sec = SPC / median_call
    # rendered Mpix/s fwd+bwd: soft blocks pass + hard env pass per view
    mpix = B * H * W * 2 * steps_per_sec / 1e6
    print(
        json.dumps(
            {
                "metric": (
                    f"optim steps/sec (DTU-shaped: {B}x{H}x{W}, "
                    f"{args.blocks} blocks, K=10, fwd+bwd+adam)"
                ),
                "value": round(steps_per_sec, 4),
                "unit": "steps/s",
                # the derived reference figure is for the 10-block 300x400
                # workload; other shapes have no published baseline
                "vs_baseline": (
                    round(steps_per_sec / REFERENCE_STEPS_PER_SEC, 4)
                    if args.blocks == 10 and (H, W) == (300, 400) else None
                ),
                "extra": {
                    "backend": backend,
                    "device": str(jax.devices()[0].device_kind),
                    "rendered_mpix_per_sec": round(mpix, 2),
                    "final_loss": float(loss),
                    # self-diagnosing cold-start accounting: a distorted run
                    # shows up here instead of silently skewing `value`.
                    "warmup_calls": len(warmup_times),
                    "warmup_stable": warmup_stable,
                    "cold_start_s": round(cold_start_s, 2),
                    "timed_calls": n_calls,
                    "steps_per_call": SPC,
                    "call_s_median": round(median_call, 4),
                    "call_s_min": round(float(np.min(call_times)), 4),
                    "call_s_max": round(float(np.max(call_times)), 4),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
