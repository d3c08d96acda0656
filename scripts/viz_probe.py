"""Time the fused viz program's components on the current backend.

The trainer dispatches one fused viz program per val interval
(trainer.py::_get_viz_fn); on the flagship schedule that is 234 dispatches,
so its device time is a first-order wall-clock term (the host side is
already async — only the DEVICE time serializes with train steps in the
FIFO queue). This probe loads a finished run's checkpoint and times each
stream separately: soft predict, edge overlay (4x supersampled raster),
hard predict, synthetic predict, texture grid.

Usage:
  python scripts/viz_probe.py --run runs/synthetic/dtu_shaped_r4
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def timeit(label, fn, *a, n=5):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:28s} {dt * 1e3:9.1f} ms")
    return dt


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--run", required=True)
    p.add_argument("--ckpt", default="model.pkl")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dbw_tpu.data import create_train_val_test_loader
    from dbw_tpu.models import load_model_from_checkpoint
    from dbw_tpu.models.dbw import Phase
    from dbw_tpu.utils.config import load_yaml

    run_dir = Path(args.run)
    cfg = load_yaml(sorted(run_dir.glob("*.yml"))[0])
    train_loader, _, _ = create_train_val_test_loader(cfg)
    ds = train_loader.dataset
    model, params, _ = load_model_from_checkpoint(
        run_dir / args.ckpt, ds.img_size
    )
    model.set_camera(ds.K[0])
    NV = 4
    R = jnp.asarray(ds.R[:NV])
    T = jnp.asarray(ds.T[:NV])
    phase = model.phase_for_epoch(int(cfg["training"]["n_epoches"]) - 1,
                                  training=False)
    key = jax.random.PRNGKey(0)

    predict = jax.jit(lambda p, ph, R, T, k: model.predict(p, ph, R, T, key=k)[0])
    predict_syn = jax.jit(lambda p, ph, R, T: model.predict_synthetic(p, ph, R, T))

    @jax.jit
    def edges(p, ph, rec, R, T):
        scene, _, _ = model.build_scene(p, ph)
        nfe = model.env_n_faces
        face_cols = jnp.concatenate(
            [jnp.zeros((nfe, 3)),
             jnp.ones((model.n_blocks * model.BNF, 3))]
        )
        return model.renderer_viz.draw_edges(rec, scene, R, T, face_cols)

    phase_hard = phase._replace(filter_transparent=jnp.asarray(True))
    rec = predict(params, phase, R, T, key)
    t1 = timeit("soft predict (4 views)", predict, params, phase, R, T, key)
    t2 = timeit("edge overlay (ss4 raster)", edges, params, phase, rec, R, T)
    t3 = timeit("hard predict", predict, params, phase_hard, R, T, key)
    t4 = timeit("synthetic predict", predict_syn, params, phase, R, T)
    print(f"{'SUM (viz streams)':28s} {(t1+t2+t3+t4) * 1e3:9.1f} ms")

    # D2H pull of the viz outputs through the tunnel (uint8, what the
    # background worker pays — serializes the device queue on one chip)
    out = [predict(params, phase, R, T, key)] * 3
    u8 = jax.jit(lambda xs: [
        (jnp.clip(x, 0, 1) * 255).astype(jnp.uint8) for x in xs
    ])(out)
    timeit("viz D2H pull (3x uint8)", lambda xs: [np.asarray(x) for x in xs],
           u8)

    # checkpoint pack + D2H (what save() dispatches per val interval)
    from dbw_tpu.utils.device_pack import make_packer

    pack, unpack = make_packer(params)
    packed = pack(params)
    nb = packed.size * packed.dtype.itemsize
    print(f"{'ckpt packed bytes':28s} {nb / 1e6:9.1f} MB")
    timeit("ckpt pack (device)", pack, params)
    timeit("ckpt D2H pull", lambda p: np.asarray(p), packed)
