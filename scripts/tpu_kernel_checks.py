"""On-device correctness checks for the TPU-only Pallas kernels.

The pytest suite runs on a virtual CPU mesh (tests/conftest.py), where the
DMA/RMW kernels cannot execute, so their pytest variants are skipped there.
This script runs the same checks on real TPU hardware:

    python scripts/tpu_kernel_checks.py

Checks (each against an independent numpy/XLA reference):
1. quad_corner_segment_sums (sorted windowed one-hot segment sum),
2. small_table_scatter_add (unsorted VMEM-accumulator scatter),
3. end-to-end texture + face-table gradients: quadk/auto kernels vs the
   plain XLA scatter reference on a real render graph.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp


def check_segment_sums():
    from dbw_tpu.ops.segment_sum_pallas import (
        pack_wxy, quad_corner_segment_sums,
    )

    rng = np.random.default_rng(0)
    N, R = 300_000, 71_424
    ids = np.sort(rng.integers(0, R, N)).astype(np.int32)
    wx = rng.random(N, dtype=np.float32)
    wy = rng.random(N, dtype=np.float32)
    g = rng.standard_normal((N, 3)).astype(np.float32)

    f = jax.jit(
        lambda s, a, b, g0, g1, g2: quad_corner_segment_sums(
            s, pack_wxy(a, b), (g0, g1, g2), R
        )
    )
    out = np.asarray(f(ids, wx, wy, g[:, 0], g[:, 1], g[:, 2])).T
    # reference uses the same 15-bit quantized weights the kernel unpacks
    qx = np.round(wx * 32767.0) / 32767.0
    qy = np.round(wy * 32767.0) / 32767.0
    w = np.stack([(1 - qx) * (1 - qy), qx * (1 - qy), (1 - qx) * qy, qx * qy], 1)
    ref = np.zeros((R, 12))
    for c in range(4):
        upd = g * w[:, c:c + 1]
        for ch in range(3):
            np.add.at(ref[:, c * 3 + ch], ids, upd[:, ch])
    err = np.abs(out - ref).max()
    assert err < 1e-4, err
    print(f"quad_corner_segment_sums: OK (max abs err {err:.2e})")


def check_small_table_scatter():
    from dbw_tpu.ops.segment_sum_pallas import small_table_scatter_add

    rng = np.random.default_rng(1)
    N, R = 200_000, 3201
    base = np.repeat(rng.integers(0, R - 200, N // 1000), 1000)
    ids = (base + rng.integers(0, 200, N)).clip(0, R - 1).astype(np.int32)
    ids[::97] = -1
    upd = rng.standard_normal((N, 12)).astype(np.float32)
    out = np.asarray(
        jax.jit(lambda i, u: small_table_scatter_add(i, u, R))(ids, upd)
    )
    ref = np.zeros((R, 12))
    m = ids >= 0
    for c in range(12):
        np.add.at(ref[:, c], ids[m], upd[m][:, c])
    err = np.abs(out - ref).max()
    assert err < 1e-3, err
    print(f"small_table_scatter_add: OK (max abs err {err:.2e})")


def check_render_gradients():
    """Full render-graph gradients: kernel backends vs XLA scatter."""
    import os

    import dbw_tpu.render.meshes as mm
    import dbw_tpu.ops.scatter as sc
    from dbw_tpu.models.dbw import BlocksWorld
    from dbw_tpu.ops.rotations import look_at_rotation

    model = BlocksWorld(
        (48, 64),
        mesh=dict(n_blocks=3, txt_size=32),
        renderer=dict(faces_per_pixel=4, detach_bary=True),
        rend_optim=dict(decouple_rendering=True),
        loss=dict(rgb_weight=1),
        backend="pallas",
    )
    K = np.zeros((4, 4), np.float32)
    K[0, 0] = K[1, 1] = 2.0
    model.set_camera(K)
    params = model.init_params(seed=0)
    phase = model.phase_for_epoch(0, training=True)
    R, T = look_at_rotation(3.0, 20.0, jnp.linspace(-30.0, 30.0, 2))
    imgs = jnp.full((2, 48, 64, 3), 0.5)

    def grads_with(texel_mode, scatter_mode):
        mm._TEXEL_MODE = texel_mode
        sc._MODE = scatter_mode

        def loss_fn(p):
            return model.forward(p, phase, imgs, R, T, jax.random.PRNGKey(0))[
                "total"
            ]

        return jax.jit(jax.grad(loss_fn))(params)

    g_kernel = grads_with("quadk", "auto")
    g_ref = grads_with("scatter", "0")
    for name in g_ref._fields:
        a = np.asarray(getattr(g_kernel, name))
        b = np.asarray(getattr(g_ref, name))
        scale = max(np.abs(b).max(), 1e-3)
        err = np.abs(a - b).max() / scale
        assert err < 5e-3, (name, err)
        print(f"  grad {name}: OK (max rel err {err:.2e})")
    print("render gradients (quadk+auto vs scatter): OK")


def main():
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    if jax.default_backend() == "cpu":
        print("WARNING: no TPU visible — kernels will fail or be skipped")
    t0 = time.time()
    check_segment_sums()
    check_small_table_scatter()
    check_render_gradients()
    print(f"all TPU kernel checks passed ({time.time() - t0:.0f}s)")


if __name__ == "__main__":
    main()
