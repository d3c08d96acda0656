"""Compile-footprint probe for the per-face-constant trajectory render.

Reproduces the exact program that OOM'd the round-4 flagship eval
(`quali_render_syn_u8`: render_faces_flat at B=10 chunk, DTU 300x400, ss4,
uint8 output — /tmp/flagship_r4b.log, 22.98 GB vs 15.75 GB HBM) and prints
the compiled memory analysis, so layout fixes are validated on the chip
BEFORE a 20-minute eval run depends on them.

Usage: python scripts/oom_probe.py [--chunk 10]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=10)
    args = ap.parse_args()

    from dbw_tpu.models.dbw import BlocksWorld
    from dbw_tpu.ops.rotations import look_at_rotation
    from dbw_tpu.models.dbw import Phase

    # flagship shape: DTU 300x400, 10 blocks, txt 256 (configs/dtu/default)
    model = BlocksWorld(
        (300, 400),
        mesh=dict(n_blocks=10, txt_size=256),
        renderer=dict(faces_per_pixel=10),
        rend_optim=dict(decouple_rendering=True),
        loss=dict(rgb_weight=1),
    )
    K = np.zeros((4, 4), np.float32)
    K[0, 0] = K[1, 1] = 2.0
    model.set_camera(K)
    params = model.init_params(seed=7)
    phase = Phase.eval_phase(filter_transparent=True)
    blocks, _ = model.build_blocks(params, phase, synthetic=True)
    syn_face_colors = model.synthetic_face_colors()

    def render_syn_u8_s(blocks, R, T):
        img = model.renderer_light.render_faces_flat(
            blocks, R, T, syn_face_colors
        )[..., :3]
        return (jnp.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)

    B = args.chunk
    R, T = look_at_rotation(3.0, 25.0, jnp.linspace(-40.0, 40.0, B))
    lowered = jax.jit(render_syn_u8_s).lower(blocks, R, T)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    print("memory_analysis:", ma)
    peak = getattr(ma, "temp_size_in_bytes", None)
    if peak is not None:
        print(f"temp={peak/2**30:.3f} GiB  "
              f"argument={ma.argument_size_in_bytes/2**30:.3f} GiB  "
              f"output={ma.output_size_in_bytes/2**30:.3f} GiB")
    out = np.asarray(compiled(blocks, R, T))
    print("executed ok:", out.shape, out.dtype, "mean", out.mean())


if __name__ == "__main__":
    main()
