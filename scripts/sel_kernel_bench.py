"""Micro-benchmark the Pallas selection kernel on the REAL bench scenes.

Builds the DTU-shaped model (the same one bench.py times), extracts the
blocks scene (soft pass, K=10) and env scene (hard pass, K=1), and times
rasterize_pallas_batched across tile / slot-state configurations set via
DBW_SEL_TILE / DBW_SEL_TILE_K1 ("THxTWxKS").

Usage: python scripts/sel_kernel_bench.py --pass blocks --tiles 8x16x128,16x16x128
"""

import argparse
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pass", dest="which", default="blocks",
                   choices=["blocks", "env"])
    p.add_argument("--tiles", default="8x16x128")
    p.add_argument("--coarsens", default="1",
                   help="comma list of DBW_SEL_COARSEN values to sweep")
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as graft
    from dbw_tpu.render import rasterize_pallas as rp
    from dbw_tpu.render.rasterize import project_faces

    model = graft._make_model()
    params = model.init_params(seed=0)
    phase = model.phase_for_epoch(0, training=True)
    R, T = graft._cams(4)
    key = jax.random.PRNGKey(0)

    if args.which == "blocks":
        scene = model.build_blocks(params, phase, key=key)[0]
        rend = model.renderer
        sigma = phase.sigma
    else:
        scene = model.build_env(params, phase)[0]
        rend = model.renderer_env
        sigma = None
    cfg = rend.config._replace(backend="pallas")
    rcfg = cfg.raster_config()
    sigma, blur = rend._sigma_blur(sigma)
    cam = rend.camera
    geom_b = jax.vmap(
        lambda r, t: project_faces(scene.verts, scene.faces, r, t, cam,
                                   z_clip=cfg.z_clip)
    )(R, T)
    packed = jax.vmap(rp.pack_faces)(geom_b)
    print(f"{args.which}: F={scene.faces.shape[0]}, K={rcfg.faces_per_pixel}, "
          f"blur={float(blur):.2e}")

    env_key = "DBW_SEL_TILE_K1" if rcfg.faces_per_pixel == 1 else "DBW_SEL_TILE"
    co_key = ("DBW_SEL_COARSEN_K1" if rcfg.faces_per_pixel == 1
              else "DBW_SEL_COARSEN")
    for tile in args.tiles.split(","):
        os.environ[env_key] = tile
        for co in args.coarsens.split(","):
            os.environ[co_key] = co
            f = jax.jit(
                lambda pk: rp.rasterize_pallas_batched(pk, blur, rcfg)
            )
            out = f(packed)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = f(packed)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / args.iters * 1000
            print(f"  {tile} coarsen={co}: {dt:.2f} ms")


if __name__ == "__main__":
    main()
