"""Dump the compiled HLO of the bench train step to a text file, so trace
op names (fusion.N, sort.N, ...) can be attributed to source computations.

Usage: python scripts/dump_hlo.py [--out /tmp/step_hlo.txt]
"""

import argparse
import os
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default="/tmp/step_hlo.txt")
    args = p.parse_args()

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
    B, H, W = 4, 300, 400
    R, T = graft._cams(B)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((B, H, W, 3), np.float32))

    from functools import partial

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, key):
        def loss_fn(pp):
            losses = model.forward(pp, phase, imgs, R, T, key)
            return losses["total"], losses

        grads, losses = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, lrs)
        params = jax.tree_util.tree_map(lambda a, u: a + u, params, updates)
        return params, opt_state, losses["total"]

    lowered = step.lower(params, opt_state, jax.random.PRNGKey(0))
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt) / 1e6:.1f} MB to {args.out}")


if __name__ == "__main__":
    main()
