"""dbw_tpu — a TPU-native JAX framework for Differentiable Blocks World.

From-scratch reimplementation of the capabilities of
`monniert/differentiable-blocksworld` (NeurIPS 2023), designed TPU-first:

- the scene (superquadric blocks + ground plane + background dome) is one
  static-shape parameter pytree,
- the soft mesh rasterizer is a two-stage design: a non-differentiable
  top-K face-selection kernel (Pallas on TPU, pure-XLA fallback) followed by
  a fully differentiable XLA interpolation/shading/blend stage,
- the whole optimization step (build meshes -> rasterize -> blend -> losses
  -> Adam update) compiles into a single jitted function vmapped over camera
  views,
- multi-seed / multi-scene protocols scale over a `jax.sharding.Mesh`.

See SURVEY.md at the repo root for the structural map of the reference this
framework rebuilds.
"""

__version__ = "0.1.0"
