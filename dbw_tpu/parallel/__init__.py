"""Multi-chip scale-out over a jax.sharding.Mesh.

The reference's parallelism is vestigial (dead DDP wrapper, SURVEY.md §2c);
the TPU-native replacements are:

- data parallelism over camera views within a scene (gradients pmean'd
  over the ``data`` mesh axis via XLA collectives on ICI),
- seed parallelism for the 5-seed protocol (one independent optimization
  per ``seed`` mesh-axis slot, zero communication until the final
  min-train-loss argmin — reference multi_pipeline.sh runs these
  sequentially),
- multi-scene batching: a ``scene`` mesh axis (one scene per device
  group; scenes.py) — scenes never communicate, so across hosts this axis
  rides DCN while the data-axis pmean stays on ICI.
"""

from .mesh import make_mesh, factor_devices
from .seeds import MultiSeedRunner, stack_params, pad_seeds, select_best_seed
from .scenes import MultiSceneRunner, make_scene_mesh, stack_scene_params
