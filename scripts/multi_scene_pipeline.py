"""Multi-scene pipeline: N scans as ONE sharded program (SURVEY §5.8c).

The reference optimizes the 10 DTU eval scans as 10 sequential jobs
(reference scripts/dtu.sh); here they run as one compiled program over a
("scene", "seed", "data") mesh — scenes never talk to each other, so the
scene axis maps onto DCN across hosts while the per-scene data axis rides
ICI. Each scene writes its own run dir with the full single-run artifact
surface.

Usage:
  python scripts/multi_scene_pipeline.py -t sweep \
      -c dtu/scan24.yml dtu/scan31.yml [-d dtu/default.yml] \
      [--n-seeds 1] [--n-data N] [--resume] [--no-quali]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from dbw_tpu.train.multi_scene import MultiSceneTrainer
from dbw_tpu.utils.config import dump_yaml, load_yaml
from dbw_tpu.utils.logger import create_logger, print_log
from dbw_tpu.utils.misc import path_mkdir
from dbw_tpu.utils.path import CONFIGS_PATH, RUNS_PATH


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-t", "--tag", required=True)
    p.add_argument("-c", "--configs", required=True, nargs="+",
                   help="one config per scene (shared model/training "
                   "sections; dataset tag/seed may differ)")
    p.add_argument("-d", "--default", default=None)
    p.add_argument("--n-seeds", type=int, default=1,
                   help="seeds per scene (best-of selection per scene)")
    p.add_argument("--n-data", type=int, default=None,
                   help="data-axis size per scene (devices for gradient "
                   "pmean over views)")
    p.add_argument("--resume", action="store_true",
                   help="continue from the first run dir's "
                   "multi_scene_model.pkl")
    p.add_argument("--no-quali", action="store_true",
                   help="skip the per-scene qualitative artifacts")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (this host's sitecustomize "
                   "pins the axon TPU platform; JAX_PLATFORMS=cpu alone "
                   "is ignored)")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    default_path = None if not args.default else CONFIGS_PATH / args.default
    cfgs, run_dirs = [], []
    for c in args.configs:
        cfg = load_yaml(CONFIGS_PATH / c, default_path)
        scene_tag = Path(c).stem
        run_dir = path_mkdir(
            RUNS_PATH / cfg["dataset"]["name"] / args.tag / scene_tag
        )
        dump_yaml(cfg, run_dir / Path(c).name)
        cfgs.append(cfg)
        run_dirs.append(run_dir)
    create_logger(run_dirs[0].parent)
    print_log(
        f"multi_scene_pipeline: {len(cfgs)} scenes -> "
        f"{[str(d) for d in run_dirs]}"
    )

    trainer = MultiSceneTrainer(
        cfgs, run_dirs, n_seeds=args.n_seeds, n_data=args.n_data,
        resume=args.resume,
    )
    trainer.run()
    trainer.evaluate(quali=not args.no_quali)


if __name__ == "__main__":
    main()
