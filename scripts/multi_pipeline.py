"""5-seed auto-selection pipeline (reference: scripts/multi_pipeline.sh +
README 'auto' protocol) as one seed-parallel program.

Output surface matches the reference protocol (which runs the full trainer
per seed, scripts/multi_pipeline.sh:12-23 -> src/trainer.py:241-272):
- per seed: ``seed{s}/model.pkl``, ``seed{s}/val_metrics.tsv``,
  ``seed{s}/final_scores.tsv`` (add ``--per-seed-full`` for per-seed
  quali/DTU artifacts too),
- protocol run dir: ``train_metrics.tsv``, ``seed_selection.tsv``, the
  best seed's ``model.pkl``, ``final_scores.tsv``, ``quali_eval/`` and —
  on DTU — the official-protocol ``dtu_scores.tsv``.

``--resume`` continues an interrupted protocol from ``multi_model.pkl``
(written at every val interval), replaying the exact batch order.

Single-scene data parallelism (the BASELINE.md north-star axis): one seed
with the view batch sharded over all devices — ``--seeds 4321 --n-data 8``
trains ONE scan with per-device B/8-view gradient shards pmean'd over ICI.
The seed/scene axes multiply protocol THROUGHPUT; only the data axis
shortens a single scan's wall-clock. Equality with single-device training
is pinned by tests/test_parallel.py::test_data_parallel_step_matches_single_device.
"""

import argparse
import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from dbw_tpu.train.multi_seed import MultiSeedTrainer
from dbw_tpu.utils.config import dump_yaml, load_yaml
from dbw_tpu.utils.logger import create_logger, print_log
from dbw_tpu.utils.misc import path_mkdir
from dbw_tpu.utils.path import CONFIGS_PATH, RUNS_PATH


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-t", "--tag", required=True)
    p.add_argument("-c", "--config", required=True)
    p.add_argument("-d", "--default", default=None)
    p.add_argument("--n-seeds", type=int, default=5)
    p.add_argument("--seeds", type=int, nargs="*", default=None)
    p.add_argument("--n-data", type=int, default=None,
                   help="explicit data-axis width: shard the B-view batch "
                   "over this many devices per seed (gradient pmean). "
                   "Single-scene wall-clock scaling = 1 seed + all devices "
                   "on data: `--seeds 4321 --n-data 8`. Requires n_devices "
                   "and batch_size divisible by n-data (validated loudly)")
    p.add_argument("--n-spatial", type=int, default=None,
                   help="pixel-band axis width: each band device renders "
                   "H/n_spatial image rows (band images are all_gathered "
                   "for the cross-pixel losses; gradients pmean exactly). "
                   "Not capped by batch_size — `--seeds 4321 --n-spatial 8` "
                   "puts all 8 devices on ONE scan at the reference's B=4. "
                   "Composes with --n-data: devices = seed*data*spatial")
    p.add_argument("--resume", action="store_true",
                   help="continue from the run dir's multi_model.pkl")
    p.add_argument("--per-seed-full", action="store_true",
                   help="full quali/DTU eval for every seed (reference's "
                   "exact per-run behavior), not just the best")
    p.add_argument("--n-traj-videos", type=int, default=None,
                   help="cap trajectory videos to the first N eval views "
                   "(default: all views, reference parity; each video is "
                   "240 rendered frames — the dominant eval cost on hosts "
                   "without a hardware encoder)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (this host's sitecustomize "
                   "pins the axon TPU platform; JAX_PLATFORMS=cpu alone "
                   "is ignored)")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    default_path = None if not args.default else CONFIGS_PATH / args.default
    cfg = load_yaml(CONFIGS_PATH / args.config, default_path)
    seeds = args.seeds or [random.randint(1, 1_000_000) for _ in range(args.n_seeds)]
    run_dir = path_mkdir(RUNS_PATH / cfg["dataset"]["name"] / args.tag)
    create_logger(run_dir)
    dump_yaml(cfg, run_dir / Path(args.config).name)
    print_log(f"multi_pipeline: seeds={seeds}, run_dir={run_dir}")

    trainer = MultiSeedTrainer(cfg, run_dir, seeds, resume=args.resume,
                               n_data=args.n_data, n_spatial=args.n_spatial)
    trainer.run()
    qk = (None if args.n_traj_videos is None
          else dict(n_traj_videos=args.n_traj_videos))
    trainer.evaluate(per_seed_full=args.per_seed_full, quali_kwargs=qk)


if __name__ == "__main__":
    main()
