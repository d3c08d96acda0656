"""5-seed auto-selection pipeline (reference: scripts/multi_pipeline.sh +
README 'auto' protocol) as one seed-parallel program."""

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
    args = p.parse_args()

    default_path = None if not args.default else CONFIGS_PATH / args.default
    cfg = load_yaml(CONFIGS_PATH / args.config, default_path)
    seeds = args.seeds or [random.randint(1, 1_000_000) for _ in range(args.n_seeds)]
    run_dir = path_mkdir(RUNS_PATH / cfg["dataset"]["name"] / args.tag)
    create_logger(run_dir)
    dump_yaml(cfg, run_dir / Path(args.config).name)
    print_log(f"multi_pipeline: seeds={seeds}, run_dir={run_dir}")

    trainer = MultiSeedTrainer(cfg, run_dir, seeds)
    best_params, best_seed, losses = trainer.run()

    # quantitative eval of the auto-selected model
    from dbw_tpu.eval.quant import quantitative_eval

    scores = quantitative_eval(trainer.model, best_params, trainer.test_loader)
    print_log(
        "auto-selected final_scores: "
        + ", ".join("{}={:.5f}".format(k, v) for k, v in scores.items())
    )
    with open(run_dir / "final_scores.tsv", "w") as f:
        f.write("\t".join(scores.keys()) + "\n")
        f.write("\t".join(map("{:.5f}".format, scores.values())) + "\n")


if __name__ == "__main__":
    main()
