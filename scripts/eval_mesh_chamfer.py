"""Mesh-vs-GT-points evaluation for any finished run dir.

Exports the run's filtered block mesh and scores it against the dataset's
GT point cloud with the MeshEvaluator surface (chamfer-L1 / normal-cos,
with and without gradient-ICP alignment — reference
src/utils/metrics.py:110-198). The reference only reports mesh accuracy
through the DTU protocol (scan datasets); this utility gives the same
family of numbers for ANY dataset that carries GT points (synthetic
scenes, DTU raw pc), e.g. the end-to-end schedule demonstrations.

Usage:
  python scripts/eval_mesh_chamfer.py --run runs/synthetic/dtu_shaped_r3
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run", required=True, help="run dir with model.pkl + a "
                   "dumped config yml")
    p.add_argument("--ckpt", default="model.pkl")
    p.add_argument("--fast-cpu", action="store_true")
    args = p.parse_args()

    from dbw_tpu.data import create_train_val_test_loader
    from dbw_tpu.eval.export import export_blocks_mesh
    from dbw_tpu.eval.metrics import MeshEvaluator
    from dbw_tpu.models import load_model_from_checkpoint
    from dbw_tpu.utils.config import load_yaml

    run_dir = Path(args.run)
    ymls = sorted(run_dir.glob("*.yml"))
    if not ymls:
        sys.exit(f"no dumped config yml in {run_dir}")
    cfg = load_yaml(ymls[0])
    train_loader, _, _ = create_train_val_test_loader(cfg)
    dataset = train_loader.dataset
    pc_gt = np.asarray(dataset.pc_gt)
    if pc_gt.size <= 3:
        sys.exit(f"dataset {dataset.tag} has no GT point cloud")

    model, params, _ = load_model_from_checkpoint(
        run_dir / args.ckpt, dataset.img_size
    )
    verts, faces = export_blocks_mesh(model, params, filter_transparent=True)
    ev = MeshEvaluator(fast_cpu=args.fast_cpu)
    scores = ev.evaluate(verts, faces, pc_gt)
    print("mesh_scores:",
          ", ".join(f"{k}={v:.5f}" for k, v in scores.items()))
    with open(run_dir / "mesh_scores.tsv", "w") as f:
        f.write("\t".join(scores.keys()) + "\n")
        f.write("\t".join(f"{v:.6f}" for v in scores.values()) + "\n")


if __name__ == "__main__":
    main()
