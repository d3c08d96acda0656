"""Re-run the quantitative final evaluation for any finished run dir.

Rewrites ``final_scores.tsv`` (PSNR / SSIM / LPIPS + training losses +
block stats — reference src/model/dbw.py:465-493) from the run's saved
checkpoint WITHOUT redoing the expensive qualitative surface (meshes,
videos, gallery). Useful when a metric implementation changed after the
run finished — e.g. re-scoring with the precision-fixed SSIM — or when a
final eval was interrupted after quali already landed.

Usage:
  python scripts/requant_run.py --run runs/synthetic/dtu_shaped_r4
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run", required=True, help="run dir with model.pkl + a "
                   "dumped config yml")
    p.add_argument("--ckpt", default="model.pkl")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from dbw_tpu.data import create_train_val_test_loader
    from dbw_tpu.eval.full import evaluate_run
    from dbw_tpu.models import load_model_from_checkpoint
    from dbw_tpu.utils.config import load_yaml

    run_dir = Path(args.run)
    ymls = sorted(run_dir.glob("*.yml"))
    if not ymls:
        sys.exit(f"no dumped config yml in {run_dir}")
    cfg = load_yaml(ymls[0])
    old_tsv = None
    tsv_path = run_dir / "final_scores.tsv"
    if tsv_path.exists():
        old_tsv = tsv_path.read_text()
    train_loader, _, test_loader = create_train_val_test_loader(cfg)
    dataset = train_loader.dataset
    model, params, _ = load_model_from_checkpoint(
        run_dir / args.ckpt, dataset.img_size
    )
    model.set_camera(dataset.K[0])  # builds the renderer family
    scores = evaluate_run(
        model, params, test_loader, dataset, run_dir, quali=False
    )
    print("final_scores:",
          ", ".join(f"{k}={v:.5f}" for k, v in scores.items()))

    # provenance note: a re-scored TSV next to a training.log that printed
    # different (pre-fix) values must be self-explaining (VERDICT r4 #9)
    import datetime
    import subprocess

    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=Path(__file__).resolve().parents[1],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:
        commit = "unknown"
    note = run_dir / "final_scores.requant.txt"
    stamp = datetime.datetime.now().isoformat(timespec="seconds")
    with open(note, "a") as f:
        f.write(
            f"== requant {stamp} (commit {commit}, ckpt {args.ckpt}) ==\n"
            "final_scores.tsv was REWRITTEN by scripts/requant_run.py from "
            "the saved checkpoint using the metric implementations at the "
            "commit above; values printed in training.log predate this "
            "re-score and may differ (e.g. the pre-fix bf16 SSIM).\n"
            "previous final_scores.tsv:\n"
            f"{old_tsv if old_tsv is not None else '(none existed)'}\n"
            "new final_scores.tsv:\n"
            f"{tsv_path.read_text() if tsv_path.exists() else '(missing)'}\n"
        )
    print(f"wrote provenance note: {note}")


if __name__ == "__main__":
    main()
