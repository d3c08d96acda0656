"""Final per-run evaluation surface (reference: src/trainer.py:241-272).

One optimized scene -> the reference's complete artifact set in a run dir:
``final_scores.tsv`` (quantitative image metrics), ``quali_eval/`` (textures,
OBJ meshes, renders, trajectory videos, HTML gallery) and — for DTU scans —
the official Chamfer protocol's ``dtu_scores.tsv``.

Shared by ``Trainer.evaluate`` (single-seed runs) and
``MultiSeedTrainer.evaluate`` (the 5-seed auto protocol, which runs this per
seed / on the auto-selected best seed).
"""

from __future__ import annotations

import numpy as np

from ..utils.logger import print_log, print_warning
from ..utils.misc import path_mkdir
from ..utils.path import DATASETS_PATH


def write_scores_tsv(path, scores):
    with open(path, "w") as f:
        f.write("\t".join(scores.keys()) + "\n")
        f.write("\t".join(map("{:.5f}".format, scores.values())) + "\n")


def evaluate_run(model, params, test_loader, dataset, run_dir, quali=True,
                 lpips=None, label="", quali_kwargs=None):
    """Write the reference's final evaluation artifacts for one scene.

    quali=False restricts to the cheap quantitative surface (used for the
    non-selected seeds of the multi-seed protocol when per-seed videos are
    not wanted); quali_kwargs forwards to ``qualitative_eval`` (NV,
    n_views, render_videos, ...). Returns the final scores OrderedDict.
    """
    from .quant import quantitative_eval

    run_dir = path_mkdir(run_dir)
    tag = f"[{label}] " if label else ""

    if quali:
        from .quali import qualitative_eval

        out = path_mkdir(run_dir / "quali_eval")
        qualitative_eval(model, params, test_loader, out,
                         **(quali_kwargs or {}))

    scores = quantitative_eval(model, params, test_loader, lpips=lpips)
    print_log(
        tag + "final_scores: "
        + ", ".join("{}={:.5f}".format(k, v) for k, v in scores.items())
    )
    write_scores_tsv(run_dir / "final_scores.tsv", scores)

    if dataset.name == "dtu":
        from .dtu_eval import evaluate_mesh
        from .export import export_blocks_mesh

        scan_id = int(dataset.tag.replace("scan", ""))
        scale = np.asarray(dataset.scale_mat)
        verts, faces = export_blocks_mesh(
            model, params, filter_transparent=True
        )
        verts = verts @ scale[:3, :3].T + scale[:3, 3]
        evaluate_mesh(
            verts, faces, scan_id, DATASETS_PATH / "DTU", run_dir,
            save_viz=False,
        )

    if quali:
        try:
            from ..utils.html import gallery_from_run_dir

            gallery_from_run_dir(run_dir / "quali_eval")
        except Exception as e:  # pragma: no cover - gallery is best-effort
            print_warning(f"gallery generation failed: {e}")
    return scores
