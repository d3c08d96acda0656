"""Export one of this framework's checkpoints to the reference PyTorch
implementation's ``model.pkl`` format (torch.save; reference
src/trainer.py:201-209), so scenes optimized here can be loaded by the
reference's eval/visualization tooling (``load_model_from_path``,
src/model/__init__.py:26-41).

Parameter names/layouts already match field for field (see
scripts/import_reference_ckpt.py); this writes torch tensors plus the
model_kwargs needed to rebuild the reference module. Optimizer/scheduler
states are written empty (optax state is not torch-portable).

Usage:
  python scripts/export_reference_ckpt.py runs/dtu/myrun/model.pkl ref_model.pkl
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _discover_img_size(src_path):
    """Pull dataset img_size from the run dir's dumped config, if any
    (our trainer dumps the merged YAML next to model.pkl)."""
    import glob

    run_dir = os.path.dirname(os.path.abspath(src_path))
    for yml in sorted(glob.glob(os.path.join(run_dir, "*.yml"))) + sorted(
        glob.glob(os.path.join(run_dir, "*.yaml"))
    ):
        try:
            import yaml

            with open(yml) as f:
                cfg = yaml.safe_load(f)
            sz = (cfg or {}).get("dataset", {}).get("img_size")
            if sz is not None:
                return tuple(int(x) for x in sz)
        except Exception:
            continue
    return None


def export_checkpoint(src_path, dst_path, img_size=None):
    import torch

    with open(src_path, "rb") as f:
        state = pickle.load(f)
    ms = state["model_state"]
    if not isinstance(ms, dict):  # SceneParams NamedTuple
        ms = ms._asdict() if hasattr(ms, "_asdict") else dict(ms)
    tensors = {
        k: torch.from_numpy(np.ascontiguousarray(np.asarray(v, np.float32)))
        for k, v in ms.items()
    }
    # The reference rebuilds via get_model(name)(**model_kwargs) where
    # DifferentiableBlocksWorld.__init__(self, img_size, **kwargs) — its
    # _init_kwargs always embeds img_size and has no 'name' key (reference
    # src/model/dbw.py:43-44, src/model/__init__.py:38). Match that shape.
    model_kwargs = dict(state.get("model_kwargs", {}))
    model_kwargs.pop("name", None)
    if img_size is None:
        img_size = _discover_img_size(src_path)
    if img_size is None:
        raise ValueError(
            "img_size is required for a reference-loadable checkpoint: pass "
            "--img-size H W (no *.yml with dataset.img_size found next to "
            f"{src_path})"
        )
    model_kwargs["img_size"] = list(int(x) for x in img_size)
    out = {
        "epoch": int(state.get("epoch", 0)),
        "batch": int(state.get("batch", 0)),
        "model_name": state.get("model_name", "dbw"),
        "model_kwargs": model_kwargs,
        "model_state": tensors,
        "optimizer_state": {},
        "scheduler_state": {},
    }
    os.makedirs(os.path.dirname(os.path.abspath(dst_path)), exist_ok=True)
    torch.save(out, dst_path)
    n = tensors["T"].shape[0]
    print(
        f"exported {src_path} -> {dst_path}: {n} blocks, "
        f"textures {tuple(tensors['textures'].shape)}, epoch {out['epoch']}"
    )
    return dst_path


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("src", help="this framework's model.pkl")
    p.add_argument("dst", help="output reference-format model.pkl")
    p.add_argument(
        "--img-size", type=int, nargs=2, metavar=("H", "W"), default=None,
        help="dataset image size to embed in model_kwargs (the reference "
        "requires it; auto-read from the run dir's dumped config if omitted)",
    )
    args = p.parse_args()
    export_checkpoint(args.src, args.dst, img_size=args.img_size)


if __name__ == "__main__":
    main()
