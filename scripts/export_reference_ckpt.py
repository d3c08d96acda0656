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


def export_checkpoint(src_path, dst_path):
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
    out = {
        "epoch": int(state.get("epoch", 0)),
        "batch": int(state.get("batch", 0)),
        "model_name": state.get("model_name", "dbw"),
        "model_kwargs": state.get("model_kwargs", {}),
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
    args = p.parse_args()
    export_checkpoint(args.src, args.dst)


if __name__ == "__main__":
    main()
