"""Import a reference differentiable-blocksworld checkpoint into this
framework.

The reference saves ``model.pkl`` via ``torch.save`` with
``{epoch, batch, model_name, model_kwargs, model_state (torch state_dict),
optimizer_state, scheduler_state}`` (reference src/trainer.py:201-209).
Parameter names and layouts match this framework's ``SceneParams`` field
for field (reference src/model/dbw.py:84-119 — textures are already
(N, H, W, 3)), so a trained reference scene converts losslessly:

- ``module.`` prefixes stripped (old DataParallel checkpoints, reference
  src/model/tools.py:17-21),
- legacy ``spq_`` keys renamed to ``sq_`` (reference src/model/dbw.py:445),
- registered buffers (uv tables, sq_eta/omega, world pose) dropped — they
  are deterministic statics this framework recomputes at model build,
- optimizer/scheduler state dropped (torch Adam state is not portable to
  optax; the trainer's resume path re-initializes on mismatch),
- epoch/batch carried over so a ``resume`` continues the curriculum at the
  right phase.

Usage:
  python scripts/import_reference_ckpt.py ref_model.pkl out_model.pkl
  python trainer.py --tag cont --config <cfg>   # with training.resume: out_model.pkl
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def convert_state(model_state):
    """torch (or numpy) state_dict -> SceneParams-compatible dict of np arrays."""
    from dbw_tpu.models.dbw import SceneParams

    out = {}
    for k, v in model_state.items():
        k = k[len("module."):] if k.startswith("module.") else k
        k = k.replace("spq_", "sq_")
        if k not in SceneParams._fields:
            continue  # registered buffer / loss-net weights: recomputed here
        if hasattr(v, "detach"):  # torch tensor
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v, np.float32)
    missing = [f for f in SceneParams._fields if f not in out]
    if missing:
        raise ValueError(f"reference checkpoint is missing parameters: {missing}")
    n = out["T"].shape[0]
    for k in ("sq_eps", "S", "R_6d", "alpha_logit", "textures"):
        if out[k].shape[0] != n:
            raise ValueError(
                f"inconsistent block count: T has {n}, {k} has {out[k].shape[0]}"
            )
    return out


def import_checkpoint(src_path, dst_path):
    try:
        import torch

        state = torch.load(src_path, map_location="cpu", weights_only=False)
    except ImportError:  # torch-free fallback: plain-pickle checkpoints only
        with open(src_path, "rb") as f:
            state = pickle.load(f)

    ms = convert_state(state["model_state"])
    # Real reference checkpoints embed img_size in model_kwargs (reference
    # src/model/dbw.py:43-44); our loaders pass img_size positionally from
    # the dataset, so keeping it would crash load_model_from_checkpoint with
    # "multiple values for img_size". Strip it (and 'name', which the
    # reference never stores but our own configs carry).
    model_kwargs = dict(state.get("model_kwargs", {}))
    model_kwargs.pop("img_size", None)
    model_kwargs.pop("name", None)
    out = {
        "epoch": int(state.get("epoch", 0)),
        "batch": int(state.get("batch", 0)),
        "model_name": state.get("model_name", "dbw"),
        "model_kwargs": model_kwargs,
        "model_state": ms,
        "optimizer_state": None,  # torch Adam state is not optax-portable
    }
    os.makedirs(os.path.dirname(os.path.abspath(dst_path)), exist_ok=True)
    with open(dst_path, "wb") as f:
        pickle.dump(out, f)
    n = ms["T"].shape[0]
    print(
        f"imported {src_path} -> {dst_path}: {n} blocks, "
        f"textures {ms['textures'].shape}, epoch {out['epoch']}"
    )
    return dst_path


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("src", help="reference model.pkl (torch.save format)")
    p.add_argument("dst", help="output checkpoint path (this framework)")
    args = p.parse_args()
    import_checkpoint(args.src, args.dst)


if __name__ == "__main__":
    main()
