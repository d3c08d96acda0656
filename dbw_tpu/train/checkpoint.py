"""Checkpoint save/load (reference: src/trainer.py:84-107, 201-209).

One pickle per checkpoint holding numpy-ified pytrees:
{epoch, batch, model_name, model_kwargs, model_state (SceneParams),
 optimizer_state, scheduler ignored (closed-form)}. ``pretrained`` loads
weights only; ``resume`` restores the full state including the mid-epoch
batch cursor and cur_epoch so the curriculum continues correctly."""

from __future__ import annotations

import pickle
from pathlib import Path

import jax
import numpy as np

from ..models.dbw import SceneParams


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path, params, opt_state, epoch, batch, model_name="dbw",
                    model_kwargs=None):
    state = {
        "epoch": int(epoch),
        "batch": int(batch),
        "model_name": model_name,
        "model_kwargs": model_kwargs or {},
        "model_state": _to_numpy(params)._asdict(),
        "optimizer_state": _to_numpy(opt_state),
    }
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(state, f)
    return path


def load_checkpoint(path):
    with open(path, "rb") as f:
        state = pickle.load(f)
    ms = state["model_state"]
    # backward-compat key rename (reference dbw.py:445)
    ms = {k.replace("spq_", "sq_"): v for k, v in ms.items()}
    state["model_state"] = SceneParams(**ms)
    return state


# ---------------------------------------------------------------------------
# Orbax backend: TPU-native async/multi-host-safe checkpointing for long
# runs (the pickle format above stays the default for its exact parity with
# the reference's model.pkl contract).
# ---------------------------------------------------------------------------


def save_checkpoint_orbax(directory, params, opt_state, epoch, batch,
                          model_kwargs=None):
    import orbax.checkpoint as ocp

    directory = Path(directory).absolute()
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "model_state": _to_numpy(params)._asdict(),
        "optimizer_state": _to_numpy(opt_state),
        "meta": {
            "epoch": np.asarray(epoch), "batch": np.asarray(batch),
        },
    }
    ckptr.save(directory / "state", payload, force=True)
    ckptr.wait_until_finished()
    (directory / "model_kwargs.pkl").write_bytes(
        pickle.dumps(model_kwargs or {})
    )
    return directory


def load_checkpoint_orbax(directory):
    import orbax.checkpoint as ocp

    directory = Path(directory).absolute()
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(directory / "state")
    ms = {
        k.replace("spq_", "sq_"): v for k, v in payload["model_state"].items()
    }
    return {
        "model_state": SceneParams(**ms),
        "optimizer_state": payload["optimizer_state"],
        "epoch": int(payload["meta"]["epoch"]),
        "batch": int(payload["meta"]["batch"]),
        "model_kwargs": pickle.loads(
            (directory / "model_kwargs.pkl").read_bytes()
        ),
    }
