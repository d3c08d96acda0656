"""Model registry (reference: src/model/__init__.py:20-23 — dbw only)."""

from .dbw import BlocksWorld, SceneParams, Phase


def get_model(name):
    return {"dbw": BlocksWorld}[name]


def create_model(cfg, img_size):
    kwargs = dict(cfg["model"])
    name = kwargs.pop("name")
    return get_model(name)(img_size, **kwargs)


def load_model_from_checkpoint(path, img_size, **overrides):
    """Rebuild (model, params) from a checkpoint's saved model_kwargs with
    optional overrides (reference: src/model/__init__.py:26-41)."""
    import jax

    from ..train.checkpoint import load_checkpoint

    ckpt = load_checkpoint(path)
    kwargs = dict(ckpt.get("model_kwargs") or {})
    kwargs.update(overrides)
    kwargs.pop("name", None)
    # reference checkpoints embed img_size in model_kwargs (reference
    # dbw.py:43-44); we pass it positionally from the dataset
    kwargs.pop("img_size", None)
    model = get_model(ckpt.get("model_name", "dbw"))(img_size, **kwargs)
    params = jax.tree_util.tree_map(
        lambda x: jax.numpy.asarray(x), ckpt["model_state"]
    )
    return model, params, ckpt
