"""Model registry (reference: src/model/__init__.py:20-23 — dbw only)."""

from .dbw import BlocksWorld, SceneParams, Phase


def get_model(name):
    return {"dbw": BlocksWorld}[name]


def create_model(cfg, img_size):
    kwargs = dict(cfg["model"])
    name = kwargs.pop("name")
    return get_model(name)(img_size, **kwargs)
