"""Optimizer factory (reference: src/optimizer.py).

The reference builds a torch Adam with a second param group for
``texture*``-prefixed params at 10x LR. Here the optimizer is an optax
gradient transform WITHOUT the learning-rate step: the per-group LRs are
traced inputs of the jitted train step (so the multistep schedule never
recompiles). ``update(grads, state, lrs)`` applies the transform then scales
each leaf by -lr[group(leaf)].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import optax

from ..models.dbw import SceneParams, TEXTURE_PARAM_NAMES


def param_group_labels(params: SceneParams):
    """'texture' for texture*-prefixed leaves, 'main' otherwise (reference
    optimizer.py:9-15)."""
    return SceneParams(
        **{
            name: "texture" if name in TEXTURE_PARAM_NAMES else "main"
            for name in params._fields
        }
    )


_SCALE_FREE = {"adam", "adamw", "adamax", "rmsprop", "adadelta", "adagrad"}


def _transform(name, kwargs):
    name = name or "sgd"
    if name == "adam":
        return optax.scale_by_adam(
            b1=kwargs.get("betas", (0.9, 0.999))[0],
            b2=kwargs.get("betas", (0.9, 0.999))[1],
            eps=kwargs.get("eps", 1e-8),
        )
    if name == "adamw":
        return optax.chain(
            optax.scale_by_adam(), optax.add_decayed_weights(
                kwargs.get("weight_decay", 1e-2)
            )
        )
    if name == "sgd":
        mom = kwargs.get("momentum", 0.0)
        return optax.trace(decay=mom) if mom else optax.identity()
    if name == "adamax":
        return optax.scale_by_adamax()
    if name == "rmsprop":
        return optax.scale_by_rms()
    if name == "adagrad":
        return optax.scale_by_rss()
    if name == "adadelta":
        return optax.scale_by_adadelta()
    raise KeyError(name)


class Optimizer(NamedTuple):
    init: callable
    update: callable
    base_lrs: dict  # {'main': lr, 'texture': lr}


def create_optimizer(cfg, params: SceneParams) -> Optimizer:
    kwargs = dict(cfg["training"].get("optimizer") or {})
    name = kwargs.pop("name", "adam")
    txt_kwargs = kwargs.pop("texture", None) or {}
    lr_main = float(kwargs.pop("lr", 1e-3))
    lr_texture = float(txt_kwargs.get("lr", lr_main))
    tx = _transform(name, kwargs)
    labels = param_group_labels(params)

    def init(p):
        return tx.init(p)

    def update(grads, state, lrs):
        """lrs: {'main': f32, 'texture': f32} (traced)."""
        updates, state = tx.update(grads, state)
        updates = jax.tree_util.tree_map(
            lambda u, lab: u * -(lrs[lab]), updates, labels
        )
        return updates, state

    return Optimizer(init, update, {"main": lr_main, "texture": lr_texture})
