"""Generic NN building blocks (reference: src/model/tools.py:28-142).

The reference carries MLP/conv/upsample/Blur generator utilities that the
blocks-world model itself never instantiates; they are part of the public
surface, so equivalent pure-JAX (init, apply) builders live here. Each
builder returns ``(params, apply_fn)`` — stateless, jit/vmap-friendly.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

N_UNITS = 128
N_LAYERS = 3


def count_parameters(params):
    """Total number of scalars in a pytree (reference tools.py:24-25)."""
    return sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params))


def linear_normalize(t):
    m, M = jnp.min(t), jnp.max(t)
    return (t - m) / jnp.maximum(M - m, 1e-12)


def _kaiming(rng, shape, fan_in):
    return rng.standard_normal(shape).astype(np.float32) * np.sqrt(2.0 / fan_in)


def create_mlp(in_ch, out_ch, n_units=N_UNITS, n_layers=N_LAYERS, seed=0,
               zero_last_init=False, bias_last=True):
    """MLP builder (reference tools.py:50-81): ReLU hidden layers, Kaiming
    init, optional zeroed last layer."""
    rng = np.random.default_rng(seed)
    dims = (
        [in_ch] + [n_units] * n_layers + [out_ch] if n_layers > 0
        else [in_ch, out_ch]
    )
    params = []
    for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
        w = _kaiming(rng, (a, b), a)
        if zero_last_init and i == len(dims) - 2:
            w = (
                np.zeros_like(w) if isinstance(zero_last_init, bool)
                else rng.standard_normal(w.shape).astype(np.float32) * zero_last_init
            )
        bias = np.zeros(b, np.float32)
        params.append((jnp.asarray(w), jnp.asarray(bias)))
    if not bias_last:
        w, _ = params[-1]
        params[-1] = (w, None)

    def apply(params, x):
        for i, (w, b) in enumerate(params):
            x = x @ w
            if b is not None:
                x = x + b
            if i < len(params) - 1:
                x = jax.nn.relu(x)
        return x

    return params, apply


def conv2d(x, w, b=None, stride=1, padding=1, groups=1):
    """NHWC conv with HWIO weights (reference conv3x3/conv1x1 semantics)."""
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    return y if b is None else y + b


def make_conv3x3(in_planes, out_planes, seed=0, zero_init=False):
    rng = np.random.default_rng(seed)
    w = _kaiming(rng, (3, 3, in_planes, out_planes), 9 * in_planes)
    if zero_init:
        w = np.zeros_like(w)
    return jnp.asarray(w)


def make_conv1x1(in_planes, out_planes, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(_kaiming(rng, (1, 1, in_planes, out_planes), in_planes))


def blur3x3(x):
    """[1,2,1] separable blur with reflect padding (reference Blur module,
    tools.py:117-131)."""
    k = np.array([1.0, 2.0, 1.0])
    k2 = np.outer(k, k)
    k2 = (k2 / k2.sum()).astype(np.float32)
    C = x.shape[-1]
    filt = jnp.broadcast_to(jnp.asarray(k2)[:, :, None, None], (3, 3, 1, C))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        xp, filt, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
    )


def upsample2x(x, mode="nn"):
    """2x upsampling: 'nn' | 'bilinear' | 'bilinear_blur' (reference
    tools.py:134-142)."""
    B, H, W, C = x.shape
    if mode == "nn":
        return jnp.repeat(jnp.repeat(x, 2, 1), 2, 2)
    up = jax.image.resize(x, (B, 2 * H, 2 * W, C), method="bilinear")
    if mode == "bilinear_blur":
        up = blur3x3(up)
    return up
