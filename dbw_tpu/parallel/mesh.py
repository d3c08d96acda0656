"""Device mesh construction helpers."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def factor_devices(n, max_data=4):
    """Factor n devices into (seed, data) axes: prefer putting devices on the
    seed axis (independent optimizations, zero ICI traffic), with a small
    data axis when n exceeds the seed count we need."""
    for data in range(min(max_data, n), 0, -1):
        if n % data == 0:
            return n // data, data
    return n, 1


def make_mesh(n_seed=None, n_data=None, devices=None):
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_seed is None or n_data is None:
        n_seed, n_data = factor_devices(n)
    assert n_seed * n_data == n, (n_seed, n_data, n)
    arr = np.asarray(devices).reshape(n_seed, n_data)
    return Mesh(arr, ("seed", "data"))
