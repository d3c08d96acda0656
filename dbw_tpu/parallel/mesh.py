"""Device mesh construction helpers."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def factor_devices(n, n_seeds=None):
    """Factor n devices into (seed, data) axes, preferring the seed axis:
    seeds are independent optimizations with zero ICI traffic, while the
    data axis pays a gradient all-reduce every step.

    Without a requested seed count, all devices go on the seed axis.
    With ``n_seeds`` (e.g. the reference's 5-seed DTU protocol,
    scripts/multi_pipeline.sh:12-23, on a v5e-8), the seed axis is the
    smallest divisor of n that fits all seeds — leftover slots are padded
    with duplicate seeds and masked out of best-selection (see
    ``parallel.seeds.pad_seeds`` / ``select_best_seed``) — and any
    remaining factor becomes the data axis."""
    if n_seeds is None:
        return n, 1
    for seed_ax in sorted(d for d in range(1, n + 1) if n % d == 0):
        if seed_ax >= n_seeds:
            return seed_ax, n // seed_ax
    return n, 1  # more seeds than devices: caller batches seeds per slot


def make_mesh(n_seed=None, n_data=None, devices=None, n_seeds=None,
              n_spatial=1):
    """(seed, data[, sp]) mesh. ``n_spatial`` > 1 adds the pixel-band axis
    (each sp device renders H/n_spatial image rows, parallel/seeds.py) as a
    trailing mesh dim — innermost so band all_gathers ride the fastest ICI
    links. The axis is only materialized when used, keeping 2-axis
    programs' specs and tests unchanged."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_spatial > 1:
        if n % n_spatial:
            raise ValueError(
                f"n_spatial={n_spatial} does not divide {n} devices"
            )
        n = n // n_spatial
    if n_seed is None and n_data is None:
        n_seed, n_data = factor_devices(n, n_seeds=n_seeds)
    elif n_seed is None:  # one axis given: derive the other, don't discard
        if n % n_data:
            raise ValueError(f"n_data={n_data} does not divide {n} devices")
        n_seed = n // n_data
    elif n_data is None:
        if n % n_seed:
            raise ValueError(f"n_seed={n_seed} does not divide {n} devices")
        n_data = n // n_seed
    assert n_seed * n_data == n, (n_seed, n_data, n)
    if n_spatial > 1:
        arr = np.asarray(devices).reshape(n_seed, n_data, n_spatial)
        return Mesh(arr, ("seed", "data", "sp"))
    arr = np.asarray(devices).reshape(n_seed, n_data)
    return Mesh(arr, ("seed", "data"))
