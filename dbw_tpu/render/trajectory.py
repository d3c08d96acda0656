"""Camera trajectory helpers (reference: src/model/renderer.py:290-414)."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..ops.rotations import look_at_rotation


def get_circle_traj(dist=1.0, a_scale=15.0, e_scale=15.0, N_views=50):
    """Small circular camera wobble around the current view (reference
    renderer.py:411-414). Returns (R (N,3,3), T (N,3))."""
    t = np.linspace(0, 2, N_views + 1)[:-1] * np.pi
    azim = np.cos(t) * a_scale - 180.0
    elev = np.sin(t) * e_scale
    return look_at_rotation(dist, elev, azim)


def get_rotated_views_traj(n_views=50, elev=30.0, dist=2.732):
    """Full turntable trajectory (reference renderer.py:319-324)."""
    azim = np.linspace(-180, 180, n_views)
    return look_at_rotation(dist, elev, azim)
