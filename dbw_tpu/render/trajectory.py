"""Camera trajectory helpers (reference: src/model/renderer.py:290-414)."""

from __future__ import annotations

from functools import partial

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


def render_rotated_views(renderer, scene, n_views=50, elev=30.0, dist=2.5,
                         R=None, T=None, chunk=10, out_u8=False):
    """Turntable renders of a scene (reference renderer.py:290-330): batches
    of `chunk` views to bound memory; optional base pose composed with the
    turntable. Returns (n_views, H, W, 4) numpy (uint8 when out_u8 — 4x
    smaller D2H pulls for frames that only feed a video encoder)."""
    import jax
    import jax.numpy as jnp

    R_t, T_t = get_rotated_views_traj(n_views, elev=0.0 if R is not None else elev,
                                      dist=0.0 if T is not None else dist)
    R_t, T_t = jnp.asarray(R_t), jnp.asarray(T_t)
    if R is not None:
        R_t = jnp.einsum("nij,jk->nik", R_t, jnp.asarray(R))
    if T is not None:
        T_t = T_t + jnp.asarray(T)

    # one cached program per renderer, scene as an ARGUMENT: a fresh
    # jax.jit wrapper per call would recompile every invocation, and a
    # scene baked in as closure constants would change the HLO (and the
    # AOT executable-cache key) every call
    attr = "_traj_render_u8_fn" if out_u8 else "_traj_render_fn"
    render = getattr(renderer, attr, None)
    if render is None:
        from ..utils.aot_cache import aot_jit

        if out_u8:
            render = aot_jit(
                lambda s, r, t: (
                    jnp.clip(renderer.render(s, r, t), 0.0, 1.0) * 255.0 + 0.5
                ).astype(jnp.uint8),
                label="traj_render_u8",
            )
        else:
            render = aot_jit(
                lambda s, r, t: renderer.render(s, r, t), label="traj_render"
            )
        setattr(renderer, attr, render)
    render = partial(render, scene)
    # dispatch every chunk before pulling any (async dispatch: the device
    # renders back-to-back while the host drains earlier chunks)
    futs = []
    for k in range(0, n_views, chunk):
        Rc, Tc = R_t[k : k + chunk], T_t[k : k + chunk]
        pad = chunk - len(Rc)
        if pad:
            Rc = jnp.concatenate([Rc, jnp.repeat(Rc[-1:], pad, 0)])
            Tc = jnp.concatenate([Tc, jnp.repeat(Tc[-1:], pad, 0)])
        futs.append((render(Rc, Tc), chunk - pad if pad else chunk))
    return np.concatenate([np.asarray(f)[:take] for f, take in futs])


def save_mesh_as_video(renderer, scene, filename, n_views=240, elev=30.0,
                       dist=2.732):
    """Turntable video of a scene (reference renderer.py:390-394)."""
    from ..utils.image import save_video

    frames = render_rotated_views(renderer, scene, n_views, elev, dist,
                                  out_u8=True)
    save_video(frames[..., :3], filename)


def save_mesh_as_gif(renderer, scene, filename, n_views=50, elev=30.0,
                     dist=2.732):
    from ..utils.image import convert_to_img

    frames = render_rotated_views(renderer, scene, n_views, elev, dist)
    imgs = [convert_to_img(f[..., :3]) for f in frames]
    imgs[0].save(filename, save_all=True, append_images=imgs[1:], duration=42,
                 loop=0)
