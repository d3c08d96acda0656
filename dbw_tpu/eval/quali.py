"""Qualitative evaluation artifacts (reference: src/model/dbw.py:495-554):
texture PNGs, full/clean OBJ meshes, GT point cloud PLY, per-view renders
with edge overlays, synthetic-color renders, circle-trajectory videos."""

from __future__ import annotations

import math
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..models.dbw import Phase
from ..render.trajectory import get_circle_traj
from ..utils.image import convert_to_img, save_video
from ..utils.misc import path_mkdir, use_seed
from ..utils.obj_io import save_ply
from .export import export_scene_obj


def qualitative_eval(model, params, loader, path, NV=240, n_views=10,
                     render_videos=True, n_traj_videos=None):
    """n_traj_videos: how many views get trajectory videos (None = all,
    matching the reference's per-view loop, src/model/dbw.py:552-554)."""
    path = Path(path)

    # textures (reference dbw.py:501-505)
    out = path_mkdir(path / "textures")
    convert_to_img(np.asarray(jax.nn.sigmoid(params.texture_bkg))[0]).save(
        out / "bkg.png"
    )
    convert_to_img(np.asarray(jax.nn.sigmoid(params.texture_ground))[0]).save(
        out / "ground.png"
    )
    for k, img in enumerate(np.asarray(jax.nn.sigmoid(params.textures))):
        convert_to_img(img).save(out / f"block_{str(k).zfill(2)}.png")

    # meshes (reference dbw.py:508-514)
    if render_videos:
        from ..render.trajectory import save_mesh_as_video

        phase_v = Phase.eval_phase(filter_transparent=True)
        scene_v, _, _ = model.build_scene(params, phase_v)
        save_mesh_as_video(
            model.renderer_viz, scene_v, path / "rotated_mesh.mp4", n_views=60
        )
    export_scene_obj(model, params, path / "mesh_full.obj", filter_transparent=True)
    export_scene_obj(
        model, params, path / "mesh.obj", filter_transparent=True,
        w_bkg=False, reduce_ground=True,
    )

    # GT point cloud (reference dbw.py:519-522)
    gt = np.asarray(loader.dataset.pc_gt)
    with use_seed(123):
        sel = np.random.permutation(len(gt))[:3000]
    save_ply(path / "gt.ply", gt[sel])

    phase = Phase.eval_phase(filter_transparent=True)
    scene, _, _ = model.build_scene(params, phase)
    syn_blocks, syn_aux = model.build_blocks(params, phase, synthetic=True)
    if int(np.asarray(syn_aux["mask"]).sum()) == 0:
        return None
    full_colors = model.get_scene_face_colors(
        params, filter_transparent=True, w_env=False
    )

    # scene/blocks enter as ARGUMENTS (not jit-closure constants): the
    # lowered HLO is then identical across runs of the same model config,
    # so the AOT executable cache (utils/aot_cache.py) hits across
    # processes — protocol seeds, A/B arms, requants all reuse one compile
    from ..utils.aot_cache import aot_jit

    @aot_jit(label="quali_render")
    def render_s(scene, R, T):
        return model.renderer_viz.render(scene, R, T)[..., :3]

    # synthetic maps are constant per block -> per-face-constant fast path
    # (render_faces_flat: raster + two gathers; see renderer.py)
    syn_face_colors = model.synthetic_face_colors()

    @aot_jit(label="quali_render_syn")
    def render_syn_s(blocks, R, T):
        return model.renderer_light.render_faces_flat(
            blocks, R, T, syn_face_colors
        )[..., :3]

    # trajectory-video programs return uint8: the frames only ever feed the
    # video encoder, and the D2H pull through the axon tunnel is 4x smaller
    # (240 frames x 2 streams per view at DTU res is the bulk of the final
    # eval's transfer volume)
    def _to_u8(img):
        return (jnp.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)

    @aot_jit(label="quali_render_u8")
    def render_u8_s(scene, R, T):
        return _to_u8(model.renderer_viz.render(scene, R, T)[..., :3])

    @aot_jit(label="quali_render_syn_u8")
    def render_syn_u8_s(blocks, R, T):
        return _to_u8(
            model.renderer_light.render_faces_flat(
                blocks, R, T, syn_face_colors
            )[..., :3]
        )

    # jitted edge overlays: the previous eager calls paid per-op dispatch
    # through the axon tunnel at 16x supersampled shapes
    @aot_jit(label="quali_edges")
    def edged_viz(img, blocks, R, T, colors):
        return model.renderer_viz.draw_edges(img, blocks, R, T, colors)

    @aot_jit(label="quali_edges_syn")
    def edged_light(img, blocks, R, T):
        return model.renderer_light.draw_edges(
            img, blocks, R, T, (0.3, 0.3, 0.3), linewidth=0.7
        )

    render = lambda R, T: render_s(scene, R, T)
    render_syn = lambda R, T: render_syn_s(syn_blocks, R, T)
    render_u8 = lambda R, T: render_u8_s(scene, R, T)
    render_syn_u8 = lambda R, T: render_syn_u8_s(syn_blocks, R, T)

    R_traj, T_traj = get_circle_traj(N_views=NV)

    count = 0
    n_zeros = int(math.log10(max(n_views - 1, 1))) + 1
    for inp, _ in loader:
        if count >= n_views:
            break
        B = min(len(inp["imgs"]), n_views - count)
        for k in range(B):
            i = str(count + k).zfill(n_zeros)
            img = inp["imgs"][k]
            convert_to_img(img).save(path / f"{i}_inp.png")
            R = jnp.asarray(inp["R"][k : k + 1])
            T = jnp.asarray(inp["T"][k : k + 1])
            rec = np.asarray(render(R, T))[0]
            convert_to_img(rec).save(path / f"{i}_rec.png")
            edged = edged_viz(
                jnp.asarray(rec)[None], syn_blocks, R, T, full_colors
            )
            convert_to_img(np.asarray(edged)[0]).save(path / f"{i}_rec_col.png")
            edged_inp = edged_viz(
                jnp.asarray(img)[None], syn_blocks, R, T, full_colors
            )
            convert_to_img(np.asarray(edged_inp)[0]).save(
                path / f"{i}_rec_col_inp.png"
            )
            rec_syn = np.asarray(render_syn(R, T))[0]
            convert_to_img(rec_syn).save(path / f"{i}_rec_syn_nobkg.png")
            edged_syn = edged_light(
                jnp.asarray(rec_syn)[None], syn_blocks, R, T
            )
            convert_to_img(np.asarray(edged_syn)[0]).save(
                path / f"{i}_rec_syn_nobkg_edged.png"
            )
            n_traj = n_views if n_traj_videos is None else n_traj_videos
            if render_videos and count + k < n_traj:  # trajectory videos
                R_v = jnp.einsum("ij,njk->nik", R[0], R_traj)
                T_v = jnp.broadcast_to(T[0], (NV, 3))
                frames = _render_batched(render_u8, R_v, T_v)
                save_video(frames, path / f"{i}_rec_traj.mp4")
                frames = _render_batched(render_syn_u8, R_v, T_v)
                save_video(frames, path / f"{i}_rec_traj_syn.mp4")
        count += B
    return None


def _render_batched(render_fn, R, T, chunk=10, max_in_flight=4):
    """Render a long trajectory in fixed-size chunks (reference
    renderer.py:357-365 renders by batches of 10 to bound memory).

    Up to ``max_in_flight`` chunks are dispatched ahead of the host pull:
    JAX dispatch is async, so the device renders back-to-back while the
    host drains earlier chunks — a synchronous render->pull loop leaves
    the chip idle for every D2H round-trip (100s of ms each through the
    axon tunnel). The cap keeps the chunking's memory bound real: an
    unbounded queue holds n/chunk output buffers on-device at once, which
    silently loses the bound for float32 callers at higher resolution."""
    n = len(R)
    futs = []
    out = []
    for k in range(0, n, chunk):
        Rc, Tc = R[k : k + chunk], T[k : k + chunk]
        pad = chunk - len(Rc)
        if pad:
            Rc = jnp.concatenate([Rc, jnp.repeat(Rc[-1:], pad, 0)])
            Tc = jnp.concatenate([Tc, jnp.repeat(Tc[-1:], pad, 0)])
        futs.append((render_fn(Rc, Tc), chunk - pad if pad else chunk))
        while len(futs) >= max_in_flight:
            f, take = futs.pop(0)
            out.append(np.asarray(f)[:take])
    out.extend(np.asarray(f)[:take] for f, take in futs)
    return np.concatenate(out)

