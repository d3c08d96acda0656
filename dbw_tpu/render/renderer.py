"""High-level renderer: project -> select -> interpolate -> shade -> blend.

Functional equivalent of the reference's ``Renderer`` wrapper + its four
configured instances (train soft / fine / env-hard / light, reference:
src/model/dbw.py:131-143). One ``Renderer`` here is a static config; sigma
and per-face alphas are traced inputs so the curriculum never recompiles.
Batched rendering is ``vmap`` over (R, T).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .blend import layered_blend
from .cameras import Camera
from .meshes import MeshScene
from .rasterize import RasterConfig, project_faces, rasterize

DIRECTION_LIGHT = (1.0, 0.25, -1.0)  # camera-frame light (reference renderer.py:21)

# DBW_REMAT=1 wraps the differentiable shading stage in jax.checkpoint:
# the backward then recomputes the fragment math instead of storing ~30
# N-sized intermediates — trades VPU flops for HBM residual traffic.
import os as _os

REMAT_SHADING = _os.environ.get("DBW_REMAT", "0") == "1"


class RendererConfig(NamedTuple):
    image_size: Tuple[int, int]
    faces_per_pixel: int = 10
    sigma: float = 1e-4              # default; can be overridden per call
    background_color: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    clip_inside: bool = True
    detach_bary: bool = False
    shading: str = "raw"             # 'raw' | 'flat' | 'phong' | 'gouraud'
    ambient_color: Optional[Tuple[float, float, float]] = None
    diffuse_color: Tuple[float, float, float] = (0.4, 0.4, 0.4)
    light_direction: Tuple[float, float, float] = DIRECTION_LIGHT
    light_type: str = "directional"  # 'ambient' | 'directional' | 'point'
    light_location: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    z_clip: float = 1e-3
    supersample: int = 1             # 4 for the antialiased viz renderer
    backend: str = "xla"

    @property
    def blur_radius_factor(self):
        # blur_radius = log(1/1e-4 - 1) * sigma (reference renderer.py:51)
        import math

        return math.log(1.0 / 1e-4 - 1.0)

    def raster_config(self):
        H, W = self.image_size
        s = self.supersample
        return RasterConfig(
            image_size=(H * s, W * s),
            faces_per_pixel=self.faces_per_pixel,
            z_clip=self.z_clip,
            backend=self.backend,
        )


class Renderer:
    """Stateless given (config, camera); all methods are jit-friendly."""

    SHADING_TYPES = ("raw", "flat", "phong", "gouraud")
    LIGHT_TYPES = ("ambient", "directional", "point")

    def __init__(self, config: RendererConfig, camera: Camera):
        # loud config validation (reference renderer.py:203-204 raises
        # NotImplementedError on unknown shading_type)
        if config.shading not in self.SHADING_TYPES:
            raise NotImplementedError(
                f"unknown shading_type: {config.shading!r} "
                f"(supported: {self.SHADING_TYPES})"
            )
        if config.light_type not in self.LIGHT_TYPES:
            raise NotImplementedError(
                f"unknown light type: {config.light_type!r} "
                f"(supported: {self.LIGHT_TYPES})"
            )
        self.config = config
        self.camera = camera

    # -- single view ------------------------------------------------------

    def _sigma_blur(self, sigma):
        cfg = self.config
        sigma = jnp.asarray(cfg.sigma if sigma is None else sigma, jnp.float32)
        return sigma, jnp.float32(cfg.blur_radius_factor) * sigma

    def _shade_from_p2f(self, scene, geom, p2f, R, sigma, row_range=None):
        """Differentiable stage: interpolate + shade + blend one view."""
        cfg = self.config
        if cfg.shading == "raw":
            return self._shade_fused(scene, geom, p2f, sigma,
                                     row_range=row_range)
        if row_range is not None:
            raise NotImplementedError(
                "row_range (pixel-band sharding) supports raw shading only "
                "— the training renderers; lit shading is viz-only"
            )
        # lit shading types run the FLAT-layout stage 2: the (H, W, K, 3, 2)
        # tensors of the naive modular path tile-pad up to 64x on TPU and
        # OOM at 4x-supersampled viz scale (see interpolate.py)
        return self._shade_lit_flat(scene, geom, p2f, R, sigma)

    def _shade_lit_flat(self, scene: MeshScene, geom, p2f, R, sigma):
        """flat/phong/gouraud shading in (N,) component layout, one view."""
        from .interpolate import (
            fragment_alpha_flat,
            interp_corner_table,
            interpolate_fragments_flat,
        )
        from .meshes import sample_atlas_bilinear
        from .shading import vertex_normals

        cfg = self.config
        rcfg = cfg.raster_config()
        Hs, Ws = rcfg.image_size
        K = p2f.shape[-1]
        ff = interpolate_fragments_flat(
            p2f, geom, rcfg, detach_bary=cfg.detach_bary
        )

        # texels: uv corner table -> interpolated uv -> bilinear atlas read
        uv_tab = scene.uv_verts[scene.uv_faces].reshape(-1, 6)
        # corner-major [u0 v0 | u1 v1 | u2 v2] -> interp wants [a0|a1|a2]
        uv = interp_corner_table(ff, uv_tab)
        mi = scene.map_idx[ff.idx]
        colors = sample_atlas_bilinear(
            scene.atlas.maps, mi, uv, diff_uv=not cfg.detach_bary
        )  # (N, 3)

        # lighting (reference LayeredShader shading types, renderer.py:
        # 195-204): the no-op fallback is 1 — with default AmbientLights
        # (1,1,1) the lit types leave texels unchanged
        ambient = jnp.asarray(cfg.ambient_color or (1.0,) * 3)
        from .shading import _light

        if cfg.shading == "flat":
            from .meshes import face_normals

            fn = face_normals(scene.verts, scene.faces)       # (F, 3)
            cent = scene.verts[scene.faces].mean(axis=1)      # (F, 3)
            light_tab = _light(fn, cent, R, cfg.light_type,
                               cfg.light_direction, cfg.light_location,
                               ambient, cfg.diffuse_color)    # (F, 3)
            light = light_tab[ff.idx]
        elif cfg.shading == "gouraud":
            vn = vertex_normals(scene.verts, scene.faces)     # (V, 3)
            light_v = _light(vn, scene.verts, R, cfg.light_type,
                             cfg.light_direction, cfg.light_location,
                             ambient, cfg.diffuse_color)      # (V, 3)
            light = interp_corner_table(
                ff, light_v[scene.faces].reshape(-1, 9)
            )
        else:  # phong
            vn = vertex_normals(scene.verts, scene.faces)
            n = interp_corner_table(ff, vn[scene.faces].reshape(-1, 9))
            n = n / jnp.linalg.norm(n, axis=-1, keepdims=True).clip(1e-12)
            pts = interp_corner_table(
                ff, scene.verts[scene.faces].reshape(-1, 9)
            )
            light = _light(n, pts, R, cfg.light_type, cfg.light_direction,
                           cfg.light_location, ambient, cfg.diffuse_color)
        colors = colors * light

        alpha = fragment_alpha_flat(ff, sigma, clip_inside=cfg.clip_inside)
        alpha = alpha * scene.faces_alpha[ff.idx]
        img = layered_blend(
            colors.reshape(Hs, Ws, K, 3), alpha.reshape(Hs, Ws, K),
            cfg.background_color,
        )
        if cfg.supersample > 1:
            img = _avg_pool_2d(img, cfg.supersample)
        return img

    def _shade_fused(self, scene: MeshScene, geom, p2f, sigma,
                     row_range=None):
        """Single-view wrapper over the batched fused shading path."""
        geom_b = jax.tree_util.tree_map(lambda x: x[None], geom)
        return self._shade_fused_batched(
            scene, geom_b, p2f[None], sigma, row_range=row_range
        )[0]

    def _shade_fused_batched(self, scene: MeshScene, geom_b, p2f_b, sigma,
                             row_range=None):
        """TPU-optimized raw-shading path, batched over views.

        Design rules (learned the hard way — see BENCH_NOTES.md):
        - ALL views are shaded in one flat (B*N,) fragment stream — the
          texel-gradient sort/bincount/boundary-gather pipeline then runs
          ONCE over the shared atlas instead of once per view (the per-view
          vmap paid 4x the R-sized bincount + boundary gather),
        - per-face attributes pack into one gradient-carrying table (single
          dynamic gather with an MXU-matmul backward, ops/scatter.py) and
          one gradient-free static table,
        - every per-fragment quantity lives in FLAT 1-D (N,) / 2-D (N, C)
          arrays with component-wise math (like the Pallas kernel) — rank>3
          tensors with tiny trailing dims invite (8, 128) tile padding that
          blows HBM by 10-50x,
        - texture sampling uses the quad-table gather with the sort+stencil
          backward (render/meshes.py)."""
        import jax.numpy as jnp

        from ..ops.scatter import gather_rows
        from .meshes import sample_atlas_bilinear

        cfg = self.config
        rcfg = cfg.raster_config()
        Hs, Ws = rcfg.image_size
        # pixel-band sharding: p2f_b holds the Hb-row band starting at image
        # row row0 (traced); all pixel NDC math stays in FULL-image (Hs, Ws)
        # coordinates so band fragments shade bit-identically to full-frame
        if row_range is not None:
            assert cfg.supersample == 1, "row_range: training renderers only"
            row0, Hb = row_range[0], int(row_range[1])
        else:
            row0, Hb = 0.0, Hs
        K = rcfg.faces_per_pixel
        B = p2f_b.shape[0]
        F = scene.faces.shape[0]
        N = Hb * Ws * K

        # ONE combined per-face table: gradient-carrying dynamic columns
        # first (xy 6, z 3, face alpha 1, 2 pad), then gradient-free static
        # columns (uv corners 6, map index 1, 1 pad) — the fragment stream
        # pays a single row gather (row-count-bound on TPU, so the extra
        # width is nearly free) and the backward scatters only the first 12
        # columns (gather_rows_partial)
        from ..ops.scatter import gather_rows_partial

        stat = jax.lax.stop_gradient(
            jnp.concatenate(
                [
                    scene.uv_verts[scene.uv_faces].reshape(F, 6),
                    scene.map_idx[:, None].astype(jnp.float32),
                    jnp.zeros((F, 1), jnp.float32),
                ],
                axis=1,
            )
        )
        dyn = jnp.concatenate(
            [
                geom_b.xy.reshape(B * F, 6),
                geom_b.z.reshape(B * F, 3),
                jnp.tile(scene.faces_alpha, B)[:, None],
                jnp.zeros((B * F, 2), geom_b.xy.dtype),
                jnp.tile(stat, (B, 1)),
            ],
            axis=1,
        )  # (B*F, 20)
        p2f_flat = p2f_b.reshape(B * N)
        view_off = jnp.repeat(
            jnp.arange(B, dtype=jnp.int32) * F, N, total_repeat_length=B * N
        )
        # invalid fragments must read SOME row (zero cotangents by
        # construction) — pick a LOCAL one so the windowed face kernels'
        # per-sub-chunk [min, max] id spans stay tight: the pixel's
        # nearest-face id (slot 0), else the pixel row's max face id (sky
        # rows collapse to one uniform id), else 0. All pure elementwise /
        # row-broadcast ops.
        slot0 = p2f_b[..., 0:1]                              # (B, Hs, Ws, 1)
        row_fill = jnp.max(p2f_b[..., 0], axis=2)[:, :, None, None]
        fill = jnp.where(slot0 >= 0, slot0, jnp.maximum(row_fill, 0))
        fill_flat = jnp.broadcast_to(fill, p2f_b.shape).reshape(B * N)
        dyn_idx = jnp.where(p2f_flat >= 0, p2f_flat, fill_flat) + view_off

        # pixel NDC centers per fragment (pure index math, no gathers);
        # row0 + band-local row is exact integer-valued f32 arithmetic
        n_idx = jnp.arange(B * N, dtype=jnp.int32) % N
        pix = n_idx // K
        row = jnp.asarray(row0, jnp.float32) + (pix // Ws).astype(jnp.float32)
        col = pix % Ws
        s = min(Hs, Ws)
        px = (Ws - 1.0 - 2.0 * col.astype(jnp.float32)) / s
        py = (Hs - 1.0 - 2.0 * row) / s

        from .meshes import _sample_quad, _texel_mode
        from .fragment_fused import (
            DR, WIN, frag_fused_enabled, fused_fragment_shade,
        )

        try:
            from jax._src.interpreters.batching import BatchTracer
        except ImportError:  # pragma: no cover - jax internals moved
            BatchTracer = ()
        if (
            cfg.detach_bary
            and frag_fused_enabled()
            and _texel_mode() in ("quad", "quadk")
            # under vmap (e.g. DBW_SEED_EXEC=vmap's per-device seed axis)
            # the fused/quad pallas kernels get batched block specs Mosaic
            # cannot lower (non-trivial index maps on ANY-space operands —
            # measured: the 5-seed vmap protocol arm crashed in
            # _sample_quad); take the XLA gather path instead, which
            # batches fine. The map executor never hits this.
            and not isinstance(p2f_b, BatchTracer)
        ):
            # fully-fused fragment stage: one Pallas kernel does the face
            # gather (windowed one-hot MXU contraction against the
            # VMEM-resident table) + bary/edge-distance/uv/alpha math;
            # its custom backward scatters d(vertex xy, face alpha)
            # (render/fragment_fused.py)
            M, THt, TWt = scene.atlas.maps.shape[:3]
            F_tab = dyn.shape[0]
            F_pad = -(-F_tab // WIN) * WIN
            dynT = jnp.pad(
                dyn, ((0, F_pad - F_tab), (0, 0))
            ).T
            dynT = jnp.pad(dynT, ((0, DR - dynT.shape[0]), (0, 0)))
            flags = (rcfg.perspective_correct, rcfg.clip_barycentric,
                     cfg.clip_inside, THt, TWt)
            maps_flat = scene.atlas.maps.reshape(M * THt * TWt, 3)
            sigma_f = jnp.asarray(sigma, jnp.float32)

            def dense_img():
                vld = (p2f_flat >= 0).astype(jnp.float32)
                id00, wx, wy, alpha = fused_fragment_shade(
                    dynT, dyn_idx, vld, px, py, sigma_f, flags,
                )
                colors = _sample_quad(maps_flat, id00, wx, wy, TWt)
                if cfg.ambient_color is not None:
                    colors = colors * jnp.asarray(cfg.ambient_color)
                return layered_blend(
                    colors.reshape(B, Hb, Ws, K, 3),
                    alpha.reshape(B, Hb, Ws, K), cfg.background_color,
                )

            from .compact_shade import (
                compact_fragment_shade, compact_shade_enabled,
            )

            if compact_shade_enabled(K):
                # sparsity-compacted pipeline: per-fragment kernels + blend
                # run only over the valid slots (render/compact_shade.py)
                img = compact_fragment_shade(
                    dynT, p2f_b, sigma_f, flags, maps_flat, TWt,
                    cfg.ambient_color, cfg.background_color, F, dense_img,
                    full_h_row0=(Hs, row0),
                )
            else:
                img = dense_img()
            return self._pool_tail(img)

        full = gather_rows_partial(dyn, dyn_idx, 12)     # (B*N, 20)
        tab, stab = full[:, :12], full[:, 12:]

        x0, y0 = tab[:, 0], tab[:, 1]
        x1, y1 = tab[:, 2], tab[:, 3]
        x2, y2 = tab[:, 4], tab[:, 5]
        z0, z1, z2 = tab[:, 6], tab[:, 7], tab[:, 8]
        face_alpha = tab[:, 9]
        u0, v0u = stab[:, 0], stab[:, 1]
        u1, v1u = stab[:, 2], stab[:, 3]
        u2, v2u = stab[:, 4], stab[:, 5]
        mi = stab[:, 6].astype(jnp.int32)

        # 2D barycentrics + signed squared edge distance (component math,
        # identical numerics to rasterize.signed_edge_dist2)
        area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
        inv_area = jnp.where(
            jnp.abs(area) > 1e-12, 1.0 / jnp.where(area == 0.0, 1.0, area), 0.0
        )
        w0 = ((x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)) * inv_area
        w1 = ((x0 - x2) * (py - y2) - (y0 - y2) * (px - x2)) * inv_area
        w2 = ((x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)) * inv_area
        inside = jnp.minimum(jnp.minimum(w0, w1), w2) >= 0.0

        def seg_d2(ax, ay, bx, by):
            abx, aby = bx - ax, by - ay
            apx, apy = px - ax, py - ay
            denom = jnp.maximum(abx * abx + aby * aby, 1e-12)
            t = jnp.clip((apx * abx + apy * aby) / denom, 0.0, 1.0)
            dx = apx - t * abx
            dy = apy - t * aby
            return dx * dx + dy * dy

        d2 = jnp.minimum(
            jnp.minimum(seg_d2(x0, y0, x1, y1), seg_d2(x1, y1, x2, y2)),
            seg_d2(x2, y2, x0, y0),
        )
        dists = jnp.where(inside, -d2, d2)

        # perspective-correct, clipped barycentrics
        if rcfg.perspective_correct:
            iw0 = w0 / jnp.maximum(z0, 1e-8)
            iw1 = w1 / jnp.maximum(z1, 1e-8)
            iw2 = w2 / jnp.maximum(z2, 1e-8)
            denom = jnp.maximum(iw0 + iw1 + iw2, 1e-12)
            b0, b1, b2 = iw0 / denom, iw1 / denom, iw2 / denom
        else:
            b0, b1, b2 = w0, w1, w2
        if rcfg.clip_barycentric:
            b0 = jnp.clip(b0, 0.0, 1.0)
            b1 = jnp.clip(b1, 0.0, 1.0)
            b2 = jnp.clip(b2, 0.0, 1.0)
            bs = jnp.maximum(b0 + b1 + b2, 1e-6)
            b0, b1, b2 = b0 / bs, b1 / bs, b2 / bs
        if cfg.detach_bary:
            b0 = jax.lax.stop_gradient(b0)
            b1 = jax.lax.stop_gradient(b1)
            b2 = jax.lax.stop_gradient(b2)

        uv = jnp.stack(
            [b0 * u0 + b1 * u1 + b2 * u2, b0 * v0u + b1 * v1u + b2 * v2u],
            axis=-1,
        )  # (N, 2)
        colors = sample_atlas_bilinear(
            scene.atlas.maps, mi, uv, diff_uv=not cfg.detach_bary
        )  # (N, 3)

        # coverage alpha (reference renderer.py:252-257 semantics)
        valid = (p2f_flat >= 0).astype(jnp.float32)
        if cfg.clip_inside:
            soft_a = jnp.exp(
                -jnp.clip(dists, 0.0, None) / jnp.maximum(sigma, 1e-20)
            )
        else:
            soft_a = jax.nn.sigmoid(-dists / jnp.maximum(sigma, 1e-20))
        hard_a = (dists <= 0.0).astype(jnp.float32)
        alpha = jnp.where(sigma == 0.0, hard_a, soft_a) * valid * face_alpha
        return self._blend_tail(colors, alpha, B, Hb, Ws, K)

    def _blend_tail(self, colors, alpha, B, Hs, Ws, K):
        """Shared tail of the fused shading paths: ambient scale + layered
        blend + optional supersample pooling."""
        cfg = self.config
        if cfg.ambient_color is not None:
            colors = colors * jnp.asarray(cfg.ambient_color)
        img = layered_blend(
            colors.reshape(B, Hs, Ws, K, 3), alpha.reshape(B, Hs, Ws, K),
            cfg.background_color,
        )
        return self._pool_tail(img)

    def _pool_tail(self, img):
        """Optional supersample pooling of a blended (B, Hs, Ws, 4) image."""
        cfg = self.config
        if cfg.supersample > 1:
            img = jax.vmap(lambda im: _avg_pool_2d(im, cfg.supersample))(img)
        return img

    def render_view(self, scene: MeshScene, R, T, sigma=None, row_range=None):
        """Render one view -> (H, W, 4) RGBA in [0, 1]."""
        cfg = self.config
        rcfg = cfg.raster_config()
        sigma, blur = self._sigma_blur(sigma)
        geom = project_faces(
            scene.verts, scene.faces, R, T, self.camera, z_clip=cfg.z_clip
        )
        p2f = rasterize(geom, blur, rcfg, row_range=row_range)
        return self._shade_from_p2f(scene, geom, p2f, R, sigma,
                                    row_range=row_range)

    def render(self, scene: MeshScene, R, T, sigma=None, row_range=None):
        """Batched over views: R (B, 3, 3), T (B, 3) -> (B, H, W, 4).

        On the pallas backend the selection kernel runs ONCE over the whole
        view batch (views are a grid axis), then the differentiable stage
        vmaps per view.

        ``row_range=(row0, Hb)`` renders only the Hb-row pixel band starting
        at image row row0 (traced ok) -> (B, Hb, W, 4), bit-identical to the
        corresponding rows of a full render. This is the spatial axis of the
        sharded trainers (parallel/seeds.py): each device renders its band,
        the (tiny) band images are all_gathered for the cross-pixel losses,
        and gradients psum back through the gather."""
        cfg = self.config
        if cfg.backend == "pallas":
            from .rasterize_pallas import pack_faces, rasterize_pallas_batched

            rcfg = cfg.raster_config()
            # sigma statically 0 (config-constant, e.g. the hard env pass)
            # -> the selection kernel compiles its blur=0 specialization
            hard = (
                float(cfg.sigma if sigma is None else sigma) == 0.0
                if sigma is None or isinstance(sigma, (int, float))
                else False
            )
            sigma, blur = self._sigma_blur(sigma)
            geom_b = jax.vmap(
                lambda r, t: project_faces(
                    scene.verts, scene.faces, r, t, self.camera, z_clip=cfg.z_clip
                )
            )(R, T)
            geom_sg = jax.tree_util.tree_map(jax.lax.stop_gradient, geom_b)
            packed = jax.vmap(pack_faces)(geom_sg)
            p2f = rasterize_pallas_batched(
                packed, jax.lax.stop_gradient(blur), rcfg, hard=hard,
                row_range=row_range,
            )
            if cfg.shading == "raw":
                # one flat fragment stream across views: the texel-gradient
                # pipeline runs once, not per view
                shade = lambda g, p: self._shade_fused_batched(
                    scene, g, p, sigma, row_range=row_range
                )
                if REMAT_SHADING:
                    shade = jax.checkpoint(shade)
                return shade(geom_b, p2f)
            if row_range is not None:
                raise NotImplementedError(
                    "row_range (pixel-band sharding) supports raw shading "
                    "only — the training renderers"
                )
            shade = lambda g, p, r: self._shade_from_p2f(scene, g, p, r, sigma)
            if REMAT_SHADING:
                shade = jax.checkpoint(shade)
            return jax.vmap(shade)(geom_b, p2f, R)
        return jax.vmap(
            lambda r, t: self.render_view(scene, r, t, sigma,
                                          row_range=row_range)
        )(R, T)

    def render_faces_flat(self, scene: MeshScene, R, T, face_colors):
        """Hard flat-lit render with per-face CONSTANT colors: one K=1
        raster + two table gathers per pixel — no barycentrics, no uv
        interpolation, no atlas sampling.

        Exact for scenes whose texture maps are constant per block (the
        synthetic-color renders, reference dbw.py:241-248): there the
        lit-flat path's bilinear atlas sample returns the block color at
        every uv, so color(fragment) = face_color[face] * light[face] is a
        per-face constant. The general `_shade_lit_flat` path paid the full
        per-fragment pipeline for this — 595 ms per 4-view ss4 dispatch on
        the v5e (viz_probe, BENCH_NOTES round 4), the largest stream of
        every val interval and of the synthetic trajectory videos.
        Equality is pinned by tests/test_render_extras.py.

        Requires this renderer's config: flat shading, sigma == 0, K == 1.
        """
        cfg = self.config
        assert cfg.shading == "flat" and float(cfg.sigma) == 0.0, (
            "render_faces_flat: hard flat-lit viz renderers only"
        )
        rcfg = cfg.raster_config()._replace(faces_per_pixel=1)
        geom_b = jax.vmap(
            lambda r, t: project_faces(
                scene.verts, scene.faces, r, t, self.camera, z_clip=cfg.z_clip
            )
        )(R, T)
        if cfg.backend == "pallas":
            from .rasterize_pallas import pack_faces, rasterize_pallas_batched

            packed = jax.vmap(pack_faces)(
                jax.tree_util.tree_map(jax.lax.stop_gradient, geom_b)
            )
            p2f = rasterize_pallas_batched(
                packed, jnp.float32(0.0), rcfg, hard=True
            )
        else:
            xcfg = rcfg._replace(backend="xla")
            p2f = jax.vmap(
                lambda g: rasterize(g, jnp.float32(0.0), xcfg)
            )(geom_b)
        f = p2f[..., 0]  # (B, Hs, Ws) front face per pixel, -1 = miss

        from .meshes import face_normals
        from .shading import _light

        fn = face_normals(scene.verts, scene.faces)       # (F, 3)
        cent = scene.verts[scene.faces].mean(axis=1)      # (F, 3)
        ambient = jnp.asarray(cfg.ambient_color or (1.0,) * 3)
        bg = jnp.asarray(cfg.background_color)

        def view(fv, r):
            light = _light(fn, cent, r, cfg.light_type, cfg.light_direction,
                           cfg.light_location, ambient, cfg.diffuse_color)
            tab = jnp.asarray(face_colors) * light        # (F, 3)
            safe = jnp.maximum(fv, 0)
            a = (fv >= 0).astype(jnp.float32) * scene.faces_alpha[safe]
            # Channel-MAJOR at supersampled resolution, and pool BEFORE the
            # background blend (the blend is affine in (rgb*a, a), so
            # pool(rgb*a) + (1-pool(a))*bg == pool(blend) exactly): a
            # trailing dim of 3 on a (B, Hs, Ws, 3) f32 temp pads ~42x
            # under TPU (8,128)/(4,128) tiling — at the 10-view ss4
            # trajectory chunk that was a 22.98 GB compile-time HBM OOM
            # (round-4 flagship eval crash). (3, Hs, Ws) keeps the big
            # dims minor; the channel-minor image only exists at final res.
            wrgb_c = tab.T[:, safe] * a[None]             # (3, Hs, Ws)
            s = cfg.supersample
            if s > 1:
                wrgb_c = _avg_pool_2d_strided(wrgb_c, s)  # (3, H, W)
                a = _avg_pool_2d_strided(a[None], s)[0]   # (H, W)
            rgb = (wrgb_c + (1.0 - a[None]) * bg[:, None, None]
                   ).transpose(1, 2, 0)
            return jnp.concatenate([rgb, a[..., None]], axis=-1)

        return jax.vmap(view)(f, R)

    # -- wireframe overlays ----------------------------------------------

    def render_edges_view(self, scene: MeshScene, R, T, linewidth=1.0):
        """Edge mask + front pix_to_face at supersampled resolution
        (reference: src/model/renderer.py:134-146). Returns
        (mask (H*s, W*s), pix2face (H*s, W*s))."""
        cfg = self.config
        # viz-only path, stays on the XLA backend (runs rarely; avoids
        # vmapping the pallas kernel)
        rcfg = cfg.raster_config()._replace(faces_per_pixel=1, backend="xla")
        geom = project_faces(
            scene.verts, scene.faces, R, T, self.camera, z_clip=cfg.z_clip
        )
        p2f = rasterize(geom, jnp.float32(0.0), rcfg)
        from .interpolate import interpolate_fragments_flat

        # flat stage 2: the (H, W, 1, 3, 2) tensors of the naive path
        # tile-pad 64x at supersampled resolution (see interpolate.py)
        ff = interpolate_fragments_flat(p2f, geom, rcfg, detach_bary=True)
        Hs, Ws = rcfg.image_size
        s = min(Hs, Ws) / cfg.supersample  # min of the ORIGINAL image size, scaled
        thresh = (linewidth * cfg.supersample * 2.0 / s) ** 2
        mask = ((-ff.dists < thresh) & ff.valid).astype(jnp.float32)
        return mask.reshape(Hs, Ws), p2f[..., 0]

    def draw_edges_view(self, img, scene: MeshScene, R, T, colors, linewidth=1.0):
        """Overlay the wireframe (antialiased via the supersample factor)
        onto img (H, W, 3). colors: (F, 3) per-face or (3,) constant."""
        cfg = self.config
        mask, p2f = self.render_edges_view(scene, R, T, linewidth)
        colors = jnp.asarray(colors, jnp.float32)
        if colors.ndim == 2:
            face_img = colors[jnp.maximum(p2f, 0)]
        else:
            face_img = jnp.broadcast_to(colors, mask.shape + (3,))
        if cfg.supersample > 1:
            mask = _avg_pool_2d(mask[..., None], cfg.supersample)[..., 0]
            face_img = _avg_pool_2d(face_img, cfg.supersample)
        return img * (1.0 - mask[..., None]) + mask[..., None] * face_img

    def render_edges(self, scene: MeshScene, R, T, linewidth=1.0):
        """Batched edge mask + front pix_to_face at supersampled resolution:
        R (B, 3, 3), T (B, 3) -> (mask (B, Hs, Ws), pix2face (B, Hs, Ws)).

        On the pallas backend the K=1 hard selection kernel runs ONCE over
        the whole view batch. At supersample 4 the raster covers 16x the
        training pixel count, and the per-view XLA fallback was the largest
        device cost of every val interval's fused viz program (the interval
        anatomy in BENCH_NOTES round 4) — the viz flavors inherit the
        model's backend, so on TPU this rides the same bbox-culled kernel
        as training."""
        cfg = self.config
        rcfg = cfg.raster_config()._replace(faces_per_pixel=1)
        geom_b = jax.vmap(
            lambda r, t: project_faces(
                scene.verts, scene.faces, r, t, self.camera, z_clip=cfg.z_clip
            )
        )(R, T)
        if cfg.backend == "pallas":
            from .rasterize_pallas import pack_faces, rasterize_pallas_batched

            packed = jax.vmap(pack_faces)(
                jax.tree_util.tree_map(jax.lax.stop_gradient, geom_b)
            )
            p2f = rasterize_pallas_batched(
                packed, jnp.float32(0.0), rcfg, hard=True
            )
        else:
            xcfg = rcfg._replace(backend="xla")
            p2f = jax.vmap(
                lambda g: rasterize(g, jnp.float32(0.0), xcfg)
            )(geom_b)
        from .interpolate import interpolate_fragments_flat

        Hs, Ws = rcfg.image_size
        s = min(Hs, Ws) / cfg.supersample
        thresh = (linewidth * cfg.supersample * 2.0 / s) ** 2

        def mask_view(p, g):
            ff = interpolate_fragments_flat(p, g, rcfg, detach_bary=True)
            return (
                (-ff.dists < thresh) & ff.valid
            ).astype(jnp.float32).reshape(Hs, Ws)

        return jax.vmap(mask_view)(p2f, geom_b), p2f[..., 0]

    def draw_edges(self, imgs, scene, R, T, colors, linewidth=1.0):
        cfg = self.config
        mask, p2f = self.render_edges(scene, R, T, linewidth)
        colors = jnp.asarray(colors, jnp.float32)
        if colors.ndim == 2:
            face_img = colors[jnp.maximum(p2f, 0)]
        else:
            face_img = jnp.broadcast_to(colors, mask.shape + (3,))
        if cfg.supersample > 1:
            ss = cfg.supersample
            mask = jax.vmap(
                lambda m: _avg_pool_2d(m[..., None], ss)[..., 0]
            )(mask)
            face_img = jax.vmap(lambda f: _avg_pool_2d(f, ss))(face_img)
        return imgs * (1.0 - mask[..., None]) + mask[..., None] * face_img


def _avg_pool_2d(img, k):
    """(H*k, W*k, C) -> (H, W, C) mean pooling."""
    H, W, C = img.shape[0] // k, img.shape[1] // k, img.shape[2]
    return img.reshape(H, k, W, k, C).mean(axis=(1, 3))


def _avg_pool_2d_strided(x, k):
    """(..., H*k, W*k) -> (..., H, W) mean pooling over the two MINOR dims
    via k*k strided slices, never materialising a (..., H, k, W, k) reshape
    whose size-k minor dims pad to the 128-lane tile (the layout that
    OOM'd the round-4 trajectory renders)."""
    acc = x[..., 0::k, 0::k]
    for i in range(k):
        for j in range(k):
            if i == 0 and j == 0:
                continue
            acc = acc + x[..., i::k, j::k]
    return acc / float(k * k)


def make_train_renderer(image_size, camera, faces_per_pixel=10, sigma=1e-4,
                        detach_bary=True, backend="xla", **kw):
    """The soft training renderer (reference dbw.py:132 + configs)."""
    return Renderer(
        RendererConfig(
            image_size=tuple(image_size), faces_per_pixel=faces_per_pixel,
            sigma=sigma, detach_bary=detach_bary, backend=backend, **kw
        ),
        camera,
    )


def make_env_renderer(image_size, camera, backend="xla", **kw):
    """Hard one-layer renderer for background+ground (reference dbw.py:135-138:
    faces_per_pixel=1, sigma=0, detach_bary=False)."""
    return Renderer(
        RendererConfig(
            image_size=tuple(image_size), faces_per_pixel=1, sigma=0.0,
            detach_bary=False, backend=backend, **kw
        ),
        camera,
    )


def make_viz_renderer(image_size, camera, supersample=4, shading="raw",
                      background_color=(0.0, 0.0, 0.0), backend="xla", **kw):
    """Antialiased hard renderer for visualization (reference renderer.py:56-60:
    4x supersampling, sigma=0, then average pooling)."""
    return Renderer(
        RendererConfig(
            image_size=tuple(image_size), faces_per_pixel=1, sigma=0.0,
            detach_bary=False, supersample=supersample, shading=shading,
            background_color=background_color, backend=backend, **kw
        ),
        camera,
    )
