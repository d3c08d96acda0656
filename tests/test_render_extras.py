"""Edge overlays, blend properties, uniform superquadric sampling."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dbw_tpu.ops.superquadric import implicit_sq, sample_uniform_sq
from dbw_tpu.render.blend import layered_blend
from dbw_tpu.render.renderer import Renderer, RendererConfig
from tests.test_render import EYE, ZERO, fov_cam, tri_scene


class TestBlendProperties:
    def test_front_to_back_order_matters(self):
        c = jnp.asarray([[[[1.0, 0, 0], [0, 1.0, 0]]]])  # (1,1,2,3)
        a_front_opaque = jnp.asarray([[[1.0, 1.0]]])
        img = layered_blend(c, a_front_opaque, (0, 0, 0))
        np.testing.assert_allclose(img[0, 0, :3], [1, 0, 0], atol=1e-6)

    def test_transmittance(self):
        c = jnp.ones((1, 1, 3, 3))
        a = jnp.asarray([[[0.5, 0.5, 0.5]]])
        img = layered_blend(c, a, (0, 0, 0))
        # alpha channel = 1 - 0.5^3
        assert float(img[0, 0, 3]) == pytest.approx(1 - 0.125, rel=1e-5)

    def test_background_fills_empty(self):
        c = jnp.zeros((1, 1, 2, 3))
        a = jnp.zeros((1, 1, 2))
        img = layered_blend(c, a, (0.2, 0.4, 0.6))
        np.testing.assert_allclose(img[0, 0, :3], [0.2, 0.4, 0.6], atol=1e-6)
        assert float(img[0, 0, 3]) == 0.0


class TestEdges:
    def test_draw_edges_marks_boundary(self):
        cfg = RendererConfig(image_size=(32, 32), faces_per_pixel=1, sigma=0.0,
                             supersample=2)
        rend = Renderer(cfg, fov_cam())
        scene = tri_scene([[0.0, 0.8, 2.0], [-0.8, -0.8, 2.0], [0.8, -0.8, 2.0]])
        base = jnp.zeros((32, 32, 3))
        out = np.asarray(
            rend.draw_edges_view(base, scene, EYE, ZERO, (0.0, 1.0, 0.0),
                                 linewidth=1.0)
        )
        assert out[..., 1].max() > 0.5  # green edge pixels exist
        assert (out[..., 1] > 0.1).sum() < 32 * 32 * 0.5  # but sparse

    def test_render_edges_pix2face(self):
        cfg = RendererConfig(image_size=(16, 16), faces_per_pixel=1, sigma=0.0)
        rend = Renderer(cfg, fov_cam())
        scene = tri_scene([[0.0, 1.0, 2.0], [-1.0, -1.0, 2.0], [1.0, -1.0, 2.0]])
        mask, p2f = rend.render_edges_view(scene, EYE, ZERO)
        assert mask.shape == (16, 16)
        assert int(np.asarray(p2f).max()) == 0

    def test_batched_draw_edges_matches_per_view(self):
        # the batched path (one raster over the view axis) must reproduce
        # the per-view reference path exactly
        cfg = RendererConfig(image_size=(24, 20), faces_per_pixel=1,
                             sigma=0.0, supersample=2)
        rend = Renderer(cfg, fov_cam())
        scene = tri_scene([[0.1, 0.8, 2.0], [-0.8, -0.7, 2.2], [0.8, -0.8, 1.8]])
        imgs = jnp.stack([jnp.zeros((24, 20, 3)), jnp.full((24, 20, 3), 0.5)])
        R = jnp.stack([EYE, EYE])
        T = jnp.stack([ZERO, jnp.asarray([0.05, 0.0, 0.0])])
        cols = jnp.asarray([[0.0, 1.0, 0.0]])  # (F, 3) per-face
        batched = rend.draw_edges(imgs, scene, R, T, cols)
        ref = jnp.stack([
            rend.draw_edges_view(imgs[i], scene, R[i], T[i], cols)
            for i in range(2)
        ])
        np.testing.assert_allclose(
            np.asarray(batched), np.asarray(ref), atol=1e-6
        )


class TestUniformSQ:
    def test_samples_near_surface(self):
        pts = sample_uniform_sq(
            np.array([0.5, 1.0]), np.array([1.0, 1.5]),
            np.array([[1.0, 1.0, 1.0], [1.0, 0.8, 1.2]]), n_points=300,
        )
        assert pts.shape == (2, 300, 3)
        # samples use (x, y, z) with z the eps1 axis -> permute to implicit's
        # y-up convention
        p = jnp.asarray(pts[0][:, [0, 2, 1]])
        f = implicit_sq(p, 0.5, 1.0)
        assert float(jnp.abs(f).mean()) < 0.25


class TestFusedPathEquivalence:
    """The fused flat-layout shading path must match the modular
    interpolate/shade/blend composition exactly."""

    def test_fused_matches_modular(self):
        from dbw_tpu.render.blend import fragment_alpha, layered_blend
        from dbw_tpu.render.interpolate import interpolate_fragments
        from dbw_tpu.render.rasterize import project_faces, rasterize
        from dbw_tpu.render.shading import shade_raw

        rng = np.random.default_rng(5)
        n_tris = 30
        centers = rng.uniform(-0.8, 0.8, (n_tris, 1, 3))
        centers[..., 2] = rng.uniform(1.5, 3.0, (n_tris, 1))
        verts = jnp.asarray(
            (centers + rng.uniform(-0.3, 0.3, (n_tris, 3, 3))).reshape(-1, 3),
            jnp.float32,
        )
        scene = tri_scene(verts, n_tris=n_tris,
                          alphas=rng.uniform(0.2, 1.0, n_tris))
        # give it a non-trivial texture map + uvs
        maps = jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)
        uvv = jnp.asarray(rng.random((3 * n_tris, 2)), jnp.float32)
        uvf = jnp.arange(3 * n_tris, dtype=jnp.int32).reshape(n_tris, 3)
        scene = scene._replace(
            atlas=scene.atlas._replace(maps=maps), uv_verts=uvv, uv_faces=uvf
        )

        for sigma, detach in [(1e-3, True), (1e-3, False), (0.0, True)]:
            cfg = RendererConfig(image_size=(24, 32), faces_per_pixel=4,
                                 sigma=sigma, detach_bary=detach)
            rend = Renderer(cfg, fov_cam())
            rcfg = cfg.raster_config()
            geom = project_faces(scene.verts, scene.faces, EYE, ZERO, fov_cam())
            sig, blur = rend._sigma_blur(None)
            p2f = jax.jit(rasterize, static_argnums=2)(geom, blur, rcfg)

            fused = jax.jit(rend._shade_fused)(scene, geom, p2f, sig)

            @jax.jit
            def modular_fn(scene, geom, p2f, sig):
                frags = interpolate_fragments(
                    p2f, geom, rcfg, detach_bary=detach
                )
                colors = shade_raw(frags, scene)
                alpha = fragment_alpha(frags, sig, clip_inside=cfg.clip_inside)
                alpha = alpha * scene.faces_alpha[
                    jnp.maximum(frags.pix_to_face, 0)
                ]
                return layered_blend(colors, alpha, cfg.background_color)

            modular = modular_fn(scene, geom, p2f, sig)

            np.testing.assert_allclose(
                np.asarray(fused), np.asarray(modular), atol=2e-5,
                err_msg=f"sigma={sigma}, detach={detach}",
            )


class TestShadingTypesAndRegistries:
    """Reference renderer config surface: shading_type raw/flat/phong/
    gouraud (renderer.py:195-204), camera registry fov/perspective
    (renderer.py:62-67), light registry ambient/directional/point
    (renderer.py:69-78). Unknown names fail LOUDLY."""

    CFG = dict(
        mesh=dict(n_blocks=2, txt_size=16, T_range=[0.5, 0.5, 0.5]),
        rend_optim=dict(decouple_rendering=True, coarse_learning=10),
        loss=dict(rgb_weight=1),
    )

    def _model(self, renderer_cfg):
        from dbw_tpu.models import BlocksWorld

        m = BlocksWorld((24, 32), renderer=renderer_cfg, **self.CFG)
        K = np.zeros((4, 4), np.float32)
        K[0, 0] = K[1, 1] = 2.0
        m.set_camera(K)
        return m

    def _render(self, m):
        from dbw_tpu.ops.rotations import look_at_rotation

        params = m.init_params(seed=0)
        phase = m.phase_for_epoch(0, training=False)
        R, T = look_at_rotation(3.0, 20.0, jnp.asarray([0.0]))
        rec, _ = m.predict(params, phase, R, T)
        return np.asarray(rec)

    @pytest.mark.parametrize("shading", [
        pytest.param("raw", marks=pytest.mark.slow),
        "flat", "phong", "gouraud"])
    def test_shading_types_render(self, shading):
        m = self._model(dict(faces_per_pixel=2, shading_type=shading))
        rec = self._render(m)
        assert np.isfinite(rec).all()
        assert rec.shape == (1, 24, 32, 3)
        if shading != "raw":
            # reference parity: with the default AmbientLights (1,1,1) the
            # lit shading types leave texels unchanged (pytorch3d ambient
            # lights contribute no diffuse), so each type must EQUAL raw
            raw = self._render(
                self._model(dict(faces_per_pixel=2, shading_type="raw")))
            np.testing.assert_allclose(rec, raw, atol=1e-5)
            # and with a directional light it must actually modulate
            lit = self._render(self._model(dict(
                faces_per_pixel=2, shading_type=shading,
                lights=dict(name="directional",
                            direction=[[1.0, 0.2, -1.0]]),
            )))
            assert np.abs(lit - raw).max() > 1e-3

    def test_gouraud_differs_from_phong_but_close(self):
        lights = dict(name="directional", direction=[[1.0, 0.2, -1.0]],
                      ambient_color=[[0.4, 0.4, 0.4]],
                      diffuse_color=[[0.6, 0.6, 0.6]])
        g = self._render(self._model(dict(
            faces_per_pixel=2, shading_type="gouraud", lights=lights)))
        p = self._render(self._model(dict(
            faces_per_pixel=2, shading_type="phong", lights=lights)))
        # same light model evaluated at vertices vs pixels: close, not equal
        assert np.abs(g - p).max() > 1e-6
        assert np.abs(g - p).mean() < 0.1

    def test_unknown_shading_type_raises(self):
        with pytest.raises(NotImplementedError, match="shading_type"):
            self._model(dict(faces_per_pixel=2, shading_type="bogus"))

    def test_fov_camera_overrides_dataset_K(self):
        m = self._model(dict(faces_per_pixel=2,
                             cameras=dict(name="fov", fov=90.0)))
        # fov=90 -> fx = fy = 1/tan(45 deg) = 1, px = py = 0 — NOT the
        # dataset K (fx=fy=2) passed to set_camera
        assert float(m.camera.fx) == pytest.approx(1.0)
        assert float(m.camera.fy) == pytest.approx(1.0)
        assert float(m.camera.px) == 0.0 and float(m.camera.py) == 0.0
        assert np.isfinite(self._render(m)).all()

    def test_perspective_camera_explicit_K_overrides_dataset(self):
        # reference renderer.py:62-67: config kwargs (incl. K) go straight
        # to PerspectiveCameras — an explicit K must beat the dataset's
        K = np.zeros((4, 4), np.float32)
        K[0, 0], K[1, 1] = 3.0, 4.0
        K[0, 2], K[1, 2] = 0.1, -0.2
        m = self._model(dict(faces_per_pixel=2,
                             cameras=dict(name="perspective", K=K.tolist())))
        assert float(m.camera.fx) == pytest.approx(3.0)
        assert float(m.camera.fy) == pytest.approx(4.0)
        assert float(m.camera.px) == pytest.approx(0.1)
        assert float(m.camera.py) == pytest.approx(-0.2)
        assert np.isfinite(self._render(m)).all()

    def test_explicit_camera_block_defaults_to_fov(self):
        # reference init_cameras: name defaults to 'fov' (renderer.py:65)
        m = self._model(dict(faces_per_pixel=2, cameras=dict(fov=60.0)))
        assert float(m.camera.px) == 0.0

    def test_unknown_camera_raises(self):
        with pytest.raises(NotImplementedError, match="camera"):
            self._model(dict(faces_per_pixel=2, cameras=dict(name="ortho")))

    def test_ambient_light_scales_raw_render(self):
        base = self._render(self._model(dict(faces_per_pixel=2)))
        half = self._render(self._model(dict(
            faces_per_pixel=2,
            lights=dict(name="ambient", ambient_color=[[0.5, 0.5, 0.5]]),
        )))
        np.testing.assert_allclose(half, base * 0.5, atol=1e-5)

    @pytest.mark.parametrize("light", [
        dict(name="directional", direction=[[1.0, 0.2, -1.0]]),
        dict(name="point", location=[[0.0, 2.0, 0.0]]),
    ])
    def test_directional_and_point_lights(self, light):
        m = self._model(dict(faces_per_pixel=2, shading_type="flat",
                             lights=light))
        rec = self._render(m)
        assert np.isfinite(rec).all()
        amb = self._render(self._model(dict(
            faces_per_pixel=2, shading_type="flat",
            lights=dict(name="ambient"))))
        assert np.abs(rec - amb).max() > 1e-3

    def test_unknown_light_raises(self):
        with pytest.raises(NotImplementedError, match="light"):
            self._model(dict(faces_per_pixel=2, lights=dict(name="area")))


class TestTrajectoryRenders:
    def test_rotated_views_u8_matches_f32(self):
        # out_u8 returns the same frames as the f32 path up to quantization;
        # chunked dispatch (incl. a ragged tail: 7 views, chunk 3) must
        # cover every view exactly once
        from dbw_tpu.render.trajectory import render_rotated_views

        cfg = RendererConfig(image_size=(16, 16), faces_per_pixel=1,
                             sigma=0.0)
        rend = Renderer(cfg, fov_cam())
        scene = tri_scene([[0.0, 1.0, 2.0], [-1.0, -1.0, 2.0], [1.0, -1.0, 2.0]])
        f32 = render_rotated_views(rend, scene, n_views=7, dist=2.0, chunk=3)
        u8 = render_rotated_views(rend, scene, n_views=7, dist=2.0, chunk=3,
                                  out_u8=True)
        assert f32.shape == (7, 16, 16, 4) and u8.shape == (7, 16, 16, 4)
        assert u8.dtype == np.uint8
        exp = (np.clip(f32, 0, 1) * 255.0 + 0.5).astype(np.uint8)
        np.testing.assert_array_equal(u8, exp)

    def test_render_batched_pipelined_matches_direct(self):
        # _render_batched dispatches every chunk before pulling any; the
        # result must equal one direct batched render (ragged tail incl.)
        from dbw_tpu.eval.quali import _render_batched
        from dbw_tpu.render.trajectory import get_circle_traj

        cfg = RendererConfig(image_size=(16, 16), faces_per_pixel=1,
                             sigma=0.0)
        rend = Renderer(cfg, fov_cam())
        scene = tri_scene([[0.0, 1.0, 2.0], [-1.0, -1.0, 2.0], [1.0, -1.0, 2.0]])
        R, T = get_circle_traj(dist=2.0, N_views=5)
        R, T = jnp.asarray(R), jnp.asarray(T)
        fn = lambda r, t: rend.render(scene, r, t)
        out = _render_batched(fn, R, T, chunk=2)
        direct = np.asarray(fn(R, T))
        np.testing.assert_allclose(out, direct, atol=1e-6)


class TestFacesFlatFastPath:
    """render_faces_flat (raster + two gathers) == the general lit-flat
    path on a per-block-constant-texture scene (the synthetic renders)."""

    def test_matches_lit_path_on_synthetic_scene(self):
        from dbw_tpu.models.dbw import BlocksWorld
        from dbw_tpu.ops.rotations import look_at_rotation

        model = BlocksWorld(
            (20, 28),
            mesh=dict(n_blocks=3, txt_size=16),
            renderer=dict(faces_per_pixel=2),
            rend_optim=dict(decouple_rendering=True),
            loss=dict(rgb_weight=1),
        )
        K = np.zeros((4, 4), np.float32)
        K[0, 0] = K[1, 1] = 2.0
        model.set_camera(K)
        params = model.init_params(seed=7)
        phase = model.phase_for_epoch(0, training=False)
        phase = phase._replace(filter_transparent=jnp.asarray(True))
        blocks, _ = model.build_blocks(params, phase, synthetic=True)
        B = 3
        R, T = look_at_rotation(3.0, 25.0, jnp.linspace(-40.0, 40.0, B))

        general = model.renderer_light.render(blocks, R, T)
        fast = model.renderer_light.render_faces_flat(
            blocks, R, T, model.synthetic_face_colors()
        )
        np.testing.assert_allclose(
            np.asarray(fast), np.asarray(general), atol=2e-6
        )
        # and the model-level wrapper rides the fast path
        syn = model.predict_synthetic(params, phase, R, T)
        np.testing.assert_allclose(
            np.asarray(syn), np.asarray(general[..., :3]), atol=2e-6
        )

    def test_rejects_non_flat_config(self):
        from tests.test_render import fov_cam, tri_scene

        scene = tri_scene([[-1, -1, 2], [1, -1, 2], [0, 1, 2]])
        cfg = RendererConfig(image_size=(8, 8), faces_per_pixel=1,
                             sigma=0.0, shading="raw")
        r = Renderer(cfg, fov_cam())
        with pytest.raises(AssertionError):
            r.render_faces_flat(
                scene, EYE[None], ZERO[None], jnp.ones((1, 3))
            )
