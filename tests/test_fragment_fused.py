"""Fused fragment kernel (render/fragment_fused.py) vs the XLA fragment
math — exact forward outputs and matching gradients (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dbw_tpu.render import fragment_fused as ff


@pytest.fixture(autouse=True)
def interpret_and_enable(monkeypatch):
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)
    monkeypatch.setattr(ff.pl, "pallas_call", patched)
    monkeypatch.setattr(ff, "_MODE", "1")
    yield


FLAGS = (True, True, True, 16, 16)  # persp, clip_bary, clip_inside, TH, TW


def _assert_outputs_match(out, ref):
    """id00 exact; wx/wy/alpha to f32 fusion noise (jit FMA/contraction
    reassociation vs the eager reference gives last-ulp differences)."""
    np.testing.assert_array_equal(
        np.asarray(out[0]), np.asarray(ref[0]), err_msg="id00"
    )
    for o, r, name in zip(out[1:], ref[1:], ["wx", "wy", "alpha"]):
        # wx/wy amplify uv noise by (TW-1)/(TH-1); still ~1e-4 texel units
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(r), atol=1e-4, rtol=1e-5, err_msg=name
        )


def random_inputs(seed=0, N=5000, F_tab=300, n_invalid=500):
    rng = np.random.default_rng(seed)
    F_pad = -(-F_tab // ff.WIN) * ff.WIN
    dynT = np.zeros((ff.DR, F_pad), np.float32)
    # vertex xy in NDC-ish range, z positive, fa in (0,1], uv in [0,1], map 0
    dynT[0:6, :F_tab] = rng.uniform(-1.2, 1.2, (6, F_tab))
    dynT[6:9, :F_tab] = rng.uniform(0.5, 4.0, (3, F_tab))
    dynT[9, :F_tab] = rng.uniform(0.05, 1.0, F_tab)
    dynT[12:18, :F_tab] = rng.uniform(0.0, 1.0, (6, F_tab))
    dynT[18, :F_tab] = 0.0
    ids = rng.integers(0, F_tab, N).astype(np.int32)
    vld = np.ones(N, np.float32)
    vld[rng.choice(N, n_invalid, replace=False)] = 0.0
    px = rng.uniform(-1.0, 1.0, N).astype(np.float32)
    py = rng.uniform(-1.0, 1.0, N).astype(np.float32)
    return (jnp.asarray(dynT), jnp.asarray(ids), jnp.asarray(vld),
            jnp.asarray(px), jnp.asarray(py))


class TestForward:
    @pytest.mark.parametrize("sigma", [1e-4, 0.0])
    def test_matches_reference(self, sigma):
        dynT, ids, vld, px, py = random_inputs()
        sig = jnp.float32(sigma)
        out = jax.jit(ff.fused_fragment_shade, static_argnums=6)(
            dynT, ids, vld, px, py, sig, FLAGS
        )
        ref = ff.frag_math_reference(dynT, ids, vld, px, py, sig, FLAGS)
        _assert_outputs_match(out, ref)

    def test_multiblock_padding(self):
        # N > SUB*CH exercises multiple grid programs + padding
        dynT, ids, vld, px, py = random_inputs(seed=3, N=ff.SUB * ff.CH + 777)
        sig = jnp.float32(3e-4)
        out = jax.jit(ff.fused_fragment_shade, static_argnums=6)(
            dynT, ids, vld, px, py, sig, FLAGS
        )
        ref = ff.frag_math_reference(dynT, ids, vld, px, py, sig, FLAGS)
        _assert_outputs_match(out, ref)


class TestBackward:
    def test_dynT_gradient_matches_reference(self):
        dynT, ids, vld, px, py = random_inputs(seed=1)
        sig = jnp.float32(2e-4)
        w = jnp.asarray(
            np.random.default_rng(2).standard_normal(ids.shape[0]),
            jnp.float32,
        )

        def loss_fused(d):
            _, _, _, alpha = ff.fused_fragment_shade(
                d, ids, vld, px, py, sig, FLAGS
            )
            return jnp.sum(alpha * w)

        def loss_ref(d):
            _, _, _, alpha = ff.frag_math_reference(
                d, ids, vld, px, py, sig, FLAGS
            )
            return jnp.sum(alpha * w)

        g_fused = jax.jit(jax.grad(loss_fused))(dynT)
        g_ref = jax.grad(loss_ref)(dynT)
        # xy + face-alpha rows carry gradient; z/uv/map rows must be zero
        np.testing.assert_allclose(
            np.asarray(g_fused), np.asarray(g_ref), rtol=1e-4, atol=1e-5
        )
        assert float(jnp.abs(g_ref[0:6]).max()) > 0
        np.testing.assert_array_equal(np.asarray(g_fused[10:]), 0.0)


class TestEndToEnd:
    def _scene_and_cam(self):
        from dbw_tpu.render import Camera, MeshScene, TextureAtlas

        rng = np.random.default_rng(5)
        n_tris = 30
        centers = rng.uniform(-0.8, 0.8, (n_tris, 1, 3))
        centers[..., 2] = rng.uniform(1.5, 3.0, (n_tris, 1))
        verts = jnp.asarray(
            (centers + rng.uniform(-0.3, 0.3, (n_tris, 3, 3))).reshape(-1, 3),
            jnp.float32,
        )
        faces = jnp.arange(3 * n_tris, dtype=jnp.int32).reshape(n_tris, 3)
        maps = jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)
        uvv = jnp.asarray(rng.random((3 * n_tris, 2)), jnp.float32)
        uvf = faces
        scene = MeshScene(
            verts, faces, uvv, uvf, jnp.zeros(n_tris, jnp.int32),
            TextureAtlas(maps),
            jnp.asarray(rng.uniform(0.2, 1.0, n_tris), jnp.float32),
        )
        return scene, Camera.from_fov(90.0)

    @pytest.mark.parametrize("sigma", [1e-3, 0.0])
    def test_fused_kernel_path_matches_xla_path(self, sigma, monkeypatch):
        import unittest.mock as mock

        from dbw_tpu.render import TextureAtlas
        from dbw_tpu.render.rasterize import project_faces, rasterize
        from dbw_tpu.render.renderer import Renderer, RendererConfig

        scene, cam = self._scene_and_cam()
        cfg = RendererConfig(image_size=(24, 32), faces_per_pixel=4,
                             sigma=sigma, detach_bary=True)
        rend = Renderer(cfg, cam)
        rcfg = cfg.raster_config()
        geom = project_faces(scene.verts, scene.faces, jnp.eye(3),
                             jnp.zeros(3), cam)
        sig, blur = rend._sigma_blur(None)
        p2f = jax.jit(rasterize, static_argnums=2)(geom, blur, rcfg)

        def run(mode):
            def loss_fn(xy, fa, maps):
                g = geom._replace(xy=xy)
                s2 = scene._replace(
                    faces_alpha=fa, atlas=TextureAtlas(maps)
                )
                img = rend._shade_fused(s2, g, p2f, sig)
                return jnp.sum(img[..., :3] ** 2), img

            with mock.patch.object(ff, "_MODE", mode):
                (_, img), grads = jax.value_and_grad(
                    loss_fn, argnums=(0, 1, 2), has_aux=True
                )(geom.xy, scene.faces_alpha, scene.atlas.maps)
            return img, grads

        img_k, g_k = run("1")
        img_x, g_x = run("0")
        np.testing.assert_allclose(
            np.asarray(img_k), np.asarray(img_x), atol=2e-5
        )
        for a, b, name in zip(g_k, g_x, ["xy", "faces_alpha", "maps"]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
                err_msg=name,
            )
