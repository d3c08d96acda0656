"""Compacted fragment pipeline (render/compact_shade.py) vs the dense fused
path — matching images and gradients, ladder/fallback behavior, and the
segmented-scan / segment-blend building blocks."""

import unittest.mock as mock

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dbw_tpu.render import compact_shade as csh
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
    monkeypatch.setattr(ff, "_MODE", "1")  # fused kernel on (CPU interpret)
    yield


# ---------------------------------------------------------------------------
# building blocks


class TestSegmentedCumprod:
    def test_matches_per_segment_numpy(self):
        rng = np.random.default_rng(0)
        ids = np.sort(rng.integers(0, 40, 300))
        vals = rng.uniform(0.0, 1.0, 300).astype(np.float32)
        seg_start = np.concatenate([[True], ids[1:] != ids[:-1]])
        # max run length bound
        runs = np.diff(np.flatnonzero(np.concatenate([seg_start, [True]])))
        n_rounds = int(np.ceil(np.log2(max(runs.max(), 2))))
        out = np.asarray(
            csh.segmented_cumprod(
                jnp.asarray(vals), jnp.asarray(seg_start), n_rounds
            )
        )
        ref = np.empty_like(vals)
        for s in np.unique(ids):
            m = ids == s
            ref[m] = np.cumprod(vals[m])
        np.testing.assert_allclose(out, ref, rtol=1e-6)

    def test_gradients(self):
        vals = jnp.asarray([0.5, 0.25, 1.0, 0.0, 0.5], jnp.float32)
        seg = jnp.asarray([True, False, True, False, False])

        def f(v):
            return jnp.sum(csh.segmented_cumprod(v, seg, 3) ** 2)

        from jax.test_util import check_grads

        check_grads(f, (vals,), order=1, modes=["rev"], atol=1e-3, rtol=1e-3)


class TestSegBlend:
    def test_matches_dense_sum_and_backward(self):
        rng = np.random.default_rng(1)
        R, K = 13, 4
        counts = rng.integers(0, K + 1, R)
        counts[3] = 0  # force empty pixels incl. pixel 0
        counts[0] = 0
        M_real = int(counts.sum())
        M = M_real + 5  # padded tail rows
        pixel_c = np.concatenate(
            [np.repeat(np.arange(R), counts), np.full(5, R)]
        ).astype(np.int32)
        wc = rng.standard_normal((M, 3)).astype(np.float32)
        wc[M_real:] = 0.0
        occ = rng.uniform(0.1, 1.0, M).astype(np.float32)
        e = np.cumsum(counts) - 1

        def f(wc_, occ_):
            rgb, occ_last = csh._seg_blend(
                wc_, occ_, jnp.asarray(pixel_c), jnp.asarray(e), R
            )
            return rgb, occ_last

        rgb, occ_last = f(jnp.asarray(wc), jnp.asarray(occ))
        # dense reference
        ref_rgb = np.zeros((R, 3), np.float32)
        ref_last = np.zeros(R, np.float32)
        for p in range(R):
            m = pixel_c[:M_real] == p
            ref_rgb[p] = wc[:M_real][m].sum(0)
            if m.any():
                ref_last[p] = occ[:M_real][m][-1]
        np.testing.assert_allclose(np.asarray(rgb), ref_rgb, atol=1e-5)
        mask = counts > 0
        np.testing.assert_allclose(
            np.asarray(occ_last)[mask], ref_last[mask], atol=1e-6
        )

        # backward vs autodiff of an equivalent dense formulation
        w_r = jnp.asarray(rng.standard_normal((R, 3)), jnp.float32)
        w_o = jnp.asarray(rng.standard_normal(R), jnp.float32)

        def loss(wc_, occ_):
            rgb, occ_last = f(wc_, occ_)
            return jnp.sum(rgb * w_r) + jnp.sum(
                jnp.where(jnp.asarray(mask), occ_last, 0.0) * w_o
            )

        g_wc, g_occ = jax.grad(loss, argnums=(0, 1))(
            jnp.asarray(wc), jnp.asarray(occ)
        )
        # closed-form expectations
        exp_gwc = np.zeros((M, 3), np.float32)
        exp_gocc = np.zeros(M, np.float32)
        pos = 0
        for p in range(R):
            for _ in range(counts[p]):
                exp_gwc[pos] = np.asarray(w_r)[p]
                pos += 1
            if counts[p]:
                exp_gocc[pos - 1] = np.asarray(w_o)[p]
        np.testing.assert_allclose(np.asarray(g_wc), exp_gwc, atol=1e-6)
        np.testing.assert_allclose(np.asarray(g_occ), exp_gocc, atol=1e-6)


# ---------------------------------------------------------------------------
# end-to-end: compacted vs dense fused path through the real renderer


def _scene_and_cam(n_tris=30, seed=5):
    from dbw_tpu.render import Camera, MeshScene, TextureAtlas

    rng = np.random.default_rng(seed)
    centers = rng.uniform(-0.8, 0.8, (n_tris, 1, 3))
    centers[..., 2] = rng.uniform(1.5, 3.0, (n_tris, 1))
    verts = jnp.asarray(
        (centers + rng.uniform(-0.3, 0.3, (n_tris, 3, 3))).reshape(-1, 3),
        jnp.float32,
    )
    faces = jnp.arange(3 * n_tris, dtype=jnp.int32).reshape(n_tris, 3)
    maps = jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)
    uvv = jnp.asarray(rng.random((3 * n_tris, 2)), jnp.float32)
    scene = MeshScene(
        verts, faces, uvv, faces, jnp.zeros(n_tris, jnp.int32),
        TextureAtlas(maps),
        jnp.asarray(rng.uniform(0.2, 1.0, n_tris), jnp.float32),
    )
    return scene, Camera.from_fov(90.0)


def _run_shade(scene, cam, sigma, compact, monkeypatch, n_views=2, div="2"):
    from dbw_tpu.render import TextureAtlas
    from dbw_tpu.render.rasterize import project_faces, rasterize
    from dbw_tpu.render.renderer import Renderer, RendererConfig
    from dbw_tpu.ops.rotations import look_at_rotation

    monkeypatch.setenv("DBW_COMPACT_SHADE", "1" if compact else "0")
    monkeypatch.setenv("DBW_COMPACT_SHADE_DIV", div)

    cfg = RendererConfig(image_size=(24, 32), faces_per_pixel=4,
                         sigma=sigma, detach_bary=True)
    rend = Renderer(cfg, cam)
    rcfg = cfg.raster_config()
    R_m, T_m = look_at_rotation(
        2.5, 15.0, jnp.linspace(-20.0, 40.0, n_views)
    )
    geom_b = jax.vmap(
        lambda r, t: project_faces(scene.verts, scene.faces, r, t, cam)
    )(R_m, T_m)
    sig, blur = rend._sigma_blur(None)
    p2f_b = jax.vmap(
        lambda g: jax.jit(rasterize, static_argnums=2)(g, blur, rcfg)
    )(geom_b)

    def loss_fn(xy, fa, maps):
        g = geom_b._replace(xy=xy)
        s2 = scene._replace(faces_alpha=fa, atlas=TextureAtlas(maps))
        img = rend._shade_fused_batched(s2, g, p2f_b, sig)
        return jnp.sum(img ** 2), img

    (_, img), grads = jax.value_and_grad(
        loss_fn, argnums=(0, 1, 2), has_aux=True
    )(geom_b.xy, scene.faces_alpha, scene.atlas.maps)
    return img, grads


class TestEndToEnd:
    @pytest.mark.parametrize("sigma", [
        pytest.param(1e-3, marks=pytest.mark.slow), 0.0])
    def test_compact_matches_dense(self, sigma, monkeypatch):
        scene, cam = _scene_and_cam()
        img_c, g_c = _run_shade(scene, cam, sigma, True, monkeypatch)
        img_d, g_d = _run_shade(scene, cam, sigma, False, monkeypatch)
        np.testing.assert_allclose(
            np.asarray(img_c), np.asarray(img_d), atol=2e-5
        )
        # gradients: the compacted blend accumulates per-pixel sums by
        # cumsum (vs the dense K-axis reduce) — float reassociation gives
        # a slightly wider noise floor than the fused-vs-XLA comparison
        for a, b, name in zip(g_c, g_d, ["xy", "faces_alpha", "maps"]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=3e-4, atol=5e-5,
                err_msg=name,
            )

    def test_stream_remat_policy_matches_dense(self, monkeypatch):
        """DBW_COMPACT_REMAT=stream (save the compacted fragment stream,
        remat only index math — the round-5 remat-tax lever) must be a pure
        scheduling change: image and gradients identical to the default
        full-remat compact path and to dense."""
        monkeypatch.setenv("DBW_COMPACT_REMAT", "stream")
        scene, cam = _scene_and_cam()
        img_s, g_s = _run_shade(scene, cam, 0.0, True, monkeypatch)
        monkeypatch.setenv("DBW_COMPACT_REMAT", "full")
        img_d, g_d = _run_shade(scene, cam, 0.0, False, monkeypatch)
        np.testing.assert_allclose(
            np.asarray(img_s), np.asarray(img_d), atol=2e-5
        )
        for a, b, name in zip(g_s, g_d, ["xy", "faces_alpha", "maps"]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=3e-4, atol=5e-5,
                err_msg=name,
            )

    @pytest.mark.slow
    def test_dense_fallback_when_over_cap(self, monkeypatch):
        # div huge -> tiny caps -> count exceeds them -> dense branch; the
        # switch must still produce identical results
        scene, cam = _scene_and_cam(n_tris=60, seed=7)
        img_c, _ = _run_shade(scene, cam, 1e-3, True, monkeypatch, div="4096")
        img_d, _ = _run_shade(scene, cam, 1e-3, False, monkeypatch)
        np.testing.assert_allclose(
            np.asarray(img_c), np.asarray(img_d), atol=2e-5
        )

    def test_vmap_falls_back_to_dense(self, monkeypatch):
        """Under vmap (the per-device seed axis) lax.switch executes every
        branch, so the compacted path must not even be traced."""
        def boom(*a, **k):
            raise AssertionError("compacted branch traced under vmap")

        monkeypatch.setattr(csh, "_shade_compacted", boom)
        dynT = jnp.zeros((2, ff.DR, ff.WIN), jnp.float32)
        p2f = -jnp.ones((2, 1, 4, 8, 2), jnp.int32)  # (S, B, H, W, K)
        maps_flat = jnp.zeros((16 * 16, 3), jnp.float32)
        flags = (True, True, True, 16, 16)

        def shade(dT, p):
            return csh.compact_fragment_shade(
                dT, p, jnp.float32(1e-3), flags, maps_flat, 16,
                None, (0.0, 0.0, 0.0), 10,
                lambda: jnp.zeros((1, 4, 8, 4), jnp.float32),
            )

        out = jax.vmap(shade)(dynT, p2f)     # dense fallback: no boom
        assert out.shape == (2, 1, 4, 8, 4)

        # unbatched + large enough for a non-empty cap ladder: the
        # compacted branch IS traced
        p2f_big = -jnp.ones((1, 32, 32, 4), jnp.int32)
        with pytest.raises(AssertionError, match="compacted branch"):
            jax.jit(
                lambda dT, p: csh.compact_fragment_shade(
                    dT, p, jnp.float32(1e-3), flags, maps_flat, 16,
                    None, (0.0, 0.0, 0.0), 10,
                    lambda: jnp.zeros((1, 32, 32, 4), jnp.float32),
                )
            )(dynT[0], p2f_big)

    @pytest.mark.slow
    def test_empty_scene_is_background(self, monkeypatch):
        # scene far outside every view frustum -> zero valid fragments
        from dbw_tpu.render import MeshScene, TextureAtlas, Camera

        rng = np.random.default_rng(3)
        verts = jnp.asarray(
            500.0 + rng.uniform(-1, 1, (9, 3)), jnp.float32
        )
        faces = jnp.arange(9, dtype=jnp.int32).reshape(3, 3)
        scene = MeshScene(
            verts, faces, jnp.asarray(rng.random((9, 2)), jnp.float32),
            faces, jnp.zeros(3, jnp.int32),
            TextureAtlas(jnp.asarray(rng.random((1, 8, 8, 3)), jnp.float32)),
            jnp.ones(3, jnp.float32),
        )
        img, _ = _run_shade(scene, Camera.from_fov(90.0), 1e-3, True,
                            monkeypatch)
        assert np.allclose(np.asarray(img[..., 3]), 0.0)  # fully transparent
        img_d, _ = _run_shade(scene, Camera.from_fov(90.0), 1e-3, False,
                              monkeypatch)
        np.testing.assert_allclose(
            np.asarray(img), np.asarray(img_d), atol=2e-5
        )
