"""Rasterizer / blend golden tests on tiny closed-form scenes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dbw_tpu.render import (
    Camera,
    MeshScene,
    TextureAtlas,
)
from dbw_tpu.render.cameras import (
    camera_from_opencv_projection,
    decompose_projection,
    ndc_pixel_centers,
    view_to_ndc,
)
from dbw_tpu.render.rasterize import (
    RasterConfig,
    barycentrics_2d,
    project_faces,
    rasterize,
    signed_edge_dist2,
)
from dbw_tpu.render.interpolate import interpolate_fragments
from dbw_tpu.render.blend import fragment_alpha, layered_blend
from dbw_tpu.render.renderer import Renderer, RendererConfig

EYE = jnp.eye(3)
ZERO = jnp.zeros(3)


def tri_scene(verts, color=(1.0, 0.0, 0.0), n_tris=1, faces=None, alphas=None):
    """Single-map scene with constant-color texture."""
    verts = jnp.asarray(verts, jnp.float32)
    if faces is None:
        faces = jnp.arange(3 * n_tris, dtype=jnp.int32).reshape(n_tris, 3)
    else:
        faces = jnp.asarray(faces, jnp.int32)
    maps = jnp.broadcast_to(jnp.asarray(color, jnp.float32), (1, 8, 8, 3))
    uvf = jnp.zeros_like(faces)
    uvv = jnp.array([[0.5, 0.5]], jnp.float32)
    al = jnp.ones(faces.shape[0]) if alphas is None else jnp.asarray(alphas)
    return MeshScene(
        verts, faces, uvv, uvf, jnp.zeros(faces.shape[0], jnp.int32),
        TextureAtlas(maps), al,
    )


def fov_cam():
    return Camera.from_fov(90.0)  # f == 1


class TestCameraMath:
    def test_projection_center(self):
        cam = fov_cam()
        p = view_to_ndc(jnp.array([[0.0, 0.0, 2.0]]), cam)
        np.testing.assert_allclose(p[0, :2], [0, 0], atol=1e-6)

    def test_pixel_centers_orientation(self):
        x, y = ndc_pixel_centers((4, 6))
        assert x[0, 0] > 0 and x[0, -1] < 0  # column 0 = +x (left)
        assert y[0, 0] > 0 and y[-1, 0] < 0  # row 0 = +y (top)
        assert x.shape == (4, 6)

    def test_decompose_projection_roundtrip(self):
        rng = np.random.default_rng(3)
        K = np.array([[500.0, 0, 320], [0, 480.0, 240], [0, 0, 1]])
        # random rotation
        q = rng.standard_normal(4)
        q /= np.linalg.norm(q)
        w, x, y, z = q
        R = np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
                [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
                [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
            ]
        )
        t = rng.standard_normal(3)
        P = K @ np.concatenate([R, t[:, None]], axis=1)
        K4, R_out, T_out = decompose_projection(P)
        np.testing.assert_allclose(K4[:3, :3], K / K[2, 2], atol=1e-5)
        # reference convention: returns R.T (x_world = R_out @ x_cam + T_out)
        np.testing.assert_allclose(R_out, R.T, atol=1e-6)
        c = -R.T @ t  # camera center
        np.testing.assert_allclose(T_out, c, atol=1e-5)

    def test_decompose_matches_cv2(self):
        cv2 = pytest.importorskip("cv2")
        rng = np.random.default_rng(7)
        for _ in range(3):
            # plausible projection: positive-focal K times a rigid transform
            K = np.array(
                [
                    [300 + 200 * rng.random(), 2 * rng.random(), 300 * rng.random()],
                    [0, 300 + 200 * rng.random(), 250 * rng.random()],
                    [0, 0, 1.0],
                ]
            )
            q = rng.standard_normal(4)
            q /= np.linalg.norm(q)
            w, x, y, z = q
            R = np.array(
                [
                    [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
                    [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
                    [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
                ]
            )
            t = rng.standard_normal(3)
            M = (K @ np.concatenate([R, t[:, None]], axis=1)) * (
                0.5 + rng.random()
            )  # arbitrary overall scale
            K_cv, R_cv, T_cv = cv2.decomposeProjectionMatrix(M)[:3]
            K4, R_out, T_out = decompose_projection(M)
            np.testing.assert_allclose(
                K4[:3, :3], K_cv / K_cv[2, 2], atol=1e-4, rtol=1e-4
            )
            np.testing.assert_allclose(R_out, R_cv.T, atol=1e-5)
            np.testing.assert_allclose(T_out, (T_cv[:3] / T_cv[3])[:, 0], atol=1e-4)

    def test_opencv_projection_to_internal_projects_correctly(self):
        # pixel-space projection through P must equal our NDC->pixel mapping
        rng = np.random.default_rng(11)
        H, W = 240, 320
        K = np.array([[400.0, 0, 170.0], [0, 410.0, 115.0], [0, 0, 1]])
        Rw = np.eye(3)
        t = np.array([0.1, -0.2, 3.0])
        P = K @ np.concatenate([Rw, t[:, None]], axis=1)
        K_ndc, R_i, T_i = camera_from_opencv_projection(P, (H, W))
        cam = Camera(
            jnp.float32(K_ndc[0, 0]), jnp.float32(K_ndc[1, 1]),
            jnp.float32(K_ndc[0, 2]), jnp.float32(K_ndc[1, 2]),
        )
        pts = rng.standard_normal((20, 3)) * 0.3
        # opencv pixel projection
        pc = (Rw @ pts.T).T + t
        pix = (K @ pc.T).T
        pix = pix[:, :2] / pix[:, 2:3]  # (u, v) = (col, row)
        # internal projection
        v_view = jnp.asarray(pts, jnp.float32) @ jnp.asarray(R_i) + jnp.asarray(T_i)
        ndc = view_to_ndc(v_view, cam)
        s = min(H, W)
        col = (W - 1.0 - s * np.asarray(ndc[:, 0])) / 2.0
        row = (H - 1.0 - s * np.asarray(ndc[:, 1])) / 2.0
        np.testing.assert_allclose(col, pix[:, 0] - 0.5, atol=1e-2)
        np.testing.assert_allclose(row, pix[:, 1] - 0.5, atol=1e-2)


class TestRasterize:
    CFG = RasterConfig(image_size=(32, 32), faces_per_pixel=2, row_chunk=8)

    def test_hard_triangle_coverage(self):
        # big triangle facing the camera at z=2, covering image center
        scene = tri_scene([[0.0, 1.0, 2.0], [-1.0, -1.0, 2.0], [1.0, -1.0, 2.0]])
        geom = project_faces(scene.verts, scene.faces, EYE, ZERO, fov_cam())
        p2f = rasterize(geom, jnp.float32(0.0), self.CFG)
        p2f = np.asarray(p2f)
        assert p2f[16, 16, 0] == 0  # center covered by face 0
        assert p2f[16, 16, 1] == -1  # only one face
        assert p2f[0, 0, 0] == -1  # corner not covered
        # projected triangle spans [-0.5, 0.5] NDC (z=2 divide): area 0.5 of
        # the [-1,1]^2 square (area 4) -> exactly 1/8 of pixels
        frac = (p2f[..., 0] >= 0).mean()
        assert 0.08 < frac < 0.17

    def test_depth_ordering(self):
        # two stacked triangles; nearer (z=1) must come first
        v = [
            [0.0, 1.0, 2.0], [-1.0, -1.0, 2.0], [1.0, -1.0, 2.0],
            [0.0, 1.0, 1.0], [-1.0, -1.0, 1.0], [1.0, -1.0, 1.0],
        ]
        scene = tri_scene(v, n_tris=2)
        geom = project_faces(scene.verts, scene.faces, EYE, ZERO, fov_cam())
        p2f = np.asarray(rasterize(geom, jnp.float32(0.0), self.CFG))
        assert p2f[16, 16, 0] == 1  # nearer triangle first
        assert p2f[16, 16, 1] == 0

    def test_behind_camera_culled(self):
        scene = tri_scene([[0.0, 1.0, -2.0], [-1.0, -1.0, -2.0], [1.0, -1.0, -2.0]])
        geom = project_faces(scene.verts, scene.faces, EYE, ZERO, fov_cam())
        p2f = np.asarray(rasterize(geom, jnp.float32(0.0), self.CFG))
        assert (p2f == -1).all()

    def test_blur_expands_coverage(self):
        scene = tri_scene([[0.0, 0.3, 2.0], [-0.3, -0.3, 2.0], [0.3, -0.3, 2.0]])
        geom = project_faces(scene.verts, scene.faces, EYE, ZERO, fov_cam())
        hard = np.asarray(rasterize(geom, jnp.float32(0.0), self.CFG))
        soft = np.asarray(rasterize(geom, jnp.float32(0.05), self.CFG))
        assert (soft[..., 0] >= 0).sum() > (hard[..., 0] >= 0).sum()

    def test_signed_dist_sign(self):
        xy = jnp.array([[[0.0, 1.0], [-1.0, -1.0], [1.0, -1.0]]])
        d_in, inside, _ = signed_edge_dist2(
            jnp.array([0.0]), jnp.array([0.0]), xy
        )
        d_out, outside_flag, _ = signed_edge_dist2(
            jnp.array([2.0]), jnp.array([0.0]), xy
        )
        assert d_in[0] < 0 and bool(inside[0])
        assert d_out[0] > 0 and not bool(outside_flag[0])


class TestFragmentsAndBlend:
    CFG = RasterConfig(image_size=(24, 24), faces_per_pixel=2, row_chunk=8)

    def _frags(self, scene, blur=0.0):
        geom = project_faces(scene.verts, scene.faces, EYE, ZERO, fov_cam())
        p2f = rasterize(geom, jnp.float32(blur), self.CFG)
        return interpolate_fragments(p2f, geom, self.CFG), geom

    def test_barycentric_interp_z(self):
        scene = tri_scene([[0.0, 1.0, 2.0], [-1.0, -1.0, 1.0], [1.0, -1.0, 3.0]])
        frags, _ = self._frags(scene)
        z = np.asarray(frags.z)
        valid = np.asarray(frags.valid[..., 0])
        assert ((z[..., 0] > 0.9) & (z[..., 0] < 3.1))[valid].all()
        b = np.asarray(frags.bary[..., 0, :])
        assert np.allclose(b[valid].sum(-1), 1.0, atol=1e-4)

    def test_hard_blend_composites_color(self):
        scene = tri_scene([[0.0, 1.0, 2.0], [-1.0, -1.0, 2.0], [1.0, -1.0, 2.0]],
                          color=(0.2, 0.9, 0.4))
        frags, _ = self._frags(scene)
        from dbw_tpu.render.shading import shade_raw

        colors = shade_raw(frags, scene)
        alpha = fragment_alpha(frags, jnp.float32(0.0))
        img = layered_blend(colors, alpha, (0.0, 0.0, 0.0))
        img = np.asarray(img)
        np.testing.assert_allclose(img[12, 12, :3], [0.2, 0.9, 0.4], atol=1e-5)
        assert img[12, 12, 3] == pytest.approx(1.0)
        np.testing.assert_allclose(img[0, 0], [0, 0, 0, 0], atol=1e-6)

    def test_face_alpha_composites(self):
        # two stacked triangles: front (face 1, green, alpha .5), back (red)
        v = [
            [0.0, 1.0, 2.0], [-1.0, -1.0, 2.0], [1.0, -1.0, 2.0],
            [0.0, 1.0, 1.0], [-1.0, -1.0, 1.0], [1.0, -1.0, 1.0],
        ]
        scene = tri_scene(v, n_tris=2, alphas=[1.0, 0.5])
        # color both from one red map; front contributes .5 red, back .5 red
        geom = project_faces(scene.verts, scene.faces, EYE, ZERO, fov_cam())
        p2f = rasterize(geom, jnp.float32(0.0), self.CFG)
        frags = interpolate_fragments(p2f, geom, self.CFG)
        from dbw_tpu.render.shading import shade_raw

        colors = shade_raw(frags, scene)
        alpha = fragment_alpha(frags, jnp.float32(0.0))
        alpha = alpha * scene.faces_alpha[jnp.maximum(frags.pix_to_face, 0)]
        img = np.asarray(layered_blend(colors, alpha, (0.0, 0.0, 1.0)))
        # red = .5 (front) + .5*1 (back) = 1; no background leaks
        np.testing.assert_allclose(img[12, 12, :3], [1.0, 0, 0], atol=1e-5)
        assert img[12, 12, 3] == pytest.approx(1.0)

    def test_soft_alpha_decays_outside(self):
        scene = tri_scene([[0.0, 0.4, 2.0], [-0.4, -0.4, 2.0], [0.4, -0.4, 2.0]])
        frags, _ = self._frags(scene, blur=0.1)
        a = np.asarray(fragment_alpha(frags, jnp.float32(0.01)))
        d = np.asarray(frags.dists[..., 0])
        v = np.asarray(frags.valid[..., 0])
        inside = v & (d < 0)
        near_out = v & (d > 0)
        assert a[..., 0][inside].min() == pytest.approx(1.0, abs=1e-5)
        assert (a[..., 0][near_out] < 1.0).all()
        assert (a[..., 0][near_out] > 0.0).all()


class TestGradients:
    def test_soft_render_gradient_matches_fd(self):
        """Finite-difference check of d(mean image)/d(translation) through
        the full soft render (selection fixed, interpolation differentiable)."""
        cfg = RendererConfig(image_size=(24, 24), faces_per_pixel=2, sigma=5e-3)
        rend = Renderer(cfg, fov_cam())
        base = jnp.asarray(
            [[0.0, 0.5, 0.0], [-0.5, -0.5, 0.0], [0.5, -0.5, 0.0]], jnp.float32
        )

        def f(tx):
            verts = base + jnp.array([tx, 0.0, 2.0])
            scene = tri_scene(verts)
            img = rend.render_view(scene, EYE, ZERO)
            return img[..., 3].mean()  # coverage changes with translation

        fj = jax.jit(f)
        g = jax.jit(jax.grad(f))(jnp.float32(0.05))
        eps = 1e-3
        fd = (fj(jnp.float32(0.05 + eps)) - fj(jnp.float32(0.05 - eps))) / (2 * eps)
        assert np.isfinite(g)
        assert g == pytest.approx(float(fd), rel=0.2, abs=1e-4)

    def test_texture_gradient_flows(self):
        cfg = RendererConfig(image_size=(16, 16), faces_per_pixel=1, sigma=1e-4)
        rend = Renderer(cfg, fov_cam())
        scene = tri_scene([[0.0, 1.0, 2.0], [-1.0, -1.0, 2.0], [1.0, -1.0, 2.0]])

        def f(maps):
            s = scene._replace(atlas=TextureAtlas(maps))
            img = rend.render_view(s, EYE, ZERO)
            return ((img[..., :3] - 0.5) ** 2).mean()

        g = jax.jit(jax.grad(f))(scene.atlas.maps)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0

    def test_face_alpha_gradient_flows(self):
        cfg = RendererConfig(image_size=(16, 16), faces_per_pixel=2, sigma=1e-4)
        rend = Renderer(cfg, fov_cam())

        def f(a):
            scene = tri_scene(
                [[0.0, 1.0, 2.0], [-1.0, -1.0, 2.0], [1.0, -1.0, 2.0]],
                alphas=jnp.array([a]),
            )
            img = rend.render_view(scene, EYE, ZERO)
            return img[..., 3].mean()

        g = jax.jit(jax.grad(f))(jnp.float32(0.5))
        assert np.isfinite(g) and g > 0


class TestRendererModes:
    def test_supersampled_viz_antialiases(self):
        cam = fov_cam()
        scene = tri_scene([[0.0, 0.6, 2.0], [-0.6, -0.6, 2.0], [0.6, -0.6, 2.0]])
        r1 = Renderer(
            RendererConfig(image_size=(16, 16), faces_per_pixel=1, sigma=0.0), cam
        )
        r4 = Renderer(
            RendererConfig(
                image_size=(16, 16), faces_per_pixel=1, sigma=0.0, supersample=4
            ),
            cam,
        )
        hard = np.asarray(jax.jit(r1.render_view)(scene, EYE, ZERO))
        aa = np.asarray(jax.jit(r4.render_view)(scene, EYE, ZERO))
        assert hard.shape == aa.shape == (16, 16, 4)
        # AA must produce fractional alphas on the boundary
        fractional = ((aa[..., 3] > 0.01) & (aa[..., 3] < 0.99)).sum()
        assert fractional > 0
        assert set(np.unique(hard[..., 3])) <= {0.0, 1.0}

    def test_batched_render(self):
        cam = fov_cam()
        scene = tri_scene([[0.0, 1.0, 2.0], [-1.0, -1.0, 2.0], [1.0, -1.0, 2.0]])
        rend = Renderer(
            RendererConfig(image_size=(8, 8), faces_per_pixel=1, sigma=0.0), cam
        )
        R = jnp.broadcast_to(EYE, (3, 3, 3))
        T = jnp.broadcast_to(ZERO, (3, 3))
        out = jax.jit(rend.render)(scene, R, T)
        assert out.shape == (3, 8, 8, 4)


def _ref_qcss(s, p, gcols, R):
    """Dense reference of the Pallas quad-corner segment sum (CPU tests)."""
    from dbw_tpu.ops.segment_sum_pallas import unpack_wxy

    wx, wy = unpack_wxy(p)
    ws = ((1 - wx) * (1 - wy), wx * (1 - wy), (1 - wx) * wy, wx * wy)
    G = jnp.zeros((12, R), jnp.float32)
    for c in range(4):
        for ch in range(3):
            G = G.at[c * 3 + ch, :].add(
                jnp.zeros(R).at[s].add(ws[c] * gcols[ch])
            )
    return G


class TestQuadTexelSampling:
    """The quad-table texel path (one base-id sort + stencil backward) must
    match the legacy per-corner path in values AND atlas gradients."""

    def _setup(self, seed=0, M=3, TH=16, TW=19, N=4000):
        rng = np.random.default_rng(seed)
        maps = jnp.asarray(rng.random((M, TH, TW, 3)), jnp.float32)
        map_idx = jnp.asarray(rng.integers(0, M, (N,)), jnp.int32)
        uv = jnp.asarray(rng.random((N, 2)), jnp.float32)
        # hit the exact-boundary cases where corner clamping engages
        uv = uv.at[0].set(jnp.array([1.0, 1.0]))
        uv = uv.at[1].set(jnp.array([0.0, 0.0]))
        uv = uv.at[2].set(jnp.array([1.0, 0.0]))
        uv = uv.at[3].set(jnp.array([0.5, 1.0]))
        return maps, map_idx, uv

    def _run(self, mode, maps, map_idx, uv):
        import dbw_tpu.render.meshes as mm

        old = mm._TEXEL_MODE
        mm._TEXEL_MODE = mode
        try:
            from dbw_tpu.render.meshes import sample_atlas_bilinear

            def f(m):
                out = sample_atlas_bilinear(m, map_idx, uv)
                return (out * jnp.arange(1.0, 4.0)).sum(), out

            (loss, out), grads = jax.jit(jax.value_and_grad(f, has_aux=True))(maps)
            return np.asarray(out), np.asarray(grads)
        finally:
            mm._TEXEL_MODE = old

    def test_quad_matches_scatter_small_strict(self):
        """Small N: cumsum accumulation noise is negligible, so any stencil
        mis-alignment would show as O(1) errors (the quad backward's 15-bit
        fixed-point weight packing bounds per-fragment error at ~3e-5)."""
        maps, map_idx, uv = self._setup(N=64)
        out_q, g_q = self._run("quad", maps, map_idx, uv)
        out_r, g_r = self._run("scatter", maps, map_idx, uv)
        np.testing.assert_allclose(out_q, out_r, atol=1e-6)
        np.testing.assert_allclose(g_q, g_r, atol=2e-4)

    def test_quad_matches_scatter_reference(self):
        maps, map_idx, uv = self._setup()
        out_q, g_q = self._run("quad", maps, map_idx, uv)
        out_r, g_r = self._run("scatter", maps, map_idx, uv)
        np.testing.assert_allclose(out_q, out_r, atol=1e-6)
        # f32 cumsum-order noise over 4k fragments: ~1e-4 relative
        np.testing.assert_allclose(g_q, g_r, rtol=2e-3, atol=1e-3)

    def test_quad_matches_sort_path(self):
        maps, map_idx, uv = self._setup(seed=7)
        out_q, g_q = self._run("quad", maps, map_idx, uv)
        out_s, g_s = self._run("sort", maps, map_idx, uv)
        np.testing.assert_allclose(out_q, out_s, atol=1e-6)
        np.testing.assert_allclose(g_q, g_s, rtol=2e-3, atol=1e-3)

    def test_quad_all_fragments_one_texel(self):
        """Heavy collision case: every fragment samples the same texel."""
        maps = jnp.ones((2, 8, 8, 3), jnp.float32) * 0.5
        N = 257
        map_idx = jnp.ones((N,), jnp.int32)
        uv = jnp.full((N, 2), 0.3, jnp.float32)
        import dbw_tpu.render.meshes as mm
        from dbw_tpu.render.meshes import sample_atlas_bilinear

        outs = {}
        for mode in ("quad", "scatter"):
            old = mm._TEXEL_MODE
            mm._TEXEL_MODE = mode
            try:
                g = jax.jit(jax.grad(
                    lambda m: sample_atlas_bilinear(m, map_idx, uv).sum()
                ))(maps)
            finally:
                mm._TEXEL_MODE = old
            outs[mode] = np.asarray(g)
        # 257 collisions accumulate the packed-weight quantization bias
        # coherently (~N * 1.5e-5); stencil misalignment would be O(100)
        np.testing.assert_allclose(outs["quad"], outs["scatter"], atol=2e-2)
        assert abs(outs["quad"].sum() - N * 3) < 1e-2

    @pytest.mark.skipif(
        jax.default_backend() == "cpu",
        reason="quadk Pallas kernel needs TPU (DMA/RMW semantics)",
    )
    def test_quadk_kernel_matches_scatter(self):
        maps, map_idx, uv = self._setup(seed=11, N=6000)
        out_k, g_k = self._run("quadk", maps, map_idx, uv)
        out_r, g_r = self._run("scatter", maps, map_idx, uv)
        np.testing.assert_allclose(out_k, out_r, atol=1e-6)
        np.testing.assert_allclose(g_k, g_r, rtol=2e-3, atol=1e-3)

    @pytest.mark.parametrize("overflow", [False, True])
    def test_compacted_backward_matches_full(self, monkeypatch, overflow):
        """The compacted texel backward (sort only (key, idx), slice M,
        gather payloads) must equal the full-width pipeline; when the
        nonzero count exceeds M the lax.cond fallback must engage. The
        Pallas segsum is monkeypatched with a dense reference so the
        sort/slice/gather/cond logic itself is exercised on CPU."""
        import dbw_tpu.ops.segment_sum_pallas as ssp
        import dbw_tpu.render.meshes as mm

        monkeypatch.setattr(ssp, "quad_corner_segment_sums", _ref_qcss)
        monkeypatch.setattr(mm, "_TEXEL_MODE", "quadk")
        monkeypatch.setenv("DBW_TEXEL_COMPACT_MIN", "0")

        rng = np.random.default_rng(3)
        N, R, TW = 4096, 200, 10
        id00 = jnp.asarray(rng.integers(0, R - TW - 1, (N,)), jnp.int32)
        wx = jnp.asarray(rng.random(N), jnp.float32)
        wy = jnp.asarray(rng.random(N), jnp.float32)
        g = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)
        # sparse gradients: only `density` of rows are nonzero
        density = 0.6 if overflow else 0.05  # M = N/4 -> overflow iff 0.6
        mask = jnp.asarray(rng.random(N) < density, jnp.float32)
        g = g * mask[:, None]

        monkeypatch.setenv("DBW_TEXEL_COMPACT_DIV", "4")
        d_compact = np.asarray(
            mm._quad_maps_grad(TW, id00, wx, wy, g, R, jnp.float32)
        )
        monkeypatch.setenv("DBW_TEXEL_COMPACT_DIV", "0")
        d_full = np.asarray(
            mm._quad_maps_grad(TW, id00, wx, wy, g, R, jnp.float32)
        )
        np.testing.assert_allclose(d_compact, d_full, rtol=1e-5, atol=1e-5)

    def test_diff_uv_quad_matches_legacy(self):
        """Env-pass path (diff_uv=True): quad path must match the legacy
        corner-gather loop in values AND both maps and uv gradients."""
        from dbw_tpu.render.meshes import sample_atlas_bilinear
        import dbw_tpu.render.meshes as mm

        rng = np.random.default_rng(5)
        maps = jnp.asarray(rng.random((2, 8, 9, 3)), jnp.float32)
        mi = jnp.asarray(rng.integers(0, 2, (300,)), jnp.int32)
        uv = jnp.asarray(rng.random((300, 2)), jnp.float32)
        uv = uv.at[0].set(jnp.array([1.0, 1.0]))
        uv = uv.at[1].set(jnp.array([0.0, 0.0]))

        def f(m, u):
            out = sample_atlas_bilinear(m, mi, u, diff_uv=True)
            return (out * jnp.arange(1.0, 4.0)).sum()

        grads = {}
        for mode in ("quad", "scatter"):
            old = mm._TEXEL_MODE
            mm._TEXEL_MODE = mode
            try:
                v = float(f(maps, uv))
                gm, guv = jax.jit(jax.grad(f, argnums=(0, 1)))(maps, uv)
            finally:
                mm._TEXEL_MODE = old
            grads[mode] = (v, np.asarray(gm), np.asarray(guv))
        assert grads["quad"][0] == pytest.approx(grads["scatter"][0], rel=1e-6)
        # maps grads carry the 15-bit packed-weight quantization (~3e-5/frag)
        np.testing.assert_allclose(grads["quad"][1], grads["scatter"][1],
                                   atol=5e-4)
        # uv grads equal except the measure-zero exact-boundary rows where
        # the subgradient convention differs; compare the interior rows
        np.testing.assert_allclose(grads["quad"][2][2:],
                                   grads["scatter"][2][2:], atol=2e-5)
