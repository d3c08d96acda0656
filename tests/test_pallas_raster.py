"""Pallas rasterization kernel vs XLA reference backend — exact equality
(run in interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dbw_tpu.ops.rotations import look_at_rotation
from dbw_tpu.render.cameras import Camera
from dbw_tpu.render.rasterize import RasterConfig, project_faces, rasterize
from dbw_tpu.render import rasterize_pallas as rp

EYE = jnp.eye(3)
ZERO = jnp.zeros(3)


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """Force pallas interpreter mode on CPU."""
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)
    monkeypatch.setattr(rp.pl, "pallas_call", patched)
    yield


def random_tri_soup(n_faces=60, seed=0, z_range=(1.0, 4.0), spread=1.2):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-spread, spread, (n_faces, 1, 3))
    centers[..., 2] = rng.uniform(*z_range, (n_faces, 1))
    offsets = rng.uniform(-0.4, 0.4, (n_faces, 3, 3))
    verts = (centers + offsets).reshape(-1, 3).astype(np.float32)
    faces = np.arange(3 * n_faces, dtype=np.int32).reshape(n_faces, 3)
    return jnp.asarray(verts), jnp.asarray(faces)


CASES = [
    dict(n_faces=60, K=4, blur=0.0, img=(32, 48)),
    dict(n_faces=60, K=4, blur=2e-3, img=(32, 48)),
    dict(n_faces=200, K=10, blur=9.2e-4, img=(48, 64)),
    dict(n_faces=7, K=1, blur=0.0, img=(16, 16)),  # env-style hard pass
]


@pytest.mark.parametrize("case", CASES)
def test_pallas_matches_xla(case):
    verts, faces = random_tri_soup(case["n_faces"])
    cam = Camera.from_fov(80.0)
    cfg = RasterConfig(
        image_size=case["img"], faces_per_pixel=case["K"], row_chunk=8
    )
    geom = project_faces(verts, faces, EYE, ZERO, cam)
    blur = jnp.float32(case["blur"])
    ref = np.asarray(rasterize(geom, blur, cfg))
    out = np.asarray(rp.rasterize_pallas(geom, blur, cfg))
    assert out.shape == ref.shape
    mismatch = (out != ref).mean()
    if mismatch > 0:
        # allow z-ties to order differently, but sets must agree
        diff = np.argwhere(out != ref)
        for i, j, k in diff[:20]:
            assert set(out[i, j]) == set(ref[i, j]), (
                f"pixel ({i},{j}): pallas {out[i, j]} vs xla {ref[i, j]}"
            )
    assert mismatch < 0.001


@pytest.mark.parametrize("K", [1, 4])
def test_pallas_hard_specialization_matches_general(K):
    """blur == 0 statically -> the coverage-is-inside kernel; must equal
    the general kernel fed a traced zero blur (env/hard-pass contract)."""
    verts, faces = random_tri_soup(50, seed=7)
    cam = Camera.from_fov(80.0)
    cfg = RasterConfig(image_size=(32, 32), faces_per_pixel=K)
    geom = project_faces(verts, faces, EYE, ZERO, cam)
    packed = rp.pack_faces(geom)[None]
    out_hard = np.asarray(
        rp.rasterize_pallas_batched(packed, 0.0, cfg, hard=True)
    )
    out_gen = np.asarray(
        jax.jit(
            lambda p, b: rp.rasterize_pallas_batched(p, b, cfg, hard=False)
        )(packed, jnp.float32(0.0))
    )
    np.testing.assert_array_equal(out_hard, out_gen)


@pytest.mark.parametrize("G", [2, 3])
def test_pallas_coarsened_grid_matches(G, monkeypatch):
    """DBW_SEL_COARSEN=G (G column tiles per program, incl. a non-divisor
    G that pads the tile grid) must reproduce the default kernel exactly."""
    monkeypatch.setenv("DBW_SEL_COARSEN", str(G))
    monkeypatch.setenv("DBW_SEL_COARSEN_K1", str(G))
    for case in (CASES[1], CASES[3]):
        verts, faces = random_tri_soup(case["n_faces"])
        cam = Camera.from_fov(80.0)
        cfg = RasterConfig(image_size=case["img"],
                           faces_per_pixel=case["K"], row_chunk=8)
        geom = project_faces(verts, faces, EYE, ZERO, cam)
        blur = jnp.float32(case["blur"])
        ref = np.asarray(rasterize(geom, blur, cfg))
        out = np.asarray(rp.rasterize_pallas(geom, blur, cfg))
        assert (out != ref).mean() < 0.001


def test_pallas_behind_camera_culled():
    verts = jnp.asarray(
        [[0.0, 1.0, -2.0], [-1.0, -1.0, -2.0], [1.0, -1.0, -2.0]], jnp.float32
    )
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    cfg = RasterConfig(image_size=(16, 16), faces_per_pixel=2)
    geom = project_faces(verts, faces, EYE, ZERO, Camera.from_fov(80.0))
    out = np.asarray(rp.rasterize_pallas(geom, jnp.float32(0.0), cfg))
    assert (out == -1).all()


def test_pallas_batched_views():
    verts, faces = random_tri_soup(40, seed=3)
    cam = Camera.from_fov(80.0)
    cfg = RasterConfig(image_size=(32, 32), faces_per_pixel=4)
    R, T = look_at_rotation(3.0, 20.0, jnp.array([-30.0, 10.0, 50.0]))
    geom_b = jax.vmap(lambda r, t: project_faces(verts, faces, r, t, cam))(R, T)
    packed = jax.vmap(rp.pack_faces)(geom_b)
    out = np.asarray(
        rp.rasterize_pallas_batched(packed, jnp.float32(1e-3), cfg)
    )
    assert out.shape == (3, 32, 32, 4)
    for b in range(3):
        geom = jax.tree_util.tree_map(lambda x: x[b], geom_b)
        ref = np.asarray(rasterize(geom, jnp.float32(1e-3), cfg))
        assert (out[b] != ref).mean() < 0.001


def test_batched_edges_pallas_matches_xla():
    """render_edges' pallas branch (one K=1 raster over the view axis) must
    match the XLA branch exactly (interpret mode on CPU)."""
    from dbw_tpu.render.renderer import Renderer, RendererConfig
    from tests.test_render import tri_scene

    verts, faces = random_tri_soup(24, z_range=(1.5, 3.0))
    scene = tri_scene(verts, faces=faces)
    cam = Camera.from_fov(70.0)
    R = jnp.stack([EYE, EYE])
    T = jnp.stack([ZERO, jnp.asarray([0.1, 0.0, 0.0])])
    outs = {}
    for backend in ("xla", "pallas"):
        cfg = RendererConfig(image_size=(20, 24), faces_per_pixel=1,
                             sigma=0.0, supersample=2, backend=backend)
        rend = Renderer(cfg, cam)
        mask, p2f = rend.render_edges(scene, R, T)
        outs[backend] = (np.asarray(mask), np.asarray(p2f))
    np.testing.assert_array_equal(outs["xla"][0], outs["pallas"][0])
    np.testing.assert_array_equal(outs["xla"][1], outs["pallas"][1])
