"""Pixel-band (spatial) sharding of the render: band rasters/renders must
match the corresponding rows of the full-frame path, and the (seed, data,
sp) sharded train step must reproduce single-device training step for step.

The spatial axis is the north-star scaling axis (BASELINE.md): unlike the
data axis it is not capped by the reference's batch_size=4, so all devices
can shorten ONE scan's wall-clock.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dbw_tpu.ops.rotations import look_at_rotation
from dbw_tpu.render.cameras import Camera
from dbw_tpu.render.rasterize import RasterConfig, project_faces, rasterize
from dbw_tpu.render import rasterize_pallas as rp
from dbw_tpu.parallel.mesh import make_mesh
from dbw_tpu.parallel.seeds import MultiSeedRunner, stack_params, unstack_params

EYE = jnp.eye(3)
ZERO = jnp.zeros(3)


def random_tri_soup(n_faces=80, seed=0, z_range=(1.0, 4.0), spread=1.2):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-spread, spread, (n_faces, 1, 3))
    centers[..., 2] = rng.uniform(*z_range, (n_faces, 1))
    offsets = rng.uniform(-0.4, 0.4, (n_faces, 3, 3))
    verts = (centers + offsets).reshape(-1, 3).astype(np.float32)
    faces = np.arange(3 * n_faces, dtype=np.int32).reshape(n_faces, 3)
    return jnp.asarray(verts), jnp.asarray(faces)


def _band_concat_raster(geom, blur, cfg, n_bands, H):
    """Rasterize in n_bands row bands (traced row0) and reassemble."""
    Hb = -(-H // n_bands)

    @jax.jit
    def band(row0):
        return rasterize(geom, blur, cfg, row_range=(row0, Hb))

    rows = [band(jnp.float32(b * Hb)) for b in range(n_bands)]
    return jnp.concatenate(rows, axis=0)[:H]


def test_band_raster_xla_matches_full():
    verts, faces = random_tri_soup()
    cam = Camera.from_fov(80.0)
    # H=20 with 8 bands of 3 rows: the last band overhangs the image (rows
    # 21..23 rendered then cropped) — the production overhang case
    cfg = RasterConfig(image_size=(20, 32), faces_per_pixel=4, row_chunk=3)
    geom = project_faces(verts, faces, EYE, ZERO, cam)
    full = rasterize(geom, jnp.float32(2e-3), cfg)
    banded = _band_concat_raster(geom, jnp.float32(2e-3), cfg, 8, 20)
    np.testing.assert_array_equal(np.asarray(banded), np.asarray(full))


@pytest.fixture()
def interpret_mode(monkeypatch):
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)
    monkeypatch.setattr(rp.pl, "pallas_call", patched)
    yield


@pytest.mark.parametrize("blur,K", [(2e-3, 4), (0.0, 1)])
def test_band_raster_pallas_matches_full(interpret_mode, blur, K):
    verts, faces = random_tri_soup(n_faces=60)
    cam = Camera.from_fov(80.0)
    cfg = RasterConfig(
        image_size=(32, 48), faces_per_pixel=K, backend="pallas"
    )
    geom = project_faces(verts, faces, EYE, ZERO, cam)
    full = rasterize(geom, jnp.float32(blur), cfg)
    # 4 bands of 8 rows — one tile row per band; traced row0
    banded = _band_concat_raster(geom, jnp.float32(blur), cfg, 4, 32)
    np.testing.assert_array_equal(np.asarray(banded), np.asarray(full))


def _make_model(img_size=(16, 24), with_perceptual=False):
    from dbw_tpu.models.dbw import BlocksWorld

    loss = dict(rgb_weight=1, tv_weight=0.1, parsimony_weight=0.01)
    if with_perceptual:
        loss["perceptual_weight"] = 0.1
    model = BlocksWorld(
        img_size,
        mesh=dict(n_blocks=2, txt_size=16),
        renderer=dict(faces_per_pixel=2),
        rend_optim=dict(decouple_rendering=True),
        loss=loss,
    )
    K = np.zeros((4, 4), np.float32)
    K[0, 0] = K[1, 1] = 2.0
    model.set_camera(K)
    return model


def test_band_predict_matches_full():
    """model.predict over 4 traced-offset bands == the full render, at the
    default CPU (XLA backend, dense shading) path."""
    model = _make_model((20, 24))
    params = model.init_params(seed=3)
    phase = model.phase_for_epoch(0, training=True)
    B = 2
    R, T = look_at_rotation(3.0, 20.0, jnp.linspace(-30.0, 30.0, B))
    key = jax.random.PRNGKey(5)

    full, _ = model.predict(params, phase, R, T, key=key)
    Hb = 5

    @jax.jit
    def band(row0):
        return model.predict(
            params, phase, R, T, key=key, row_range=(row0, Hb)
        )[0]

    rows = [band(jnp.float32(b * Hb)) for b in range(4)]
    banded = jnp.concatenate(rows, axis=1)
    np.testing.assert_allclose(
        np.asarray(banded), np.asarray(full), atol=1e-6
    )


def test_band_predict_grads_sum_to_full():
    """Summed band-loss gradients == full-frame gradients for a pixel-sum
    objective (the exactness the sp-axis pmean relies on)."""
    model = _make_model((16, 24))
    params = model.init_params(seed=3)
    phase = model.phase_for_epoch(0, training=True)
    R, T = look_at_rotation(3.0, 20.0, jnp.linspace(-15.0, 15.0, 2))
    key = jax.random.PRNGKey(5)
    tgt = jnp.asarray(
        np.random.default_rng(0).random((2, 16, 24, 3), np.float32)
    )

    def full_loss(p):
        rec, _ = model.predict(p, phase, R, T, key=key)
        return jnp.sum((rec - tgt) ** 2)

    def band_loss(p, row0, r0i):
        rec, _ = model.predict(p, phase, R, T, key=key, row_range=(row0, 8))
        t = jax.lax.dynamic_slice_in_dim(tgt, r0i, 8, axis=1)
        return jnp.sum((rec - t) ** 2)

    g_full = jax.grad(full_loss)(params)
    g0 = jax.grad(band_loss)(params, jnp.float32(0.0), 0)
    g1 = jax.grad(band_loss)(params, jnp.float32(8.0), 8)
    g_sum = jax.tree_util.tree_map(lambda a, b: a + b, g0, g1)
    for name in g_full._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(g_sum, name)),
            np.asarray(getattr(g_full, name)),
            atol=2e-4, rtol=1e-4, err_msg=name,
        )


def test_spatial_step_matches_single_device():
    """(seed=2, data=1, sp=4) over the 8-device mesh — each seed's render
    split into 4 row bands — must reproduce single-device training step for
    step, INCLUDING the cross-pixel perceptual loss through the band
    all_gather (transpose: psum_scatter)."""
    from dbw_tpu.train.optimizer import create_optimizer

    model = _make_model((24, 32), with_perceptual=True)
    mesh = make_mesh(n_seed=2, n_data=1, n_spatial=4)
    assert dict(mesh.shape) == {"seed": 2, "data": 1, "sp": 4}
    params_list = [model.init_params(seed=s) for s in (3, 4)]
    cfg = {"training": {"optimizer": {"name": "adam", "lr": 1e-2}}}
    opt = create_optimizer(cfg, params_list[0])
    runner = MultiSeedRunner(model, opt, mesh)

    B = 2
    R, T = look_at_rotation(3.0, 20.0, jnp.linspace(-30.0, 30.0, B))
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((B, 24, 32, 3), np.float32))
    phase = model.phase_for_epoch(0, training=True)
    lrs = {"main": jnp.float32(1e-2), "texture": jnp.float32(1e-2)}

    stacked = stack_params(params_list)
    opt_sh = stack_params([opt.init(p) for p in params_list])

    def single_step(p, o, key):
        def loss_fn(pp):
            losses = model.forward(pp, phase, imgs, R, T, key)
            return losses["total"], losses

        grads, losses = jax.grad(loss_fn, has_aux=True)(p)
        updates, o = opt.update(grads, o, lrs)
        p = jax.tree_util.tree_map(lambda a, u: a + u, p, updates)
        return p, o, losses["total"]

    single_step = jax.jit(single_step)
    ref_p = list(params_list)
    ref_o = [opt.init(p) for p in params_list]

    base = jax.random.PRNGKey(7)
    for step in range(2):
        keys = jax.random.split(jax.random.fold_in(base, step), 2)
        stacked, opt_sh, losses = runner.step(
            stacked, opt_sh, imgs, R, T, phase, lrs, keys
        )
        ref_losses = []
        for i in range(2):
            ref_p[i], ref_o[i], l = single_step(ref_p[i], ref_o[i], keys[i])
            ref_losses.append(float(l))
        np.testing.assert_allclose(
            np.asarray(losses), ref_losses, rtol=2e-5, err_msg=f"step {step}"
        )

    for i in range(2):
        got = unstack_params(stacked, i)
        for name in got._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(got, name)),
                np.asarray(getattr(ref_p[i], name)),
                atol=3e-5, err_msg=f"seed{i}.{name}",
            )


def test_spatial_data_mesh_step_matches_single_device():
    """The composed (seed=1, data=2, sp=4) layout: view batch sharded over
    data AND rows sharded over sp — the full north-star configuration."""
    from dbw_tpu.train.optimizer import create_optimizer

    model = _make_model((16, 24))
    mesh = make_mesh(n_seed=1, n_data=2, n_spatial=4)
    params_list = [model.init_params(seed=3)]
    cfg = {"training": {"optimizer": {"name": "adam", "lr": 1e-2}}}
    opt = create_optimizer(cfg, params_list[0])
    runner = MultiSeedRunner(model, opt, mesh)

    B = 4
    R, T = look_at_rotation(3.0, 20.0, jnp.linspace(-30.0, 30.0, B))
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.random((B, 16, 24, 3), np.float32))
    phase = model.phase_for_epoch(0, training=True)
    lrs = {"main": jnp.float32(1e-2), "texture": jnp.float32(1e-2)}

    stacked = stack_params(params_list)
    opt_sh = stack_params([opt.init(p) for p in params_list])

    def single_step(p, o, key):
        def loss_fn(pp):
            losses = model.forward(pp, phase, imgs, R, T, key)
            return losses["total"], losses

        grads, losses = jax.grad(loss_fn, has_aux=True)(p)
        updates, o = opt.update(grads, o, lrs)
        return (
            jax.tree_util.tree_map(lambda a, u: a + u, p, updates),
            o,
            losses["total"],
        )

    single_step = jax.jit(single_step)
    ref_p, ref_o = params_list[0], opt.init(params_list[0])

    base = jax.random.PRNGKey(9)
    for step in range(2):
        keys = jax.random.split(jax.random.fold_in(base, step), 1)
        stacked, opt_sh, losses = runner.step(
            stacked, opt_sh, imgs, R, T, phase, lrs, keys
        )
        ref_p, ref_o, l = single_step(ref_p, ref_o, keys[0])
        np.testing.assert_allclose(
            float(losses[0]), float(l), rtol=2e-5, err_msg=f"step {step}"
        )

    got = unstack_params(stacked, 0)
    for name in got._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)),
            np.asarray(getattr(ref_p, name)),
            atol=3e-5, err_msg=name,
        )


@pytest.mark.slow
def test_spatial_mesh_step_matches_single_device_flagship_shape():
    """(seed=1, data=2, sp=4) at the FLAGSHIP spatial shape (300x400): the
    sp axis must reproduce single-device training at the scale the
    north-star projection runs it, not only at the 16x24/24x32 unit shapes
    (VERDICT r4 next #3). Few steps here; the 50-step loss-curve evidence
    is runs/synthetic/sp_train_mesh.tsv (scripts/sp_train_probe.py --mode
    mesh)."""
    from dbw_tpu.train.optimizer import create_optimizer

    model = _make_model((300, 400), with_perceptual=True)
    mesh = make_mesh(n_seed=1, n_data=2, n_spatial=4)
    params_list = [model.init_params(seed=3)]
    cfg = {"training": {"optimizer": {"name": "adam", "lr": 1e-2}}}
    opt = create_optimizer(cfg, params_list[0])
    runner = MultiSeedRunner(model, opt, mesh)

    B = 4
    R, T = look_at_rotation(3.0, 20.0, jnp.linspace(-30.0, 30.0, B))
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.random((B, 300, 400, 3), np.float32))
    phase = model.phase_for_epoch(0, training=True)
    lrs = {"main": jnp.float32(1e-2), "texture": jnp.float32(1e-2)}

    stacked = stack_params(params_list)
    opt_sh = stack_params([opt.init(p) for p in params_list])

    def single_step(p, o, key):
        def loss_fn(pp):
            losses = model.forward(pp, phase, imgs, R, T, key)
            return losses["total"], losses

        grads, losses = jax.grad(loss_fn, has_aux=True)(p)
        updates, o = opt.update(grads, o, lrs)
        return (
            jax.tree_util.tree_map(lambda a, u: a + u, p, updates),
            o,
            losses["total"],
        )

    single_step = jax.jit(single_step)
    ref_p, ref_o = params_list[0], opt.init(params_list[0])

    base = jax.random.PRNGKey(9)
    for step in range(3):
        keys = jax.random.split(jax.random.fold_in(base, step), 1)
        stacked, opt_sh, losses = runner.step(
            stacked, opt_sh, imgs, R, T, phase, lrs, keys
        )
        ref_p, ref_o, l = single_step(ref_p, ref_o, keys[0])
        np.testing.assert_allclose(
            float(losses[0]), float(l), rtol=2e-5, err_msg=f"step {step}"
        )

    got = unstack_params(stacked, 0)
    for name in got._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)),
            np.asarray(getattr(ref_p, name)),
            # 3 Adam steps at lr 1e-2 amplify float-reassociation noise
            # (band-concat + psum order vary with CPU thread scheduling);
            # observed drift up to ~8e-5 on weakly-constrained params
            # (ground rotation under random images) while per-step losses
            # still matched at rtol 2e-5. A structural sp-axis break shows
            # as O(step size)=1e-2+ divergence, far above this tolerance.
            atol=3e-4, err_msg=name,
        )


def test_spatial_trainer_validation(tmp_path):
    """--n-spatial is validated loudly, like --n-data."""
    from dbw_tpu.train.multi_seed import MultiSeedTrainer

    cfg = {
        "dataset": {"name": "synthetic", "img_size": [16, 24], "n_views": 6,
                    "seed": 0},
        "model": {"name": "dbw", "mesh": {"n_blocks": 2, "txt_size": 16},
                  "renderer": {"faces_per_pixel": 2},
                  "loss": {"rgb_weight": 1}},
        "training": {"batch_size": 2, "n_epoches": 1,
                     "optimizer": {"name": "adam", "lr": 1e-3}},
    }
    with pytest.raises(ValueError, match="n_spatial=3 does not divide"):
        MultiSeedTrainer(cfg, tmp_path / "a", [1, 2], n_spatial=3)
    with pytest.raises(ValueError, match="n_spatial=8 leaves"):
        MultiSeedTrainer(cfg, tmp_path / "b", [1, 2, 3, 4, 5], n_spatial=8)


def test_vmap_executor_rejected_with_pallas_texel_kernels(monkeypatch):
    """DBW_SEED_EXEC=vmap + the quadk pallas texel path must fail loudly
    (Mosaic cannot lower vmapped block specs — measured on the chip)."""
    from dbw_tpu.parallel import seeds as ps
    from dbw_tpu.render import meshes

    monkeypatch.setenv("DBW_SEED_EXEC", "vmap")
    monkeypatch.setattr(meshes, "_TEXEL_MODE", "quadk")
    xs = (jnp.zeros((2, 3)),)
    with pytest.raises(ValueError, match="incompatible with the pallas"):
        ps.seed_axis_exec(lambda x: x, *xs)
