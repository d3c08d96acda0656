"""Scene model tests: build, predict, losses, gradients, curriculum."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dbw_tpu.models import BlocksWorld, Phase, create_model
from dbw_tpu.ops.rotations import look_at_rotation

IMG = (32, 40)

MODEL_CFG = dict(
    mesh=dict(n_blocks=4, S_world=0.5, R_world=[115, 0, 0], txt_size=32),
    renderer=dict(faces_per_pixel=4, detach_bary=True, z_clip=0.001),
    rend_optim=dict(
        coarse_learning=100, decimate_txt=50, decimate_factor=8,
        kill_blocks=True, decouple_rendering=True, opacity_noise=True,
    ),
    loss=dict(
        rgb_weight=1, parsimony_weight=0.01, tv_weight=0.1, overlap_weight=1
    ),
)


@pytest.fixture(scope="module")
def model():
    m = BlocksWorld(IMG, **MODEL_CFG)
    K = np.zeros((4, 4), np.float32)
    K[0, 0] = K[1, 1] = 2.0
    m.set_camera(K)
    return m


@pytest.fixture(scope="module")
def params(model):
    return model.init_params(seed=1)


def cams(b=2):
    R, T = look_at_rotation(3.0, 20.0, jnp.linspace(-30.0, 30.0, b))
    return R, T


class TestBuild:
    def test_init_param_shapes(self, model, params):
        N, TS = 4, 32
        assert params.sq_eps.shape == (N, 2)
        assert params.S.shape == (N, 3)
        assert params.R_6d.shape == (N, 6)
        assert params.alpha_logit.shape == (N,)
        assert params.textures.shape == (N, TS, TS, 3)
        assert params.texture_bkg.shape == (1, TS, TS, 3)
        # opacity starts at ~0.5 (logit 1e-3)
        np.testing.assert_allclose(
            jax.nn.sigmoid(params.alpha_logit), 0.5, atol=1e-3
        )

    def test_env_faces(self, model):
        assert model.bkg_n_faces == 320  # icosphere level 2
        assert model.ground_n_faces == 128  # plane subdivided 3x
        assert model.blocks_n_faces == 4 * 80

    def test_build_blocks_shapes(self, model, params):
        phase = model.phase_for_epoch(0)
        scene, aux = model.build_blocks(params, phase, key=jax.random.PRNGKey(0))
        assert scene.verts.shape == (4 * 42, 3)
        assert scene.faces.shape == (4 * 80, 3)
        assert scene.faces_alpha.shape == (4 * 80,)
        assert aux["alpha"].shape == (4,)

    def test_dead_block_collapses(self, model, params):
        p = params._replace(
            alpha_logit=params.alpha_logit.at[0].set(-10.0)  # alpha ~ 0
        )
        phase = model.phase_for_epoch(0)
        scene, aux = model.build_blocks(p, phase)
        v = np.asarray(scene.verts).reshape(4, 42, 3)
        assert (v[0] == 0).all()  # collapsed
        assert not (v[1] == 0).all()
        assert np.asarray(aux["alpha_full"])[0] == 0.0

    def test_phase_curriculum(self, model):
        p0 = model.phase_for_epoch(0)
        assert bool(p0.coarse) and bool(p0.decimate)
        assert float(p0.opacity_noise) == 1.0
        assert float(p0.sigma) == pytest.approx(1e-4)
        p60 = model.phase_for_epoch(60)
        assert bool(p60.coarse) and not bool(p60.decimate)
        p150 = model.phase_for_epoch(150)
        assert not bool(p150.coarse) and bool(p150.filter_transparent)
        assert float(p150.sigma) == pytest.approx(5e-6)
        pe = model.phase_for_epoch(0, training=False)
        assert float(pe.opacity_noise) == 0.0 and not bool(pe.decimate)


class TestPredict:
    def test_predict_shapes_and_range(self, model, params):
        R, T = cams(2)
        phase = model.phase_for_epoch(0)
        rec, aux = jax.jit(model.predict)(params, phase, R, T, key=jax.random.PRNGKey(0))
        assert rec.shape == (2, IMG[0], IMG[1], 3)
        rec = np.asarray(rec)
        assert np.isfinite(rec).all()
        assert rec.min() >= -1e-5 and rec.max() <= 1.0 + 1e-5
        # the dome + ground should cover every pixel (env pass): with random
        # textures the image should not be all background zeros
        assert rec.std() > 0.01

    def test_predict_synthetic(self, model, params):
        R, T = cams(2)
        phase = model.phase_for_epoch(0)
        rec = jax.jit(model.predict_synthetic)(params, phase, R, T)
        assert rec.shape == (2, IMG[0], IMG[1], 3)
        assert np.isfinite(np.asarray(rec)).all()

    def test_fine_phase_renders(self, model, params):
        R, T = cams(1)
        phase = model.phase_for_epoch(150)
        rec, _ = jax.jit(model.predict)(params, phase, R, T, key=jax.random.PRNGKey(0))
        assert np.isfinite(np.asarray(rec)).all()


class TestLosses:
    def test_losses_finite_and_composed(self, model, params):
        R, T = cams(2)
        phase = model.phase_for_epoch(0)
        imgs = jnp.zeros((2, IMG[0], IMG[1], 3)) + 0.5
        losses = jax.jit(model.forward)(
            params, phase, imgs, R, T, jax.random.PRNGKey(0)
        )
        for k in ["rgb", "parsimony", "tv", "overlap", "total"]:
            assert k in losses and np.isfinite(float(losses[k])), k
        assert float(losses["total"]) == pytest.approx(
            sum(float(v) for k, v in losses.items() if k != "total"), rel=1e-5
        )

    def test_fine_phase_zeroes_coarse_losses(self, model, params):
        R, T = cams(1)
        phase = model.phase_for_epoch(150)
        imgs = jnp.zeros((1, IMG[0], IMG[1], 3)) + 0.5
        losses = jax.jit(model.forward)(
            params, phase, imgs, R, T, jax.random.PRNGKey(0)
        )
        assert float(losses["parsimony"]) == 0.0
        assert float(losses["overlap"]) == 0.0

    def test_gradients_reach_all_params(self, model, params):
        R, T = cams(2)
        phase = model.phase_for_epoch(0)
        imgs = jnp.full((2, IMG[0], IMG[1], 3), 0.5)

        def loss_fn(p):
            return model.forward(p, phase, imgs, R, T, jax.random.PRNGKey(3))[
                "total"
            ]

        grads = jax.jit(jax.grad(loss_fn))(params)
        for name, g in grads._asdict().items():
            g = np.asarray(g)
            assert np.isfinite(g).all(), f"{name} grad not finite"
            assert np.abs(g).max() > 0, f"{name} grad identically zero"

    def test_jit_train_loss(self, model, params):
        R, T = cams(2)
        imgs = jnp.full((2, IMG[0], IMG[1], 3), 0.5)

        @jax.jit
        def step(p, phase, key):
            return model.forward(p, phase, imgs, R, T, key)["total"]

        l0 = step(params, model.phase_for_epoch(0), jax.random.PRNGKey(0))
        # phase flip must NOT retrigger tracing errors (traced scalars)
        l1 = step(params, model.phase_for_epoch(150), jax.random.PRNGKey(0))
        assert np.isfinite(float(l0)) and np.isfinite(float(l1))


class TestRegistry:
    def test_create_model(self):
        cfg = {"model": dict(name="dbw", **MODEL_CFG)}
        m = create_model(cfg, (16, 16))
        assert isinstance(m, BlocksWorld)
        assert m.loss_names[-1] == "loss_total"


class TestExport:
    def test_export_scene_obj_filters_dead_blocks(self, model, params, tmp_path):
        from dbw_tpu.eval.export import export_blocks_mesh, export_scene_obj
        from dbw_tpu.utils.obj_io import load_obj

        p = params._replace(
            alpha_logit=jnp.asarray([5.0, -5.0, 5.0, -5.0])  # 2 alive, 2 dead
        )
        v, f = export_blocks_mesh(model, p, filter_transparent=True)
        assert v.shape == (2 * 42, 3)
        assert f.shape == (2 * 80, 3)

        export_scene_obj(model, p, tmp_path / "scene.obj", filter_transparent=True)
        assert (tmp_path / "scene.obj").exists()
        assert (tmp_path / "scene.png").exists()
        v2, f2 = load_obj(tmp_path / "scene.obj")
        # bkg (162) + ground (81) + 2 alive blocks (2x42)
        assert len(v2) == 162 + 81 + 84
        assert f2.max() == len(v2) - 1

    def test_export_all_dead(self, model, params):
        from dbw_tpu.eval.export import export_blocks_mesh

        p = params._replace(alpha_logit=jnp.full((4,), -9.0))
        v, f = export_blocks_mesh(model, p, filter_transparent=True)
        assert len(v) == 0 and len(f) == 0


@pytest.mark.slow
class TestOptimizationDynamics:
    def test_block_opacity_rises_when_blocks_explain_images(self):
        """The soft-rasterizer gradient must push opacities UP for blocks
        that explain the photometric evidence (the core mechanism of the
        method — blocks start at alpha=0.5 and must commit)."""
        from functools import partial

        from dbw_tpu.data.synthetic import make_synthetic_scene
        from dbw_tpu.train.optimizer import create_optimizer

        ds, _, gt_params = make_synthetic_scene(
            (48, 64), n_views=8, n_blocks=2, seed=11
        )
        m = BlocksWorld(
            (48, 64),
            mesh=dict(n_blocks=2, S_world=1.0, R_world=[0, 0, 0], txt_size=32,
                      T_range=[0.3, 0.3, 0.3]),
            renderer=dict(faces_per_pixel=4, detach_bary=True, z_clip=0.001),
            rend_optim=dict(coarse_learning=10000, decouple_rendering=True,
                            kill_blocks=True),
            loss=dict(rgb_weight=1),
        )
        m.set_camera(ds.K[0])
        params = m.init_params(3)._replace(
            T=gt_params.T, S=gt_params.S, R_6d=gt_params.R_6d,
            sq_eps=gt_params.sq_eps,
        )
        cfg = {"training": {"optimizer": {"name": "adam", "lr": 5e-3,
                                          "texture": {"lr": 5e-2}}}}
        opt = create_optimizer(cfg, params)
        state = opt.init(params)
        phase = m.phase_for_epoch(0, True)
        lrs = {"main": jnp.float32(5e-3), "texture": jnp.float32(5e-2)}
        imgs, R, T = jnp.asarray(ds.imgs), jnp.asarray(ds.R), jnp.asarray(ds.T)

        @partial(jax.jit, donate_argnums=(0, 1))
        def step(p, s, k):
            def loss_fn(pp):
                losses = m.forward(pp, phase, imgs, R, T, k)
                return losses["total"], losses

            g, losses = jax.grad(loss_fn, has_aux=True)(p)
            u, s = opt.update(g, s, lrs)
            return jax.tree_util.tree_map(lambda a, b: a + b, p, u), s, losses

        key = jax.random.PRNGKey(0)
        a0 = np.asarray(jax.nn.sigmoid(params.alpha_logit))
        for _ in range(120):
            key, k = jax.random.split(key)
            params, state, _ = step(params, state, k)
        a1 = np.asarray(jax.nn.sigmoid(params.alpha_logit))
        assert (a1 > a0 + 0.04).any(), f"opacities did not rise: {a0} -> {a1}"


class TestPerceptualFlavor:
    """perceptual_name must select the loss class (reference defaults to
    LPIPS: src/model/dbw.py:155,163)."""

    def _mk(self, loss):
        m = BlocksWorld(IMG, **{**MODEL_CFG, "loss": loss})
        K = np.zeros((4, 4), np.float32)
        K[0, 0] = K[1, 1] = 2.0
        m.set_camera(K)
        return m

    def test_default_is_lpips(self):
        from dbw_tpu.losses.vgg import LPIPSLoss

        m = self._mk({**MODEL_CFG["loss"], "perceptual_weight": 0.1})
        assert isinstance(m.perceptual_loss, LPIPSLoss)

    def test_vgg_perceptual_selectable(self):
        from dbw_tpu.losses.vgg import PerceptualLoss

        m = self._mk({**MODEL_CFG["loss"], "perceptual_weight": 0.1,
                      "perceptual_name": "perceptual"})
        assert isinstance(m.perceptual_loss, PerceptualLoss)

    def test_perceptual_loss_runs_in_forward(self, params):
        m = self._mk({**MODEL_CFG["loss"], "perceptual_weight": 0.1})
        phase = m.phase_for_epoch(0, training=True)
        R, T = cams(2)
        imgs = jnp.full((2,) + IMG + (3,), 0.5, jnp.float32)
        losses = jax.jit(m.forward)(
            params, phase, imgs, R, T, jax.random.PRNGKey(0)
        )
        assert "perceptual" in losses
        assert np.isfinite(float(losses["total"]))


class TestRGBCriterion:
    """loss.name must select the rgb criterion (reference dbw.py:161,367)."""

    def test_l1_criterion_selected_and_used(self, params):
        from dbw_tpu.losses.basic import l1_loss, mse_loss

        m = BlocksWorld(IMG, **{**MODEL_CFG, "loss": {**MODEL_CFG["loss"],
                                                      "name": "l1"}})
        K = np.zeros((4, 4), np.float32)
        K[0, 0] = K[1, 1] = 2.0
        m.set_camera(K)
        assert m.criterion is l1_loss
        phase = m.phase_for_epoch(0, training=True)
        R, T = cams(1)
        imgs = jnp.full((1,) + IMG + (3,), 0.2, jnp.float32)
        rec, aux = jax.jit(m.predict)(params, phase, R, T,
                                      key=jax.random.PRNGKey(0))
        losses = m.compute_losses(imgs, rec, params, phase, aux,
                                  key=jax.random.PRNGKey(1))
        expected = float(l1_loss(imgs, rec))
        assert float(losses["rgb"]) == pytest.approx(expected, rel=1e-6)
        assert expected != pytest.approx(float(mse_loss(imgs, rec)), rel=1e-3)

    def test_unknown_name_fails_loudly(self):
        with pytest.raises(KeyError):
            BlocksWorld(IMG, **{**MODEL_CFG,
                                "loss": {**MODEL_CFG["loss"], "name": "nope"}})

    def test_class_criterion_is_instantiated(self, params):
        """Class-backed registry entries (ssim) must arrive ready to call
        on (imgs, rec) — reference get_loss(name)() semantics."""
        from dbw_tpu.losses.ssim import ssim_loss

        m = BlocksWorld(IMG, **{**MODEL_CFG, "loss": {**MODEL_CFG["loss"],
                                                      "name": "ssim"}})
        K = np.zeros((4, 4), np.float32)
        K[0, 0] = K[1, 1] = 2.0
        m.set_camera(K)
        phase = m.phase_for_epoch(0, training=True)
        R, T = cams(1)
        imgs = jnp.full((1,) + IMG + (3,), 0.2, jnp.float32)
        rec, aux = jax.jit(m.predict)(params, phase, R, T,
                                      key=jax.random.PRNGKey(0))
        losses = m.compute_losses(imgs, rec, params, phase, aux,
                                  key=jax.random.PRNGKey(1))
        expected = float(ssim_loss(imgs, rec).mean())
        assert float(losses["rgb"]) == pytest.approx(expected, rel=1e-5)
