"""Differentiable Blocks World — TPU-native functional scene model.

Functional redesign of the reference's ``DifferentiableBlocksWorld``
nn.Module (src/model/dbw.py): the scene is

- ``SceneParams``: one learnable pytree (superquadric exponents, ground
  pose, per-block scale/rotation/translation, opacity logits, uv texture
  maps — reference dbw.py:98-119),
- ``SceneStatics``: host-built constant topology (icospheres, uv atlases,
  world frame — reference dbw.py:74-96),
- ``Phase``: the curriculum as TRACED scalars (coarse/fine, texture
  decimation, opacity noise, sigma — reference dbw.py:121-129, 457-462),
  so epoch-milestone flips never recompile,
- every build/predict/loss entry point is a pure function of
  (params, phase, rng); shapes are static — transparent-block "filtering"
  (reference dbw.py:316-326) collapses dead blocks to zero-area geometry
  instead of changing shapes.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..losses.basic import tv_norm_funcs
from ..losses.vgg import LPIPSLoss, PerceptualLoss, VGG16Features
from ..ops.icosphere import icosphere, plane_mesh, subdivide
from ..ops.rotations import euler_world_matrix, random_rotations, rotation_6d_to_matrix
from ..ops.safe_math import safe_pow
from ..ops.superquadric import implicit_sq, parametric_sq
from ..ops.uv import icosphere_uv_atlas, pad_u_atlas, spherical_uv_from_points
from ..render.cameras import Camera
from ..render.meshes import MeshScene, TextureAtlas, concat_scenes
from ..render.renderer import (
    Renderer,
    make_env_renderer,
    make_train_renderer,
    make_viz_renderer,
)
from ..utils.colors import fancy_colormap

VIZ_SIZE = 256
DECIMATE_FACTOR = 8
OVERLAP_N_POINTS = 1000
OVERLAP_N_BLOCKS = 1.95
OVERLAP_TEMPERATURE = 0.005


class SceneParams(NamedTuple):
    """Learnable parameters (reference dbw.py:98-119). Names starting with
    ``texture`` form the high-LR optimizer group (reference optimizer.py:9-15).
    """

    sq_eps: jnp.ndarray         # (N, 2) shape exponent logits
    R_6d_ground: jnp.ndarray    # (1, 6)
    T_ground: jnp.ndarray       # (1, 3)
    S: jnp.ndarray              # (N, 3) log-scales
    R_6d: jnp.ndarray           # (N, 6)
    T: jnp.ndarray              # (N, 3)
    alpha_logit: jnp.ndarray    # (N,)
    texture_bkg: jnp.ndarray    # (1, TSb, TSb, 3) logits
    texture_ground: jnp.ndarray  # (1, TSb, TSb, 3)
    textures: jnp.ndarray       # (N, TS, TS, 3)


TEXTURE_PARAM_NAMES = ("texture_bkg", "texture_ground", "textures")


class Phase(NamedTuple):
    """Traced curriculum state, computed on host per epoch by
    ``phase_for_epoch`` (reference is_live milestones, dbw.py:457-462)."""

    coarse: jnp.ndarray        # bool: epoch < coarse_learning milestone
    decimate: jnp.ndarray      # bool: epoch < decimate_txt milestone (and training)
    opacity_noise: jnp.ndarray  # f32 noise scale on alpha logits (0 = off)
    filter_transparent: jnp.ndarray  # bool: hard-filter blocks at alpha>0.5
    sigma: jnp.ndarray         # f32 soft-rasterization sigma
    training: jnp.ndarray      # bool

    @staticmethod
    def eval_phase(filter_transparent=True, sigma=0.0):
        b = lambda v: jnp.asarray(v, bool)
        return Phase(
            b(False), b(False), jnp.float32(0.0), b(filter_transparent),
            jnp.float32(sigma), b(False),
        )


class SceneStatics(NamedTuple):
    """Constant topology/frames (host-built, folded into jit)."""

    bkg_verts: jnp.ndarray
    bkg_faces: jnp.ndarray
    bkg_uvs: jnp.ndarray          # per-vertex, atlas-rescaled
    ground_verts: jnp.ndarray
    ground_faces: jnp.ndarray
    ground_uvs: jnp.ndarray
    sq_eta: jnp.ndarray           # (V,)
    sq_omega: jnp.ndarray         # (V,)
    block_faces: jnp.ndarray      # (Fb, 3)
    block_uv_faces: jnp.ndarray   # (Fb, 3)
    block_uv_verts: jnp.ndarray   # (VT, 2) atlas coords
    R_world: jnp.ndarray          # (3, 3)
    T_world: jnp.ndarray          # (3,)
    block_colors: jnp.ndarray     # (N, 3) synthetic-color palette


class BlocksWorld:
    """Scene model: statics + config; all compute methods are pure."""

    name = "dbw"

    def __init__(self, img_size, mesh=None, renderer=None, rend_optim=None,
                 loss=None, backend=None, vgg=None, **unused):
        assert not unused, f"unknown model config keys: {unused}"
        if backend is None:
            # Pallas selection kernel on TPU (4x faster than the XLA
            # backend, see BENCH_NOTES.md); pure-XLA elsewhere — the kernel
            # uses pallas.tpu primitives, so GPU/other backends get XLA
            backend = (
                "pallas"
                if jax.default_backend() in ("tpu", "axon") else "xla"
            )
        mesh = dict(mesh or {})
        renderer = dict(renderer or {})
        rend_optim = dict(rend_optim or {})
        loss = dict(loss or {})
        self.img_size = (
            (img_size, img_size) if isinstance(img_size, int) else tuple(img_size)
        )
        self._init_mesh_cfg(mesh)
        self._init_rend_optim(rend_optim)
        self._init_loss_cfg(loss, vgg=vgg)
        self._renderer_cfg = renderer
        self.sigma_coarse = renderer.get("sigma", 1e-4)
        self.sigma_fine = 5e-6  # fine-phase sigma (reference dbw.py:133)
        self.backend = backend
        self.statics = self._build_statics()
        self.camera = None  # set via set_camera before compiling
        self._renderers = None

    # ------------------------------------------------------------------
    # configuration
    # ------------------------------------------------------------------

    def _init_mesh_cfg(self, kw):
        self.n_blocks = kw.pop("n_blocks", 1)
        self.S_world = float(kw.pop("S_world", 1))
        self.R_world_euler = kw.pop("R_world", [0, 0, 0])
        self.T_world = kw.pop("T_world", [0.0, 0.0, 0.0])
        self.z_far = kw.pop("z_far", 10)
        self.ratio_block_scene = kw.pop("ratio_block_scene", 1 / 4)
        self.txt_size = kw.pop("txt_size", 256)
        self.txt_bkg_upscale = kw.pop("txt_bkg_upscale", 1)
        self.scale_min = kw.pop("scale_min", 0.2)
        self.opacity_init = kw.pop("opacity_init", 0.5)
        self.T_range = kw.pop("T_range", [1, 1, 1])
        self.T_init_mode = kw.pop("T_init_mode", "gauss")
        assert not kw, f"unknown mesh config keys: {kw}"

    def _init_rend_optim(self, kw):
        self.opacity_noise = kw.pop("opacity_noise", False)
        self.decouple_rendering = kw.pop("decouple_rendering", False)
        self.coarse_learning = kw.pop("coarse_learning", True)
        self.decimate_txt = kw.pop("decimate_txt", False)
        self.decim_factor = kw.pop("decimate_factor", DECIMATE_FACTOR)
        self.kill_blocks = kw.pop("kill_blocks", False)
        assert not kw, f"unknown rend_optim config keys: {kw}"

    def _init_loss_cfg(self, kw, vgg=None):
        weights = {
            "rgb": kw.pop("rgb_weight", 1.0),
            "perceptual": kw.pop("perceptual_weight", 0),
            "parsimony": kw.pop("parsimony_weight", 0),
            "scale": kw.pop("scale_weight", 0),
            "tv": kw.pop("tv_weight", 0),
            "overlap": kw.pop("overlap_weight", 0),
        }
        self.loss_name = kw.pop("name", "mse")
        from ..losses import get_loss

        self.criterion = get_loss(self.loss_name)  # rgb reconstruction term
        assert callable(self.criterion)
        self.perceptual_name = kw.pop("perceptual_name", "lpips")
        self.tv_norm = tv_norm_funcs[kw.pop("tv_type", "l2sq")]
        vgg_weights_path = kw.pop("vgg_weights", None)
        # filter seed of the random-feature fallback (no pretrained weights
        # in this environment): exposed so the random-VGG sensitivity can be
        # A/B'd across filter draws (VERDICT r3 #5). Ignored when real
        # weights are loaded.
        vgg_filter_seed = int(kw.pop("vgg_filter_seed", 0))
        assert not kw, f"unknown loss config keys: {kw}"
        self.loss_weights = {k: v for k, v in weights.items() if v > 0}
        self.loss_names = [f"loss_{n}" for n in list(self.loss_weights) + ["total"]]
        if "perceptual" in self.loss_weights:
            # honor the configured flavor; reference defaults to LPIPS
            # (src/model/dbw.py:155,163 + registry src/model/loss.py:12-25)
            shared_vgg = vgg or VGG16Features.from_env_or_random(
                seed=vgg_filter_seed, path=vgg_weights_path)
            flavors = {"lpips": LPIPSLoss, "perceptual": PerceptualLoss}
            assert self.perceptual_name in flavors, (
                f"unknown perceptual_name {self.perceptual_name!r}; "
                f"expected one of {sorted(flavors)}"
            )
            self.perceptual_loss = flavors[self.perceptual_name](vgg=shared_vgg)
        else:
            self.perceptual_loss = None

    # ------------------------------------------------------------------
    # statics
    # ------------------------------------------------------------------

    def _build_statics(self) -> SceneStatics:
        TS = self.txt_size
        # blocks: level-1 icosphere + seam/pole-fixed uv atlas + circular pad
        bv, bf = icosphere(level=1)
        uv_faces, uv_verts = icosphere_uv_atlas(bv, bf)
        uv_verts, (p_left, p_right) = pad_u_atlas(uv_verts, TS)
        self.txt_padding = (p_left, p_right)
        self.BNF = len(uv_faces)
        eta = np.arcsin(np.clip(bv[:, 1], -1, 1)).astype(np.float32)
        omega = np.arctan2(bv[:, 0], bv[:, 2]).astype(np.float32)

        # atlas geometry: all maps share (TH, TW); blocks are (TS, TS+p),
        # bkg/ground are (TSb, TSb) placed top-left with uv rescale.
        TSb = TS * self.txt_bkg_upscale
        TH = max(TS, TSb)
        TW = max(TS + p_left + p_right, TSb)
        self.atlas_hw = (TH, TW)
        self.block_map_hw = (TS, TS + p_left + p_right)
        self.env_map_hw = (TSb, TSb)

        def rescale_uv(uv, h, w):
            u = uv[..., 0] * (w - 1) / max(TW - 1, 1)
            v = 1.0 - (1.0 - uv[..., 1]) * (h - 1) / max(TH - 1, 1)
            return np.stack([u, v], axis=-1).astype(np.float32)

        # background dome: level-2 icosphere, inward faces, radius z_far
        gv, gf = icosphere(level=2, flip=True)
        bkg_verts = gv * self.z_far
        bkg_uvs = rescale_uv(spherical_uv_from_points(bkg_verts), TSb, TSb)

        # ground: plane scaled (z_far, 1, z_far), subdivided 3x
        pv, pf = plane_mesh()
        pv = pv * np.array([self.z_far, 1.0, self.z_far], np.float32)
        for _ in range(3):
            pv, pf = subdivide(pv, pf)
        ground_uvs = rescale_uv(
            (pv[:, [0, 2]] / self.z_far + 1) / 2, TSb, TSb
        )

        R_world = np.asarray(euler_world_matrix(*self.R_world_euler))
        colors = fancy_colormap(np.linspace(0, 1, self.n_blocks + 1)[1:])

        return SceneStatics(
            jnp.asarray(bkg_verts), jnp.asarray(gf.astype(np.int32)),
            jnp.asarray(bkg_uvs),
            jnp.asarray(pv.astype(np.float32)), jnp.asarray(pf.astype(np.int32)),
            jnp.asarray(ground_uvs),
            jnp.asarray(eta), jnp.asarray(omega),
            jnp.asarray(bf.astype(np.int32)), jnp.asarray(uv_faces),
            jnp.asarray(rescale_uv(uv_verts, TS, TS + p_left + p_right)),
            jnp.asarray(R_world, dtype=jnp.float32), jnp.asarray(self.T_world, dtype=jnp.float32),
            jnp.asarray(colors, dtype=jnp.float32),
        )

    @property
    def bkg_n_faces(self):
        return int(self.statics.bkg_faces.shape[0])

    @property
    def ground_n_faces(self):
        return int(self.statics.ground_faces.shape[0])

    @property
    def env_n_faces(self):
        return self.bkg_n_faces + self.ground_n_faces

    @property
    def blocks_n_faces(self):
        return self.n_blocks * self.BNF

    # ------------------------------------------------------------------
    # params / renderers
    # ------------------------------------------------------------------

    def init_params(self, seed=0) -> SceneParams:
        """Init distributions match the reference (dbw.py:98-119)."""
        rng = np.random.default_rng(seed)
        N, TS = self.n_blocks, self.txt_size
        TSb = TS * self.txt_bkg_upscale
        t_range = np.asarray(self.T_range, np.float32)
        S_init = np.log(rng.random((N, 3)) + 0.5 - self.scale_min)
        R_init = random_rotations(N, rng)
        R_6d = np.concatenate([R_init[:, 0, :], R_init[:, 1, :]], axis=-1)
        if self.T_init_mode == "gauss":
            T_init = rng.standard_normal((N, 3)) / 2 * t_range
        elif self.T_init_mode == "uni":
            T_init = (2 * rng.random((N, 3)) - 1) * t_range
        else:
            raise NotImplementedError(self.T_init_mode)
        logit = math.log(self.opacity_init / (1 - self.opacity_init)) + 1e-3
        f32 = lambda x: jnp.asarray(x, jnp.float32)
        return SceneParams(
            sq_eps=jnp.zeros((N, 2), jnp.float32),
            R_6d_ground=f32([[1.0, 0, 0, 0, 1.0, 0]]),
            T_ground=f32([[0.0, -0.9 * float(t_range[1]), 0.0]]),
            S=f32(S_init),
            R_6d=f32(R_6d),
            T=f32(T_init),
            alpha_logit=jnp.full((N,), logit, jnp.float32),
            texture_bkg=f32(rng.standard_normal((1, TSb, TSb, 3)) / 10),
            texture_ground=f32(rng.standard_normal((1, TSb, TSb, 3)) / 10),
            textures=f32(rng.standard_normal((N, TS, TS, 3)) / 10),
        )

    def set_camera(self, K_ndc):
        """Install the dataset camera (first view's K, like the reference
        dbw.py:204-208) and build the renderer family (dbw.py:131-143).

        Accepts a traced K too: the scene-axis runner re-invokes this inside
        its traced, scene-vmapped step so intrinsics become per-scene inputs
        (parallel/scenes.py)."""
        rc = dict(self._renderer_cfg)
        # camera registry (reference renderer.py:62-67): 'perspective'
        # takes intrinsics from the dataset K (update_cameras on first
        # batch, dbw.py:204-208); 'fov' builds a pytorch3d
        # FoVPerspectiveCameras-convention pinhole from the config and the
        # dataset K does NOT override it.
        # NOTE: with no `cameras` key at all we default to the dataset-K
        # perspective camera (every shipped reference config names its
        # camera explicitly; the reference's implicit no-key default is
        # fov, renderer.py:65, which would ignore the dataset intrinsics).
        # An explicit `cameras:` block with no name follows the reference's
        # fov default.
        had_cam_cfg = rc.get("cameras") is not None
        cam_cfg = dict(rc.pop("cameras", None) or {})
        cam_name = cam_cfg.pop("name", "fov" if had_cam_cfg else "perspective")
        if cam_name == "perspective":
            # explicit K in the config overrides the dataset intrinsics
            # (reference renderer.py:62-67 passes config kwargs straight to
            # PerspectiveCameras) — discarding it would silently render
            # with different intrinsics than the reference run
            K_cfg = cam_cfg.pop("K", None)
            if K_cfg is not None:
                K = np.asarray(K_cfg, np.float32)
            else:
                K = (K_ndc if isinstance(K_ndc, jnp.ndarray)
                     else np.asarray(K_ndc))
            self.camera = Camera(
                jnp.float32(K[0, 0]), jnp.float32(K[1, 1]),
                jnp.float32(K[0, 2]), jnp.float32(K[1, 2]),
            )
        elif cam_name == "fov":
            import math

            fov = float(cam_cfg.pop("fov", 60.0))  # pytorch3d default
            aspect = float(cam_cfg.pop("aspect_ratio", 1.0))
            cam_cfg.pop("znear", None)  # z range handled by z_clip/z_far
            cam_cfg.pop("zfar", None)
            cam_cfg.pop("degrees", None)
            t = math.tan(math.radians(fov) / 2.0)
            # pytorch3d FoV NDC projection: fx = 1/(tan * aspect), fy = 1/tan
            self.camera = Camera(
                jnp.float32(1.0 / (t * aspect)), jnp.float32(1.0 / t),
                jnp.float32(0.0), jnp.float32(0.0),
            )
        else:
            raise NotImplementedError(
                f"unknown camera type: {cam_name!r} "
                "(supported: 'fov', 'perspective')"
            )
        assert not cam_cfg, f"unknown camera config keys: {cam_cfg}"

        # light registry (reference renderer.py:69-78): ambient (default) /
        # directional / point, pytorch3d default colors; applied to the
        # train/env/viz flavors (renderer_light keeps its fixed eye-light
        # setup, reference dbw.py:139-143)
        light_cfg = dict(rc.pop("lights", None) or {})
        light_name = light_cfg.pop("name", "ambient")
        flat1 = lambda v: tuple(np.asarray(v, np.float32).reshape(-1)[:3])
        if light_name == "ambient":
            amb = flat1(light_cfg.pop("ambient_color", (1.0, 1.0, 1.0)))
            light_kw = dict(
                light_type="ambient",
                # all-ones ambient is a no-op: keep None so the fused raw
                # path skips the multiply (reference renderer.py:226-228)
                ambient_color=None if amb == (1.0, 1.0, 1.0) else amb,
            )
        elif light_name in ("directional", "point"):
            light_kw = dict(
                light_type=light_name,
                ambient_color=flat1(
                    light_cfg.pop("ambient_color", (0.5, 0.5, 0.5))),
                diffuse_color=flat1(
                    light_cfg.pop("diffuse_color", (0.3, 0.3, 0.3))),
            )
            if light_name == "directional":
                light_kw["light_direction"] = flat1(
                    light_cfg.pop("direction", (0.0, 1.0, 0.0)))
            else:
                light_kw["light_location"] = flat1(
                    light_cfg.pop("location", (0.0, 1.0, 0.0)))
            light_cfg.pop("specular_color", None)  # specular always zero
        else:
            raise NotImplementedError(
                f"unknown light type: {light_name!r} "
                "(supported: 'ambient', 'directional', 'point')"
            )
        assert not light_cfg, f"unknown light config keys: {light_cfg}"

        fpp = rc.pop("faces_per_pixel", 25)  # reference default renderer.py:33
        rc.pop("sigma", None)  # handled in __init__ (sigma_coarse)
        detach_bary = rc.pop("detach_bary", False)
        clip_inside = rc.pop("clip_inside", True)
        shading = rc.pop("shading_type", "raw")
        bg_color = tuple(rc.pop("background_color", (0.0, 0.0, 0.0)))
        z_clip = rc.pop("z_clip", 1e-3) or 1e-3
        rc.pop("perspective_correct", None)
        assert not rc, f"unknown renderer config keys: {rc}"
        self.renderer = make_train_renderer(
            self.img_size, self.camera, faces_per_pixel=fpp,
            sigma=self.sigma_coarse, detach_bary=detach_bary,
            clip_inside=clip_inside, shading=shading,
            background_color=bg_color, z_clip=z_clip, backend=self.backend,
            **light_kw,
        )
        self.renderer_env = make_env_renderer(
            self.img_size, self.camera, shading=shading,
            background_color=bg_color, z_clip=z_clip, backend=self.backend,
            **light_kw,
        )
        self.renderer_viz = make_viz_renderer(
            self.img_size, self.camera, shading=shading,
            background_color=bg_color, z_clip=z_clip, backend=self.backend,
            **light_kw,
        )
        self.renderer_light = make_viz_renderer(
            self.img_size, self.camera, shading="flat",
            background_color=(1.0, 1.0, 1.0), z_clip=z_clip,
            ambient_color=(0.7, 0.7, 0.7), backend=self.backend,
        )

    # ------------------------------------------------------------------
    # curriculum
    # ------------------------------------------------------------------

    def _is_live(self, milestone, epoch):
        if isinstance(milestone, bool):
            return milestone
        return epoch < milestone

    def phase_for_epoch(self, epoch, training=True, filter_transparent=False) -> Phase:
        """Reference semantics: the coarse/fine split follows the EPOCH only
        (losses use it even in eval, dbw.py:364), while texture decimation and
        opacity noise additionally require training mode (dbw.py:276, 298-301).
        Hard transparency filtering kicks in after the coarse phase or when
        requested explicitly (dbw.py:210-211).

        Known nuance: the reference decimates env (bkg/ground) textures on
        training+decimate_txt alone (dbw.py:276), without the coarse
        condition applied to block textures (dbw.py:333); this single flag
        adds the coarse condition for both. Identical for every shipped
        config (decimate_txt milestones end before coarse_learning)."""
        coarse = self._is_live(self.coarse_learning, epoch)
        decim = training and coarse and self._is_live(self.decimate_txt, epoch)
        noise = float(self.opacity_noise) if (training and coarse) else 0.0
        sigma = self.sigma_coarse if coarse else self.sigma_fine
        b = lambda v: jnp.asarray(v, bool)
        return Phase(
            b(coarse), b(decim), jnp.float32(noise),
            b(filter_transparent or not coarse),
            jnp.float32(sigma), b(training),
        )

    # ------------------------------------------------------------------
    # texture maps -> atlas
    # ------------------------------------------------------------------

    def _decimate(self, maps, decimate):
        """avg_pool(f) + nearest upsample(f) regularizer under a traced flag
        (reference dbw.py:277-278, 331-334)."""
        f = self.decim_factor
        n, h, w, c = maps.shape

        def dec(m):
            sub = m.reshape(n, h // f, f, w // f, f, c).mean(axis=(2, 4))
            return jnp.repeat(jnp.repeat(sub, f, axis=1), f, axis=2)

        return jax.lax.cond(decimate, dec, lambda m: m, maps)

    def _place_in_atlas(self, maps, hw):
        """Pad a (n, h, w, 3) map stack to the shared atlas size (top-left,
        edge-replicated)."""
        TH, TW = self.atlas_hw
        h, w = hw
        return jnp.pad(maps, ((0, 0), (0, TH - h), (0, TW - w), (0, 0)), mode="edge")

    def _block_maps(self, params: SceneParams, phase: Phase, synthetic=False):
        """sigmoid textures (+ optional decimation) + circular u padding.
        Returns (atlas_maps (N, TH, TW, 3), raw_maps (N, TS, TS, 3))."""
        raw = jax.nn.sigmoid(params.textures)
        if synthetic:
            raw = jnp.broadcast_to(
                self.statics.block_colors[:, None, None, :], raw.shape
            )
        maps = self._decimate(raw, phase.decimate)
        pl, pr = self.txt_padding
        maps = jnp.concatenate(
            [maps[:, :, maps.shape[2] - pl:], maps, maps[:, :, :pr]], axis=2
        )
        return self._place_in_atlas(maps, self.block_map_hw), raw

    def _env_map(self, tex_logits, phase: Phase, synthetic=False):
        raw = jax.nn.sigmoid(tex_logits)
        if synthetic:
            raw = jnp.ones_like(raw)
        maps = self._decimate(raw, phase.decimate)
        return self._place_in_atlas(maps, self.env_map_hw), raw

    # ------------------------------------------------------------------
    # scene building
    # ------------------------------------------------------------------

    def _world_transform(self, verts):
        return (verts * self.S_world) @ self.statics.R_world + self.statics.T_world

    def build_bkg(self, params, phase, world_coord=True, synthetic=False,
                  reduced=False):
        st = self.statics
        verts = st.bkg_verts
        if reduced:
            verts = verts * (3.0 / self.z_far)
        if world_coord:
            verts = self._world_transform(verts)
        maps, raw = self._env_map(params.texture_bkg, phase, synthetic)
        scene = MeshScene(
            verts, st.bkg_faces, st.bkg_uvs, st.bkg_faces,
            jnp.zeros(st.bkg_faces.shape[0], jnp.int32), TextureAtlas(maps),
            jnp.ones(st.bkg_faces.shape[0], jnp.float32),
        )
        return scene, raw

    def build_ground(self, params, phase, world_coord=True, synthetic=False,
                     reduced=False):
        st = self.statics
        Rg = rotation_6d_to_matrix(params.R_6d_ground[0])
        S_ground = (
            jnp.asarray([3.0 / self.z_far, 1.0, 3.0 / self.z_far])
            if reduced else 1.0
        )
        verts = (st.ground_verts * S_ground) @ Rg + params.T_ground[0]
        if world_coord:
            verts = self._world_transform(verts)
        maps, raw = self._env_map(params.texture_ground, phase, synthetic)
        scene = MeshScene(
            verts, st.ground_faces, st.ground_uvs, st.ground_faces,
            jnp.zeros(st.ground_faces.shape[0], jnp.int32), TextureAtlas(maps),
            jnp.ones(st.ground_faces.shape[0], jnp.float32),
        )
        return scene, raw

    def build_env(self, params, phase, synthetic=False, reduced_ground=False):
        """bkg + ground as one world-coordinate scene (decoupled env pass,
        reference dbw.py:214)."""
        bkg, braw = self.build_bkg(params, phase, synthetic=synthetic)
        ground, graw = self.build_ground(
            params, phase, synthetic=synthetic, reduced=reduced_ground
        )
        return concat_scenes([bkg, ground]), {"bkg": braw, "ground": graw}

    def block_sq_eps(self, params):
        e = jax.nn.sigmoid(params.sq_eps) * 1.8 + 0.1
        return e[:, 0:1], e[:, 1:2]

    def get_blocks_verts(self, params):
        """Superquadric warp of the unit icosphere (reference dbw.py:348-352).
        Returns (N, V, 3) local-frame verts (before S/R/T)."""
        eps1, eps2 = self.block_sq_eps(params)
        st = self.statics
        return parametric_sq(
            st.sq_eta[None], st.sq_omega[None], eps1, eps2
        ) * self.ratio_block_scene

    def build_blocks(self, params: SceneParams, phase: Phase, key=None,
                     world_coord=True, synthetic=False):
        """Blocks as one static-shape MeshScene + aux for losses.

        Dead blocks (kill_blocks at alpha<=0.01 in coarse, hard filter at
        alpha<=0.5 in fine/eval — reference dbw.py:316-326) are collapsed to
        zero-area geometry (culled by the rasterizer) with alpha 0."""
        st = self.statics
        N = self.n_blocks
        S = jnp.exp(params.S) + self.scale_min
        R = rotation_6d_to_matrix(params.R_6d)
        T = params.T

        logit = params.alpha_logit
        if key is not None:
            noisy = logit + phase.opacity_noise * jax.random.normal(key, logit.shape)
        else:
            noisy = logit
        alpha = jax.nn.sigmoid(noisy)
        alpha_clean = jax.nn.sigmoid(logit)

        thresh = jnp.where(phase.filter_transparent, 0.5, 0.01)
        if self.kill_blocks:
            mask = alpha_clean > thresh
        else:
            mask = jnp.where(
                phase.filter_transparent, alpha_clean > 0.5, jnp.ones_like(logit, bool)
            )
        mask_f = mask.astype(jnp.float32)
        alpha_full = alpha * mask_f  # reference's _alpha_full (dbw.py:305,321)

        verts = (self.get_blocks_verts(params) * S[:, None]) @ R + T[:, None]
        if world_coord:
            verts = self._world_transform(verts)
        # collapse dead blocks to a point -> zero NDC area -> culled
        verts = jnp.where(mask[:, None, None], verts, 0.0)

        # per-face alpha: soft alpha in coarse, opaque when hard-filtered
        block_face_alpha = jnp.where(phase.filter_transparent, mask_f, alpha * mask_f)
        faces_alpha = jnp.repeat(block_face_alpha, self.BNF)

        maps, raw_maps = self._block_maps(params, phase, synthetic)
        V = verts.shape[1]
        faces = (st.block_faces[None] + (jnp.arange(N) * V)[:, None, None]).reshape(-1, 3)
        VT = st.block_uv_verts.shape[0]
        uv_faces = (
            st.block_uv_faces[None] + (jnp.arange(N) * VT)[:, None, None]
        ).reshape(-1, 3)
        uv_verts = jnp.tile(st.block_uv_verts, (N, 1))
        map_idx = jnp.repeat(jnp.arange(N, dtype=jnp.int32), self.BNF)
        scene = MeshScene(
            verts.reshape(-1, 3), faces, uv_verts, uv_faces, map_idx,
            TextureAtlas(maps), faces_alpha,
        )
        eps1, eps2 = self.block_sq_eps(params)
        aux = {
            "alpha": alpha, "alpha_full": alpha_full, "mask": mask,
            "S": S, "R": R, "T": T, "eps1": eps1, "eps2": eps2,
            "raw_maps": raw_maps,
        }
        return scene, aux

    def build_scene(self, params, phase, key=None, synthetic=False,
                    w_bkg=True, reduced_ground=False):
        """Joint scene: env + blocks in one MeshScene (reference
        dbw.py:250-265)."""
        parts, raws = [], {}
        if w_bkg:
            bkg, raws["bkg"] = self.build_bkg(params, phase, synthetic=synthetic)
            parts.append(bkg)
        ground, raws["ground"] = self.build_ground(
            params, phase, synthetic=synthetic, reduced=reduced_ground
        )
        parts.append(ground)
        blocks, aux = self.build_blocks(
            params, phase, key=key, world_coord=True, synthetic=synthetic
        )
        parts.append(blocks)
        return concat_scenes(parts), aux, raws

    # ------------------------------------------------------------------
    # prediction
    # ------------------------------------------------------------------

    def predict(self, params: SceneParams, phase: Phase, R, T, key=None,
                row_range=None):
        """Render B views (decoupled env/blocks compositing when configured,
        reference dbw.py:202-239). R: (B, 3, 3), T: (B, 3).

        Returns (rec (B, H, W, 3), aux). ``row_range=(row0, Hb)`` renders
        only the Hb-row pixel band at traced offset row0 — the spatial axis
        of the sharded trainers (parallel/seeds.py)."""
        if self.decouple_rendering:
            env, env_raws = self.build_env(params, phase)
            rec_env = self.renderer_env.render(
                env, R, T, row_range=row_range
            )[..., :3]
            blocks, aux = self.build_blocks(params, phase, key=key)
            rgba = self.renderer.render(
                blocks, R, T, sigma=phase.sigma, row_range=row_range
            )
            rec_fg, mask = rgba[..., :3], rgba[..., 3:]
            rec = rec_fg * mask + (1.0 - mask) * rec_env
        else:
            scene, aux, env_raws = self.build_scene(params, phase, key=key)
            rgba = self.renderer.render(
                scene, R, T, sigma=phase.sigma, row_range=row_range
            )
            rec = rgba[..., :3]
        aux["env_raw_maps"] = env_raws
        return rec, aux

    def predict_synthetic(self, params, phase, R, T):
        """Flat-shaded synthetic-color render of the filtered blocks
        (reference dbw.py:241-248). Synthetic maps are constant per block,
        so this rides the per-face-constant fast path (raster + two
        gathers, render/renderer.py render_faces_flat) instead of the full
        fragment pipeline — equality pinned by tests/test_render_extras.py."""
        phase = phase._replace(filter_transparent=jnp.asarray(True))
        blocks, _ = self.build_blocks(params, phase, synthetic=True)
        face_colors = self.synthetic_face_colors()
        return self.renderer_light.render_faces_flat(
            blocks, R, T, face_colors
        )[..., :3]

    def synthetic_face_colors(self):
        """(N*BNF, 3) per-face synthetic palette: the constant block color
        every uv of the synthetic maps resolves to."""
        return jnp.repeat(self.statics.block_colors, self.BNF, axis=0)

    def sample_points_from_blocks(self, params, key=None, n_points=500):
        """Random surface samples of the posed blocks in model coordinates
        (reference dbw.py:354-359)."""
        from ..ops.superquadric import sample_sq

        key = key if key is not None else jax.random.PRNGKey(0)
        eps1, eps2 = self.block_sq_eps(params)
        S = jnp.exp(params.S) + self.scale_min
        R = rotation_6d_to_matrix(params.R_6d)
        pts = sample_sq(key, eps1, eps2, S * self.ratio_block_scene, n_points)
        return pts @ R + params.T[:, None]

    # ------------------------------------------------------------------
    # losses
    # ------------------------------------------------------------------

    def compute_losses(self, imgs, rec, params: SceneParams, phase: Phase,
                       aux, key=None):
        """Training objective (reference dbw.py:361-408). imgs/rec:
        (B, H, W, 3)."""
        w = self.loss_weights
        coarse_f = phase.coarse.astype(jnp.float32)
        losses = {}

        if "rgb" in w:
            # configured criterion (reference dbw.py:161,367: get_loss(name));
            # .mean() reduces per-image criteria (ssim returns (B,)) to the
            # scalar the loss dict requires — a no-op for scalar criteria
            losses["rgb"] = w["rgb"] * jnp.mean(self.criterion(imgs, rec))

        if "perceptual" in w:
            factor = jnp.where(phase.coarse, 1.0, 0.1)
            losses["perceptual"] = (
                w["perceptual"] * factor * self.perceptual_loss(imgs, rec)
            )

        if "parsimony" in w:
            alpha = jnp.where(
                phase.coarse, aux["alpha_full"],
                (aux["alpha_full"] > 0.5).astype(jnp.float32),
            )
            losses["parsimony"] = (
                w["parsimony"] * coarse_f * safe_pow(alpha, 0.5).mean()
            )

        if "tv" in w:
            factor = jnp.where(phase.coarse, 1.0, 0.1)
            tv = self.tv_norm
            bkg_m, ground_m = aux["env_raw_maps"]["bkg"], aux["env_raw_maps"]["ground"]
            tv_loss = tv(jnp.diff(bkg_m, axis=1)).mean() + tv(
                jnp.diff(bkg_m, axis=2)
            ).mean()
            # (N, TS, TS, 3), unfiltered & undecimated — deliberately so:
            # the reference assigns `self._blocks_maps = maps` at dbw.py:313
            # BEFORE the transparency filter at dbw.py:316-326 (which rebinds
            # only the local `maps`), so reference TV at dbw.py:381-384 runs
            # over ALL blocks' maps incl. dead ones. Pinned by
            # tests/test_losses.py::test_block_tv_matches_reference_semantics.
            bm = aux["raw_maps"]
            # seam continuity: circular diff along u (reference dbw.py:382-385)
            dx = tv(jnp.diff(bm, axis=2, append=bm[:, :, 0:1]))
            dy = tv(jnp.diff(bm, axis=1))
            tv_loss += dx.sum(0).mean() + dy.sum(0).mean()
            # NOTE: the ground term is factor-scaled INSIDE the sum and the
            # whole tv_loss is factor-scaled again — so ground TV gets
            # factor^2 in the fine phase. That is the reference's exact
            # behavior (dbw.py:386-387), kept for parity.
            tv_loss += (
                tv(jnp.diff(ground_m, axis=1)).mean()
                + tv(jnp.diff(ground_m, axis=2)).mean()
            ) * factor
            losses["tv"] = w["tv"] * factor * tv_loss

        if "overlap" in w:
            key = key if key is not None else jax.random.PRNGKey(0)
            S, R, T = aux["S"], aux["R"], aux["T"]
            N = self.n_blocks
            pts = (
                jax.random.uniform(key, (N, OVERLAP_N_POINTS, 3)) * 2.0 - 1.0
            )
            pts = (pts * self.ratio_block_scene * S[:, None]) @ R + T[:, None]
            pts = jax.lax.stop_gradient(pts.reshape(-1, 3))[None]  # (1, NP, 3)
            pts = jnp.broadcast_to(pts, (N, N * OVERLAP_N_POINTS, 3))
            inv = ((pts - T[:, None]) @ jnp.swapaxes(R, 1, 2)) / (
                S[:, None] * self.ratio_block_scene
            )
            sdf = implicit_sq(inv, aux["eps1"], aux["eps2"], as_sdf=2)
            occ = jax.nn.sigmoid(-sdf / OVERLAP_TEMPERATURE)
            alpha = jnp.where(
                phase.coarse, aux["alpha_full"],
                (aux["alpha_full"] > 0.5).astype(jnp.float32),
            )
            occ = occ * alpha[:, None]
            overlap = jnp.clip(occ.sum(0) - OVERLAP_N_BLOCKS, 0.0).mean()
            losses["overlap"] = w["overlap"] * coarse_f * overlap

        losses["total"] = sum(losses.values())
        return losses

    def forward(self, params, phase, imgs, R, T, key, row_range=None,
                rec_gather=None):
        """predict + losses (reference dbw.py:198-200).

        Pixel-band sharding hooks (parallel/seeds.py): with ``row_range``
        the render covers only this device's row band; ``rec_gather``
        (e.g. a tiled lax.all_gather over the spatial mesh axis + crop)
        reassembles the full (B, H, W, 3) reconstruction the cross-pixel
        losses (SSIM / perceptual convs) need. Gradients flow back through
        the gather (transpose: psum_scatter) into the band render."""
        k1, k2 = jax.random.split(key)
        rec, aux = self.predict(params, phase, R, T, key=k1,
                                row_range=row_range)
        if rec_gather is not None:
            rec = rec_gather(rec)
        return self.compute_losses(imgs, rec, params, phase, aux, key=k2)

    # ------------------------------------------------------------------
    # inspection helpers (host / eval)
    # ------------------------------------------------------------------

    def get_opacities(self, params):
        alpha = jax.nn.sigmoid(params.alpha_logit)
        if self.kill_blocks:
            alpha = alpha * (alpha > 0.01)
        return alpha

    def get_nb_opaque_blocks(self, params):
        return int((np.asarray(self.get_opacities(params)) > 0.5).sum())

    def get_scene_face_colors(self, params, filter_transparent=False, w_env=True):
        """Per-face synthetic palette for edge overlays (reference
        dbw.py:421-431). Scenes here are STATIC full-N (dead blocks are
        collapsed in place, never dropped), so the table always has
        env + N*BNF rows with POSITIONAL alignment; the reference's
        dynamic filtering maps to blacking out dead blocks' colors (their
        zero-area faces never rasterize anyway)."""
        vals = np.linspace(0, 1, self.n_blocks + 1)[1:]
        colors = fancy_colormap(vals)
        op = np.asarray(self.get_opacities(params))
        if filter_transparent:
            colors = np.where((op > 0.5)[:, None], colors, 0.0)
        elif self.kill_blocks:
            colors = np.where((op > 0.01)[:, None], colors, 0.0)
        nfe = self.env_n_faces if w_env else 0
        face_vals = np.concatenate(
            [np.zeros((nfe, 3)), np.repeat(colors, self.BNF, axis=0)], axis=0
        )
        return jnp.asarray(face_vals, jnp.float32)

    def quantitative_eval(self, params, loader, hard_inference=True):
        """PSNR/SSIM/LPIPS + block stats on a loader (reference
        dbw.py:465-493); delegates to eval.quant."""
        from ..eval.quant import quantitative_eval

        return quantitative_eval(self, params, loader, hard_inference)

    def qualitative_eval(self, params, loader, path=None, NV=240):
        """Texture/mesh/render/video artifacts (reference dbw.py:495-554);
        delegates to eval.quali."""
        from pathlib import Path

        from ..eval.quali import qualitative_eval

        return qualitative_eval(self, params, loader, path or Path("."), NV=NV)

    def get_arranged_block_txt(self, params, ncol=5):
        """Texture grid image for logging (reference dbw.py:433-438)."""
        maps = np.asarray(jax.nn.sigmoid(params.textures))
        n = len(maps)
        ncol = min(ncol, n)
        nrow = max(n // ncol, 1)
        rows = [
            np.concatenate([maps[k] for k in range(ncol * i, ncol * (i + 1))], axis=1)
            for i in range(nrow)
        ]
        return np.concatenate(rows, axis=0)
