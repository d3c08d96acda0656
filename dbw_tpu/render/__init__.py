"""Differentiable TPU rendering stack.

Two-stage design (see rasterize.py): a non-differentiable top-K
face-selection pass followed by a fully differentiable XLA
interpolation/shading/blend pass. Replaces PyTorch3D's CUDA
``MeshRasterizer`` + the reference's ``LayeredShader`` / ``layered_rgb_blend``
(reference: src/model/renderer.py).
"""

from .cameras import Camera, camera_from_opencv_projection, ndc_pixel_centers
from .meshes import MeshScene, TextureAtlas
from .rasterize import rasterize, RasterConfig
from .interpolate import interpolate_fragments
from .blend import layered_blend
from .renderer import Renderer, RendererConfig
