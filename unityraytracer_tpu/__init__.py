"""unityraytracer_tpu: a TPU-native progressive Monte-Carlo path tracer.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
Unity compute-shader ray tracer (RemyMuj/UnityRayTracer): sphere / mesh /
ground-plane scenes, albedo-specular-emissive roulette BRDF, Moller-Trumbore
triangles with barycentric smooth normals, LBVH acceleration, HDRI equirect
skyboxes, progressive accumulation, and multi-chip framebuffer sharding.
"""

from .config import RenderConfig
from .camera import Camera, camera_rays
from .scene import (Material, Materials, Scene, SceneBuilder, Spheres,
                    Triangles, compute_smooth_normals, GROUND_MATERIAL)
from .render import Renderer, RenderState, render_sample, progressive_step

__version__ = "0.1.0"

__all__ = [
    "RenderConfig", "Camera", "camera_rays", "Material", "Materials", "Scene",
    "SceneBuilder", "Spheres", "Triangles", "compute_smooth_normals",
    "GROUND_MATERIAL", "Renderer", "RenderState", "render_sample",
    "progressive_step",
]
