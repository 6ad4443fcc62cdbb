"""Frame rendering: path-traced sample pass + progressive accumulation.

This is the TPU-native reimagining of the reference's host frame driver
(`RayTraceMaster.cs:751-866`) and device megakernel
(`RayTraceShader.compute:431-469`):

* ``render_sample``: one full frame of ``spp`` jittered camera rays per pixel,
  bounced ``bounces`` times — a single jitted function (the megakernel's two
  nested loops become a batched bounce loop over SoA ray arrays).
* ``progressive_step``: the AdditionShader running mean — frame N blended with
  weight 1/(N+1) (`AdditionShader.shader:40`), as explicit jit-carried state.
* ``Renderer``: convenience driver with reference reset semantics (camera
  moved / scene dirty / resize -> sample counter back to 0,
  `RayTraceMaster.cs:765-768,843,852`).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from .camera import Camera, camera_rays, pixel_uv
from .config import RenderConfig
from .ops.shade import Hit, shade
from .ops.sampling import sample_unit_disk
from .ops import trace as trace_ops
from .scene import Scene


@struct.dataclass
class RenderState:
    """Progressive accumulation state (the _converged texture + _currentSample)."""

    accum: jnp.ndarray      # (H, W, 3) running mean, linear radiance
    n_samples: jnp.ndarray  # () int32 frames accumulated

    @staticmethod
    def create(width: int, height: int) -> "RenderState":
        return RenderState(accum=jnp.zeros((height, width, 3), jnp.float32),
                           n_samples=jnp.int32(0))


def get_tracer(scene: Scene, cfg: RenderConfig, accel=None) -> Callable:
    """Resolve cfg.tracer to a ``fn(ro, rd) -> Hit`` closure."""
    if cfg.tracer == "brute":
        return trace_ops.make_brute_tracer(scene, chunk=cfg.ray_chunk)
    if cfg.tracer in ("bvh", "cluster", "pallas"):
        from .ops import traverse  # deferred: needs accel structures
        return traverse.make_accel_tracer(scene, accel, cfg)
    raise ValueError(f"unknown tracer {cfg.tracer!r}")


def render_sample(scene: Scene, tracer: Callable, camera: Camera, key,
                  cfg: RenderConfig) -> jnp.ndarray:
    """Render one frame: (H, W, 3) linear radiance, mean over cfg.spp rays.

    Row 0 of the output is the TOP of the image (pixel v flipped from the
    reference's bottom-left uv origin).
    """
    H, W, spp = cfg.height, cfg.width, cfg.spp
    N = H * W * spp

    k_jit, k_lens, k_bounce = jax.random.split(key, 3)

    # Pixel lattice: py counts up from the bottom (NDC v up).
    px = jnp.broadcast_to(jnp.arange(W)[None, None, :], (spp, H, W))
    py = jnp.broadcast_to(jnp.arange(H)[None, :, None], (spp, H, W))
    jitter = jax.random.uniform(k_jit, (spp, H, W, 2))
    uv = pixel_uv(px, py, jitter, W, H)

    # Thin-lens offsets are generated unconditionally (cheap) and are a no-op
    # when aperture == 0; keeps the traced graph static across camera params.
    lu = jax.random.uniform(k_lens, (spp, H, W, 2))
    lens_uv = sample_unit_disk(lu[..., 0], lu[..., 1])

    ro, rd = camera_rays(camera, uv, lens_uv)
    ro = ro.reshape(N, 3)
    rd = rd.reshape(N, 3)
    energy = jnp.ones((N, 3), jnp.float32)
    radiance = jnp.zeros((N, 3), jnp.float32)

    # Bounce loop (compute:453-461). Static trip count; dead lanes carry zero
    # energy. The wavefront path (ops/wavefront.py) compacts between bounces.
    for b in range(cfg.bounces):
        hit: Hit = tracer(ro, rd)
        uniforms = jax.random.uniform(jax.random.fold_in(k_bounce, b), (N, 3))
        ro, rd, energy, contrib = shade(ro, rd, energy, hit, scene.skybox, uniforms)
        radiance = radiance + contrib

    img = radiance.reshape(spp, H, W, 3).mean(axis=0)
    return img[::-1]  # flip: row 0 = top


def progressive_step(state: RenderState, frame: jnp.ndarray) -> RenderState:
    """Running mean with weight 1/(N+1) (AdditionShader.shader:40)."""
    n = state.n_samples.astype(jnp.float32)
    accum = state.accum * (n / (n + 1.0)) + frame / (n + 1.0)
    return RenderState(accum=accum, n_samples=state.n_samples + 1)


class Renderer:
    """Stateful convenience driver around the pure functions.

    Mirrors RayTraceMaster's lifecycle: holds (scene, camera, config), jits the
    frame step once, accumulates progressively, resets on invalidation.
    """

    def __init__(self, scene: Scene, camera: Camera, config: RenderConfig,
                 accel=None, seed: int = 0):
        self.scene = scene
        self.camera = camera
        self.config = config
        self.accel = accel
        if accel is None and config.tracer not in ("brute",):
            from .ops import bvh
            self.accel = bvh.build_accel(scene, config)
        self._key = jax.random.key(seed)
        self.state = RenderState.create(config.width, config.height)
        self._compiled = self._build_step()

    def _build_step(self):
        cfg = self.config

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state, scene, camera, accel, key):
            tracer = get_tracer(scene, cfg, accel)
            frame = render_sample(scene, tracer, camera, key, cfg)
            return progressive_step(state, frame)

        return step

    # -- invalidation (RayTraceMaster.cs:765-768,852) -------------------------
    def reset(self):
        self.state = RenderState.create(self.config.width, self.config.height)

    def set_camera(self, camera: Camera):
        self.camera = camera
        self.reset()

    def set_scene(self, scene: Scene, accel=None):
        self.scene = scene
        self.accel = accel
        if accel is None and self.config.tracer not in ("brute",):
            from .ops import bvh
            self.accel = bvh.build_accel(scene, self.config)
        self.reset()

    # -- stepping --------------------------------------------------------------
    def step(self, n_frames: int = 1) -> "Renderer":
        for _ in range(n_frames):
            self._key, sub = jax.random.split(self._key)
            self.state = self._compiled(self.state, self.scene, self.camera,
                                        self.accel, sub)
        return self

    @property
    def image(self) -> np.ndarray:
        """Current converged image, (H, W, 3) linear float32, row 0 = top."""
        return np.asarray(jax.device_get(self.state.accum))

    @property
    def sample_count(self) -> int:
        return int(jax.device_get(self.state.n_samples))
