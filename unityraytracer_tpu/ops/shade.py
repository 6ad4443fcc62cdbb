"""Shading: roulette BRDF bounce + equirect skybox (reference Shade,
RayTraceShader.compute:386-428), fully vectorized and branchless.

Per bounce the reference mutates the ray in place and returns the radiance
contribution; here the same update is a pure function over SoA arrays:

  contribution = energy_before * (emission | skybox)
  energy_after = energy_before * lobe_weight          (0 on miss/terminate)

All three roulette branches are computed for every lane and selected with
``where`` — on TPU there is no divergence to save, so branchless select is the
idiomatic form of the reference's if/else chain.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..utils.math3d import reflect, sdot
from .sampling import sample_hemisphere, PI

MISS_T = 1e30  # distances >= this are misses (reference uses 1.#INF, compute:128)


@struct.dataclass
class Hit:
    """Per-ray hit record (RayHit analog, compute:36-41), SoA."""

    t: jnp.ndarray           # (R,)
    position: jnp.ndarray    # (R, 3)
    normal: jnp.ndarray      # (R, 3)
    albedo: jnp.ndarray      # (R, 3)
    specular: jnp.ndarray    # (R, 3)
    emission: jnp.ndarray    # (R, 3)
    smoothness: jnp.ndarray  # (R,)


def sample_skybox(skybox, rd):
    """Bilinear equirect environment lookup.

    Mapping matches the reference (compute:424-426) composed with Unity's
    repeat-wrap sampler and bottom-left uv origin; our arrays are row 0 = top
    (+y pole):  row01 = acos(y)/pi, col01 = (-atan2(x, -z)/(2*pi)) mod 1.

    Args:
      skybox: (H, W, 3) float32.
      rd: (R, 3) unit directions.
    Returns:
      (R, 3) radiance.
    """
    H, W = skybox.shape[0], skybox.shape[1]
    y = jnp.clip(rd[..., 1], -1.0, 1.0)
    row01 = jnp.arccos(y) / PI
    col01 = jnp.mod(-jnp.arctan2(rd[..., 0], -rd[..., 2]) / (2.0 * PI), 1.0)

    fy = row01 * H - 0.5
    fx = col01 * W - 0.5
    y0f = jnp.floor(fy)
    x0f = jnp.floor(fx)
    wy = fy - y0f
    wx = fx - x0f
    # Clamp v (pole rows), wrap u (seam) — clamp both neighbors independently
    # so pole samples don't bleed into the adjacent row.
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, H - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, H - 1)
    x0 = jnp.mod(x0f.astype(jnp.int32), W)
    x1 = jnp.mod(x0f.astype(jnp.int32) + 1, W)

    c00 = skybox[y0, x0]
    c01 = skybox[y0, x1]
    c10 = skybox[y1, x0]
    c11 = skybox[y1, x1]
    top = c00 * (1 - wx)[..., None] + c01 * wx[..., None]
    bot = c10 * (1 - wx)[..., None] + c11 * wx[..., None]
    return top * (1 - wy)[..., None] + bot * wy[..., None]


def shade(ro, rd, energy, hit: Hit, skybox, uniforms):
    """One bounce of the reference BRDF.

    Args:
      ro, rd: (R, 3) current ray origins / unit directions.
      energy: (R, 3) path throughput before this bounce.
      hit: Hit SoA (t >= MISS_T marks skybox rays).
      skybox: (H, W, 3) environment map.
      uniforms: (R, 3) independent U[0,1) samples (roulette, u1, u2).

    Returns:
      (new_ro, new_rd, new_energy, radiance): radiance is this bounce's
      contribution ``energy * (emission | sky)``; new_energy is 0 for missed
      or terminated lanes.
    """
    u_roulette = uniforms[..., 0]
    u1 = uniforms[..., 1]
    u2 = uniforms[..., 2]
    missed = hit.t >= MISS_T
    n = hit.normal

    # Energy conservation clamp + lobe probabilities (compute:389-394).
    albedo = jnp.minimum(1.0 - hit.specular, hit.albedo)
    spec_chance = jnp.mean(hit.specular, axis=-1)
    diff_chance = jnp.mean(albedo, axis=-1)
    total = spec_chance + diff_chance
    safe_total = jnp.where(total > 0, total, 1.0)
    spec_chance = spec_chance / safe_total
    diff_chance = diff_chance / safe_total

    is_spec = (total > 0) & (u_roulette < spec_chance)
    is_diff = (total > 0) & ~is_spec & (diff_chance > 0)

    # Specular lobe: Phong alpha = 1000^(s^2) (compute:399-406).
    alpha = jnp.power(1000.0, hit.smoothness * hit.smoothness)
    refl = reflect(rd, n)
    dir_spec = sample_hemisphere(u1, u2, refl, alpha)
    f = (alpha + 2.0) / (alpha + 1.0)
    w_spec = (hit.specular / jnp.maximum(spec_chance, 1e-8)[..., None]
              * sdot(n, dir_spec, f)[..., None])

    # Diffuse lobe (compute:407-411): power-1 hemisphere about the normal.
    dir_diff = sample_hemisphere(u1, u2, n, 1.0)
    w_diff = albedo / jnp.maximum(diff_chance, 1e-8)[..., None]

    new_rd = jnp.where(is_spec[..., None], dir_spec, dir_diff)
    lobe_w = jnp.where(is_spec[..., None], w_spec,
                       jnp.where(is_diff[..., None], w_diff, 0.0))
    new_ro = hit.position + n * 0.001  # bias (compute:402,409)

    sky = sample_skybox(skybox, rd)
    radiance = jnp.where(missed[..., None], energy * sky, energy * hit.emission)
    new_energy = jnp.where(missed[..., None], 0.0, energy * lobe_w)
    # Dead lanes keep their old ray (values are masked by zero energy anyway).
    new_ro = jnp.where(missed[..., None], ro, new_ro)
    new_rd = jnp.where(missed[..., None], rd, new_rd)
    return new_ro, new_rd, new_energy, radiance
