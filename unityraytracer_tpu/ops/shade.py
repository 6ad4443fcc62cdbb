"""Shading: roulette BRDF bounce + equirect skybox (reference Shade,
RayTraceShader.compute:386-428), fully vectorized and branchless.

Per bounce the reference mutates the ray in place and returns the radiance
contribution; here the same update is a pure function over component-SoA
arrays (Vec3 tuples of (N,) — see ops/vec.py for the TPU layout rationale):

  contribution = energy_before * (emission | skybox)
  energy_after = energy_before * lobe_weight          (0 on miss/terminate)

All three roulette branches are computed for every lane and selected with
``where`` — on TPU there is no divergence to save, so branchless select is
the idiomatic form of the reference's if/else chain.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from . import vec
from .vec import Vec3
from .sampling import sample_hemisphere, PI

MISS_T = 1e30  # distances >= this are misses (reference uses 1.#INF, compute:128)


@struct.dataclass
class Hit:
    """Per-ray hit record (RayHit analog, compute:36-41), component-SoA."""

    t: jnp.ndarray        # (N,)
    position: Vec3        # 3 x (N,)
    normal: Vec3          # 3 x (N,)
    albedo: Vec3          # 3 x (N,)
    specular: Vec3        # 3 x (N,)
    emission: Vec3        # 3 x (N,)
    smoothness: jnp.ndarray  # (N,)


def sample_skybox(skybox, rd: Vec3) -> Vec3:
    """Bilinear equirect environment lookup.

    Mapping matches the reference (compute:424-426) composed with Unity's
    repeat-wrap sampler and bottom-left uv origin; our arrays are row 0 = top
    (+y pole):  row01 = acos(y)/pi, col01 = (-atan2(x, -z)/(2*pi)) mod 1.

    Gathers are flat per-channel (dense layouts; see ops/vec.py).

    Args:
      skybox: (H, W, 3) float32.
      rd: Vec3 of (N,) unit direction components.
    Returns:
      Vec3 of (N,) radiance.
    """
    H, W = skybox.shape[0], skybox.shape[1]
    y = jnp.clip(rd[1], -1.0, 1.0)
    row01 = jnp.arccos(y) / PI
    col01 = jnp.mod(-jnp.arctan2(rd[0], -rd[2]) / (2.0 * PI), 1.0)

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

    i00 = y0 * W + x0
    i01 = y0 * W + x1
    i10 = y1 * W + x0
    i11 = y1 * W + x1
    out = []
    for ch in range(3):
        plane = skybox[:, :, ch].reshape(-1)
        top = plane[i00] * (1 - wx) + plane[i01] * wx
        bot = plane[i10] * (1 - wx) + plane[i11] * wx
        out.append(top * (1 - wy) + bot * wy)
    return tuple(out)


def shade(ro: Vec3, rd: Vec3, energy: Vec3, hit: Hit, skybox, uniforms):
    """One bounce of the reference BRDF.

    Args:
      ro, rd: Vec3 of (N,) current ray origins / unit directions.
      energy: Vec3 of (N,) path throughput before this bounce.
      hit: Hit SoA (t >= MISS_T marks skybox rays).
      skybox: (H, W, 3) environment map.
      uniforms: 3-tuple of (N,) independent U[0,1) samples (roulette, u1, u2).

    Returns:
      (new_ro, new_rd, new_energy, radiance): radiance is this bounce's
      contribution ``energy * (emission | sky)``; new_energy is 0 for missed
      or terminated lanes.
    """
    u_roulette, u1, u2 = uniforms
    missed = hit.t >= MISS_T
    n = hit.normal

    # Energy conservation clamp + lobe probabilities (compute:389-394).
    albedo = tuple(jnp.minimum(1.0 - s, a)
                   for s, a in zip(hit.specular, hit.albedo))
    spec_chance = (hit.specular[0] + hit.specular[1] + hit.specular[2]) / 3.0
    diff_chance = (albedo[0] + albedo[1] + albedo[2]) / 3.0
    total = spec_chance + diff_chance
    safe_total = jnp.where(total > 0, total, 1.0)
    spec_chance = spec_chance / safe_total
    diff_chance = diff_chance / safe_total

    is_spec = (total > 0) & (u_roulette < spec_chance)
    is_diff = (total > 0) & ~is_spec & (diff_chance > 0)

    # Specular lobe: Phong alpha = 1000^(s^2) (compute:399-406).
    alpha = jnp.power(1000.0, hit.smoothness * hit.smoothness)
    refl = vec.reflect(rd, n)
    dir_spec = sample_hemisphere(u1, u2, refl, alpha)
    f = (alpha + 2.0) / (alpha + 1.0)
    w_spec_s = vec.sdot(n, dir_spec, f) / jnp.maximum(spec_chance, 1e-8)
    w_spec = vec.scale(hit.specular, w_spec_s)

    # Diffuse lobe (compute:407-411): power-1 hemisphere about the normal.
    dir_diff = sample_hemisphere(u1, u2, n, 1.0)
    w_diff = vec.scale(albedo, 1.0 / jnp.maximum(diff_chance, 1e-8))

    new_rd = vec.where(is_spec, dir_spec, dir_diff)
    lobe_w = vec.where(is_spec, w_spec,
                       vec.where(is_diff, w_diff, vec.splat((0., 0., 0.), u1)))
    # Bounce origin bias (compute:402,409).
    new_ro = vec.add(hit.position, vec.scale(n, 0.001))

    sky = sample_skybox(skybox, rd)
    radiance = vec.where(missed, vec.mul(energy, sky),
                         vec.mul(energy, hit.emission))
    zero = vec.splat((0., 0., 0.), u1)
    new_energy = vec.where(missed, zero, vec.mul(energy, lobe_w))
    # Dead lanes keep their old ray (values are masked by zero energy anyway).
    new_ro = vec.where(missed, ro, new_ro)
    new_rd = vec.where(missed, rd, new_rd)
    return new_ro, new_rd, new_energy, radiance
