"""Monte-Carlo sampling: tangent frames, power-cosine hemisphere, lens disk.

The reference uses a sequential per-pixel ``frac(sin(...))`` hash RNG
(`RayTraceShader.compute:77-81`) whose stream advances by side effect — not
reproducible in a vectorized rebuild (SURVEY.md defect #8). We use JAX's
counter-based threefry keys at the XLA level and ``pltpu.prng_*`` inside
Pallas kernels; the estimator (hemisphere pdfs, roulette weights) matches the
reference exactly, so converged images agree even though individual sample
streams differ.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.math3d import normalize

PI = 3.14159265


def tangent_frame(n):
    """Orthonormal (tangent, binormal) for unit normals ``n``: (..., 3).

    Mirrors GetTangentSpace (RayTraceShader.compute:89-100): helper axis is
    +x unless |n.x| > 0.99, then +z.
    """
    use_z = jnp.abs(n[..., 0]) > 0.99
    helper = jnp.stack([
        jnp.where(use_z, 0.0, 1.0),
        jnp.zeros_like(n[..., 0]),
        jnp.where(use_z, 1.0, 0.0),
    ], axis=-1)
    tangent = normalize(jnp.cross(n, helper))
    binormal = normalize(jnp.cross(n, tangent))
    return tangent, binormal


def sample_hemisphere(u1, u2, axis, alpha):
    """Power-cosine hemisphere sample about ``axis``.

    cos(theta) = u1^(1/(alpha+1)) (SampleHemisphere, compute:102-111):
    alpha=0 uniform, alpha=1 cosine, large alpha = tight Phong lobe.

    Args:
      u1, u2: (...,) uniforms in [0, 1).
      axis: (..., 3) unit vectors.
      alpha: scalar or (...,) lobe exponent.
    Returns:
      (..., 3) unit directions (may dip below the surface for lobes around a
      reflection vector; the caller's sdot clamp zeroes those, as in the
      reference).
    """
    cos_t = jnp.power(jnp.maximum(u1, 1e-12), 1.0 / (alpha + 1.0))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = 2.0 * PI * u2
    tangent, binormal = tangent_frame(axis)
    return (tangent * (jnp.cos(phi) * sin_t)[..., None]
            + binormal * (jnp.sin(phi) * sin_t)[..., None]
            + axis * cos_t[..., None])


def sample_unit_disk(u1, u2):
    """Concentric-ish polar disk sample for thin-lens DoF: (..., 2)."""
    r = jnp.sqrt(u1)
    phi = 2.0 * PI * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def uniform_from_bits(bits):
    """uint32 random bits -> float32 uniforms in [0, 1).

    Used inside Pallas kernels with ``pltpu.prng_random_bits``: keep the top
    24 bits so the float is exact.
    """
    return (bits >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))
