"""Vectorized intersection primitives (pure jnp).

These are the correctness-reference implementations of the reference's device
intersectors (`RayTraceShader.compute:156-291`), written as dense batched ops:
every function takes ``(R, 3)`` ray SoA arrays and broadcasts against ``(P,)``
primitive SoA arrays, returning ``(R, P)`` (or ``(R,)``) results that the
caller reduces with argmin. The Pallas fast path reuses the same math on VMEM
tiles.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.math3d import INF, EPSILON


def intersect_ground(ro, rd):
    """Infinite plane y=0 (reference IntersectGroundPlane, compute:156-172).

    Returns t: (R,), +INF on miss.
    """
    dy = rd[..., 1]
    safe_dy = jnp.where(jnp.abs(dy) < 1e-20, 1e-20, dy)
    t = -ro[..., 1] / safe_dy
    return jnp.where(t > 0, t, INF)


def intersect_spheres(ro, rd, center, radius):
    """Batched ray-sphere (reference IntersectSphere, compute:175-196).

    Args:
      ro, rd: (R, 3) origins / unit directions.
      center: (S, 3), radius: (S,).
    Returns:
      t: (R, S), +INF where no positive hit.
    """
    oc = ro[:, None, :] - center[None, :, :]                  # (R, S, 3)
    p1 = -jnp.sum(rd[:, None, :] * oc, axis=-1)               # (R, S)
    p2sqr = p1 * p1 - jnp.sum(oc * oc, axis=-1) + (radius * radius)[None, :]
    p2 = jnp.sqrt(jnp.maximum(p2sqr, 0.0))
    t_near = p1 - p2
    t = jnp.where(t_near > 0, t_near, p1 + p2)
    return jnp.where((p2sqr >= 0) & (t > 0), t, INF)


def intersect_triangles(ro, rd, v0, v1, v2):
    """Batched Moller-Trumbore with backface culling
    (reference IntersectTriangle_MT97, compute:199-234).

    Args:
      ro, rd: (R, 3); v0/v1/v2: (T, 3) world-space.
    Returns:
      t, u, v: (R, T); t = +INF on miss.
    """
    e1 = v1 - v0                                              # (T, 3)
    e2 = v2 - v0
    pvec = jnp.cross(rd[:, None, :], e2[None, :, :])          # (R, T, 3)
    det = jnp.sum(e1[None, :, :] * pvec, axis=-1)             # (R, T)
    front = det >= EPSILON                                    # backface cull
    inv_det = 1.0 / jnp.where(front, det, 1.0)
    tvec = ro[:, None, :] - v0[None, :, :]                    # (R, T, 3)
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1[None, :, :])                    # (R, T, 3)
    v = jnp.sum(rd[:, None, :] * qvec, axis=-1) * inv_det
    t = jnp.sum(e2[None, :, :] * qvec, axis=-1) * inv_det
    valid = front & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t > 0)
    return jnp.where(valid, t, INF), u, v


def intersect_aabb(ro, inv_rd, vmin, vmax):
    """Batched slab test (correct version of IntersectBVHNode, compute:271-291).

    Unlike the reference we cull against positive t (the reference returns hits
    behind the ray; SURVEY.md defect list says implement the correct test).

    Args:
      ro: (R, 3); inv_rd: (R, 3) precomputed safe reciprocal directions.
      vmin, vmax: (B, 3).
    Returns:
      (hit, t_enter): ((R, B) bool, (R, B) float32 entry distance, clamped >= 0).
    """
    t1 = (vmin[None, :, :] - ro[:, None, :]) * inv_rd[:, None, :]  # (R, B, 3)
    t2 = (vmax[None, :, :] - ro[:, None, :]) * inv_rd[:, None, :]
    t_min = jnp.max(jnp.minimum(t1, t2), axis=-1)
    t_max = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit = (t_max >= t_min) & (t_max > 0)
    return hit, jnp.maximum(t_min, 0.0)


def safe_inv_dir(rd):
    """Reciprocal direction guarded against division by zero (the reference
    adds EPSILON to the raw direction, compute:282-283; we clamp magnitude)."""
    return 1.0 / jnp.where(jnp.abs(rd) < 1e-12, jnp.where(rd < 0, -1e-12, 1e-12), rd)
