"""Closest-hit tracers: scene -> per-ray Hit records.

``trace_brute`` is the dense correctness reference (the analog of the
reference's Trace, RayTraceShader.compute:364-383, with BVHs replaced by
exhaustive tests). Acceleration-structure tracers live in ``traverse.py``
(pure-jnp LBVH) and ``pallas_trace.py`` (fused TPU kernel); all return the
same Hit SoA so the renderer swaps them freely.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..scene import Scene
from ..utils.math3d import INF, normalize
from .intersect import intersect_ground, intersect_spheres, intersect_triangles
from .shade import Hit


def map_chunked(fn, ray_args, chunk: int):
    """Apply ``fn(*ray_args)`` over rays in fixed-size chunks via lax.map.

    Bounds the peak memory of (rays x primitives) intermediates. ``fn`` must
    be shape-polymorphic in the leading ray dim and return a pytree of arrays
    with that leading dim.
    """
    R = ray_args[0].shape[0]
    if R <= chunk:
        return fn(*ray_args)
    pad = (-R) % chunk
    n_chunks = (R + pad) // chunk

    def pad_reshape(a):
        if pad:
            a = jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
        return a.reshape(n_chunks, chunk, *a.shape[1:])

    stacked = tuple(pad_reshape(a) for a in ray_args)
    out = jax.lax.map(lambda xs: fn(*xs), stacked)
    return jax.tree_util.tree_map(
        lambda a: a.reshape(n_chunks * chunk, *a.shape[2:])[:R], out)


def _empty_candidate(R):
    z3 = jnp.zeros((R, 3), jnp.float32)
    return dict(t=jnp.full((R,), INF), normal=z3, material_id=jnp.zeros((R,), jnp.int32))


def _ground_candidate(scene: Scene, ro, rd):
    t = intersect_ground(ro, rd)
    # ground_enabled==0 disables the built-in plane.
    t = jnp.where(scene.ground_enabled > 0, t, INF)
    n = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], jnp.float32), ro.shape)
    mid = jnp.broadcast_to(scene.ground_material_id, t.shape)
    return dict(t=t, normal=n, material_id=mid)


def _sphere_candidate(scene: Scene, ro, rd):
    sp = scene.spheres
    if sp.count == 0:
        return _empty_candidate(ro.shape[0])
    ts = intersect_spheres(ro, rd, sp.center, sp.radius)  # (R, S)
    best = jnp.argmin(ts, axis=1)
    t = jnp.take_along_axis(ts, best[:, None], axis=1)[:, 0]
    center = sp.center[best]
    pos = ro + rd * t[:, None]
    n = normalize(pos - center)
    return dict(t=t, normal=n, material_id=sp.material_id[best])


def _triangle_candidate(scene: Scene, ro, rd):
    tr = scene.triangles
    if tr.count == 0:
        return _empty_candidate(ro.shape[0])
    tt, u, v = intersect_triangles(ro, rd, tr.v0, tr.v1, tr.v2)  # (R, T)
    best = jnp.argmin(tt, axis=1)
    take = lambda a: jnp.take_along_axis(a, best[:, None], axis=1)[:, 0]
    t, bu, bv = take(tt), take(u), take(v)
    # Barycentric smooth-normal blend (compute:263), world space (defect #4 fixed).
    w = 1.0 - bu - bv
    n = (tr.n0[best] * w[:, None] + tr.n1[best] * bu[:, None]
         + tr.n2[best] * bv[:, None])
    return dict(t=t, normal=normalize(n), material_id=tr.material_id[best])


def combine_candidates(scene: Scene, ro, rd, candidates) -> Hit:
    """Nearest-wins merge of per-source candidate hits + material gather."""
    t = jnp.stack([c["t"] for c in candidates], axis=0)          # (C, R)
    n = jnp.stack([c["normal"] for c in candidates], axis=0)     # (C, R, 3)
    m = jnp.stack([c["material_id"] for c in candidates], axis=0)
    win = jnp.argmin(t, axis=0)                                   # (R,)
    r_idx = jnp.arange(t.shape[1])
    bt = t[win, r_idx]
    bn = n[win, r_idx]
    bm = m[win, r_idx]
    albedo, specular, emission, smoothness = scene.materials.take(bm)
    pos = ro + rd * bt[:, None]
    return Hit(t=bt, position=pos, normal=bn, albedo=albedo,
               specular=specular, emission=emission, smoothness=smoothness)


def trace_brute(scene: Scene, ro, rd, chunk: int = 8192) -> Hit:
    """Exhaustive closest-hit over ground + spheres + triangles."""

    def body(ro_c, rd_c):
        cands = [
            _ground_candidate(scene, ro_c, rd_c),
            _sphere_candidate(scene, ro_c, rd_c),
            _triangle_candidate(scene, ro_c, rd_c),
        ]
        return combine_candidates(scene, ro_c, rd_c, cands)

    return map_chunked(body, (ro, rd), chunk)


def make_brute_tracer(scene: Scene, chunk: int = 8192):
    return functools.partial(trace_brute, scene, chunk=chunk)
