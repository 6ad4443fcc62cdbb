"""Closest-hit tracers: scene -> per-ray Hit records.

``trace_brute`` is the dense correctness reference (the analog of the
reference's Trace, RayTraceShader.compute:364-383, with BVHs replaced by
exhaustive tests). Acceleration-structure tracers live in ``traverse.py``
(pure-jnp LBVH) and ``pallas_trace.py`` (fused TPU kernel); all take/return
component-SoA rays (Vec3 tuples; ops/vec.py) and the same Hit SoA so the
renderer swaps them freely.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..scene import Scene
from ..utils.math3d import INF
from . import vec
from .vec import Vec3
from .intersect import intersect_ground, intersect_spheres, intersect_triangles
from .shade import Hit


def map_chunked(fn, ray_args, chunk: int):
    """Apply ``fn(*ray_args)`` over rays in fixed-size chunks via lax.map.

    Bounds the peak memory of (rays x primitives) intermediates. ``ray_args``
    is a pytree of (N, ...) arrays; ``fn`` must be shape-polymorphic in the
    leading ray dim.
    """
    leaves = jax.tree_util.tree_leaves(ray_args)
    R = leaves[0].shape[0]
    if R <= chunk:
        return fn(*ray_args)
    pad = (-R) % chunk
    n_chunks = (R + pad) // chunk

    def pad_reshape(a):
        if pad:
            a = jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
        return a.reshape(n_chunks, chunk, *a.shape[1:])

    stacked = jax.tree_util.tree_map(pad_reshape, ray_args)
    out = jax.lax.map(lambda xs: fn(*xs), stacked)
    return jax.tree_util.tree_map(
        lambda a: a.reshape(n_chunks * chunk, *a.shape[2:])[:R], out)


def _empty_candidate(shape_like):
    z = jnp.zeros_like(shape_like)
    return dict(t=jnp.full_like(shape_like, INF), normal=(z, z, z),
                material_id=jnp.zeros(shape_like.shape, jnp.int32))


def _ground_candidate(scene: Scene, ro: Vec3, rd: Vec3):
    t = intersect_ground(ro, rd)
    # ground_enabled==0 disables the built-in plane.
    t = jnp.where(scene.ground_enabled > 0, t, INF)
    zeros = jnp.zeros_like(t)
    n = (zeros, jnp.ones_like(t), zeros)
    mid = jnp.broadcast_to(scene.ground_material_id, t.shape).astype(jnp.int32)
    return dict(t=t, normal=n, material_id=mid)


def _sphere_candidate(scene: Scene, ro: Vec3, rd: Vec3):
    sp = scene.spheres
    if sp.count == 0:
        return _empty_candidate(ro[0])
    ts = intersect_spheres(ro, rd, sp.center, sp.radius)  # (R, S)
    best = jnp.argmin(ts, axis=1)
    t = jnp.take_along_axis(ts, best[:, None], axis=1)[:, 0]
    center = vec.gather_rows(sp.center, best)
    pos = vec.add(ro, vec.scale(rd, t))
    n = vec.normalize(vec.sub(pos, center))
    return dict(t=t, normal=n, material_id=sp.material_id[best])


def _triangle_candidate(scene: Scene, ro: Vec3, rd: Vec3):
    tr = scene.triangles
    if tr.count == 0:
        return _empty_candidate(ro[0])
    tt, u, v = intersect_triangles(ro, rd, tr.v0, tr.v1, tr.v2)  # (R, T)
    best = jnp.argmin(tt, axis=1)
    take = lambda a: jnp.take_along_axis(a, best[:, None], axis=1)[:, 0]
    t, bu, bv = take(tt), take(u), take(v)
    # Barycentric smooth-normal blend (compute:263), world space (defect #4 fixed).
    w = 1.0 - bu - bv
    n0 = vec.gather_rows(tr.n0, best)
    n1 = vec.gather_rows(tr.n1, best)
    n2 = vec.gather_rows(tr.n2, best)
    n = vec.add(vec.add(vec.scale(n0, w), vec.scale(n1, bu)), vec.scale(n2, bv))
    return dict(t=t, normal=vec.normalize(n), material_id=tr.material_id[best])


def combine_candidates(scene: Scene, ro: Vec3, rd: Vec3, candidates) -> Hit:
    """Nearest-wins merge of per-source candidates + material gather.

    A sequential where-chain (no stacking) keeps every buffer a dense (N,)
    array.
    """
    best = candidates[0]
    for c in candidates[1:]:
        closer = c["t"] < best["t"]
        best = dict(
            t=jnp.where(closer, c["t"], best["t"]),
            normal=vec.where(closer, c["normal"], best["normal"]),
            material_id=jnp.where(closer, c["material_id"], best["material_id"]),
        )
    bt = best["t"]
    bm = best["material_id"]
    mats = scene.materials
    albedo = vec.gather_rows(mats.albedo, bm)
    specular = vec.gather_rows(mats.specular, bm)
    emission = vec.gather_rows(mats.emission, bm)
    smoothness = mats.smoothness[bm]
    pos = vec.add(ro, vec.scale(rd, bt))
    return Hit(t=bt, position=pos, normal=best["normal"], albedo=albedo,
               specular=specular, emission=emission, smoothness=smoothness)


def trace_brute(scene: Scene, ro: Vec3, rd: Vec3, chunk: int = 8192) -> Hit:
    """Exhaustive closest-hit over ground + spheres + triangles."""

    def body(rox, roy, roz, rdx, rdy, rdz):
        ro_c = (rox, roy, roz)
        rd_c = (rdx, rdy, rdz)
        cands = [
            _ground_candidate(scene, ro_c, rd_c),
            _sphere_candidate(scene, ro_c, rd_c),
            _triangle_candidate(scene, ro_c, rd_c),
        ]
        return combine_candidates(scene, ro_c, rd_c, cands)

    return map_chunked(body, (*ro, *rd), chunk)


def make_brute_tracer(scene: Scene, chunk: int = 8192):
    return functools.partial(trace_brute, scene, chunk=chunk)
