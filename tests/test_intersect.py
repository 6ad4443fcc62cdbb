"""Unit tests for intersection primitives against analytic ground truth."""

import numpy as np
import jax.numpy as jnp

from unityraytracer_tpu.ops import intersect as I
from unityraytracer_tpu.utils.math3d import INF


def rays(o, d):
    o = np.atleast_2d(np.asarray(o, np.float32))
    d = np.asarray(d, np.float32)
    d = np.atleast_2d(d / np.linalg.norm(d, axis=-1, keepdims=True))
    to3 = lambda a: tuple(jnp.asarray(a[:, k]) for k in range(3))
    return to3(o), to3(d)  # component-SoA rays (ops/vec.py)


def test_ground_hit_and_miss():
    ro, rd = rays([[0, 1, 0], [0, 1, 0], [0, -1, 0]],
                  [[0, -1, 0], [0, 1, 0], [0, -1, 0]])
    t = np.asarray(I.intersect_ground(ro, rd))
    assert np.isclose(t[0], 1.0)
    assert t[1] >= 1e30  # pointing away
    assert t[2] >= 1e30  # below plane going down


def test_sphere_analytic():
    center = jnp.asarray([[0.0, 0.0, 5.0]])
    radius = jnp.asarray([1.0])
    ro, rd = rays([[0, 0, 0]], [[0, 0, 1]])
    t = np.asarray(I.intersect_spheres(ro, rd, center, radius))
    assert np.isclose(t[0, 0], 4.0, atol=1e-5)


def test_sphere_inside_takes_far_root():
    center = jnp.asarray([[0.0, 0.0, 0.0]])
    radius = jnp.asarray([2.0])
    ro, rd = rays([[0, 0, 0]], [[0, 0, 1]])
    t = np.asarray(I.intersect_spheres(ro, rd, center, radius))
    assert np.isclose(t[0, 0], 2.0, atol=1e-5)


def test_sphere_miss():
    center = jnp.asarray([[0.0, 5.0, 5.0]])
    radius = jnp.asarray([1.0])
    ro, rd = rays([[0, 0, 0]], [[0, 0, 1]])
    t = np.asarray(I.intersect_spheres(ro, rd, center, radius))
    assert t[0, 0] >= 1e30


def test_sphere_behind_misses():
    center = jnp.asarray([[0.0, 0.0, -5.0]])
    radius = jnp.asarray([1.0])
    ro, rd = rays([[0, 0, 0]], [[0, 0, 1]])
    t = np.asarray(I.intersect_spheres(ro, rd, center, radius))
    assert t[0, 0] >= 1e30


def test_triangle_hit_t_u_v():
    # CCW-when-seen-from -z in a left-handed system: det>0 for dir +z requires
    # cross(e1,e2) . d > 0.
    v0 = jnp.asarray([[-1.0, -1.0, 3.0]])
    v1 = jnp.asarray([[-1.0, 1.0, 3.0]])
    v2 = jnp.asarray([[1.0, -1.0, 3.0]])
    ro, rd = rays([[-0.5, -0.5, 0]], [[0, 0, 1]])
    t, u, v = I.intersect_triangles(ro, rd, v0, v1, v2)
    t, u, v = np.asarray(t), np.asarray(u), np.asarray(v)
    assert np.isclose(t[0, 0], 3.0, atol=1e-5)
    # barycentric: p = v0 + u*(v1-v0) + v*(v2-v0); p=(-0.5,-0.5) -> u=0.25, v=0.25
    assert np.isclose(u[0, 0], 0.25, atol=1e-5)
    assert np.isclose(v[0, 0], 0.25, atol=1e-5)


def test_triangle_backface_culled():
    # Same triangle, ray from the other side.
    v0 = jnp.asarray([[-1.0, -1.0, 3.0]])
    v1 = jnp.asarray([[-1.0, 1.0, 3.0]])
    v2 = jnp.asarray([[1.0, -1.0, 3.0]])
    ro, rd = rays([[-0.5, -0.5, 6]], [[0, 0, -1]])
    t, _, _ = I.intersect_triangles(ro, rd, v0, v1, v2)
    assert np.asarray(t)[0, 0] >= 1e30


def test_triangle_outside_misses():
    v0 = jnp.asarray([[-1.0, -1.0, 3.0]])
    v1 = jnp.asarray([[-1.0, 1.0, 3.0]])
    v2 = jnp.asarray([[1.0, -1.0, 3.0]])
    ro, rd = rays([[0.9, 0.9, 0]], [[0, 0, 1]])  # outside hypotenuse
    t, _, _ = I.intersect_triangles(ro, rd, v0, v1, v2)
    assert np.asarray(t)[0, 0] >= 1e30


def test_degenerate_triangle_never_hits():
    z = jnp.zeros((1, 3))
    ro, rd = rays([[0, 0, -1]], [[0, 0, 1]])
    t, _, _ = I.intersect_triangles(ro, rd, z, z, z)
    assert np.asarray(t)[0, 0] >= 1e30


def test_aabb_hit_enter_distance():
    ro, rd = rays([[0, 0, -5]], [[0, 0, 1]])
    inv = I.safe_inv_dir(rd)
    vmin = jnp.asarray([[-1.0, -1.0, -1.0]])
    vmax = jnp.asarray([[1.0, 1.0, 1.0]])
    hit, t_enter = I.intersect_aabb(ro, inv, vmin, vmax)
    assert bool(np.asarray(hit)[0, 0])
    assert np.isclose(np.asarray(t_enter)[0, 0], 4.0, atol=1e-4)


def test_aabb_behind_ray_misses():
    ro, rd = rays([[0, 0, 5]], [[0, 0, 1]])
    inv = I.safe_inv_dir(rd)
    vmin = jnp.asarray([[-1.0, -1.0, -1.0]])
    vmax = jnp.asarray([[1.0, 1.0, 1.0]])
    hit, _ = I.intersect_aabb(ro, inv, vmin, vmax)
    assert not bool(np.asarray(hit)[0, 0])


def test_aabb_inside_hits_with_zero_enter():
    ro, rd = rays([[0, 0, 0]], [[0, 0, 1]])
    inv = I.safe_inv_dir(rd)
    vmin = jnp.asarray([[-1.0, -1.0, -1.0]])
    vmax = jnp.asarray([[1.0, 1.0, 1.0]])
    hit, t_enter = I.intersect_aabb(ro, inv, vmin, vmax)
    assert bool(np.asarray(hit)[0, 0])
    assert np.asarray(t_enter)[0, 0] == 0.0


def test_aabb_axis_parallel_ray():
    # Direction with a zero component must not produce NaN verdicts.
    ro, rd = rays([[0.5, 0.5, -5]], [[0, 0, 1]])
    inv = I.safe_inv_dir(rd)
    vmin = jnp.asarray([[0.0, 0.0, -1.0], [2.0, 2.0, -1.0]])
    vmax = jnp.asarray([[1.0, 1.0, 1.0], [3.0, 3.0, 1.0]])
    hit, _ = I.intersect_aabb(ro, inv, vmin, vmax)
    hit = np.asarray(hit)
    assert bool(hit[0, 0]) and not bool(hit[0, 1])
