"""LBVH build + traversal correctness: invariants and brute-force agreement."""

import numpy as np
import jax.numpy as jnp
import pytest

from unityraytracer_tpu import RenderConfig, SceneBuilder, Material
from unityraytracer_tpu.models import primitives as P
from unityraytracer_tpu.ops.bvh import (build_cluster_accel, morton_encode_3d,
                                        validate_accel, _radix_tree)
from unityraytracer_tpu.ops.trace import trace_brute
from unityraytracer_tpu.ops.traverse import make_accel_tracer
from unityraytracer_tpu.utils.math3d import trs_matrix


def _mixed_scene():
    b = SceneBuilder()
    v, f, n = P.icosphere(2)
    b.add_mesh(v, f, transform=trs_matrix((0, 1, 0), (0, 30, 0), 2.0),
               material=Material(albedo=(0.8, 0.3, 0.2), specular=(0.05,) * 3))
    v2, f2, n2 = P.cube()
    b.add_mesh(v2, f2, transform=trs_matrix((2.5, 0.5, 0.5), (0, 20, 0)),
               material=Material(albedo=(0.2, 0.6, 0.9), specular=(0, 0, 0)))
    v3, f3, n3 = P.cylinder()
    b.add_mesh(v3, f3, transform=trs_matrix((-2.5, 1.0, 1.5), (20, 0, 10)))
    b.add_sphere((-2.5, 0.7, -2), 0.7)
    b.set_skybox(np.ones((4, 8, 3), np.float32) * 0.6)
    return b.build()


SCENE = _mixed_scene()


def _random_rays(R, seed=0):
    rng = np.random.default_rng(seed)
    ro = rng.uniform(-4, 4, (R, 3)).astype(np.float32) + np.array([0, 2, -6], np.float32)
    rd = rng.normal(size=(R, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    # Rays are component-SoA tuples (ops/vec.py).
    to3 = lambda a: tuple(jnp.asarray(a[:, k]) for k in range(3))
    return to3(ro), to3(rd)


def test_morton_orders_locality():
    codes = morton_encode_3d(np.array([[0, 0, 0], [1, 1, 1], [0.5, 0.5, 0.5]],
                                      np.float64))
    assert codes[0] < codes[2] < codes[1]


def test_radix_tree_structure_small():
    keys = np.sort(np.unique(np.random.default_rng(0).integers(
        0, 2**60, 37, dtype=np.uint64)))
    left, right = _radix_tree(keys)
    n = len(keys)
    # Every leaf and internal node referenced exactly once except the root.
    refs = np.concatenate([left, right])
    assert len(refs) == 2 * (n - 1)
    assert sorted(refs) == sorted(set(range(1, 2 * n - 1)))


@pytest.mark.parametrize("cluster_size", [4, 16, 64])
def test_accel_invariants(cluster_size):
    accel = build_cluster_accel(SCENE.triangles, cluster_size=cluster_size,
                                use_native=False)
    validate_accel(accel, SCENE.triangles)


@pytest.mark.parametrize("tracer", ["bvh", "cluster"])
def test_accel_matches_brute(tracer):
    accel = build_cluster_accel(SCENE.triangles, cluster_size=16,
                                use_native=False)
    ro, rd = _random_rays(256)
    hb = trace_brute(SCENE, ro, rd)
    cfg = RenderConfig(tracer=tracer, ray_chunk=512, cluster_size=16)
    ha = make_accel_tracer(SCENE, accel, cfg)(ro, rd)
    np.testing.assert_allclose(np.asarray(hb.t), np.asarray(ha.t),
                               rtol=1e-4, atol=1e-4)
    for k in range(3):
        np.testing.assert_allclose(np.asarray(hb.normal[k]),
                                   np.asarray(ha.normal[k]), atol=1e-3)
        np.testing.assert_array_equal(np.asarray(hb.albedo[k]),
                                      np.asarray(ha.albedo[k]))


def test_single_cluster_scene():
    # Tiny mesh -> C == 1 (leaf root, no internal nodes).
    b = SceneBuilder()
    v, f, n = P.quad()
    b.add_mesh(v, f, transform=trs_matrix((0, 1, 2), (0, 0, 0), 2.0))
    b.set_skybox(np.ones((2, 4, 3), np.float32))
    scene = b.build()
    accel = build_cluster_accel(scene.triangles, cluster_size=64,
                                use_native=False)
    assert accel.num_clusters == 1
    validate_accel(accel, scene.triangles)
    ro, rd = _random_rays(64, seed=3)
    hb = trace_brute(scene, ro, rd)
    for tracer in ("bvh", "cluster"):
        cfg = RenderConfig(tracer=tracer, ray_chunk=128, cluster_size=64)
        ha = make_accel_tracer(scene, accel, cfg)(ro, rd)
        np.testing.assert_allclose(np.asarray(hb.t), np.asarray(ha.t),
                                   rtol=1e-4, atol=1e-4)


def test_empty_triangles_accel():
    b = SceneBuilder()
    b.add_sphere((0, 1, 0), 1.0)
    b.set_skybox(np.ones((2, 4, 3), np.float32))
    scene = b.build()
    accel = build_cluster_accel(scene.triangles, cluster_size=8,
                                use_native=False)
    ro, rd = _random_rays(32, seed=4)
    cfg = RenderConfig(tracer="cluster", ray_chunk=64, cluster_size=8)
    ha = make_accel_tracer(scene, accel, cfg)(ro, rd)
    hb = trace_brute(scene, ro, rd)
    np.testing.assert_allclose(np.asarray(hb.t), np.asarray(ha.t), rtol=1e-4)


def test_native_matches_python_radix_tree():
    from unityraytracer_tpu import native
    if not native.available():
        pytest.skip("native library not built")
    keys = np.sort(np.unique(np.random.default_rng(1).integers(
        0, 2**62, 500, dtype=np.uint64)))
    lp, rp = _radix_tree(keys)
    ln, rn = native.radix_tree(keys)
    np.testing.assert_array_equal(lp, ln)
    np.testing.assert_array_equal(rp, rn)
