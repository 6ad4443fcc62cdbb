"""Content layer tests: primitives, OBJ IO, HDR IO, smooth normals, fixtures."""

import os

import numpy as np
import pytest

from unityraytracer_tpu.scene import compute_smooth_normals
from unityraytracer_tpu.models import primitives as P
from unityraytracer_tpu.models import fixtures
from unityraytracer_tpu.models.obj import load_obj, save_obj
from unityraytracer_tpu.models.skybox import (float_to_rgbe, gradient_sky,
                                              load_hdr, rgbe_to_float,
                                              save_hdr, sun_sky)


@pytest.mark.parametrize("gen,kw", [
    (P.quad, {}), (P.cube, {}), (P.uv_sphere, {}), (P.icosphere, {}),
    (P.cylinder, {}), (P.capsule, {}), (P.plane, {}),
])
def test_primitive_well_formed(gen, kw):
    v, f, n = gen(**kw)
    assert v.ndim == 2 and v.shape[1] == 3
    assert f.ndim == 2 and f.shape[1] == 3
    assert n.shape == v.shape
    assert f.min() >= 0 and f.max() < len(v)
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-4)
    # Winding: geometric normals align with vertex normals (outward faces).
    tri = v[f]
    gn = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    an = n[f].mean(axis=1)
    assert (np.sum(gn * an, axis=1) >= -1e-6).all()


def test_sphere_primitives_on_sphere():
    for gen in (P.uv_sphere, P.icosphere):
        v, f, n = gen()
        np.testing.assert_allclose(np.linalg.norm(v, axis=1), 0.5, atol=1e-5)


def test_cube_extents():
    v, _, _ = P.cube()
    np.testing.assert_allclose(v.min(0), -0.5)
    np.testing.assert_allclose(v.max(0), 0.5)


def test_cylinder_capsule_extents():
    v, _, _ = P.cylinder()
    np.testing.assert_allclose(v[:, 1].min(), -1.0, atol=1e-6)
    np.testing.assert_allclose(v[:, 1].max(), 1.0, atol=1e-6)
    v, _, _ = P.capsule()
    np.testing.assert_allclose(v[:, 1].min(), -1.0, atol=1e-6)
    np.testing.assert_allclose(v[:, 1].max(), 1.0, atol=1e-6)


def test_smooth_normals_sphere():
    # Smooth normals of an icosphere ~ radial directions.
    v, f, _ = P.icosphere(2)
    n = compute_smooth_normals(v, f)
    radial = v / np.linalg.norm(v, axis=1, keepdims=True)
    dots = np.sum(n * radial, axis=1)
    assert dots.min() > 0.98


def test_smooth_normals_welds_duplicates():
    # Two triangles sharing an edge via duplicated vertices: welded normals
    # must agree on the shared positions (ComputeNormals semantics).
    verts = np.array([
        [0, 0, 0], [1, 0, 0], [0, 0, 1],     # tri A
        [1, 0, 0], [1, 0, 1], [0, 0, 1],     # tri B (duplicates of 1 and 2)
    ], np.float32)
    faces = np.array([[0, 2, 1], [3, 5, 4]])
    n = compute_smooth_normals(verts, faces)
    np.testing.assert_allclose(n[1], n[3], atol=1e-6)
    np.testing.assert_allclose(n[2], n[5], atol=1e-6)


def test_obj_roundtrip(tmp_path):
    v, f, n = P.icosphere(1)
    path = str(tmp_path / "ico.obj")
    save_obj(path, v, f, n)
    v2, f2, n2 = load_obj(path)
    np.testing.assert_allclose(v, v2, atol=1e-5)
    np.testing.assert_array_equal(f, f2)
    np.testing.assert_allclose(n, n2, atol=1e-5)


def test_obj_polygon_fan_and_forms():
    lines = [
        "v 0 0 0", "v 1 0 0", "v 1 1 0", "v 0 1 0",
        "f 1 2 3 4",           # quad -> 2 tris
        "f 1/1 2/2 3/3",       # v/vt form
        "f -4 -3 -2",          # negative indices
    ]
    v, f, n = load_obj(lines)
    assert len(v) == 4
    assert len(f) == 4
    assert n is None  # not all faces had normals
    assert f.min() >= 0 and f.max() <= 3


def test_hdr_roundtrip(tmp_path):
    img = sun_sky(32, 64).astype(np.float32)
    path = str(tmp_path / "sky.hdr")
    save_hdr(path, img)
    back = load_hdr(path)
    assert back.shape == img.shape
    # RGBE has ~1% mantissa precision.
    rel = np.abs(back - img) / np.maximum(img, 1e-3)
    assert np.median(rel) < 0.01
    assert rel.max() < 0.05


def test_rgbe_zero_and_bright():
    # Note: RGBE shares one exponent, so channels >256x dimmer than the max
    # quantize to zero — only check channels within the shared dynamic range.
    vals = np.array([[[0, 0, 0], [1000.0, 500.0, 30.0]]], np.float32)
    back = rgbe_to_float(float_to_rgbe(vals))
    np.testing.assert_allclose(back[0, 0], 0.0)
    np.testing.assert_allclose(back[0, 1], vals[0, 1], rtol=0.02, atol=4.0)


def test_fixture_scene1_inventory():
    s = fixtures.scene1()
    assert s.num_spheres == 8           # Scene1.unity sphere-collider count
    assert s.num_triangles > 50         # 2 quads + 2 cubes + cylinder
    assert float(np.asarray(s.ground_enabled)) == 1.0
    # One emissive sphere (Scene1.unity:1038).
    em = np.asarray(s.materials.emission)
    assert (em.max(axis=1) > 0.1).sum() == 1


def test_fixture_sample_scene_inventory():
    s = fixtures.sample_scene()
    assert s.num_spheres == 3
    assert s.num_triangles > 20


def test_bench_scene_size():
    s = fixtures.bench_scene(n_tris=5000)
    assert s.num_triangles >= 5000


def test_gradient_sky_shape():
    sky = gradient_sky(16, 32)
    assert sky.shape == (16, 32, 3)
    assert (sky >= 0).all()
    # Zenith brighter blue than nadir.
    assert sky[0, 0, 2] > sky[-1, 0, 2]


def test_scene_builder_remove():
    from unityraytracer_tpu import SceneBuilder
    b = SceneBuilder()
    b.add_sphere((0, 1, 0), 1.0)
    h_sphere = b.last_handle
    b.add_sphere((3, 1, 0), 1.0)
    v, f, n = P.quad()
    b.add_mesh(v, f)
    h_mesh = b.last_handle
    b.add_mesh(v, f)
    b.remove(h_sphere)
    b.remove(h_mesh)
    s = b.build()
    assert s.num_spheres == 1
    assert s.num_triangles == 2  # one quad left


def test_hdr_rle_scanlines(tmp_path):
    # Hand-encode a new-style RLE scanline file and decode it.
    import struct as _struct
    H, W = 2, 16
    img = np.zeros((H, W, 3), np.float32)
    img[0, :, 0] = 1.0   # constant red row -> run-encodable
    img[1, :, 1] = np.linspace(0.1, 1.0, W)  # varying -> literals
    rgbe = float_to_rgbe(img)
    path = tmp_path / "rle.hdr"
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {H} +X {W}\n".encode())
        for row in range(H):
            f.write(bytes([2, 2, (W >> 8) & 0xFF, W & 0xFF]))
            for ch in range(4):
                col = rgbe[row, :, ch]
                if np.all(col == col[0]):
                    f.write(bytes([128 + W, int(col[0])]))      # one run
                else:
                    f.write(bytes([W]) + bytes(col.tolist()))    # literals
    back = load_hdr(str(path))
    rel = np.abs(back - img) / np.maximum(img, 1e-2)
    assert rel.max() < 0.05


def test_hdr_old_style_rle_scanlines(tmp_path):
    # Legacy Radiance old-style RLE: records are raw RGBE pixels except
    # (1, 1, 1, n), which repeats the previous pixel n << rshift times
    # (rshift += 8 per consecutive marker). W < 8 forces the non-new-style
    # branch; also covers a >255 repeat via chained markers on a wide row.
    H, W = 2, 4
    img = np.zeros((H, W, 3), np.float32)
    img[0, :] = [2.0, 0.5, 0.25]          # constant row -> one repeat
    img[1, :] = [[1, 0, 0], [1, 0, 0], [0, 1, 0], [0, 1, 0]]
    rgbe = float_to_rgbe(img)
    path = tmp_path / "old_rle.hdr"
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {H} +X {W}\n".encode())
        f.write(bytes(rgbe[0, 0].tolist()) + bytes([1, 1, 1, 3]))
        f.write(bytes(rgbe[1, 0].tolist()) + bytes([1, 1, 1, 1])
                + bytes(rgbe[1, 2].tolist()) + bytes([1, 1, 1, 1]))
    back = load_hdr(str(path))
    rel = np.abs(back - img) / np.maximum(img, 1e-2)
    assert rel.max() < 0.05

    # Chained markers: 300 = 44 + (1 << 8) repeats on a 512-wide row
    # (flat fast path must NOT trigger: markers present).
    W2 = 512
    img2 = np.broadcast_to(np.float32([0.5, 1.0, 2.0]), (1, W2, 3)).copy()
    rgbe2 = float_to_rgbe(img2)
    p2 = tmp_path / "old_rle_chain.hdr"
    with open(p2, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y 1 +X {W2}\n".encode())
        px = bytes(rgbe2[0, 0].tolist())
        # 1 literal + 255 repeat + chained (1 << 8) repeat = 512... chain
        # semantics: second consecutive marker count = e << 8.
        f.write(px + bytes([1, 1, 1, 255]) + bytes([1, 1, 1, 1]))
    back2 = load_hdr(str(p2))
    rel2 = np.abs(back2 - img2) / np.maximum(img2, 1e-2)
    assert back2.shape == (1, W2, 3) and rel2.max() < 0.05


def test_load_mtl_mapping():
    from unityraytracer_tpu.models.obj import load_mtl

    mtl = load_mtl([
        "newmtl red",
        "Kd 0.8 0.1 0.1",
        "Ks 0.2 0.2 0.2",
        "Ke 1.0 2.0 3.0",
        "Ns 1000",
        "newmtl dull",
        "Kd 0.3 0.3 0.3",
        "Ns 1",
    ])
    assert set(mtl) == {"red", "dull"}
    np.testing.assert_allclose(mtl["red"].albedo, (0.8, 0.1, 0.1))
    np.testing.assert_allclose(mtl["red"].emission, (1.0, 2.0, 3.0))
    # Ns=1000 -> alpha=1000 -> smoothness 1; Ns=1 -> smoothness 0
    # (inverts alpha = 1000^(s^2), RayTraceShader.compute:401).
    assert abs(mtl["red"].smoothness - 1.0) < 1e-6
    assert mtl["dull"].smoothness == 0.0


def test_load_obj_with_materials_groups_faces():
    from unityraytracer_tpu.models.obj import load_obj_with_materials

    obj = [
        "mtllib x.mtl",
        "v 0 0 0", "v 1 0 0", "v 1 1 0", "v 0 1 0",
        "usemtl a",
        "f 1 2 3",
        "usemtl b",
        "f 1 3 4",
        "f 1 2 4",
    ]
    from unityraytracer_tpu.scene import Material

    lib = {"a": Material(albedo=(1, 0, 0)), "b": Material(albedo=(0, 1, 0))}
    verts, faces, normals, face_mat, mats = load_obj_with_materials(
        obj, mtl_loader=lambda name: lib)
    assert faces.shape == (3, 3)
    np.testing.assert_array_equal(face_mat, [1, 2, 2])
    np.testing.assert_allclose(mats[1].albedo, (1, 0, 0))
    np.testing.assert_allclose(mats[2].albedo, (0, 1, 0))


def test_add_obj_builds_scene_with_mtl(tmp_path):
    from unityraytracer_tpu import SceneBuilder

    mtl_path = tmp_path / "cube.mtl"
    mtl_path.write_text(
        "newmtl glow\nKd 0.1 0.2 0.3\nKe 4 5 6\nNs 31.62\n")
    obj_path = tmp_path / "tri.obj"
    obj_path.write_text(
        "mtllib cube.mtl\n"
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 0 0 1\n"
        "usemtl glow\nf 1 2 3\n"
        "usemtl missing\nf 1 3 4\n")
    b = SceneBuilder()
    b.add_obj(str(obj_path))
    b.set_skybox(np.ones((2, 4, 3), np.float32))
    scene = b.build()
    assert scene.num_triangles == 2
    # One triangle carries the .mtl emission, the unknown usemtl gets default.
    emis = np.asarray(scene.materials.emission)[
        np.asarray(scene.triangles.material_id)]
    assert (np.isclose(emis, (4, 5, 6)).all(axis=1)).sum() == 1


def test_export_normals_obj(tmp_path):
    from unityraytracer_tpu import SceneBuilder
    from unityraytracer_tpu.utils.debugviz import export_normals_obj

    b = SceneBuilder()
    v, f, n = P.icosphere(1)
    b.add_mesh(v, f, normals=n)
    b.set_skybox(np.ones((2, 4, 3), np.float32))
    scene = b.build()
    path = str(tmp_path / "normals.obj")
    export_normals_obj(scene.triangles, path, scale=0.5)
    lines = open(path).read().strip().splitlines()
    n_v = sum(1 for l in lines if l.startswith("v "))
    n_l = sum(1 for l in lines if l.startswith("l "))
    assert n_l == scene.num_triangles * 3  # one segment per corner (DrawNormals)
    assert n_v == 2 * n_l
    # Segment direction == stored normal for the first corner.
    p = np.array([float(x) for x in lines[0].split()[1:]])
    q = np.array([float(x) for x in lines[1].split()[1:]])
    d = (q - p) / 0.5
    np.testing.assert_allclose(d, np.asarray(scene.triangles.n0)[0], atol=1e-5)
