"""Unity .unity scene importer (models/unity_scene.py).

A synthetic scene string keeps the core parser hermetic; when the reference
mirror is present, the importer is cross-validated against the
hand-transcribed fixtures (models/fixtures.py) — the two independent
readings of the same YAML must agree object-for-object.
"""
import os

import numpy as np
import pytest

from unityraytracer_tpu.models import fixtures
from unityraytracer_tpu.models.unity_scene import (RAYTRACE_MASTER_GUID,
                                                   RAYTRACE_OBJECT_GUID,
                                                   load_unity_scene)

REF = "/root/reference/Assets/Scenes"


def _doc(cls, fid, body):
    return f"--- !u!{cls} &{fid}\n{body}"


def _go(fid, name, active=1):
    return _doc(1, fid, f"GameObject:\n  m_Name: {name}\n"
                        f"  m_IsActive: {active}\n")


def _tf(fid, go, pos, scale=(1, 1, 1), quat=(0, 0, 0, 1), father=0):
    return _doc(4, fid, (
        "Transform:\n"
        f"  m_GameObject: {{fileID: {go}}}\n"
        f"  m_LocalRotation: {{x: {quat[0]}, y: {quat[1]}, z: {quat[2]},"
        f" w: {quat[3]}}}\n"
        f"  m_LocalPosition: {{x: {pos[0]}, y: {pos[1]}, z: {pos[2]}}}\n"
        f"  m_LocalScale: {{x: {scale[0]}, y: {scale[1]}, z: {scale[2]}}}\n"
        f"  m_Father: {{fileID: {father}}}\n"))


def _rto(fid, go, enabled=1, albedo=(0.2, 0.4, 0.8), smooth=0.5):
    return _doc(114, fid, (
        "MonoBehaviour:\n"
        f"  m_GameObject: {{fileID: {go}}}\n"
        f"  m_Enabled: {enabled}\n"
        f"  m_Script: {{fileID: 11500000, guid: {RAYTRACE_OBJECT_GUID},"
        " type: 3}\n"
        f"  albedoColor: {{r: {albedo[0]}, g: {albedo[1]}, b: {albedo[2]},"
        " a: 1}\n"
        f"  smoothness: {smooth}\n"))


def _collider(fid, go, radius=0.5):
    return _doc(135, fid, (
        "SphereCollider:\n"
        f"  m_GameObject: {{fileID: {go}}}\n"
        "  m_Enabled: 1\n"
        f"  m_Radius: {radius}\n"
        "  m_Center: {x: 0, y: 0, z: 0}\n"))


def _meshfilter(fid, go, mesh_id):
    return _doc(33, fid, (
        "MeshFilter:\n"
        f"  m_GameObject: {{fileID: {go}}}\n"
        f"  m_Mesh: {{fileID: {mesh_id}, guid: 0000000000000000e000000000000000,"
        " type: 0}\n"))


def _camera(fid, go, fov=70):
    return _doc(20, fid, (
        "Camera:\n"
        f"  m_GameObject: {{fileID: {go}}}\n"
        f"  field of view: {fov}\n"))


def _master(fid, go, bounces=3, rays=2):
    return _doc(114, fid, (
        "MonoBehaviour:\n"
        f"  m_GameObject: {{fileID: {go}}}\n"
        "  m_Enabled: 1\n"
        f"  m_Script: {{fileID: 11500000, guid: {RAYTRACE_MASTER_GUID},"
        " type: 3}\n"
        f"  numBounces: {bounces}\n"
        f"  numRays: {rays}\n"))


def _write(tmp_path, docs):
    text = "%YAML 1.1\n%TAG !u! tag:unity3d.com,2011:\n" + "".join(docs)
    p = str(tmp_path / "scene.unity")
    open(p, "w").write(text)
    return p


def test_mesh_guid_resolution(tmp_path):
    # Non-builtin mesh references resolve through the project's .meta guid
    # index (the reference flattens ANY MeshFilter.sharedMesh,
    # RayTraceMaster.cs:298-305): a synthesized Unity project layout with
    # an OBJ asset + its .meta must import with the mesh present and match
    # SceneBuilder.add_obj on the same file. Unresolvable guids still
    # warn-and-skip.
    from unityraytracer_tpu.scene import SceneBuilder

    guid = "ab12cd34ef56ab12cd34ef56ab12cd34"
    assets = tmp_path / "Assets"
    (assets / "Meshes").mkdir(parents=True)
    (assets / "Scenes").mkdir()
    obj_path = assets / "Meshes" / "wedge.obj"
    obj_path.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 0 0 1\n"
        "f 1 2 3\nf 1 3 4\n")
    (assets / "Meshes" / "wedge.obj.meta").write_text(
        f"fileFormatVersion: 2\nguid: {guid}\n"
        "ModelImporter:\n  serializedVersion: 21300\n")
    docs = [
        _go(100, "Wedge"), _tf(101, 100, (2, 1, 0)),
        _rto(102, 100),
        _doc(33, 103, ("MeshFilter:\n"
                       "  m_GameObject: {fileID: 100}\n"
                       f"  m_Mesh: {{fileID: 4300000, guid: {guid},"
                       " type: 3}\n")),
        # unresolvable guid: warn-and-skip (unchanged behavior)
        _go(110, "Ghost"), _tf(111, 110, (0, 0, 9)),
        _rto(112, 110),
        _doc(33, 113, ("MeshFilter:\n"
                       "  m_GameObject: {fileID: 110}\n"
                       "  m_Mesh: {fileID: 4300000, guid: "
                       "ffffffffffffffffffffffffffffffff, type: 3}\n")),
    ]
    text = "%YAML 1.1\n%TAG !u! tag:unity3d.com,2011:\n" + "".join(docs)
    p = assets / "Scenes" / "scene.unity"
    p.write_text(text)
    scene, _, _ = load_unity_scene(str(p), aspect=1.0)
    assert scene.num_triangles == 2              # wedge loaded, ghost skipped

    b = SceneBuilder()
    tr = np.eye(4, dtype=np.float32)
    tr[:3, 3] = (2, 1, 0)
    b.add_obj(str(obj_path), transform=tr)
    b.set_skybox(np.ones((2, 4, 3), np.float32))
    ref = b.build()
    np.testing.assert_allclose(np.asarray(scene.triangles.v0),
                               np.asarray(ref.triangles.v0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(scene.triangles.v2),
                               np.asarray(ref.triangles.v2), atol=1e-6)


def test_synthetic_scene_core(tmp_path):
    docs = [
        # sphere: scaled parent -> lossyScale applies to collider radius
        _go(100, "Parent"), _tf(101, 100, (1, 0, 0), scale=(2, 2, 2)),
        _go(110, "Ball"), _tf(111, 110, (0, 1, 0), father=101),
        _rto(112, 110, albedo=(1, 0, 0)), _collider(113, 110, radius=0.5),
        # cube mesh
        _go(120, "Box"), _tf(121, 120, (3, 1, 0)),
        _rto(122, 120), _meshfilter(123, 120, 10202),
        # disabled component: excluded by default
        _go(130, "Off"), _tf(131, 130, (9, 9, 9)),
        _rto(132, 130, enabled=0), _collider(133, 130),
        # inactive GameObject: always excluded
        _go(140, "Hidden", active=0), _tf(141, 140, (8, 8, 8)),
        _rto(142, 140), _collider(143, 140),
        # non-builtin mesh: skipped with a warning
        _go(150, "Custom"), _tf(151, 150, (0, 0, 5)),
        _rto(152, 150), _meshfilter(153, 150, 4300000),
        # camera + master
        _go(160, "Main Camera"), _tf(161, 160, (0, 2, -9)),
        _camera(162, 160, fov=70), _master(163, 160),
    ]
    p = _write(tmp_path, docs)
    scene, cam, st = load_unity_scene(p, aspect=1.0)
    assert int(scene.spheres.count) == 1
    c = np.asarray(scene.spheres.center)[0]
    # parent scale 2: world pos = (1,0,0) + 2*(0,1,0); radius 0.5*0.5? no:
    # collider.radius(0.5) * max(lossyScale 2) = 1.0
    np.testing.assert_allclose(c, [1.0, 2.0, 0.0], atol=1e-6)
    assert float(np.asarray(scene.spheres.radius)[0]) == pytest.approx(1.0)
    assert scene.num_triangles == 12            # one cube, custom skipped
    assert st == {"numBounces": 3, "numRays": 2, "skybox_guid": None}
    np.testing.assert_allclose(np.asarray(cam.position), [0, 2, -9],
                               atol=1e-6)

    # include_disabled pulls the disabled sphere back in (but never the
    # inactive GameObject).
    scene2, _, _ = load_unity_scene(p, aspect=1.0, include_disabled=True)
    assert int(scene2.spheres.count) == 2


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference mirror absent")
@pytest.mark.parametrize("name,fx,runtime", [
    ("Scene1.unity", fixtures.scene1, (6, 936)),
    ("SampleScene.unity", fixtures.sample_scene, (3, 108)),
])
def test_reference_scene_matches_fixtures(name, fx, runtime):
    # include_disabled=True mirrors the fixtures' full inventory; the
    # default load is the reference's RUNTIME registration set (Scene1
    # ships its two mirror quads + two spheres with the component
    # disabled).
    path = os.path.join(REF, name)
    scene, cam, st = load_unity_scene(path, include_disabled=True)
    ref = fx()

    def spheres(s):
        c = np.asarray(s.spheres.center)[:s.spheres.count]
        r = np.asarray(s.spheres.radius)[:s.spheres.count]
        m = np.asarray(s.spheres.material_id)[:s.spheres.count]
        mats = s.materials
        return sorted(
            (tuple(np.round(c[i], 4)), round(float(r[i]), 4),
             tuple(np.round(np.asarray(mats.albedo)[int(m[i])], 4)),
             tuple(np.round(np.asarray(mats.emission)[int(m[i])], 4)),
             round(float(np.asarray(mats.smoothness)[int(m[i])]), 4))
            for i in range(len(r)))

    assert spheres(scene) == spheres(ref)

    def cents(s):
        t = s.triangles
        c = (np.asarray(t.v0) + np.asarray(t.v1) + np.asarray(t.v2)) / 3
        return np.sort(np.round(c.flatten(), 3))

    assert scene.num_triangles == ref.num_triangles
    np.testing.assert_allclose(cents(scene), cents(ref), atol=1e-3)

    rt, _, _ = load_unity_scene(path)
    assert (int(rt.spheres.count), rt.num_triangles) == runtime


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference mirror absent")
def test_reference_settings_and_camera():
    _, cam, st = load_unity_scene(os.path.join(REF, "Scene1.unity"),
                                  aspect=16 / 9)
    assert st["numBounces"] == 2 and st["numRays"] == 1
    ref_cam = fixtures.scene1_camera(16 / 9)
    np.testing.assert_allclose(np.asarray(cam.position),
                               np.asarray(ref_cam.position), atol=1e-6)
