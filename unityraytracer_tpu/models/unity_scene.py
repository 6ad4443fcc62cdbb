"""Unity scene importer: load the reference's ``.unity`` YAML directly.

The reference's content layer IS Unity scene files (SURVEY.md §2.3):
GameObjects carrying a ``RayTraceObject`` component register with the
renderer, typed by collider (``RayTraceObject.cs:28-39`` — a SphereCollider
makes an analytic sphere with ``radius = collider.radius * max(lossyScale)``,
anything else is a mesh), and a camera-attached ``RayTraceMaster`` holds the
render settings (``numBounces``/``numRays``, ``RayTraceMaster.cs:8-18``).
This module parses that serialization, so the reference's own
``Scene1.unity`` / ``SampleScene.unity`` (and any scene built the same way)
load without hand transcription — the hand-transcribed fixtures
(models/fixtures.py) double as the importer's ground truth in tests.

Format notes (Unity 2021.3 text serialization):
* a scene is a YAML stream of documents headed ``--- !u!<classID> &<fileID>``;
  each body is one plain mapping ``{ClassName: {fields...}}`` (the custom
  ``!u!`` tag only ever appears on the header line, so each body parses with
  a standard YAML loader);
* components reference their owner via ``m_GameObject {fileID}``; transforms
  form a hierarchy through ``m_Father`` (composed here into world TRS);
* built-in primitive meshes are referenced by well-known fileIDs
  (10202 Cube, 10206 Cylinder, 10207 Sphere, 10208 Capsule, 10210 Quad);
* script components are identified by their .meta GUID; the reference
  project's GUIDs are recognized by default, with a field-shape fallback
  (``albedoColor`` => RayTraceObject, ``numBounces`` => RayTraceMaster) so
  re-imported projects with fresh GUIDs still load.
"""

from __future__ import annotations

import re
from typing import Optional

import numpy as np

from ..camera import Camera
from ..scene import Material, SceneBuilder
from ..utils.logging import get_logger
from ..utils.math3d import quat_to_matrix
from . import primitives as P
from .skybox import sun_sky

# Script GUIDs from the reference project (Assets/Scripts/*.cs.meta).
RAYTRACE_OBJECT_GUID = "7fba285130b2c3342be00e9cfa2e3c7c"
RAYTRACE_MASTER_GUID = "b2e91413b60a86f49ac7969f1637f0cd"

_BUILTIN_MESH = {10202: "cube", 10206: "cylinder", 10207: "sphere_mesh",
                 10208: "capsule", 10210: "quad"}
_MESH_GEN = {"quad": P.quad, "cube": P.cube, "cylinder": P.cylinder,
             "capsule": P.capsule, "sphere_mesh": P.uv_sphere}

_DOC_RE = re.compile(r"^--- !u!(\d+) &(\d+)( stripped)?\s*$", re.M)


def _parse_docs(text: str):
    """YAML stream -> {fileID: (classID, className, fields)}."""
    import yaml

    out = {}
    heads = list(_DOC_RE.finditer(text))
    for k, m in enumerate(heads):
        end = heads[k + 1].start() if k + 1 < len(heads) else len(text)
        body = text[m.end():end]
        try:
            data = yaml.safe_load(body)
        except yaml.YAMLError:
            continue
        if isinstance(data, dict) and len(data) == 1:
            (cname, fields), = data.items()
            out[int(m.group(2))] = (int(m.group(1)), cname, fields or {})
    return out


def _v3(d, default=(0.0, 0.0, 0.0)):
    if not isinstance(d, dict):
        return default
    return (float(d.get("x", 0)), float(d.get("y", 0)), float(d.get("z", 0)))


def _color(d, default=(0.0, 0.0, 0.0)):
    if not isinstance(d, dict):
        return default
    return (float(d.get("r", 0)), float(d.get("g", 0)), float(d.get("b", 0)))


def _fid(d):
    return int(d.get("fileID", 0)) if isinstance(d, dict) else 0


def _local_matrix(tf) -> np.ndarray:
    q = tf.get("m_LocalRotation", {})
    quat = (float(q.get("x", 0)), float(q.get("y", 0)),
            float(q.get("z", 0)), float(q.get("w", 1)))
    pos = _v3(tf.get("m_LocalPosition"))
    scale = _v3(tf.get("m_LocalScale"), (1.0, 1.0, 1.0))
    m = np.eye(4, dtype=np.float64)
    m[:3, :3] = quat_to_matrix(quat) @ np.diag(scale)
    m[:3, 3] = pos
    return m


def _world_matrix(tfid, docs, cache):
    if tfid in cache:
        return cache[tfid]
    _cls, _name, tf = docs[tfid]
    m = _local_matrix(tf)
    parent = _fid(tf.get("m_Father", {}))
    if parent and parent in docs:
        m = _world_matrix(parent, docs, cache) @ m
    cache[tfid] = m
    return m


def _is_script(fields, guid):
    s = fields.get("m_Script", {})
    return isinstance(s, dict) and s.get("guid") == guid


_GUID_RE = re.compile(r"^guid:\s*([0-9a-f]{32})\s*$", re.M)


def _guid_index(project_root) -> dict:
    """guid -> asset path, from the Unity project's ``.meta`` files.

    Unity pairs every asset with ``<asset>.meta`` carrying a stable
    ``guid:`` line; serialized references store that guid. One shallow walk
    of the project tree (``Assets/`` and any sibling content dirs under the
    root) builds the reverse map — only the first ~1 KB of each .meta is
    read (the guid line sits in the header).
    """
    import os

    idx = {}
    for dirpath, dirnames, filenames in os.walk(project_root):
        dirnames[:] = [d for d in dirnames
                       if d not in (".git", "Library", "Temp", "obj")]
        for fn in filenames:
            if not fn.endswith(".meta"):
                continue
            p = os.path.join(dirpath, fn)
            try:
                with open(p, "r", errors="replace") as f:
                    head = f.read(1024)
            except OSError:
                continue
            m = _GUID_RE.search(head)
            if m:
                idx[m.group(1)] = p[:-len(".meta")]
    return idx


def _project_root(scene_path) -> str:
    """Nearest ancestor of the scene that CONTAINS ``Assets`` (the Unity
    project root), else the scene's own directory."""
    import os

    d = os.path.dirname(os.path.abspath(scene_path))
    while True:
        if os.path.isdir(os.path.join(d, "Assets")):
            return d
        parent = os.path.dirname(d)
        if parent == d:
            return os.path.dirname(os.path.abspath(scene_path))
        d = parent


def _resolve_mesh_guid(guid, guid_idx, log):
    """guid -> (vertices, faces, normals) via the project's .meta index.

    Matches the reference's ability to flatten ANY registered
    ``MeshFilter.sharedMesh`` (RayTraceMaster.cs:298-305): model-file
    assets resolve through their .meta guid and load with the OBJ loader.
    Returns None (caller warns-and-skips) for unresolvable guids or asset
    types the loader does not cover.
    """
    path = guid_idx.get(guid)
    if path is None:
        return None
    if not path.lower().endswith(".obj"):
        log.warn(f"unity import: mesh asset {path!r} is not an OBJ — "
                 "skipped (convert or add it via SceneBuilder.add_mesh)")
        return None
    from .obj import load_obj

    try:
        return load_obj(path)
    except (OSError, ValueError) as e:
        log.warn(f"unity import: failed to load mesh {path!r}: {e}")
        return None


def _material_from(fields) -> Material:
    """RayTraceObject serialized material; absent fields use the C# defaults
    (RayTraceObject.cs:12-15) — SampleScene's older serialization has none."""
    d = Material()
    return Material(
        albedo=_color(fields.get("albedoColor"), d.albedo),
        specular=_color(fields.get("specularColor"), d.specular),
        emission=_color(fields.get("emissionColor"), d.emission),
        smoothness=float(fields.get("smoothness", d.smoothness)),
    )


def load_unity_scene(path: str, aspect: float = 16 / 9,
                     skybox: Optional[np.ndarray] = None,
                     mesh_detail_kw: Optional[dict] = None,
                     include_disabled: bool = False):
    """Load a ``.unity`` scene built on the reference's component model.

    Returns ``(scene, camera, settings)``: the built Scene (objects with an
    enabled RayTraceObject on an active GameObject, reference typing rules),
    a Camera from the scene's camera object at ``aspect``, and a settings
    dict (``numBounces``/``numRays``/``skybox_guid`` when a RayTraceMaster
    is present). Non-builtin mesh references resolve through the project's
    ``.meta`` guid index (OBJ assets load directly, matching the
    reference's ability to flatten any registered sharedMesh —
    RayTraceMaster.cs:298-305); unresolvable guids or unsupported asset
    types are skipped with a warning.

    ``include_disabled`` also loads objects whose RayTraceObject component
    is disabled. Default False matches the reference's RUNTIME: OnEnable
    never fires for a disabled Behaviour, so it never registers
    (RayTraceObject.cs:42). Notably Scene1.unity ships with its two mirror
    quads, the emissive sphere, and one plain sphere DISABLED — the scene
    the reference actually renders is 6 spheres + 4 meshes, while the full
    14-object inventory (what models/fixtures.scene1 transcribes, and what
    SURVEY.md §2.3 counts) needs ``include_disabled=True``.
    """
    with open(path, "r", errors="replace") as f:
        docs = _parse_docs(f.read())

    # Index components by owning GameObject.
    comps = {}
    transforms = {}
    for fid, (cls, cname, fields) in docs.items():
        go = _fid(fields.get("m_GameObject", {}))
        if go:
            comps.setdefault(go, []).append((fid, cls, cname, fields))
        if cname == "Transform":
            transforms[go] = fid

    cache = {}
    b = SceneBuilder()
    log = get_logger()
    cam = None
    settings = {}
    guid_idx = None  # lazy guid -> asset map for non-builtin meshes
    for go_fid, (cls, cname, go) in docs.items():
        if cname != "GameObject":
            continue
        clist = comps.get(go_fid, [])

        def find(name):
            return [f for _fid2, _c, n, f in clist if n == name]

        monos = find("MonoBehaviour")
        camera_fields = find("Camera")
        if camera_fields:
            tfid = transforms.get(go_fid)
            m = _world_matrix(tfid, docs, cache) if tfid else np.eye(4)
            fov = float(camera_fields[0].get("field of view", 60.0))
            fwd = m[:3, :3] @ np.array([0.0, 0.0, 1.0])
            cam = Camera.create(position=tuple(m[:3, 3]), forward=tuple(fwd),
                                fov_y_deg=fov, aspect=aspect)
            for mb in monos:
                if _is_script(mb, RAYTRACE_MASTER_GUID) \
                        or "numBounces" in mb:
                    settings = {
                        "numBounces": int(mb.get("numBounces", 2)),
                        "numRays": int(mb.get("numRays", 1)),
                        "skybox_guid": (mb.get("SkyboxTexture") or {}).get(
                            "guid"),
                    }
            continue

        if int(go.get("m_IsActive", 1)) == 0:
            continue
        rto = None
        for mb in monos:
            if _is_script(mb, RAYTRACE_OBJECT_GUID) or "albedoColor" in mb:
                rto = mb
                break
        if rto is None:
            continue
        if int(rto.get("m_Enabled", 1)) == 0 and not include_disabled:
            continue
        mat = _material_from(rto)
        tfid = transforms.get(go_fid)
        m = _world_matrix(tfid, docs, cache) if tfid else np.eye(4)

        spheres = [f for f in find("SphereCollider")
                   if int(f.get("m_Enabled", 1)) != 0]
        if spheres:
            sc = spheres[0]
            r = float(sc.get("m_Radius", 0.5))
            lossy = np.linalg.norm(m[:3, :3], axis=0)   # per-axis scale
            center = m @ np.append(np.array(_v3(sc.get("m_Center"))), 1.0)
            b.add_sphere(tuple(center[:3]), r * float(lossy.max()), mat)
            continue

        mfs = find("MeshFilter")
        if not mfs:
            continue
        mesh_ref = mfs[0].get("m_Mesh", {})
        kind = _BUILTIN_MESH.get(_fid(mesh_ref))
        if kind is not None:
            v, f, n = _MESH_GEN[kind](**(mesh_detail_kw or {}).get(kind, {}))
        else:
            # Non-builtin mesh: resolve the asset guid through the
            # project's .meta files (index built lazily, once per import).
            guid = (mesh_ref or {}).get("guid") \
                if isinstance(mesh_ref, dict) else None
            loaded = None
            if guid:
                if guid_idx is None:
                    guid_idx = _guid_index(_project_root(path))
                loaded = _resolve_mesh_guid(guid, guid_idx, log)
            if loaded is None:
                log.warn(f"unity import: GameObject {go.get('m_Name')!r} "
                         "uses an unresolvable mesh — skipped (import the "
                         "mesh via models.obj and add it explicitly)")
                continue
            v, f, n = loaded
        b.add_mesh(v, f, transform=m.astype(np.float32), material=mat,
                   normals=n)

    b.set_skybox(skybox if skybox is not None else sun_sky())
    if cam is None:
        cam = Camera.create(position=(0, 1, -10), forward=(0, 0, 1),
                            fov_y_deg=60.0, aspect=aspect)
    return b.build(), cam, settings
