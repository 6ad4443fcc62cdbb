"""Wavefront OBJ mesh loader (positions, normals, triangulated faces).

The reference gets meshes from Unity's asset pipeline (built-in primitives in
the demo scenes; SURVEY.md 2.3). A standalone framework needs its own mesh
ingestion: this loader handles the common OBJ subset — v/vn/f records,
polygon faces (fan-triangulated), and the f v//vn and f v/vt/vn index forms —
and returns arrays ready for ``SceneBuilder.add_mesh``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def load_obj(path_or_lines) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Parse an OBJ file.

    Args:
      path_or_lines: filesystem path, or an iterable of lines (for tests).

    Returns:
      (vertices (V,3) f32, faces (F,3) i32, normals (V,3) f32 or None).
      Normals are returned only if every face supplies vn indices; they are
      re-indexed onto positions (last-writer-wins per position, which matches
      smooth-shaded exports; faceted exports should recompute).
    """
    if isinstance(path_or_lines, str):
        with open(path_or_lines, "r") as f:
            lines = f.readlines()
    else:
        lines = list(path_or_lines)

    positions = []
    normals_raw = []
    face_pos = []
    face_nrm = []
    any_missing_nrm = False

    for line in lines:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        tag = parts[0]
        if tag == "v":
            positions.append([float(x) for x in parts[1:4]])
        elif tag == "vn":
            normals_raw.append([float(x) for x in parts[1:4]])
        elif tag == "f":
            corners = []
            for token in parts[1:]:
                fields = token.split("/")
                vi = int(fields[0])
                ni = None
                if len(fields) == 3 and fields[2]:
                    ni = int(fields[2])
                corners.append((vi, ni))
            # Fan triangulation for polygons.
            for k in range(1, len(corners) - 1):
                tri = (corners[0], corners[k], corners[k + 1])
                face_pos.append([c[0] for c in tri])
                face_nrm.append([c[1] for c in tri])
                if any(c[1] is None for c in tri):
                    any_missing_nrm = True

    V = len(positions)
    verts = np.asarray(positions, np.float32)

    def resolve(idx, count):
        # OBJ indices are 1-based; negative counts from the end.
        return idx - 1 if idx > 0 else count + idx

    faces = np.asarray([[resolve(i, V) for i in f] for f in face_pos], np.int32)

    normals = None
    if normals_raw and not any_missing_nrm and len(face_nrm):
        nr = np.asarray(normals_raw, np.float32)
        normals = np.zeros((V, 3), np.float32)
        for f_p, f_n in zip(faces, face_nrm):
            for vi, ni in zip(f_p, f_n):
                normals[vi] = nr[resolve(ni, len(nr))]
        lens = np.linalg.norm(normals, axis=1, keepdims=True)
        normals = np.where(lens > 1e-12, normals / np.maximum(lens, 1e-12),
                           np.array([0, 1, 0], np.float32))
    return verts, faces, normals


def save_obj(path: str, vertices: np.ndarray, faces: np.ndarray,
             normals: Optional[np.ndarray] = None) -> str:
    """Write a minimal OBJ (debug/export utility)."""
    with open(path, "w") as f:
        for v in np.asarray(vertices):
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        if normals is not None:
            for n in np.asarray(normals):
                f.write(f"vn {n[0]} {n[1]} {n[2]}\n")
        for face in np.asarray(faces):
            if normals is not None:
                f.write("f " + " ".join(f"{i+1}//{i+1}" for i in face) + "\n")
            else:
                f.write("f " + " ".join(str(i + 1) for i in face) + "\n")
    return path
