"""Pure-Python Wavefront OBJ/MTL loader.

Replaces the reference's tinyobjloader + conversion layer
(ObjLoader.cpp:78-233) with zero heavy deps. Reproduced behaviors:

  * fan triangulation of polygon faces (tinyobj default),
  * vertex dedup by exact (position, normal, uv, color) equality
    (ObjLoader.cpp:93-95,155-160),
  * texcoord V flip ``1 - v`` (ObjLoader.cpp:152),
  * default vertex color (1,1,1) (tinyobj attrib.colors default),
  * missing-normal synthesis with the angle-weighted cross-product formula
    (ObjLoader.cpp:178-185 -> Tools::calculateNormalWithWeight,
    Tools.cpp:234-248), assigned per-face in face order so later faces
    overwrite shared vertices exactly like the reference loop,
  * MTL conversion keeps only the LAST material in the file
    (processMatrial loop quirk, ObjLoader.cpp:47-73),
  * bounding box accumulated over raw positions (ObjLoader.cpp:124-130).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class MtlMaterial:
    """Parsed .mtl fields (Material.hpp:47-63 equivalents)."""

    name: str = ""
    Ka: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    Kd: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    Ks: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    Ns: float = 0.0
    Ni: float = 0.0
    d: float = 1.0
    illum: int = 0
    map_Ka: str = ""
    map_Kd: str = ""
    map_Ks: str = ""
    map_Ns: str = ""
    map_d: str = ""
    map_bump: str = ""


@dataclasses.dataclass
class MeshData:
    """Deduplicated triangle-soup arrays for one OBJ file."""

    name: str
    vertices: np.ndarray   # (V,3) f32
    normals: np.ndarray    # (V,3) f32
    uvs: np.ndarray        # (V,2) f32
    colors: np.ndarray     # (V,3) f32
    faces: np.ndarray      # (F,3) i32
    material: MtlMaterial
    bbox_min: np.ndarray   # (3,) f32
    bbox_max: np.ndarray   # (3,) f32
    had_normals: bool


def parse_mtl(path: str) -> Dict[str, MtlMaterial]:
    """Parse a .mtl file into {name: MtlMaterial}."""
    mats: Dict[str, MtlMaterial] = {}
    cur: Optional[MtlMaterial] = None
    with open(path, "r", errors="replace") as f:
        for raw in f:
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            key, vals = parts[0], parts[1:]
            if key == "newmtl":
                cur = MtlMaterial(name=vals[0] if vals else "")
                mats[cur.name] = cur
            elif cur is None:
                continue
            elif key in ("Ka", "Kd", "Ks") and len(vals) >= 3:
                setattr(cur, key, tuple(float(v) for v in vals[:3]))
            elif key == "Ns":
                cur.Ns = float(vals[0])
            elif key == "Ni":
                cur.Ni = float(vals[0])
            elif key == "d":
                cur.d = float(vals[0])
            elif key == "Tr":
                cur.d = 1.0 - float(vals[0])
            elif key == "illum":
                cur.illum = int(float(vals[0]))
            elif key in ("map_Ka", "map_Kd", "map_Ks", "map_Ns", "map_d"):
                setattr(cur, key, vals[-1] if vals else "")
            elif key in ("map_bump", "bump"):
                cur.map_bump = vals[-1] if vals else ""
    return mats


def _last_material(mats: Dict[str, MtlMaterial]) -> MtlMaterial:
    """The reference's processMatrial keeps only the last material
    encountered (ObjLoader.cpp:47-73)."""
    out = MtlMaterial()
    for m in mats.values():  # dict preserves insertion order
        out = m
    return out


def _angle_weighted_normal(pa: np.ndarray, pb: np.ndarray, pc: np.ndarray) -> np.ndarray:
    """Tools::calculateNormalWithWeight (Tools.cpp:234-248), including its
    asin weighting and normalize."""
    ab = pb - pa
    ac = pc - pa
    n = np.cross(ab, ac)
    length = np.linalg.norm(n)
    denom = np.linalg.norm(ab) * np.linalg.norm(ac)
    if denom > 0 and not (-1e-8 <= length <= 1e-8):
        ratio = min(length / denom, 1.0)
        n = n * (np.arcsin(ratio) / length)
    ln = np.linalg.norm(n)
    return (n / ln).astype(np.float32) if ln > 0 else n.astype(np.float32)


def load_obj(path: str, name: str = "") -> MeshData:
    """Load an OBJ file into deduplicated SoA arrays."""
    with open(path, "r", errors="replace") as f:
        return load_obj_source(
            f.read(), name=name or os.path.basename(path),
            base_dir=os.path.dirname(path),
        )


def load_obj_source(text: str, name: str = "", base_dir: str = "") -> MeshData:
    """Parse OBJ content from a string (same pipeline as `load_obj`)."""
    positions: List[Tuple[float, float, float]] = []
    normals_in: List[Tuple[float, float, float]] = []
    uvs_in: List[Tuple[float, float]] = []
    face_corners: List[Tuple[int, int, int]] = []  # (v, vt, vn) indices, -1 = absent
    mtl_files: List[str] = []
    obj_name = ""

    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        key, vals = parts[0], parts[1:]
        if key == "v":
            positions.append(tuple(float(v) for v in vals[:3]))
        elif key == "vn":
            normals_in.append(tuple(float(v) for v in vals[:3]))
        elif key == "vt":
            uvs_in.append(tuple(float(v) for v in vals[:2]))
        elif key == "mtllib":
            mtl_files.extend(vals)
        elif key in ("o", "g") and not obj_name and vals:
            obj_name = vals[0]
        elif key == "f":
            corners = []
            for tok in vals:
                fields = tok.split("/")
                vi = int(fields[0])
                ti = int(fields[1]) if len(fields) > 1 and fields[1] else 0
                ni = int(fields[2]) if len(fields) > 2 and fields[2] else 0
                # OBJ is 1-based; negatives are relative to current count.
                vi = vi - 1 if vi > 0 else len(positions) + vi
                ti = ti - 1 if ti > 0 else (len(uvs_in) + ti if ti < 0 else -1)
                ni = ni - 1 if ni > 0 else (len(normals_in) + ni if ni < 0 else -1)
                corners.append((vi, ti, ni))
            # fan triangulation (tinyobj default for polygons)
            for k in range(1, len(corners) - 1):
                face_corners.append(corners[0])
                face_corners.append(corners[k])
                face_corners.append(corners[k + 1])

    # MTL: resolve relative to the OBJ's directory; keep last material.
    mats: Dict[str, MtlMaterial] = {}
    for mf in mtl_files:
        mp = os.path.join(base_dir, mf)
        if os.path.exists(mp):
            mats.update(parse_mtl(mp))
    material = _last_material(mats)

    had_normals = any(ni >= 0 for (_, _, ni) in face_corners)

    # Vertex dedup by exact record equality (ObjLoader.cpp:155-160).
    unique: Dict[tuple, int] = {}
    v_pos: List[Tuple[float, float, float]] = []
    v_nrm: List[Tuple[float, float, float]] = []
    v_uv: List[Tuple[float, float]] = []
    v_col: List[Tuple[float, float, float]] = []
    indices: List[int] = []
    bbox_min = np.full(3, np.inf, np.float32)
    bbox_max = np.full(3, -np.inf, np.float32)

    for (vi, ti, ni) in face_corners:
        pos = positions[vi]
        bbox_min = np.minimum(bbox_min, np.asarray(pos, np.float32))
        bbox_max = np.maximum(bbox_max, np.asarray(pos, np.float32))
        col = (1.0, 1.0, 1.0)  # tinyobj default vertex color
        if ni >= 0:
            n = np.asarray(normals_in[ni], np.float64)
            ln = np.linalg.norm(n)
            nrm = tuple((n / ln) if ln > 0 else n)  # normalized on load
        else:
            nrm = (0.0, 0.0, 0.0)
        uv = (uvs_in[ti][0], 1.0 - uvs_in[ti][1]) if ti >= 0 else (0.0, 0.0)
        record = (pos, nrm, uv, col)
        idx = unique.get(record)
        if idx is None:
            idx = len(v_pos)
            unique[record] = idx
            v_pos.append(pos)
            v_nrm.append(nrm)
            v_uv.append(uv)
            v_col.append(col)
        indices.append(idx)

    n_faces = len(indices) // 3
    faces = np.asarray(indices, np.int32).reshape(n_faces, 3)
    vertices = np.asarray(v_pos, np.float32).reshape(-1, 3)
    normals = np.asarray(v_nrm, np.float32).reshape(-1, 3)
    uvs = np.asarray(v_uv, np.float32).reshape(-1, 2)
    colors = np.asarray(v_col, np.float32).reshape(-1, 3)

    if not had_normals:
        # Per-face overwrite in face order (ObjLoader.cpp:166-186 quirk:
        # shared vertices end with the LAST face's normal).
        for i in range(n_faces):
            a, b, c = faces[i]
            pa, pb, pc = vertices[a], vertices[b], vertices[c]
            normals[a] = _angle_weighted_normal(pa, pb, pc)
            normals[b] = _angle_weighted_normal(pb, pc, pa)
            normals[c] = _angle_weighted_normal(pc, pa, pb)

    return MeshData(
        name=name or obj_name or "mesh",
        vertices=vertices,
        normals=normals,
        uvs=uvs,
        colors=colors,
        faces=faces,
        material=material,
        bbox_min=bbox_min,
        bbox_max=bbox_max,
        had_normals=had_normals,
    )
