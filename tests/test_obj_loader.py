"""OBJ/MTL loader tests against the reference's bundled assets."""

import numpy as np

from software_rasterizer_tpu.utils.obj_loader import load_obj, parse_mtl
from software_rasterizer_tpu.utils.texture import Texture


def test_spot_loads(models_dir):
    mesh = load_obj(str(models_dir / "spot" / "spot_triangulated_good.obj"), "spot")
    # SURVEY.md: spot has 5856 triangles.
    assert mesh.faces.shape == (5856, 3)
    assert mesh.vertices.shape[0] > 0
    assert mesh.faces.max() < mesh.vertices.shape[0]
    # spot has texcoords; V is flipped (values may slightly exceed [0,1]
    # in the asset; the texture fetch clamps, TextureLoader.cpp:16-17)
    assert mesh.uvs.min() > -0.2 and mesh.uvs.max() < 1.2
    # normals present and normalized
    assert mesh.had_normals
    lens = np.linalg.norm(mesh.normals, axis=1)
    assert np.allclose(lens, 1.0, atol=1e-3)


def test_crate_quads_triangulated(models_dir):
    mesh = load_obj(str(models_dir / "Crate" / "Crate1.obj"), "Crate")
    # 6 quads -> 12 triangles (SURVEY.md section 4)
    assert mesh.faces.shape[0] == 12
    mat = mesh.material
    assert mat.name != "" or mat.Kd != (0.0, 0.0, 0.0)


def test_bunny_loads(models_dir):
    mesh = load_obj(str(models_dir / "bunny" / "bunny.obj"), "bunny")
    assert mesh.faces.shape[0] == 4968  # SURVEY.md section 4
    assert np.all(mesh.bbox_min <= mesh.bbox_max)


def test_cornell_parts_load(models_dir):
    parts = ["floor", "back", "top", "left", "right", "light", "small", "large"]
    total = 0
    for p in parts:
        mesh = load_obj(str(models_dir / "cornellbox" / "cornellbox_parts" / f"{p}.obj"), p)
        total += mesh.faces.shape[0]
        assert mesh.faces.shape[0] >= 2
    assert total == 36  # SURVEY.md: 8 meshes / 36 tris total


def test_mtl_last_material_quirk(tmp_path):
    mtl = tmp_path / "two.mtl"
    mtl.write_text(
        "newmtl first\nKd 1 0 0\nnewmtl second\nKd 0 1 0\nNs 42\n"
    )
    obj = tmp_path / "two.obj"
    obj.write_text(
        "mtllib two.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n"
    )
    mesh = load_obj(str(obj))
    # reference keeps only the LAST material in the file (ObjLoader.cpp:47-73)
    assert mesh.material.name == "second"
    assert mesh.material.Kd == (0.0, 1.0, 0.0)
    assert mesh.material.Ns == 42.0


def test_dedup_and_fan_triangulation(tmp_path):
    obj = tmp_path / "quad.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n"
    )
    mesh = load_obj(str(obj))
    assert mesh.faces.shape[0] == 2           # fan: (0,1,2),(0,2,3)
    assert mesh.vertices.shape[0] == 4        # dedup across the two tris
    np.testing.assert_array_equal(mesh.faces, [[0, 1, 2], [0, 2, 3]])


def test_missing_normal_synthesis_overwrite_order(tmp_path):
    # Two faces sharing an edge with opposite winding: shared vertices must
    # carry the SECOND face's normal (reference overwrite quirk).
    obj = tmp_path / "shared.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 0 0 1\n"
        "f 1 2 3\nf 2 1 4\n"
    )
    mesh = load_obj(str(obj))
    # face 1 normal is +z-ish; face 2 (2,1,4): AB=v1-v2, AC=v4-v2 -> cross
    a, b, c = mesh.vertices[mesh.faces[1]]
    n2 = np.cross(b - a, c - a)
    n2 = n2 / np.linalg.norm(n2)
    # shared vertex index of original v1 ('1 2 3' corner 0 == '2 1 4' corner 1)
    shared_idx = mesh.faces[1][1]
    got = mesh.normals[shared_idx]
    assert np.dot(got, n2) > 0.9  # points with face 2, not face 1


def test_texture_fetch_quirks(tmp_path):
    data = np.zeros((4, 8, 3), np.uint8)
    data[0, 0] = (255, 0, 0)
    data[3, 7] = (0, 255, 0)
    tex = Texture(data)
    # uv (0,0) -> texel (0,0)
    assert np.allclose(tex.fetch(np.array([0.0, 0.0])), [1, 0, 0])
    # uv just under 1 -> last texel
    assert np.allclose(tex.fetch(np.array([0.999, 0.999])), [0, 1, 0])
    # uv exactly 1.0 -> BLACK (reference out-of-range quirk)
    assert np.allclose(tex.fetch(np.array([1.0, 0.5])), [0, 0, 0])
    # clamping below zero
    assert np.allclose(tex.fetch(np.array([-0.5, 0.0])), [1, 0, 0])
    # batch fetch shape
    uvs = np.random.RandomState(0).rand(16, 2).astype(np.float32)
    out = tex.fetch(uvs)
    assert out.shape == (16, 3)


def test_native_scan_matches_python_scan():
    """The native OBJ fast path must produce the same mesh as the pure-
    Python scan on the reference assets (dedup, normals, uvs, faces)."""
    from software_rasterizer_tpu.utils import native
    from software_rasterizer_tpu.utils.obj_loader import load_obj_source

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    import pathlib

    models = pathlib.Path("/root/reference/examples/models")
    for rel in ("spot/spot_triangulated_good.obj", "bunny/bunny.obj",
                "cornellbox/cornellbox_parts/tallbox.obj"):
        p = models / rel
        if not p.exists():
            continue
        text = p.read_text(errors="replace")
        a = load_obj_source(text, base_dir=str(p.parent), use_native=True)
        b = load_obj_source(text, base_dir=str(p.parent), use_native=False)
        assert a.vertices.shape == b.vertices.shape
        np.testing.assert_allclose(a.vertices, b.vertices, rtol=0, atol=1e-6)
        np.testing.assert_allclose(a.normals, b.normals, rtol=0, atol=1e-5)
        np.testing.assert_allclose(a.uvs, b.uvs, rtol=0, atol=1e-6)
        np.testing.assert_array_equal(a.faces, b.faces)
        np.testing.assert_allclose(a.bbox_min, b.bbox_min, atol=1e-6)
        np.testing.assert_allclose(a.bbox_max, b.bbox_max, atol=1e-6)


def test_native_scan_huge_face_capped_consistently():
    """A face with >64 vertices: the counts pass and the fill pass must
    agree (previously the counts pass over-reported and the caller got
    uninitialized rows)."""
    from software_rasterizer_tpu.utils import native

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    import math

    nv = 100
    lines = [
        f"v {math.cos(2 * math.pi * i / nv):.6f} {math.sin(2 * math.pi * i / nv):.6f} 0"
        for i in range(nv)
    ]
    lines.append("f " + " ".join(str(i + 1) for i in range(nv)))
    out = native.parse_obj_native("\n".join(lines))
    assert out is not None
    pos, nrm, uv, corners = out
    assert pos.shape == (nv, 3)
    # fan over the first 64 vertices only — and every row initialized
    assert corners.shape == (3 * (64 - 2), 3)
    assert corners[:, 0].min() >= 0 and corners[:, 0].max() < 64
