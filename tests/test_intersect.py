"""Intersection kernels vs NumPy oracles (Moller-Trumbore, sphere quadratic)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from software_rasterizer_tpu.ops.intersect import (
    intersect_spheres,
    intersect_triangles,
    nearest_hit,
    prepare_rt_scene,
)


def _mt_oracle(o, d, v0, v1, v2):
    """Scalar Moller-Trumbore (Triangle.cpp:104-145) in float64."""
    e1, e2 = v1 - v0, v2 - v0
    p = np.cross(d, e2)
    det = np.dot(e1, p)
    if abs(det) < 1e-6:
        return None
    inv = 1.0 / det
    tv = o - v0
    u = np.dot(tv, p) * inv
    if u < 0 or u > 1:
        return None
    q = np.cross(tv, e1)
    v = np.dot(d, q) * inv
    if v < 0 or u + v > 1:
        return None
    t = np.dot(e2, q) * inv
    if t < 1e-6:
        return None
    return t, u, v


def test_moller_trumbore_random_oracle():
    rng = np.random.RandomState(7)
    tris = rng.randn(40, 3, 3).astype(np.float32)
    origins = rng.randn(64, 3).astype(np.float32) * 2
    dirs = rng.randn(64, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    t, idx, u, v = intersect_triangles(
        jnp.asarray(origins), jnp.asarray(dirs),
        jnp.asarray(tris[:, 0]), jnp.asarray(tris[:, 1]), jnp.asarray(tris[:, 2]),
        jnp.ones(40, bool), chunk=16,
    )
    t, idx = np.asarray(t), np.asarray(idx)
    for i in range(64):
        best = (np.inf, -1)
        for k in range(40):
            r = _mt_oracle(origins[i], dirs[i], *tris[k].astype(np.float64))
            if r and r[0] < best[0]:
                best = (r[0], k)
        if best[1] == -1:
            assert idx[i] == -1
        else:
            assert idx[i] == best[1], (i, idx[i], best)
            np.testing.assert_allclose(t[i], best[0], rtol=1e-3)


def test_sphere_intersect_analytic():
    # ray from origin along +z toward sphere at (0,0,5) r=1 -> t=4
    o = jnp.zeros((1, 3))
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    t, idx = intersect_spheres(
        o, d, jnp.asarray([[0.0, 0.0, 5.0]]), jnp.asarray([1.0]), jnp.ones(1, bool)
    )
    assert np.isclose(float(t[0]), 4.0, atol=1e-5) and int(idx[0]) == 0
    # from inside: nearest positive root is the exit, t=1
    o2 = jnp.asarray([[0.0, 0.0, 5.0]])
    t2, _ = intersect_spheres(
        o2, d, jnp.asarray([[0.0, 0.0, 5.0]]), jnp.asarray([1.0]), jnp.ones(1, bool)
    )
    assert np.isclose(float(t2[0]), 1.0, atol=1e-5)
    # miss
    t3, i3 = intersect_spheres(
        o, jnp.asarray([[0.0, 1.0, 0.0]]),
        jnp.asarray([[0.0, 0.0, 5.0]]), jnp.asarray([1.0]), jnp.ones(1, bool),
    )
    assert int(i3[0]) == -1


def _tiny_scene():
    """One diffuse floor quad + one emissive sphere, built through Scene."""
    from software_rasterizer_tpu.models import Material, MaterialType, Scene, SphereLight
    from software_rasterizer_tpu.models.objects import MeshObject
    from software_rasterizer_tpu.utils.obj_loader import MeshData, MtlMaterial

    scene = Scene("tiny", eye=(0, 0, -3), background=(0.1, 0.2, 0.3))
    verts = np.array(
        [[-2, -1, -2], [2, -1, -2], [2, -1, 6], [-2, -1, 6]], np.float32
    )
    data = MeshData(
        name="floor",
        vertices=verts,
        normals=np.tile(np.array([[0, 1, 0]], np.float32), (4, 1)),
        uvs=np.zeros((4, 2), np.float32),
        colors=np.ones((4, 3), np.float32),
        faces=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        material=MtlMaterial(),
        bbox_min=verts.min(0),
        bbox_max=verts.max(0),
        had_normals=True,
    )
    floor = MeshObject(data, Material(
        type=MaterialType.DIFFUSE_AND_GLOSSY,
        Ka=(0.005,) * 3, Kd=(1.0,) * 3, Ks=(0.7937,) * 3, specular_exponent=150.0,
    ))
    scene.add_graphic_obj(floor, "floor")
    light = SphereLight(center=(0, 3, 1), intensity=(1, 1, 1), radius=0.5,
                        material=Material(Kd=(1.0,) * 3, emission=(5.0, 5.0, 5.0)))
    scene.add_graphic_obj(light, "light")
    # identity view/projection for a world==trace-space test scene
    scene.view = np.eye(4, dtype=np.float32)
    scene.projection = np.eye(4, dtype=np.float32)
    return scene


def test_nearest_hit_properties():
    scene = _tiny_scene()
    rt = prepare_rt_scene(scene.rt_geometry(pad_faces_to=8), scene.rt_frame())
    # straight down from above the floor
    o = jnp.asarray([[0.5, 2.0, 1.0], [0.0, 5.0, 1.0], [0.0, -5.0, 1.0]])
    d = jnp.asarray([[0.0, -1.0, 0.0], [0.0, -1.0, 0.0], [0.0, -1.0, 0.0]])
    hit = nearest_hit(rt, o, d)
    h = np.asarray(hit.hit)
    assert h[0] and h[1] and not h[2]
    # ray 0 hits floor at y=-1, t=3
    np.testing.assert_allclose(float(hit.t[0]), 3.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(hit.normal[0]), [0, 1, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(hit.color[0]), [1, 1, 1], atol=1e-6)
    # ray 1 hits the emissive sphere first (top at y=3.5, t=1.5)
    np.testing.assert_allclose(float(hit.t[1]), 1.5, rtol=1e-4)
    assert np.asarray(hit.emit[1]).sum() > 0
    # sphere hits carry color 0 (Properties default quirk)
    np.testing.assert_allclose(np.asarray(hit.color[1]), 0.0, atol=1e-7)
    # emitter table: bbox sphere of the light: center (0,3,1), r = 0.5*sqrt(3)
    em = np.asarray(rt.emitter_mask)
    ec = np.asarray(rt.emitter_center)[em]
    er = np.asarray(rt.emitter_radius)[em]
    np.testing.assert_allclose(ec[0], [0, 3, 1], atol=1e-5)
    np.testing.assert_allclose(er[0], 0.5 * np.sqrt(3), rtol=1e-5)


def test_whitted_tiny_scene():
    from software_rasterizer_tpu.ops.whitted import whitted_render

    scene = _tiny_scene()
    rt = prepare_rt_scene(scene.rt_geometry(pad_faces_to=8), scene.rt_frame())
    key = jax.random.PRNGKey(0)
    img = np.asarray(
        whitted_render(rt, 32, 32, 45.0, key, spp=1, max_depth=3, block=2048, chunk=8)
    )
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
    # some rays hit the floor (lit) and some miss (background)
    bg = np.array([0.1, 0.2, 0.3])
    is_bg = np.isclose(img, bg, atol=1e-5).all(axis=-1)
    assert is_bg.any() and not is_bg.all()
    lit = img[~is_bg]
    assert lit.max() > 0.01, "diffuse floor must receive light"


def test_mm_trace_kernel_matches_xla_sweep():
    """The MXU bilinear Moller-Trumbore kernel (ops/pallas_trace) must
    agree with the XLA broadcast-FMA sweep on hits AND winner identity
    (interpret mode on CPU; f32 exact)."""
    from software_rasterizer_tpu.ops.intersect import _intersect_tri_raw
    from software_rasterizer_tpu.ops.pallas_trace import (
        mt_tri_coef,
        trace_nearest_mm,
    )

    rng = np.random.RandomState(7)
    f = 96
    v0 = rng.randn(f, 3).astype(np.float32)
    v1 = v0 + rng.randn(f, 3).astype(np.float32) * 0.7
    v2 = v0 + rng.randn(f, 3).astype(np.float32) * 0.7
    valid = np.ones(f, bool)
    valid[80:] = False
    n = 700
    orig = rng.randn(n, 3).astype(np.float32) * 2
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    coef = mt_tri_coef(
        jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2), jnp.asarray(valid)
    )
    h1, i1, _ = trace_nearest_mm(coef, jnp.asarray(orig), jnp.asarray(d),
                              chunk=32, block=256, interpret=True)
    h2, i2, _ = _intersect_tri_raw(
        jnp.asarray(orig), jnp.asarray(d), jnp.asarray(v0), jnp.asarray(v1),
        jnp.asarray(v2), jnp.asarray(valid), chunk=32,
    )
    h1, i1, h2, i2 = (np.asarray(a) for a in (h1, i1, h2, i2))
    assert h1.sum() > 50  # scene actually hit
    # the bilinear expansion reassociates f32 math, so knife-edge
    # accept/reject decisions may flip on a tiny population
    assert (h1 != h2).mean() < 0.01
    both = h1 & h2
    assert (i1[both] != i2[both]).mean() < 0.01


def test_nearest_hit_mm_path_matches_default(cornell_rt_scene=None):
    """nearest_hit with SRT_MM_TRACE=1 (interpret on CPU) must reproduce
    the default XLA path on the Cornell scene."""
    import os

    from software_rasterizer_tpu.ops.camera import camera_rays
    from software_rasterizer_tpu.ops.intersect import nearest_hit, prepare_rt_scene
    from software_rasterizer_tpu.scenes import build_cornell_scene

    scene = build_cornell_scene()
    scene.set_ndc_matrix(24, 24)
    rt = prepare_rt_scene(scene.rt_geometry(), scene.rt_frame())
    rt = jax.tree_util.tree_map(jnp.asarray, rt)
    orig, d = camera_rays(rt.eye, scene.fovy, 24, 24)

    base = nearest_hit(rt, orig, d, 128)
    os.environ["SRT_MM_TRACE"] = "1"
    try:
        mm = nearest_hit(rt, orig, d, 128)
    finally:
        os.environ["SRT_MM_TRACE"] = "auto"
    bh, mh = np.asarray(base.hit), np.asarray(mm.hit)
    assert (bh != mh).mean() < 0.01  # borderline-ray flips only
    both = bh & mh
    same = np.asarray(base.prim)[both] == np.asarray(mm.prim)[both]
    # winner flips happen only for SEAM rays (hits exactly on a shared
    # edge/diagonal, u or v == 0 or u+v == 1): same t, different but
    # equally-valid primitive
    assert (~same).mean() < 0.03
    bad = np.where(both)[0][~same]
    np.testing.assert_allclose(
        np.asarray(base.t)[bad], np.asarray(mm.t)[bad], rtol=1e-4
    )
    sel = np.where(both)[0][same]
    np.testing.assert_allclose(
        np.asarray(base.t)[sel], np.asarray(mm.t)[sel], rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(base.normal)[sel], np.asarray(mm.normal)[sel], atol=1e-5
    )


def test_trace_nearest_mm2_matches_brute(monkeypatch):
    """The chunk-culled MXU kernel (interpret mode on CPU) must agree
    exactly with the XLA brute sweep: the slab cull is conservative."""
    import numpy as np

    from software_rasterizer_tpu.ops.pallas_trace import (
        chunk_bounds, mt_tri_coef, trace_nearest_mm2,
    )

    rng = np.random.RandomState(3)
    F, N = 300, 512
    v0 = jnp.asarray(rng.rand(F, 3) * 2 - 1, jnp.float32)
    v1 = v0 + jnp.asarray(rng.rand(F, 3) * 0.3, jnp.float32)
    v2 = v0 + jnp.asarray(rng.rand(F, 3) * 0.3, jnp.float32)
    valid = jnp.asarray(rng.rand(F) > 0.1)
    orig = jnp.asarray(rng.rand(N, 3) * 0.2 - 2.0, jnp.float32)
    d = jnp.asarray(rng.rand(N, 3) + 0.2, jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    coef = mt_tri_coef(v0, v1, v2, valid)
    lo, hi = chunk_bounds(v0, v1, v2, valid, 64)
    hit2, i2, _ = trace_nearest_mm2(
        coef, lo, hi, orig, d, chunk=64, block=256, interpret=True
    )
    hit1, i1, _, _ = intersect_triangles(orig, d, v0, v1, v2, valid, chunk=64)
    hit1 = jnp.asarray(i1) >= 0
    assert (np.asarray(hit1) == np.asarray(hit2)).all()
    assert (np.asarray(i1) == np.asarray(i2)).all()


def test_trace_nearest_mm2_many_chunks():
    """Exercise the cull-mask plane ABOVE 128 chunks (bit c lives at
    (c // 128, c % 128) of the (8,128) mask): 160 chunks of 16 triangles
    must still match the brute sweep exactly in interpret mode."""
    import numpy as np

    from software_rasterizer_tpu.ops.pallas_trace import (
        chunk_bounds, mt_tri_coef, trace_nearest_mm2,
    )

    rng = np.random.RandomState(11)
    F, N = 16 * 160, 256  # 160 chunks at chunk=16
    # spread clusters along x so chunk AABBs are tight and culling real
    centers = rng.rand(F, 1, 3) * np.array([40.0, 2.0, 2.0]) - 1.0
    tri = centers + rng.rand(F, 3, 3) * 0.4
    v0 = jnp.asarray(tri[:, 0], jnp.float32)
    v1 = jnp.asarray(tri[:, 1], jnp.float32)
    v2 = jnp.asarray(tri[:, 2], jnp.float32)
    valid = jnp.asarray(rng.rand(F) > 0.05)
    orig = jnp.asarray(
        rng.rand(N, 3) * np.array([40.0, 1.0, 1.0]) - np.array([0.0, 0.0, 4.0]),
        jnp.float32,
    )
    d = jnp.asarray(rng.rand(N, 3) * 0.2 + np.array([0.0, 0.0, 1.0]), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    coef = mt_tri_coef(v0, v1, v2, valid)
    lo, hi = chunk_bounds(v0, v1, v2, valid, 16)
    assert lo.shape[0] == 160
    hit2, i2, _ = trace_nearest_mm2(
        coef, lo, hi, orig, d, chunk=16, block=256, interpret=True
    )
    hit1, i1, _, _ = intersect_triangles(orig, d, v0, v1, v2, valid, chunk=64)
    hit1 = jnp.asarray(i1) >= 0
    assert (np.asarray(hit1) == np.asarray(hit2)).all()
    assert (np.asarray(i1) == np.asarray(i2)).all()
    assert int(np.asarray(hit1).sum()) > 0


def test_trace_nearest_mm2_stream_matches_brute():
    """The HBM-streaming kernel (double-buffered per-chunk coefficient
    DMA) must agree exactly with the XLA brute sweep, including above
    1024 chunks (the old cull-mask cap: bit c at (c//128, c%128) of the
    now-size-derived mask plane). 1100 chunks of 16 tris, interpret
    mode."""
    import numpy as np

    from software_rasterizer_tpu.ops.pallas_trace import (
        chunk_bounds, mt_tri_coef, trace_nearest_mm2_stream,
    )

    rng = np.random.RandomState(7)
    F, N = 16 * 1100, 256
    centers = rng.rand(F, 1, 3) * np.array([60.0, 2.0, 2.0]) - 1.0
    tri = centers + rng.rand(F, 3, 3) * 0.4
    v0 = jnp.asarray(tri[:, 0], jnp.float32)
    v1 = jnp.asarray(tri[:, 1], jnp.float32)
    v2 = jnp.asarray(tri[:, 2], jnp.float32)
    valid = jnp.asarray(rng.rand(F) > 0.05)
    orig = jnp.asarray(
        rng.rand(N, 3) * np.array([60.0, 1.0, 1.0]) - np.array([0.0, 0.0, 4.0]),
        jnp.float32,
    )
    d = jnp.asarray(rng.rand(N, 3) * 0.2 + np.array([0.0, 0.0, 1.0]), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    coef = mt_tri_coef(v0, v1, v2, valid)
    lo, hi = chunk_bounds(v0, v1, v2, valid, 16)
    assert lo.shape[0] == 1100
    hit2, i2, _ = trace_nearest_mm2_stream(
        coef, lo, hi, orig, d, chunk=16, block=256, interpret=True
    )
    hit1, i1, _, _ = intersect_triangles(orig, d, v0, v1, v2, valid, chunk=64)
    hit1 = jnp.asarray(i1) >= 0
    assert (np.asarray(hit1) == np.asarray(hit2)).all()
    assert (np.asarray(i1) == np.asarray(i2)).all()
    assert int(np.asarray(hit1).sum()) > 0
