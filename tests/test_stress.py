"""Large-scene (>= 100K triangles) exactness: the scaling-path backends
must agree with the unculled brute-force sweep (VERDICT r1 item 6 — the
"BVH is the scaling path" claim needs proof, not assertion).

Covers, at 317,952 tessellated-bunny triangles:
  * BVH-leaf-ordered chunk culling (ops/intersect cull_chunks=True),
  * the true per-ray nearest-hit BVH traversal (ops/bvh.bvh_nearest_hit),
both against the plain masked-min sweep over all triangles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from software_rasterizer_tpu.ops.bvh import build_bvh, bvh_nearest_hit
from software_rasterizer_tpu.ops.intersect import (
    _intersect_tri_raw,
    prepare_rt_scene,
)
from software_rasterizer_tpu.scenes.stress import build_stress_scene


@pytest.fixture(scope="module")
def stress_rt():
    scene = build_stress_scene(levels=3)
    scene.set_ndc_matrix(64, 64)
    geom = scene.rt_geometry()
    rt = prepare_rt_scene(geom, scene.rt_frame())
    return scene, geom, rt


def _rays(rt, n=512, seed=0):
    """Rays from slightly outside the scene toward random surface
    points — mixed hit/miss, all triangle-directed."""
    rng = np.random.default_rng(seed)
    v0 = np.asarray(rt.v0)
    valid = np.asarray(rt.tri_valid)
    idx = rng.choice(np.flatnonzero(valid), size=n)
    targets = v0[idx] + rng.normal(0, 0.05, (n, 3))
    orig = np.asarray([0.0, 0.5, -2.5], np.float32) + rng.normal(
        0, 0.3, (n, 3)
    )
    d = targets - orig
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(orig, jnp.float32), jnp.asarray(d, jnp.float32)


def test_stress_scene_size(stress_rt):
    _, geom, rt = stress_rt
    assert int(np.asarray(geom.face_valid).sum()) >= 100_000


def test_chunk_culled_matches_brute_at_100k(stress_rt):
    _, _, rt = stress_rt
    orig, d = _rays(rt)
    hit_b, idx_b, _ = _intersect_tri_raw(
        orig, d, rt.v0, rt.v1, rt.v2, rt.tri_valid, cull_chunks=False
    )
    hit_c, idx_c, _ = _intersect_tri_raw(
        orig, d, rt.v0, rt.v1, rt.v2, rt.tri_valid, cull_chunks=True
    )
    np.testing.assert_array_equal(np.asarray(hit_b), np.asarray(hit_c))
    np.testing.assert_array_equal(np.asarray(idx_b), np.asarray(idx_c))
    assert int(np.asarray(hit_b).sum()) > 0


def test_bvh_nearest_hit_matches_brute_at_100k(stress_rt):
    _, _, rt = stress_rt
    orig, d = _rays(rt, n=256, seed=1)
    hit_b, idx_b, _ = _intersect_tri_raw(
        orig, d, rt.v0, rt.v1, rt.v2, rt.tri_valid, cull_chunks=False
    )
    v0 = np.asarray(rt.v0)
    v1 = np.asarray(rt.v1)
    v2 = np.asarray(rt.v2)
    valid = np.asarray(rt.tri_valid)
    nv = int(valid.sum())
    # rt_geometry packs padding at the tail: the valid prefix IS the
    # primitive order, so subset indices == full-table indices
    assert valid[:nv].all() and not valid[nv:].any()
    lo = np.minimum(np.minimum(v0, v1), v2)[:nv]
    hi = np.maximum(np.maximum(v0, v1), v2)[:nv]
    areas = 0.5 * np.linalg.norm(
        np.cross(v1[:nv] - v0[:nv], v2[:nv] - v0[:nv]), axis=-1
    )
    bvh = jax.tree_util.tree_map(jnp.asarray, build_bvh(lo, hi, areas))
    t_t, idx_t = bvh_nearest_hit(
        bvh, rt.v0[:nv], rt.v1[:nv], rt.v2[:nv], orig, d
    )
    np.testing.assert_array_equal(np.asarray(hit_b), np.asarray(t_t < 1e30))
    np.testing.assert_array_equal(np.asarray(idx_b), np.asarray(idx_t))
