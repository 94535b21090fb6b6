"""Distribution tests for the object samplers (reference:
Triangle::sample sqrt-u warp Triangle.cpp:187-213, Sphere::sample
(theta,phi) Sphere.cpp:156-183, BVH cumulative-area descend
BVHAcceleration.cpp:200-232, Scene::sampleLight Scene.cpp:620-669).

Chi-square goodness-of-fit at alpha ~ 1e-3 with fixed keys (deterministic,
no flaky reruns)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from software_rasterizer_tpu.ops import bvh as B
from software_rasterizer_tpu.ops import sampling as S

N = 1 << 14


def _chi2_uniform_bins(counts):
    """Chi-square statistic against equal-probability bins."""
    counts = np.asarray(counts, np.float64)
    expected = counts.sum() / counts.size
    return ((counts - expected) ** 2 / expected).sum()


def _chi2_threshold(dof):
    # ~ alpha = 1e-3 upper tail via Wilson-Hilferty approximation
    z = 3.09
    return dof * (1.0 - 2.0 / (9.0 * dof) + z * np.sqrt(2.0 / (9.0 * dof))) ** 3


def test_sample_triangle_uniform_over_area():
    v0 = jnp.tile(jnp.array([0.0, 0.0, 0.0]), (N, 1))
    v1 = jnp.tile(jnp.array([2.0, 0.0, 0.0]), (N, 1))
    v2 = jnp.tile(jnp.array([0.0, 1.0, 0.0]), (N, 1))
    n0 = n1 = n2 = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (N, 1))
    coords, normal, pdf = S.sample_triangle(
        jax.random.PRNGKey(0), v0, v1, v2, n0, n1, n2
    )
    c = np.asarray(coords)
    # all points inside the triangle (z = 0 plane)
    b2 = c[:, 0] / 2.0
    b3 = c[:, 1]
    b1 = 1.0 - b2 - b3
    assert np.abs(c[:, 2]).max() < 1e-6
    assert (b1 > -1e-5).all() and (b2 > -1e-5).all() and (b3 > -1e-5).all()
    # uniform area sampling => (b1,b2,b3) ~ Dirichlet(1,1,1):
    # chi-square over a 4x4 grid in (b2, b3) restricted to the simplex
    # (equal-area cells: P(cell) proportional to its area)
    k = 8
    ix = np.clip((b2 * k).astype(int), 0, k - 1)
    iy = np.clip((b3 * k).astype(int), 0, k - 1)
    cell = ix * k + iy
    # count only full cells strictly inside the simplex (ix + iy <= k-2)
    inside = ix + iy <= k - 2
    counts = np.bincount(cell[inside], minlength=k * k)
    full_cells = [i * k + j for i in range(k) for j in range(k) if i + j <= k - 2]
    chi2 = _chi2_uniform_bins(counts[full_cells])
    assert chi2 < _chi2_threshold(len(full_cells) - 1), chi2
    # pdf = 1/area = 1/1.0
    np.testing.assert_allclose(np.asarray(pdf), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(normal), [[0, 0, 1.0]] * N, atol=1e-6)


def test_sample_sphere_theta_phi_distribution():
    center = jnp.zeros((N, 3))
    radius = jnp.full((N,), 2.0)
    coords, normal, pdf = S.sample_sphere_surface(
        jax.random.PRNGKey(1), center, radius
    )
    c = np.asarray(coords)
    r = np.linalg.norm(c, axis=-1)
    np.testing.assert_allclose(r, 2.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(normal), c / 2.0, atol=1e-5)
    # faithful NON-uniform quirk: phi = pi * u2 so arccos(x/r)/pi ~ U[0,1]
    u_phi = np.arccos(np.clip(c[:, 0] / 2.0, -1, 1)) / np.pi
    counts = np.histogram(u_phi, bins=16, range=(0, 1))[0]
    chi2 = _chi2_uniform_bins(counts)
    assert chi2 < _chi2_threshold(15), chi2
    # azimuth theta = atan2(z, y) ~ U[-pi, pi]
    th = np.arctan2(c[:, 2], c[:, 1])
    counts = np.histogram(th, bins=16, range=(-np.pi, np.pi))[0]
    chi2 = _chi2_uniform_bins(counts)
    assert chi2 < _chi2_threshold(15), chi2
    np.testing.assert_allclose(np.asarray(pdf), 1.0 / (4 * np.pi * 4.0), rtol=1e-5)


def test_bvh_sample_area_proportional_and_matches_searchsorted():
    rng = np.random.RandomState(3)
    m = 37
    v0 = rng.rand(m, 3).astype(np.float32) * 10
    v1 = v0 + rng.rand(m, 3).astype(np.float32)
    v2 = v0 + rng.rand(m, 3).astype(np.float32)
    areas = B.triangle_areas(v0, v1, v2)
    bb_min, bb_max = B.primitive_bounds(v0, v1, v2)
    bvh = B.build_bvh(bb_min, bb_max, areas)
    bvh_dev = jax.tree_util.tree_map(jnp.asarray, bvh)

    u = jax.random.uniform(jax.random.PRNGKey(2), (N,))
    prims, pdf = B.bvh_sample_area(bvh_dev, u)
    prims = np.asarray(prims)
    assert (prims >= 0).all() and (prims < m).all()
    np.testing.assert_allclose(np.asarray(pdf), 1.0 / areas.sum(), rtol=1e-5)
    # frequency proportional to area: chi-square with per-prim expectation
    counts = np.bincount(prims, minlength=m).astype(np.float64)
    expected = areas / areas.sum() * N
    chi2 = ((counts - expected) ** 2 / expected).sum()
    assert chi2 < _chi2_threshold(m - 1), chi2
    # the descend IS the searchsorted over leaf-order prefix sums
    order = B.leaf_order(bvh)
    cum = np.cumsum(areas[order])
    want = order[
        np.minimum(np.searchsorted(cum, np.asarray(u) * cum[-1], side="right"),
                   m - 1)
    ]
    np.testing.assert_array_equal(prims, want)


def test_scene_sample_light_area_on_cornell():
    from software_rasterizer_tpu.ops.intersect import prepare_rt_scene
    from software_rasterizer_tpu.scenes import build_cornell_scene

    scene = build_cornell_scene()
    scene.set_ndc_matrix(64, 64)
    rt = prepare_rt_scene(scene.rt_geometry(), scene.rt_frame())
    rt = jax.tree_util.tree_map(jnp.asarray, rt)
    coords, normal, emit, pdf = S.sample_light_area(rt, jax.random.PRNGKey(4), N)
    emit = np.asarray(emit)
    assert (np.linalg.norm(emit, axis=-1) > 1e-5).all()  # always on a light
    # pdf = 1/area(light object) — constant for the single Cornell light
    areas, prim_obj = S.emissive_prim_areas(rt)
    total = float(np.asarray(areas).sum())
    np.testing.assert_allclose(np.asarray(pdf), 1.0 / total, rtol=1e-4)
    # every sampled point lies on one of the emissive primitives' planes
    f = rt.v0.shape[0]
    emis_tris = np.where(np.asarray(areas[:f]) > 0)[0]
    c = np.asarray(coords)
    v0 = np.asarray(rt.v0)[emis_tris]
    n_geo = np.cross(
        np.asarray(rt.v1)[emis_tris] - v0, np.asarray(rt.v2)[emis_tris] - v0
    )
    n_geo = n_geo / np.linalg.norm(n_geo, axis=-1, keepdims=True)
    d_plane = np.abs(
        np.einsum("kc,nkc->nk", n_geo, c[:, None, :] - v0[None])
    ).min(axis=1)
    assert d_plane.max() < 1e-3
