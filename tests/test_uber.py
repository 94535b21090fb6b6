"""Persistent per-block Whitted über-kernel (ops/pallas_whitted) vs the
level-synchronous wavefront, in interpret mode on CPU.

The kernel walks each lane's FULL recursion tree (per-lane DFS), so the
right comparison target is the wavefront at LOSSLESS queue capacity
(queue_shrink=1.0, queue_factor=2**max_depth) — agreement is fp
tolerance (different program shapes reassociate FMAs; the trace math,
thresholds, and tie rules are identical by construction)."""

import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from software_rasterizer_tpu.ops.intersect import prepare_rt_scene
from software_rasterizer_tpu.ops.whitted import whitted_render
from software_rasterizer_tpu.scenes import build_cornell_scene


def test_uber_matches_wavefront_cornell():
    """Diffuse-only scene: trace + one-hot join + Phong + shadow path."""
    W, H = 128, 16
    scene = build_cornell_scene()
    scene.set_ndc_matrix(W, H)
    rt = prepare_rt_scene(scene.rt_geometry(), scene.rt_frame())
    key = jax.random.PRNGKey(0)
    ref = np.asarray(whitted_render(
        rt, W, H, scene.fovy, key, spp=1, max_depth=3, uber=False))
    ub = np.asarray(whitted_render(
        rt, W, H, scene.fovy, key, spp=1, max_depth=3, uber=True))
    np.testing.assert_allclose(ub, ref, rtol=1e-4, atol=1e-5)


def test_uber_matches_wavefront_mirror_glass():
    """MIRROR (mat_type 2) + glass forks in one scene — the über
    branch the shipped demo never exercises (it has no mirror). On the
    CPU backend the wavefront traces with the XLA scalar formulation
    while the kernel (interpret) uses the bilinear MXU math, so a small
    knife-edge population flips winners at the Cornell quad seams and
    diverges chaotically through the specular chains; the assertion is
    majority-pixel agreement + mean-level consistency (on TPU both use
    the same trace math and bunny measured bit-identical)."""
    from software_rasterizer_tpu.models import (
        Material, MaterialType, SphereObject,
    )

    scene = build_cornell_scene()
    mirror = Material(type=MaterialType.REFLECTION, ior=1.85)
    glass = Material(type=MaterialType.REFLECTION_AND_REFRACTION,
                     ior=1.49)
    scene.add_graphic_obj(
        SphereObject((-0.08, -0.08, 0.1), 0.09, mirror), "msphere")
    scene.add_graphic_obj(
        SphereObject((0.1, -0.1, 0.05), 0.08, glass), "gsphere")
    W = H = 128
    scene.set_ndc_matrix(W, H)
    rt = prepare_rt_scene(scene.rt_geometry(), scene.rt_frame())
    key = jax.random.PRNGKey(0)
    ref = np.asarray(whitted_render(
        rt, W, H, scene.fovy, key, spp=1, max_depth=5, uber=False,
        queue_shrink=1.0, queue_factor=32))
    ub = np.asarray(whitted_render(
        rt, W, H, scene.fovy, key, spp=1, max_depth=5, uber=True))
    d = np.abs(ub - ref)
    flipped = (d.max(-1) > 1e-3).mean()
    assert flipped < 0.01, f"{flipped:.2%} pixels diverged"
    assert abs(ub.mean() - ref.mean()) < 0.01 * abs(ref.mean())


def test_uber_matches_wavefront_demo(models_dir):
    """The reference main.cpp demo: glass + mirror DFS forks, texture
    slots, sphere quirks — vs the lossless-capacity wavefront. Also
    asserts the traced-ray accounting agrees exactly (the kernel's
    per-lane DFS must trace the same live-ray population the wavefront
    queues trace)."""
    sys.path.insert(0, "examples")
    from whitted_demo import build_scene, set_frame_matrices

    W, H = 128, 32
    scene = build_scene()
    set_frame_matrices(scene, 0.0)
    scene.set_ndc_matrix(W, H)
    rt = prepare_rt_scene(scene.rt_geometry(), scene.rt_frame())
    key = jax.random.PRNGKey(0)
    ref, st_ref = whitted_render(
        rt, W, H, scene.fovy, key, spp=16, max_depth=5, uber=False,
        queue_shrink=1.0, queue_factor=32, with_stats=True)
    assert int(st_ref["dropped_rays"]) == 0   # lossless target
    ub, st = whitted_render(
        rt, W, H, scene.fovy, key, spp=16, max_depth=5, uber=True,
        with_stats=True)
    np.testing.assert_allclose(
        np.asarray(ub), np.asarray(ref), rtol=1e-4, atol=1e-5)
    assert int(st["dropped_rays"]) == 0       # no texture-slot overflow
    assert int(st["rays_main"]) == int(st_ref["rays_main"])
    assert int(st["rays_shadow"]) == int(st_ref["rays_shadow"])
