"""The fused path kernel's MXU dual-trace tier (>512 triangles,
ops/pallas_path._make_dual_trace_mm) vs the SMEM scalar-loop tier, in
interpret mode.

Both tiers share identical RNG streams (same seeds, same draw order),
so forcing the mm tier on the small Cornell scene is a near-exact A/B:
lanes agree except where a knife-edge winner flips (the MXU bilinear
form rounds differently than the scalar Moller-Trumbore; a flipped
bounce diverges chaotically after that point — a different, equally
valid MC sample). The estimator is unbiased either way; the assertion
is majority per-lane agreement plus mean-level consistency."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from software_rasterizer_tpu.ops.intersect import prepare_rt_scene
from software_rasterizer_tpu.ops.pallas_path import fused_path_camera_render
from software_rasterizer_tpu.scenes import build_cornell_scene


def test_fused_mm_tier_matches_loop_tier():
    w = 16
    scene = build_cornell_scene()
    scene.set_ndc_matrix(w, w)
    rt = prepare_rt_scene(scene.rt_geometry(), scene.rt_frame())
    key = jax.random.PRNGKey(3)
    loop = np.asarray(fused_path_camera_render(
        rt, key, w, w, scene.fovy, 4, max_bounces=6, interpret=True,
        _force_mm=False))
    mm = np.asarray(fused_path_camera_render(
        rt, key, w, w, scene.fovy, 4, max_bounces=6, interpret=True,
        _force_mm=True))
    rel = np.abs(mm - loop) / (np.abs(loop) + 1e-3)
    agree = (rel <= 1e-3).mean()
    assert agree > 0.95, f"only {agree:.1%} of lane-channels agree"
    # knife-edge lanes resample, not bias: means stay consistent at
    # this tiny sample count
    assert abs(mm.mean() - loop.mean()) < 0.15 * abs(loop.mean()) + 0.05
