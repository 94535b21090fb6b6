"""The experimental in-kernel-shaded raster path (SRT_RASTER_SHADED=1,
ops/pallas_raster.raster_tiles_shaded) vs the production deferred path,
in interpret mode. The texel-quadratic decomposition (rgb = direct +
A*texel + B*texel^2) must reproduce the deferred Blinn-Phong exactly.

The path is DEFAULT-OFF: the full kernel crashes the Mosaic compiler on
real TPU (see ops/raster.py dispatch note); this test keeps the
interpret-mode semantics pinned for when the compiler issue is
resolved."""

import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def test_shaded_raster_matches_deferred(models_dir, monkeypatch):
    sys.path.insert(0, "examples")
    from whitted_demo import build_scene, set_frame_matrices

    from software_rasterizer_tpu.ops.raster import render_raster_frame

    W = H = 256
    scene = build_scene()
    set_frame_matrices(scene, 0.0)
    scene.set_ndc_matrix(W, H)
    geom = scene.raster_geometry()
    frame = scene.raster_frame()
    active = tuple(sorted(set(int(t) for t in geom.shader_type)))

    # compare PALLAS-deferred vs PALLAS-shaded: phase 1/2 are shared,
    # so zbuf must be identical and colors agree to reassociation. (The
    # XLA tile scan differs at coverage knife-edges — wrong baseline.)
    # jax.clear_caches between calls: the env flags are read at trace
    # time, so a cached executable would make the comparison vacuous.
    monkeypatch.setenv("SRT_PALLAS_RASTER", "1")
    jax.clear_caches()
    img_d, zb_d = render_raster_frame(geom, frame, H, W,
                                      active_types=active)
    img_d, zb_d = np.asarray(img_d), np.asarray(zb_d)
    monkeypatch.setenv("SRT_RASTER_SHADED", "1")
    jax.clear_caches()
    img_s, zb_s = render_raster_frame(geom, frame, H, W,
                                      active_types=active)
    np.testing.assert_array_equal(np.asarray(zb_s), zb_d)
    np.testing.assert_allclose(
        np.asarray(img_s), img_d, rtol=1e-5, atol=1e-5)
    jax.clear_caches()  # don't leak env-flag-traced executables
