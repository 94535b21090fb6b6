"""Wavefront Whitted integrator vs the literal scalar recursion
(tests/oracle_whitted.py). With one emitter the integrator is
deterministic, so agreement is fp-tolerance, not statistical."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

import oracle_path as op  # np_scene helper
import oracle_whitted as ow

from software_rasterizer_tpu.ops.camera import camera_rays
from software_rasterizer_tpu.ops.intersect import prepare_rt_scene
from software_rasterizer_tpu.ops.whitted import whitted_render
from software_rasterizer_tpu.scenes import build_cornell_scene

W = H = 24


def _compare(scene, rt, pixels, tol=2e-2, allow_bad=0):
    img = np.array(whitted_render(
        rt, W, H, scene.fovy, jax.random.PRNGKey(0), spp=1, max_depth=5
    ))
    s = op.np_scene(rt)
    orig, d = (np.asarray(a) for a in camera_rays(rt.eye, scene.fovy, W, H))
    bad = []
    for (py, px) in pixels:
        lane = py * W + px
        want = ow.whitted(s, orig[lane], d[lane])
        got = img[py, px]
        if not np.allclose(got, want, rtol=tol, atol=tol):
            bad.append(((py, px), got, want))
    assert len(bad) <= allow_bad, f"mismatches: {bad}"


def test_cornell_whitted_matches_oracle():
    scene = build_cornell_scene()
    scene.set_ndc_matrix(W, H)
    rt = prepare_rt_scene(scene.rt_geometry(), scene.rt_frame())
    pixels = [(y, x) for y in range(2, H, 5) for x in range(2, W, 5)]
    # the |t^2-d^2| > 1e-6 shadow knife-edge can flip between f32 and the
    # f64 oracle on a few pixels (squared-distance magnitudes ~1 are at
    # f32 resolution 1e-7)
    _compare(scene, rt, pixels, allow_bad=2)


def test_demo_whitted_matches_oracle(models_dir):
    import sys

    sys.path.insert(0, "examples")
    from whitted_demo import build_scene, set_frame_matrices

    scene = build_scene()
    set_frame_matrices(scene, 0.0)
    scene.set_ndc_matrix(W, H)
    rt = prepare_rt_scene(scene.rt_geometry(), scene.rt_frame())
    pixels = [(y, x) for y in range(1, H, 4) for x in range(1, W, 4)]
    # grazing/silhouette pixels may flip branches between f32 and the f64
    # oracle; allow a small population
    _compare(scene, rt, pixels, tol=3e-2, allow_bad=3)


def test_whitted_overflow_accounting(models_dir):
    """A tight queue_shrink on the specular-heavy demo scene must REPORT
    dropped child rays; the lossless queue_shrink=1.0 must report zero."""
    import sys

    sys.path.insert(0, "examples")
    from whitted_demo import build_scene, set_frame_matrices

    scene = build_scene()
    set_frame_matrices(scene, 0.0)
    scene.set_ndc_matrix(128, 128)
    rt = prepare_rt_scene(scene.rt_geometry(), scene.rt_frame())
    key = jax.random.PRNGKey(0)
    img_tight, stats_tight = whitted_render(
        rt, 128, 128, scene.fovy, key, spp=1, max_depth=3,
        queue_shrink=0.02, with_stats=True)
    img_full, stats_full = whitted_render(
        rt, 128, 128, scene.fovy, key, spp=1, max_depth=3,
        queue_shrink=1.0, with_stats=True)
    assert int(stats_full["dropped_rays"]) == 0
    assert int(stats_tight["dropped_rays"]) > 0


def test_whitted_overflow_exact_second_pass(models_dir):
    """whitted_render_exact must HANDLE overflow, not just count it: a
    queue_shrink that drops child rays renders exactly the lossless
    full-binary-tree frame, by re-tracing only the dropped pixels at
    full capacity (the second pass never pays 2^depth queues for the
    whole frame)."""
    import sys

    sys.path.insert(0, "examples")
    from whitted_demo import build_scene, set_frame_matrices

    from software_rasterizer_tpu.ops.whitted import whitted_render_exact

    scene = build_scene()
    set_frame_matrices(scene, 0.0)
    scene.set_ndc_matrix(128, 128)
    rt = prepare_rt_scene(scene.rt_geometry(), scene.rt_frame())
    key = jax.random.PRNGKey(0)
    kw = dict(spp=1, max_depth=3)

    gt, gts = whitted_render(
        rt, 128, 128, scene.fovy, key, queue_shrink=1.0,
        queue_factor=8, with_stats=True, **kw)
    assert int(gts["dropped_rays"]) == 0
    gt = np.asarray(gt)

    img1, st1 = whitted_render(
        rt, 128, 128, scene.fovy, key, queue_shrink=0.02,
        with_stats=True, **kw)
    assert int(st1["dropped_rays"]) > 0
    mask = np.asarray(st1["dropped_px"])
    assert mask.any()
    # non-vacuous: the tight render is WRONG at the dropped pixels
    assert not np.allclose(np.asarray(img1)[mask], gt[mask],
                           rtol=1e-5, atol=1e-5)

    ex = np.asarray(whitted_render_exact(
        rt, 128, 128, scene.fovy, key, queue_shrink=0.02,
        bucket=256, **kw))
    np.testing.assert_allclose(ex, gt, rtol=1e-5, atol=1e-6)
    # the patch touches ONLY the dropped pixels
    np.testing.assert_array_equal(ex[~mask], np.asarray(img1)[~mask])


def test_deferred_shading_block_compaction_exact(models_dir):
    """The block-compacted deferred Phong stage (shade_cap) must render
    the same frame as the full-width path — both the compacted branch
    (generous cap) and the lax.cond overflow fallback (cap of ~0).

    512x512 = 128 trace blocks, enough to engage the cap (nb >= 64).
    Both branches are the same per-lane computation over the same
    2048-lane block populations, so agreement is exact up to XLA
    program-shape FMA reassociation (since round 4 the attribute join +
    Phong math live INSIDE the lax.cond branches, so even the full-width
    fallback compiles as a different program than the uncond'd
    shade_cap=None path) — assert allclose at fp tolerance and that the
    vast majority of pixels are BIT-equal."""
    import sys

    sys.path.insert(0, "examples")
    from whitted_demo import build_scene, set_frame_matrices

    w = h = 512
    scene = build_scene()
    set_frame_matrices(scene, 0.0)
    scene.set_ndc_matrix(w, h)
    rt = prepare_rt_scene(scene.rt_geometry(), scene.rt_frame())
    key = jax.random.PRNGKey(0)
    kw = dict(spp=2, max_depth=3)

    plain = np.asarray(whitted_render(
        rt, w, h, scene.fovy, key, shade_cap=None, **kw))
    comp = np.asarray(whitted_render(
        rt, w, h, scene.fovy, key, shade_cap=(0.5, 0.5), **kw))
    over = np.asarray(whitted_render(
        rt, w, h, scene.fovy, key, shade_cap=(1e-9, 1e-9), **kw))

    # overflow fallback: the full-width computation inside the cond —
    # reassociation-only drift vs the uncond'd plain program
    np.testing.assert_allclose(over, plain, rtol=1e-5, atol=1e-5)
    bitsame_o = (over == plain).all(axis=-1).mean()
    assert bitsame_o > 0.97, f"only {bitsame_o:.4f} of pixels bit-equal"
    # compacted branch: same math per lane, different program shape
    np.testing.assert_allclose(comp, plain, rtol=1e-5, atol=1e-5)
    bitsame = (comp == plain).all(axis=-1).mean()
    assert bitsame > 0.97, f"only {bitsame:.4f} of pixels bit-equal"
