"""Sharded rendering on the 8-device virtual CPU mesh (conftest.py):
device-count invariance of the path tracer's RNG/accumulation and
tile-sharded Whitted equivalence (SURVEY.md section 4: 1-device and
N-device renders must agree)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from software_rasterizer_tpu.ops.intersect import prepare_rt_scene
from software_rasterizer_tpu.ops.path import path_render
from software_rasterizer_tpu.ops.whitted import whitted_render
from software_rasterizer_tpu.parallel import (
    make_render_mesh,
    sharded_path_render,
    sharded_whitted_render,
)
from software_rasterizer_tpu.scenes import build_cornell_scene

W = H = 32
BLOCK = W * H // 8  # 8 aligned lane blocks across the frame


@pytest.fixture(scope="module")
def cornell_rt():
    scene = build_cornell_scene()
    scene.set_ndc_matrix(W, H)
    return scene, prepare_rt_scene(scene.rt_geometry(), scene.rt_frame())


def test_mesh_construction():
    m = make_render_mesh(n_spp=2)
    assert m.n_spp == 2 and m.n_tile == 4 and m.n_devices == 8
    m1 = make_render_mesh(n_spp=1, n_tile=1, devices=jax.devices()[:1])
    assert m1.n_devices == 1


def test_path_sharded_matches_single_device(cornell_rt):
    """(spp=2, tile=4) sharded render == single-device render with the
    same absolute sample/block RNG keys (fp-tolerance: psum order)."""
    scene, rt = cornell_rt
    key = jax.random.PRNGKey(42)
    spp = 4

    mono = path_render(rt, W, H, scene.fovy, key, spp=spp,
                       block=BLOCK, max_bounces=8)
    m1 = make_render_mesh(n_spp=1, n_tile=1, devices=jax.devices()[:1])
    one = sharded_path_render(rt, m1, W, H, scene.fovy, key, spp=spp,
                              block=BLOCK, max_bounces=8)
    m8 = make_render_mesh(n_spp=2, n_tile=4)
    many = sharded_path_render(rt, m8, W, H, scene.fovy, key, spp=spp,
                               block=BLOCK, max_bounces=8)

    np.testing.assert_allclose(np.array(one), np.array(mono), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.array(many), np.array(mono), rtol=1e-4, atol=1e-4)


def test_path_sharded_tile_counts(cornell_rt):
    """Different tile-axis widths agree when lane blocks stay aligned.

    RNG keys are identical per (sample, block); the only divergence is fp
    reassociation between the lax.map-traced and straight-line programs,
    which can flip the reference's |t^2-d^2| shadow test on borderline
    lanes — so allow a <1% population of branch-flipped pixels."""
    scene, rt = cornell_rt
    key = jax.random.PRNGKey(3)
    m2 = make_render_mesh(n_spp=1, n_tile=2, devices=jax.devices()[:2])
    m8t = make_render_mesh(n_spp=1, n_tile=8)
    a = np.array(sharded_path_render(rt, m2, W, H, scene.fovy, key, spp=2,
                                     block=BLOCK, max_bounces=8))
    b = np.array(sharded_path_render(rt, m8t, W, H, scene.fovy, key, spp=2,
                                     block=BLOCK, max_bounces=8))
    mismatched = np.abs(a - b) > 1e-3 * (1.0 + np.abs(a))
    assert mismatched.mean() < 0.01, f"{mismatched.mean():.3%} lanes diverged"


def test_whitted_sharded_matches_single_device(cornell_rt):
    scene, rt = cornell_rt
    key = jax.random.PRNGKey(0)
    mono = whitted_render(rt, W, H, scene.fovy, key, spp=1, max_depth=3)
    m8 = make_render_mesh(n_spp=2, n_tile=4)
    shard = sharded_whitted_render(rt, m8, W, H, scene.fovy, key, spp=1,
                                   max_depth=3)
    # Whitted is deterministic per lane except the per-depth emitter key,
    # which is lane-independent -> results must match exactly
    np.testing.assert_allclose(np.array(shard), np.array(mono), rtol=1e-5, atol=1e-6)


def test_sharded_validation_errors(cornell_rt):
    scene, rt = cornell_rt
    m8 = make_render_mesh(n_spp=2, n_tile=4)
    with pytest.raises(ValueError, match="spp"):
        sharded_path_render(rt, m8, W, H, scene.fovy, jax.random.PRNGKey(0),
                            spp=3, block=BLOCK)


def _two_emitter_scene():
    """Cornell + an extra sphere light: exercises per-lane emitter picks
    (with one emitter the pick is deterministic and bugs hide)."""
    from software_rasterizer_tpu.models import Material, MaterialType, SphereLight

    scene = build_cornell_scene()
    lm = Material(type=MaterialType.DIFFUSE_AND_GLOSSY, Kd=(0.9,) * 3,
                  emission=(20.0, 18.0, 15.0))
    scene.add_graphic_obj(SphereLight((150.0, 400.0, 250.0), (1.0,) * 3, 40.0, lm),
                          "light2")
    scene.set_ndc_matrix(W, H)
    return scene, prepare_rt_scene(scene.rt_geometry(), scene.rt_frame())


def test_whitted_sharded_multi_emitter_matches():
    """With TWO emitters the per-lane emitter pick must still make the
    sharded render reproduce the monolithic one exactly (picks are keyed
    by absolute ray identity, not local lane position)."""
    scene, rt = _two_emitter_scene()
    key = jax.random.PRNGKey(7)
    mono = whitted_render(rt, W, H, scene.fovy, key, spp=2, max_depth=3)
    m8 = make_render_mesh(n_spp=2, n_tile=4)
    shard = sharded_whitted_render(rt, m8, W, H, scene.fovy, key, spp=2,
                                   max_depth=3)
    np.testing.assert_allclose(np.array(shard), np.array(mono), rtol=1e-5, atol=1e-6)
    # sanity: the two-emitter picks actually differ across lanes somewhere
    # (a constant pick would make this test as weak as the 1-emitter one)
    from software_rasterizer_tpu.utils.rng import lane_uniforms

    u = np.array(lane_uniforms(key, jnp.arange(1024, dtype=jnp.int32), 0))
    assert 0.3 < (u < 0.5).mean() < 0.7 and np.unique(u).size > 1000


def test_whitted_sharded_exact_overflow(models_dir):
    """r4-verdict item 4: an OVERFLOWING queue config must render the
    same lossless frame on the 8-device mesh as monolithic
    `whitted_render_exact` — the sharded pass 1 counts/marks drops
    identically (stats plumbed through the shard bodies, psummed), and
    the sharded pass 2 re-traces the dropped pixels at lossless capacity
    across devices. Per-pixel agreement is allclose (block compaction
    reassociates FMAs; values are keyed by absolute pixel id)."""
    import sys

    sys.path.insert(0, "examples")
    from whitted_demo import build_scene, set_frame_matrices

    from software_rasterizer_tpu.ops.whitted import whitted_render_exact
    from software_rasterizer_tpu.parallel import sharded_whitted_render_exact

    scene = build_scene()
    set_frame_matrices(scene, 0.0)
    w = 256  # at 128^2 the per-shard 1024-lane queue floor absorbs all
    #          children and the sharded pass never overflows (vacuous)
    scene.set_ndc_matrix(w, w)
    rt = prepare_rt_scene(scene.rt_geometry(), scene.rt_frame())
    key = jax.random.PRNGKey(0)
    kw = dict(spp=1, max_depth=3, queue_shrink=0.02)

    mono, st_m = whitted_render_exact(
        rt, w, w, scene.fovy, key, bucket=256, return_stats=True, **kw)
    assert int(st_m["dropped_rays"]) > 0  # non-vacuous: pass 2 ran

    m8 = make_render_mesh(n_spp=2, n_tile=4)
    shard, st_s = sharded_whitted_render_exact(
        rt, m8, w, w, scene.fovy, key, bucket=256, return_stats=True,
        **kw)
    # drop COUNTS legitimately differ (the geometric queue schedule and
    # its 1024-lane floor apply per lane set, so each shard has
    # relatively more capacity than its monolithic slice) — but the
    # sharded pass 1 must still overflow here for the recovery pass to
    # be exercised at all
    assert int(st_s["dropped_rays"]) > 0
    np.testing.assert_allclose(
        np.asarray(shard), np.asarray(mono), rtol=1e-5, atol=1e-6)


def test_raster_sharded_bitexact(models_dir):
    """Row-sharded rasterization must reassemble BIT-EXACTLY: every
    per-pixel op sees absolute (x, y) coordinates, so shard programs are
    elementwise identical to the monolithic frame (the deterministic
    analog of the reference's TBB row split, Rasterizer.cpp:217-236)."""
    from software_rasterizer_tpu.models import PointLight, Scene
    from software_rasterizer_tpu.ops.raster import render_raster_frame
    from software_rasterizer_tpu.ops.shading import ShaderType
    from software_rasterizer_tpu.parallel import sharded_raster_render

    scene = Scene("ShardScene", eye=(0.0, 0.0, -0.9))
    scene.add_graphic_obj(
        str(models_dir / "spot" / "spot_triangulated_good.obj"),
        "spot", (0, 1, 0), 140.0, (0.0, 0.05, 0.1), (0.35, 0.35, 0.35),
    )
    scene.start_loading_mesh("spot")
    scene.add_shader(
        "tex", str(models_dir / "spot" / "spot_texture.png"),
        ShaderType.TEXTURE,
    )
    scene.bind_shader_to_mesh("spot", "tex")
    scene.add_light("L1", PointLight((0.9, 0.9, -0.9), (100, 100, 100)))
    scene.set_projection_matrix(45.0, 0.1, 100.0)
    scene.set_ndc_matrix(64, 64)
    geom, frame = scene.raster_geometry(), scene.raster_frame()
    active = tuple(sorted(set(int(t) for t in geom.shader_type)))

    img, zb = render_raster_frame(geom, frame, 64, 64, active_types=active)
    m8 = make_render_mesh(n_spp=2, n_tile=4)
    img_s, zb_s = sharded_raster_render(geom, frame, m8, 64, 64,
                                        active_types=active)
    assert (np.asarray(zb) < np.inf).sum() > 200
    np.testing.assert_array_equal(np.asarray(img_s), np.asarray(img))
    np.testing.assert_array_equal(np.asarray(zb_s), np.asarray(zb))


def test_fused_camera_sharded_matches_monolithic():
    """The persistent-wavefront camera kernel sharded over a
    ("spp","tile") mesh must reproduce the monolithic fused render:
    RNG streams are keyed by absolute (pixel, sample), so every
    per-sample radiance value is identical — the spp psum only changes
    f32 association (interpret mode on the CPU mesh)."""
    scene = build_cornell_scene()
    w = 16
    scene.set_ndc_matrix(w, w)
    rt = jax.tree_util.tree_map(
        jnp.asarray, prepare_rt_scene(scene.rt_geometry(), scene.rt_frame())
    )
    key = jax.random.PRNGKey(3)
    mono = path_render(rt, w, w, scene.fovy, key, spp=4, max_bounces=6,
                       fused=True)
    m = make_render_mesh(n_spp=2, n_tile=4)
    shard = sharded_path_render(rt, m, w, w, scene.fovy, key, spp=4,
                                max_bounces=6, fused=True)
    np.testing.assert_allclose(
        np.array(shard), np.array(mono), rtol=3e-5, atol=1e-5
    )
