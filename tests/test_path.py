"""Path tracer tests: Cornell statistical properties, progressive
accumulation determinism, and checkpoint/resume (SURVEY.md section 4:
stochastic goldens compare converged statistics, not pixels)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from software_rasterizer_tpu.models.scene import Scene
from software_rasterizer_tpu.ops.intersect import prepare_rt_scene
from software_rasterizer_tpu.ops.path import path_render
from software_rasterizer_tpu.render.pathtracer import PathTracing
from software_rasterizer_tpu.render.pipeline import Primitive
from software_rasterizer_tpu.scenes import build_cornell_scene

W = H = 32


@pytest.fixture(scope="module")
def cornell_rt():
    scene = build_cornell_scene()
    scene.set_ndc_matrix(W, H)
    geom = scene.rt_geometry()
    return scene, prepare_rt_scene(geom, scene.rt_frame())


def test_cornell_geometry_counts():
    scene = build_cornell_scene()
    geom = scene.rt_geometry()
    assert int(geom.face_valid.sum()) == 36  # 6 quads*2 + 2 boxes*12
    assert geom.obj_emissive.sum() == 1  # only the light


def test_cornell_render_statistics(cornell_rt):
    scene, rt = cornell_rt
    raw = np.array(
        path_render(rt, W, H, scene.fovy, jax.random.PRNGKey(0), spp=32)
    )
    assert np.isfinite(raw).all()
    assert (raw >= 0).all()
    img = np.clip(raw, 0.0, 1.0)  # Tools::normalizedToRGB clamp
    # the floor (direct NEE light) outshines the ceiling band, which the
    # downward-facing emitter lights only indirectly
    assert img[H // 2 : 3 * H // 4].mean() > img[2 : H // 8].mean()
    # interior receives light: mean well above black
    interior = img[H // 3 : 2 * H // 3, W // 3 : 2 * W // 3]
    assert interior.mean() > 0.05
    # left wall is red: red channel dominates green
    left = img[H // 2, 2:5]
    assert left[:, 0].mean() > 2.0 * left[:, 1].mean()
    # right wall is green: green channel dominates red
    right = img[H // 2, W - 5 : W - 2]
    assert right[:, 1].mean() > 2.0 * right[:, 0].mean()


def test_path_render_deterministic(cornell_rt):
    scene, rt = cornell_rt
    a = path_render(rt, W, H, scene.fovy, jax.random.PRNGKey(7), spp=2)
    b = path_render(rt, W, H, scene.fovy, jax.random.PRNGKey(7), spp=2)
    np.testing.assert_array_equal(np.array(a), np.array(b))


def test_blocked_equals_unblocked(cornell_rt):
    scene, rt = cornell_rt
    a = path_render(rt, W, H, scene.fovy, jax.random.PRNGKey(3), spp=8,
                    block=1 << 16)
    b = path_render(rt, W, H, scene.fovy, jax.random.PRNGKey(3), spp=8,
                    block=W * H // 4)
    # blocked tracing only changes the lane batching, not the math, but
    # block ids key the RNG, so compare clamped statistics (the clamp
    # removes the unbounded-variance NEE fireflies, SURVEY.md 7.3)
    ca = float(jnp.mean(jnp.clip(a, 0.0, 1.0)))
    cb = float(jnp.mean(jnp.clip(b, 0.0, 1.0)))
    assert abs(ca - cb) < 0.05


def test_progressive_accumulation_matches_monolithic():
    pt = PathTracing(W, H, spp=4, seed=11)
    scene = build_cornell_scene()
    pt.add_scene(scene)
    pt.accumulate("CornellBox", 2)
    pt.accumulate("CornellBox", 2)
    progressive = pt.resolve("CornellBox").copy()
    assert pt.samples_done("CornellBox") == 4

    pt2 = PathTracing(W, H, spp=4, seed=11)
    pt2.add_scene(build_cornell_scene())
    pt2.accumulate("CornellBox", 4)
    np.testing.assert_allclose(
        progressive, pt2.resolve("CornellBox"), rtol=1e-5, atol=1e-6
    )


def test_checkpoint_roundtrip(tmp_path):
    pt = PathTracing(W, H, spp=4, seed=5)
    pt.add_scene(build_cornell_scene())
    pt.accumulate("CornellBox", 2)
    ckpt = str(tmp_path / "accum.npz")
    pt.save_checkpoint("CornellBox", ckpt)

    pt2 = PathTracing(W, H, spp=4, seed=5)
    pt2.add_scene(build_cornell_scene())
    pt2.load_checkpoint("CornellBox", ckpt)
    assert pt2.samples_done("CornellBox") == 2
    pt.accumulate("CornellBox", 2)
    pt2.accumulate("CornellBox", 2)
    np.testing.assert_allclose(
        pt.resolve("CornellBox"), pt2.resolve("CornellBox"), rtol=1e-5, atol=1e-6
    )


def test_draw_api(cornell_rt):
    pt = PathTracing(W, H, spp=2)
    pt.add_scene(build_cornell_scene())
    frame = pt.display(Primitive.TRIANGLES)
    assert frame.shape == (H, W, 3) and frame.dtype == np.uint8
    assert frame.max() > 100  # the light is visibly bright


def test_integrator_matches_scalar_oracle(cornell_rt):
    """Wavefront integrator vs a literal scalar implementation of the
    reference recursion (tests/oracle_path.py), compared statistically
    per pixel (different RNG streams; agreement within Monte-Carlo
    standard error)."""
    from software_rasterizer_tpu.ops.camera import camera_rays
    from software_rasterizer_tpu.ops.path import path_trace

    import oracle_path as op

    scene, rt = cornell_rt
    s = op.np_scene(rt)
    orig, d = camera_rays(rt.eye, scene.fovy, W, H)
    orig_np, d_np = np.asarray(orig), np.asarray(d)

    # pixels on: floor, left wall, right wall, back wall, tall box
    pixels = [(26, 16), (16, 4), (16, 27), (12, 16), (18, 21)]
    lanes = [py * W + px for py, px in pixels]
    n_samp = 500
    max_b = 16

    # oracle means + standard errors
    rng = np.random.default_rng(123)
    o_mean, o_se = [], []
    for lane in lanes:
        vals = np.array([
            op.path_trace_pixel(s, orig_np[lane], d_np[lane], rng,
                                p_rr=0.8, max_depth=max_b)
            for _ in range(n_samp)
        ])
        o_mean.append(vals.mean(0))
        o_se.append(vals.std(0) / np.sqrt(n_samp))

    # wavefront means: n_samp samples over the 5 selected lanes
    import functools

    pt = jax.jit(functools.partial(path_trace, p_rr=0.8, max_bounces=max_b))
    lo = jnp.asarray(orig_np[lanes])
    ld = jnp.asarray(d_np[lanes])
    acc = np.zeros((len(lanes), 3))
    sq = np.zeros((len(lanes), 3))
    for smp in range(n_samp):
        r = np.asarray(pt(
            rt, lo, ld, jax.random.fold_in(jax.random.PRNGKey(9), smp),
        ))
        acc += r
        sq += r * r
    w_mean = acc / n_samp
    w_se = np.sqrt(np.maximum(sq / n_samp - w_mean**2, 0.0) / n_samp)

    for i, (py, px) in enumerate(pixels):
        se = np.sqrt(np.asarray(o_se[i]) ** 2 + w_se[i] ** 2)
        tol = 5.0 * se + 0.05 + 0.1 * np.abs(o_mean[i])
        assert np.all(np.abs(w_mean[i] - o_mean[i]) < tol), (
            f"pixel {(py, px)}: oracle {o_mean[i]} vs wavefront {w_mean[i]}"
            f" (tol {tol})"
        )


def test_variance_decreases_with_spp(cornell_rt):
    """Monte-Carlo convergence: pixel noise shrinks as spp grows."""
    scene, rt = cornell_rt

    def noise(spp, key):
        a = np.array(path_render(rt, W, H, scene.fovy, jax.random.PRNGKey(key), spp=spp))
        b = np.array(path_render(rt, W, H, scene.fovy, jax.random.PRNGKey(key + 100), spp=spp))
        return np.abs(a - b).mean()

    assert noise(16, 1) < noise(1, 2)


def test_path_overflow_accounting(cornell_rt):
    """A schedule tighter than the survival curve must REPORT dropped live
    lanes; the default schedule must report zero on Cornell."""
    scene, rt = cornell_rt
    from software_rasterizer_tpu.ops.camera import camera_rays
    from software_rasterizer_tpu.ops.path import path_trace

    rt = jax.tree_util.tree_map(jnp.asarray, rt)
    orig, d = camera_rays(rt.eye, scene.fovy, 64, 64)
    key = jax.random.PRNGKey(0)
    # pathological: no Russian roulette kill (p_rr=1) and a near-zero
    # capacity (256-lane floor) after ONE bounce, when ~25% of 4096
    # lanes are still live -> guaranteed overflow
    _, stats = path_trace(rt, orig, d, key, p_rr=1.0, max_bounces=2,
                          chunk=128, compact_schedule=(1.0, 0.01),
                          with_stats=True)
    assert int(stats["dropped_lanes"]) > 0
    _, stats0 = path_trace(rt, orig, d, key, p_rr=0.8, max_bounces=8,
                           chunk=128, with_stats=True)
    assert int(stats0["dropped_lanes"]) == 0


def test_fused_path_kernel_statistics(cornell_rt):
    """The fused Pallas bounce kernel (ops/pallas_path, interpret mode on
    CPU) must agree with the XLA wavefront statistically: same estimator,
    different RNG stream. (Validated tighter on real TPU hardware:
    32x32@1024spp means agree within 0.7% — PERFORMANCE.md r2. Here spp
    is small to keep interpret mode fast, so the tolerance budgets the
    Monte-Carlo noise of 24*24*28 clipped samples, ~3.5 sigma.)"""
    scene, rt = cornell_rt
    rt = jax.tree_util.tree_map(jnp.asarray, rt)
    base = path_render(rt, 24, 24, scene.fovy, jax.random.PRNGKey(0),
                       spp=28, block=576, fused=False)
    fused = path_render(rt, 24, 24, scene.fovy, jax.random.PRNGKey(0),
                        spp=28, block=576, fused=True)
    bm = float(jnp.mean(jnp.clip(base, 0, 1)))
    fm = float(jnp.mean(jnp.clip(fused, 0, 1)))
    assert abs(bm - fm) / bm < 0.12, (bm, fm)
    # the lit structure must correlate strongly once noise is tamed by
    # clipping (independent streams -> only the signal correlates)
    b = np.clip(np.asarray(base), 0, 1).ravel()
    f = np.clip(np.asarray(fused), 0, 1).ravel()
    assert np.corrcoef(b, f)[0, 1] > 0.5


def test_fused_camera_kernel_resume_matches_monolithic(cornell_rt):
    """The persistent-wavefront camera kernel derives each sample's RNG
    stream from fold_in(key, start_sample + s): a run resumed at
    start_sample=k produces the SAME per-sample radiance values as the
    monolithic run — sums differ only by f32 reassociation."""
    from software_rasterizer_tpu.ops.pallas_path import (
        fused_path_camera_render,
    )

    scene, rt = cornell_rt
    rt = jax.tree_util.tree_map(jnp.asarray, rt)
    key = jax.random.PRNGKey(42)
    kw = dict(width=16, height=16, fovy_deg=scene.fovy, max_bounces=8,
              interpret=True)
    mono = fused_path_camera_render(rt, key, spp=6, **kw)
    a = fused_path_camera_render(rt, key, spp=3, start_sample=0, **kw)
    b = fused_path_camera_render(rt, key, spp=3, start_sample=3, **kw)
    np.testing.assert_allclose(
        np.asarray(mono), np.asarray(a) + np.asarray(b), rtol=2e-5, atol=1e-5
    )


def test_fused_bounce_group_statistics(cornell_rt):
    """The explicit-rays fused path (ops/pallas_path.fused_bounce_group,
    used by path_trace on arbitrary lane sets) must agree with the XLA
    wavefront statistically (same estimator, different RNG stream)."""
    from software_rasterizer_tpu.ops.camera import camera_rays
    from software_rasterizer_tpu.ops.path import path_trace

    scene, rt = cornell_rt
    rt = jax.tree_util.tree_map(jnp.asarray, rt)
    orig, d = camera_rays(rt.eye, scene.fovy, 24, 24)

    import functools

    @functools.partial(jax.jit, static_argnames=("fused",))
    def render(fused):
        def body(acc, s):
            r = path_trace(
                rt, orig, d, jax.random.fold_in(jax.random.PRNGKey(1), s),
                fused=fused,
            )
            return acc + r, None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((24 * 24, 3)), jnp.arange(20, dtype=jnp.int32)
        )
        return acc / 20.0

    base = render(fused=False)
    fused = render(fused=True)
    bm = float(jnp.mean(jnp.clip(base, 0, 1)))
    fm = float(jnp.mean(jnp.clip(fused, 0, 1)))
    assert abs(bm - fm) / bm < 0.12, (bm, fm)


def test_fused_kernel_emissive_sphere_primary_is_black():
    """Primary hits on an emissive SPHERE shade as Properties.color =
    (0,0,0) (the reference's sphere-color quirk, Object.hpp:36-40) — the
    fused kernels must reproduce it, not substitute the sphere's Kd
    (code-review r2 finding)."""
    from software_rasterizer_tpu.models import (
        Material, MaterialType, SphereLight,
    )
    from software_rasterizer_tpu.models.scene import Scene as SceneCls

    sc = SceneCls("spherelight", eye=(0.0, 0.0, -0.9))
    lm = Material(type=MaterialType.DIFFUSE_AND_GLOSSY, Kd=(1.0, 0.3, 0.2),
                  emission=(30.0, 30.0, 30.0))
    sc.add_graphic_obj(
        SphereLight((0.0, 0.0, 50.0), (1.0,) * 3, 20.0, lm), "light"
    )
    sc.set_ndc_matrix(16, 16)
    rt = jax.tree_util.tree_map(
        jnp.asarray, prepare_rt_scene(sc.rt_geometry(), sc.rt_frame())
    )
    img_f = np.asarray(path_render(rt, 16, 16, sc.fovy, jax.random.PRNGKey(0),
                                   spp=4, max_bounces=4, fused=True))
    img_x = np.asarray(path_render(rt, 16, 16, sc.fovy, jax.random.PRNGKey(0),
                                   spp=4, max_bounces=4, fused=False))
    # the light disk covers the image center; both backends must agree
    # it is BLACK (sphere color quirk), not the sphere's Kd
    c = img_f[7, 7], img_x[7, 7]
    np.testing.assert_allclose(c[0], c[1], atol=1e-5)
    assert np.abs(c[1]).max() < 1e-5, c


def _textured_cornell(target_mesh: str):
    """Cornell with a 2x2 in-memory texture bound to `target_mesh`."""
    from software_rasterizer_tpu.ops.shading import ShaderType
    from software_rasterizer_tpu.scenes import build_cornell_scene
    from software_rasterizer_tpu.utils.texture import Texture

    scene = build_cornell_scene()
    tex = Texture(np.asarray(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 0]]],
        np.uint8,
    ))
    scene.add_shader("t", tex, ShaderType.TEXTURE)
    scene.bind_shader_to_mesh(target_mesh, "t")
    scene.set_ndc_matrix(24, 24)
    return scene


def test_fused_gate_textured_nonemissive():
    """Textures on NON-emissive surfaces must not disable the fused
    bounce kernel anymore: path tracing consumes texture color only at
    emissive hits (Scene.cpp:676-680; the BRDF eval reads material Kd,
    Material.cpp:60). The shape-encoded tex_on_emitter flag must be
    empty and the fused render must still match the wavefront."""
    scene = _textured_cornell("back")
    rt = prepare_rt_scene(scene.rt_geometry(), scene.rt_frame())
    assert rt.textures.size > 3          # a REAL atlas is present
    assert rt.tex_on_emitter.shape[0] == 0

    base = path_render(rt, 24, 24, scene.fovy, jax.random.PRNGKey(0),
                       spp=24, block=576, fused=False)
    fused = path_render(rt, 24, 24, scene.fovy, jax.random.PRNGKey(0),
                        spp=24, block=576, fused=True)
    bm = float(jnp.mean(jnp.clip(base, 0, 1)))
    fm = float(jnp.mean(jnp.clip(fused, 0, 1)))
    assert abs(bm - fm) < 0.03, (bm, fm)


def test_fused_gate_textured_emitter_falls_back():
    """A texture bound to an EMISSIVE mesh is the one case the fused
    kernel cannot shade (in-kernel hits deposit Kd): the flag must trip
    so _fused_auto falls back to the XLA wavefront."""
    scene = _textured_cornell("light")
    rt = prepare_rt_scene(scene.rt_geometry(), scene.rt_frame())
    assert rt.tex_on_emitter.shape[0] == 1
