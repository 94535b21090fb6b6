"""Benchmark: Cornell Box path tracing throughput on the attached device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline: the reference CPU path tracer sustains ~2.65 Mpaths/s on a
16-core i7-12800HX (Cornell 1024x1024 @ 2048 spp in ~13.5 min —
BASELINE.md, README.md:561,613). Methodology mirrors the reference:
time the render step only (compile excluded, like its warmup frames).

Env overrides: BENCH_WIDTH/BENCH_HEIGHT/BENCH_SPP/BENCH_REPEATS.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MPATHS = 2.65e6   # Cornell 1024^2@2048spp in ~13.5 min (README.md:613)
BASELINE_RASTER_FPS = 58.6  # 17.06 ms median @ 1024^2, ~6K tris (README.md:612)


def bench_raster(width, height, repeats):
    """Raster mode: the reference's benchmark scene (spot + crate +
    spheres, ~6K tris, texture shaders, rotating per frame like the
    README methodology). Requires the reference assets; falls back to
    the path benchmark when absent."""
    import sys
    import time as _t

    import jax
    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "examples"))
    from whitted_demo import build_scene, set_frame_matrices

    from software_rasterizer_tpu.ops.raster import render_raster_frame

    import functools

    import jax.numpy as jnp

    scene = build_scene()
    scene.set_ndc_matrix(width, height)
    geom = scene.raster_geometry()
    active = tuple(sorted(set(int(t) for t in geom.shader_type)))
    geom = jax.tree_util.tree_map(jax.device_put, geom)

    # pre-build the rotating per-frame matrix bundles (README.md:641
    # methodology: rotation varies every frame) and render them as one
    # device-side pipeline — frames stay in flight back-to-back, like the
    # reference's in-process draw() loop (no per-frame dispatch stall)
    n_frames = max(repeats * 5, 10)

    def frames_bundle(degs):
        bundles = []
        for deg in degs:
            set_frame_matrices(scene, deg)
            bundles.append(scene.raster_frame())
        return jax.tree_util.tree_map(lambda *a: jnp.stack(a), *bundles)

    @functools.partial(jax.jit, static_argnames=())
    def render_batch(stacked):
        def one(fr):
            img, z = render_raster_frame(geom, fr, height, width,
                                         active_types=active)
            return img
        return jax.lax.map(one, stacked)

    stacked = frames_bundle([10.0 * (r + 1) for r in range(n_frames)])
    t0 = _t.time()
    render_batch(stacked).block_until_ready()   # compile + warmup
    compile_s = _t.time() - t0

    stacked = frames_bundle([10.0 * (r + 1) for r in range(n_frames, 2 * n_frames)])
    t0 = _t.time()
    render_batch(stacked).block_until_ready()
    total = _t.time() - t0
    med = total / n_frames
    fps = 1.0 / med
    print(json.dumps({
        "metric": "raster_frame_rate",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_RASTER_FPS, 3),
        "config": f"{width}x{height} ~6K tris rotating",
        "device": str(jax.devices()[0]),
        "median_ms": round(med * 1e3, 3),
        "first_call_s": round(compile_s, 3),
    }))


def bench_whitted(width, height, repeats):
    """Whitted mode: the reference main.cpp demo (glass + diffuse spheres,
    textured spot + crate) — the reference publishes no numbers for this
    pipeline (BASELINE.md), so vs_baseline reports Mrays/s per chip
    against the reference PATH tracer's ~10 Mrays/s CPU estimate."""
    import sys as _s
    import time as _t

    import jax

    _s.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "examples"))
    from whitted_demo import build_scene, set_frame_matrices

    from software_rasterizer_tpu.ops.intersect import prepare_rt_scene
    from software_rasterizer_tpu.ops.whitted import whitted_render
    from software_rasterizer_tpu.utils.rng import make_key

    scene = build_scene()
    set_frame_matrices(scene, 0.0)
    scene.set_ndc_matrix(width, height)
    geom = jax.tree_util.tree_map(jax.device_put, scene.rt_geometry())

    def frame(deg):
        set_frame_matrices(scene, deg)
        rt = prepare_rt_scene(geom, scene.rt_frame())
        img = whitted_render(rt, width, height, scene.fovy, make_key(0),
                             spp=1, max_depth=scene.max_depth)
        img.block_until_ready()
        return img

    t0 = _t.time()
    frame(0.0)
    compile_s = _t.time() - t0
    times = []
    for r in range(repeats):
        t0 = _t.time()
        frame(10.0 * (r + 1))
        times.append(_t.time() - t0)
    best = min(times)
    # primary + shadow rays per pixel, plus specular continuations:
    # conservatively count primary rays only (true ray count is higher)
    mrays = width * height / best / 1e6
    print(json.dumps({
        "metric": "whitted_primary_rays_throughput",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 10.0, 3),
        "config": f"{width}x{height} main.cpp demo scene",
        "device": str(jax.devices()[0]),
        "render_s": round(best, 3),
        "first_call_s": round(compile_s, 3),
    }))


def main():
    import jax

    from software_rasterizer_tpu.ops.intersect import prepare_rt_scene
    from software_rasterizer_tpu.ops.path import path_render
    from software_rasterizer_tpu.scenes import build_cornell_scene

    width = int(os.environ.get("BENCH_WIDTH", 1024))
    height = int(os.environ.get("BENCH_HEIGHT", 1024))
    spp = int(os.environ.get("BENCH_SPP", 16))
    repeats = int(os.environ.get("BENCH_REPEATS", 2))

    mode = os.environ.get("BENCH_MODE", "path")
    if mode in ("raster", "whitted"):
        try:
            if mode == "raster":
                return bench_raster(width, height, repeats)
            return bench_whitted(width, height, repeats)
        except Exception as e:  # assets missing etc. -> fall through
            print(f"# {mode} bench unavailable ({e}); falling back to path",
                  file=sys.stderr)

    scene = build_cornell_scene()
    scene.set_ndc_matrix(width, height)
    rt = prepare_rt_scene(scene.rt_geometry(), scene.rt_frame())
    rt = jax.tree_util.tree_map(jax.device_put, rt)

    from software_rasterizer_tpu.utils.rng import make_key

    def render(seed):
        img = path_render(
            rt, width, height, scene.fovy, make_key(seed), spp=spp
        )
        img.block_until_ready()
        return img

    t0 = time.time()
    render(0)  # compile + first run
    compile_s = time.time() - t0

    times = []
    for r in range(repeats):
        t0 = time.time()
        render(r + 1)  # fresh seed: no caching of the render itself
        times.append(time.time() - t0)

    best = min(times)
    n_paths = width * height * spp
    mpaths = n_paths / best / 1e6

    print(json.dumps({
        "metric": "cornell_path_tracing_throughput",
        "value": round(mpaths, 3),
        "unit": "Mpaths/s",
        "vs_baseline": round(mpaths * 1e6 / BASELINE_MPATHS, 3),
        "config": f"{width}x{height}@{spp}spp",
        "device": str(jax.devices()[0]),
        "render_s": round(best, 3),
        "first_call_s": round(compile_s, 3),
    }))


if __name__ == "__main__":
    main()
