"""Benchmark harness: all three render pipelines on the attached device.

Prints ONE JSON line per pipeline (raster, whitted, path — path last,
it is the headline metric the driver parses):
    {"metric", "value", "unit", "vs_baseline", ...}

Baselines (reference i7-12800HX, BASELINE.md):
  * raster: 58.6 fps median @1024^2 ~6K tris (README.md:612 — 17.06 ms
    per-frame median, individually timed draw() calls)
  * path:   2.65 Mpaths/s (Cornell 1024^2@2048spp in ~13.5 min,
    README.md:561,613)
  * whitted: no published reference numbers; vs_baseline compares
    Mrays/s against the reference PATH tracer's ~10 Mrays/s estimate.

Methodology mirrors the reference: render step only, compile excluded
(its 100-frame warmup), rotation varied per frame for raster
(README.md:629-642). Raster reports the TRUE per-frame median (each
frame individually dispatched and blocked) plus the pipelined
throughput as a separate field.

Env overrides: BENCH_MODE=all|path|raster|whitted, BENCH_WIDTH/
BENCH_HEIGHT/BENCH_SPP/BENCH_REPEATS/BENCH_FRAMES.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MPATHS = 2.65e6    # README.md:613
BASELINE_RASTER_FPS = 58.6  # README.md:612


def _emit(obj):
    print(json.dumps(obj), flush=True)


def bench_raster(width, height, n_frames):
    """Reference benchmark scene (spot + crate + spheres, ~6K tris,
    texture shaders, per-frame rotation)."""
    import functools
    import statistics
    import time as _t

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "examples"))
    from whitted_demo import build_scene, set_frame_matrices

    from software_rasterizer_tpu.ops.raster import render_raster_frame

    scene = build_scene()
    scene.set_ndc_matrix(width, height)
    geom = scene.raster_geometry()
    active = tuple(sorted(set(int(t) for t in geom.shader_type)))
    geom = jax.tree_util.tree_map(jax.device_put, geom)

    @functools.partial(jax.jit, static_argnames=())
    def render_one(fr):
        img, _ = render_raster_frame(geom, fr, height, width, active_types=active)
        return img

    def frame_bundle(deg):
        set_frame_matrices(scene, deg)
        return jax.tree_util.tree_map(jax.device_put, scene.raster_frame())

    t0 = _t.time()
    render_one(frame_bundle(0.0)).block_until_ready()
    compile_s = _t.time() - t0

    # SEQUENTIAL per-frame timing, reference-faithful: the reference's
    # harness draws 1000 rotated frames in one synchronous CPU loop and
    # times each draw (README.md:629-642) — consecutive frames cannot
    # overlap. We reproduce that ON DEVICE: one program scans over the
    # n_frames rotated frame bundles with a DATA DEPENDENCY (frame i+1's
    # matrices consume 0*frame_i's output), so frames execute strictly
    # back-to-back with no pipelining; wall/n_frames is the true
    # sequential per-frame time. (Host-blocked per-call timing on this
    # platform pays a fixed ~26 ms tunnel sync per call that measures
    # the fabric, not the renderer; reported below as lat_* fields.)
    bundles = [frame_bundle(10.0 * (i + 1)) for i in range(n_frames)]
    stacked = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *bundles)

    @jax.jit
    def render_chain(st):
        def body(carry, fr):
            fr = fr._replace(ndc_mvp=fr.ndc_mvp + carry)
            img, _ = render_raster_frame(
                geom, fr, height, width, active_types=active
            )
            return img[0, 0, 0] * 0.0, img[0, 0, 0]
        _, checks = jax.lax.scan(body, jnp.float32(0.0), st)
        return checks

    import numpy as np
    np.asarray(render_chain(stacked))   # compile + warm
    seq_ms = []
    for _ in range(5):
        t0 = _t.time()
        np.asarray(render_chain(stacked))  # fetch forces completion
        seq_ms.append((_t.time() - t0) / n_frames * 1e3)
    seq_ms.sort()
    med = seq_ms[len(seq_ms) // 2]
    p10, p90 = seq_ms[0], seq_ms[-1]

    # pipelined throughput (independent frames in flight) — separate
    t0 = _t.time()
    outs = [render_one(fr) for fr in bundles]
    np.asarray(outs[-1][0, 0, 0])
    pipe_fps = n_frames / (_t.time() - t0)

    # host-blocked single-call latency (includes platform sync)
    lat = []
    for fr in bundles[:10]:
        t0 = _t.time()
        render_one(fr).block_until_ready()
        lat.append((_t.time() - t0) * 1e3)

    fps = 1e3 / med
    _emit({
        "metric": "raster_frame_rate",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_RASTER_FPS, 3),
        "config": f"{width}x{height} ~6K tris rotating",
        "device": str(jax.devices()[0]),
        "median_ms": round(med, 3),
        "p10_ms": round(p10, 3),
        "p90_ms": round(p90, 3),
        "methodology": "on-device sequential chain of rotated frames "
                       "(data-dependent scan), wall/n over 5 runs",
        "throughput_fps": round(pipe_fps, 2),
        "lat_blocked_ms": round(statistics.median(lat), 2),
        "n_frames": n_frames,
        "first_call_s": round(compile_s, 3),
    })


def bench_whitted(width, height, repeats):
    """The reference main.cpp demo (glass + diffuse spheres, textured
    spot + crate)."""
    import time as _t

    import jax

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "examples"))
    from whitted_demo import build_scene, set_frame_matrices

    from software_rasterizer_tpu.ops.intersect import prepare_rt_scene
    from software_rasterizer_tpu.ops.whitted import whitted_render
    from software_rasterizer_tpu.utils.rng import make_key

    import functools

    import jax.numpy as jnp
    import numpy as np

    scene = build_scene()
    set_frame_matrices(scene, 0.0)
    scene.set_ndc_matrix(width, height)
    geom = jax.tree_util.tree_map(jax.device_put, scene.rt_geometry())

    def frame_bundle(deg):
        set_frame_matrices(scene, deg)
        return jax.tree_util.tree_map(jax.device_put, scene.rt_frame())

    n_frames = 4
    bundles = [frame_bundle(10.0 * i) for i in range(n_frames)]
    stacked = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *bundles)

    # on-device sequential chain (see bench_raster for why): scene prep
    # (updatePosition analog) runs INSIDE the step, like the reference's
    # per-frame updatePosition (RayTracing.cpp:37)
    @jax.jit
    def render_chain(st):
        def body(carry, fr):
            fr = fr._replace(mvp=fr.mvp + carry)
            rt = prepare_rt_scene(geom, fr)
            # spp=16 = the reference RayTracing pipeline's default
            # (RayTracing.hpp:12). The integrator regroups the spp
            # emitter picks by distinct emitter (ops/whitted), so the
            # demo scene (one emitter) pays ONE shadow trace per depth.
            img = whitted_render(rt, width, height, scene.fovy, make_key(0),
                                 spp=16, max_depth=scene.max_depth)
            return img[0, 0, 0] * 0.0, img[0, 0, 0]
        _, checks = jax.lax.scan(body, jnp.float32(0.0), st)
        return checks

    t0 = _t.time()
    np.asarray(render_chain(stacked))
    compile_s = _t.time() - t0
    times = []
    for r in range(repeats):
        t0 = _t.time()
        np.asarray(render_chain(stacked))
        times.append((_t.time() - t0) / n_frames)
    best = min(times)
    mrays = width * height / best / 1e6  # primary rays only (conservative)
    _emit({
        "metric": "whitted_primary_rays_throughput",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 10.0, 3),
        "config": f"{width}x{height} main.cpp demo scene, spp=16",
        "device": str(jax.devices()[0]),
        "render_s": round(best, 3),
        "methodology": "on-device sequential chain incl. per-frame scene "
                       "transform, best of repeats",
        "first_call_s": round(compile_s, 3),
    })


def bench_path(width, height, spp, repeats):
    import jax

    from software_rasterizer_tpu.ops.intersect import prepare_rt_scene
    from software_rasterizer_tpu.ops.path import path_render
    from software_rasterizer_tpu.scenes import build_cornell_scene
    from software_rasterizer_tpu.utils.rng import make_key

    scene = build_cornell_scene()
    scene.set_ndc_matrix(width, height)
    rt = prepare_rt_scene(scene.rt_geometry(), scene.rt_frame())
    rt = jax.tree_util.tree_map(jax.device_put, rt)

    import numpy as np

    def render(seed):
        img = path_render(rt, width, height, scene.fovy, make_key(seed), spp=spp)
        # a one-element fetch forces completion: on this platform
        # block_until_ready() can return before the program finishes
        # (see bench_raster methodology note)
        np.asarray(img[0, 0, 0])
        return img

    t0 = time.time()
    render(0)
    compile_s = time.time() - t0
    times = []
    for r in range(repeats):
        t0 = time.time()
        render(r + 1)  # fresh seed: no caching of the render itself
        times.append(time.time() - t0)
    best = min(times)
    mpaths = width * height * spp / best / 1e6
    _emit({
        "metric": "cornell_path_tracing_throughput",
        "value": round(mpaths, 3),
        "unit": "Mpaths/s",
        "vs_baseline": round(mpaths * 1e6 / BASELINE_MPATHS, 3),
        "config": f"{width}x{height}@{spp}spp",
        "device": str(jax.devices()[0]),
        "render_s": round(best, 3),
        "first_call_s": round(compile_s, 3),
    })


def bench_stress(width, height, repeats):
    """Scaling-path proof (VERDICT r1 item 6): nearest-hit primary-ray
    sweep on the 318K-triangle tessellated bunny, chunk-culled vs
    unculled brute force. Not part of the default run (BENCH_MODE=stress):
    the reference has no comparable workload — this measures OUR scaling
    claim, reported as the culled/brute speedup factor."""
    import time as _t

    import jax
    import numpy as np

    from software_rasterizer_tpu.ops.camera import camera_rays
    from software_rasterizer_tpu.ops.intersect import (
        _intersect_tri_raw,
        prepare_rt_scene,
    )
    from software_rasterizer_tpu.scenes.stress import build_stress_scene

    scene = build_stress_scene(levels=3)
    scene.set_ndc_matrix(width, height)
    geom = scene.rt_geometry()
    rt = jax.tree_util.tree_map(
        jax.device_put, prepare_rt_scene(geom, scene.rt_frame())
    )
    n_tri = int(np.asarray(geom.face_valid).sum())
    orig, d = camera_rays(rt.eye, scene.fovy, width, height)
    orig, d = jax.device_put(orig), jax.device_put(d)

    import functools

    import jax.numpy as jnp

    def run(cull, block=8192):
        # blocked sweep (the production shape, ops/whitted
        # blocked_nearest_hit): per-chunk culling needs RAY LOCALITY —
        # an any() over the full frame enters every chunk some ray
        # touches, which at full width is all of them
        def blocked(o, dd):
            nb = o.shape[0] // block
            return jax.lax.map(
                lambda od: _intersect_tri_raw(
                    od[0], od[1], rt.v0, rt.v1, rt.v2, rt.tri_valid,
                    chunk=512, cull_chunks=cull,
                ),
                (o.reshape(nb, block, 3), dd.reshape(nb, block, 3)),
            )

        f = jax.jit(blocked)
        hit, idx = f(orig, d)
        np.asarray(idx[0, 0])
        ts = []
        for _ in range(repeats):
            t0 = _t.time()
            hit, idx = f(orig, d)
            np.asarray(idx[0, 0])
            ts.append(_t.time() - t0)
        return min(ts), idx

    t_cull, idx_c = run(True)
    t_brute, idx_b = run(False)
    exact = bool(np.array_equal(np.asarray(idx_c), np.asarray(idx_b)))
    mrays = width * height / t_cull / 1e6
    _emit({
        "metric": "stress_trace_throughput",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": None,
        "config": f"{width}x{height} primary rays, {n_tri} tris",
        "device": str(jax.devices()[0]),
        "culled_s": round(t_cull, 4),
        "brute_s": round(t_brute, 4),
        "cull_speedup": round(t_brute / t_cull, 2),
        "exact_vs_brute": exact,
    })


def main():
    width = int(os.environ.get("BENCH_WIDTH", 1024))
    height = int(os.environ.get("BENCH_HEIGHT", 1024))
    spp = int(os.environ.get("BENCH_SPP", 16))
    repeats = int(os.environ.get("BENCH_REPEATS", 2))
    n_frames = int(os.environ.get("BENCH_FRAMES", 30))
    mode = os.environ.get("BENCH_MODE", "all")

    if mode == "all":
        # one fresh PROCESS per pipeline: after the raster bench runs,
        # whitted/path compiles in the same process fail with a backend
        # INVALID_ARGUMENT on this platform (reproducible; isolation is
        # the robust fix — the compile cache keeps restarts cheap).
        # Path (the headline) runs LAST so its JSON line is the tail.
        import subprocess

        env = dict(os.environ)
        for sub in ("raster", "whitted", "path"):
            env["BENCH_MODE"] = sub
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                stdout=subprocess.PIPE, text=True, timeout=3600,
            )
            sys.stdout.write(r.stdout)
            sys.stdout.flush()
            if r.returncode != 0:
                print(f"# {sub} bench failed (rc={r.returncode})",
                      file=sys.stderr)
        return

    def attempt(fn, *args, required=False):
        # the tunnel-attached TPU occasionally throws a transient error;
        # one retry recovers it
        err = None
        for i in range(2):
            try:
                return fn(*args)
            except Exception as e:
                print(f"# {fn.__name__} attempt {i} failed ({e})",
                      file=sys.stderr)
                err = e
        if required:
            raise err
        return None

    if mode == "raster":
        attempt(bench_raster, width, height, n_frames)
    if mode == "whitted":
        attempt(bench_whitted, width, height, repeats)
    if mode == "path":
        attempt(bench_path, width, height, spp, repeats, required=True)
    if mode == "stress":
        attempt(bench_stress, width, height, max(repeats, 2))


if __name__ == "__main__":
    main()
