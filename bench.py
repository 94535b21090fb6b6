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

BASELINE_MPATHS = 2.65e6


def main():
    import jax

    from software_rasterizer_tpu.ops.intersect import prepare_rt_scene
    from software_rasterizer_tpu.ops.path import path_render
    from software_rasterizer_tpu.scenes import build_cornell_scene

    width = int(os.environ.get("BENCH_WIDTH", 1024))
    height = int(os.environ.get("BENCH_HEIGHT", 1024))
    spp = int(os.environ.get("BENCH_SPP", 16))
    repeats = int(os.environ.get("BENCH_REPEATS", 2))

    scene = build_cornell_scene()
    scene.set_ndc_matrix(width, height)
    rt = prepare_rt_scene(scene.rt_geometry(), scene.rt_frame())
    rt = jax.tree_util.tree_map(jax.device_put, rt)

    def render(seed):
        img = path_render(
            rt, width, height, scene.fovy, jax.random.PRNGKey(seed), spp=spp
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
