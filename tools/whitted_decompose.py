"""END-TO-END decomposition of the whitted frame: steady frame times of
variants with stages removed (max_depth sweep, phong skipped) — the only
attribution this platform's tunnel measures reliably (profiler row times
and cross-process slopes both proved misleading; PERFORMANCE.md r4 log).

    python tools/whitted_decompose.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "examples"),
)

import jax
import numpy as np

from whitted_demo import build_scene, set_frame_matrices

from software_rasterizer_tpu.ops.intersect import prepare_rt_scene
from software_rasterizer_tpu.ops.whitted import whitted_render
from software_rasterizer_tpu.utils.rng import make_key


def main():
    width = height = 1024
    spp = 16
    scene = build_scene()
    set_frame_matrices(scene, 0.0)
    scene.set_ndc_matrix(width, height)
    geom = jax.tree_util.tree_map(jax.device_put, scene.rt_geometry())
    fr = jax.tree_util.tree_map(jax.device_put, scene.rt_frame())

    def steady(max_depth, skip):
        @jax.jit
        def render(fr):
            rt = prepare_rt_scene(geom, fr)
            return whitted_render(rt, width, height, scene.fovy, make_key(0),
                                  spp=spp, max_depth=max_depth,
                                  _debug_skip=skip)

        img = render(fr)
        np.asarray(img[0, 0, 0])
        best = 1e30
        for _ in range(4):
            t0 = time.time()
            img = render(fr)
            np.asarray(img[0, 0, 0])
            best = min(best, time.time() - t0)
        return best

    rows = []
    for md, skip, label in [
        (0, ("phong",), "d0: classify+deposit only"),
        (0, (), "d0 + phong"),
        (1, ("phong",), "d0-1 no phong (queue+spec join)"),
        (1, (), "d0-1 full"),
        (3, (), "d0-3 full"),
        (5, (), "FULL FRAME (md=5)"),
        (5, ("phong",), "md=5 no phong"),
    ]:
        t = steady(md, skip)
        rows.append((label, t))
        print(f"{label:36s} {t*1e3:8.1f} ms", flush=True)

    d = dict(rows)
    print()
    print(f"phong d0 cost:        {1e3*(d['d0 + phong'] - d['d0: classify+deposit only']):7.1f} ms")
    print(f"queue+spec d0->1:     {1e3*(d['d0-1 no phong (queue+spec join)'] - d['d0: classify+deposit only']):7.1f} ms")
    print(f"all phong:            {1e3*(d['FULL FRAME (md=5)'] - d['md=5 no phong']):7.1f} ms")
    print(f"depths 2-5 add:       {1e3*(d['FULL FRAME (md=5)'] - d['d0-1 full']):7.1f} ms")


if __name__ == "__main__":
    main()
