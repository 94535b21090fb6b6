"""A/B the Whitted frame time across mm2 cull granules (chunk=128 vs
64 vs 256) on the demo scene (real TPU): finer chunks trim candidate
lanes per listed chunk (tighter AABBs), coarser ones cut loop/DMA
overhead — measure, don't guess.

    python tools/whitted_ab.py [WIDTH] [SPP]
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


def main():
    width = height = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from software_rasterizer_tpu.ops import intersect
    from software_rasterizer_tpu.ops.whitted import whitted_render
    from software_rasterizer_tpu.utils.rng import make_key

    scene = build_scene()
    set_frame_matrices(scene, 0.0)
    scene.set_ndc_matrix(width, height)
    geom = jax.tree_util.tree_map(jax.device_put, scene.rt_geometry())
    fr = jax.tree_util.tree_map(jax.device_put, scene.rt_frame())

    base = None
    for chunk in (128, 64, 256):
        intersect.MM2_CHUNK = chunk

        @jax.jit
        def render(fr):
            rt = intersect.prepare_rt_scene(geom, fr)
            return whitted_render(rt, width, height, scene.fovy,
                                  make_key(0), spp=spp,
                                  max_depth=scene.max_depth)

        try:
            img = render(fr)
            np.asarray(img[0, 0, 0])
            ts = []
            for _ in range(3):
                t0 = time.time()
                img = render(fr)
                np.asarray(img[0, 0, 0])
                ts.append(time.time() - t0)
            t = min(ts)
            m = float(np.asarray(img).mean())
            if base is None:
                base = m
            print(f"chunk={chunk}: {t:.4f} s/frame  "
                  f"{width * height / t / 1e6:.2f} Mrays/s  mean={m:.5f} "
                  f"(d={m - base:+.2e})", flush=True)
        except Exception as e:
            print(f"chunk={chunk}: FAIL {str(e)[:300]}", flush=True)
    intersect.MM2_CHUNK = 128


if __name__ == "__main__":
    main()
