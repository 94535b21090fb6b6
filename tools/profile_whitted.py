"""Per-op device-time profile of one Whitted frame (the bench config:
1024x1024, spp=16, main.cpp demo scene). Drives the round-3 push to
>= 10 M primary rays/s — run on the real TPU:

    python tools/profile_whitted.py [WIDTH] [HEIGHT] [SPP]
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
from software_rasterizer_tpu.utils.profiling import trace, print_summary
from software_rasterizer_tpu.utils.rng import make_key


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    height = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    spp = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    scene = build_scene()
    set_frame_matrices(scene, 0.0)
    scene.set_ndc_matrix(width, height)
    geom = jax.tree_util.tree_map(jax.device_put, scene.rt_geometry())
    fr = jax.tree_util.tree_map(jax.device_put, scene.rt_frame())

    @jax.jit
    def render(fr):
        rt = prepare_rt_scene(geom, fr)
        return whitted_render(rt, width, height, scene.fovy, make_key(0),
                              spp=spp, max_depth=scene.max_depth)

    img = render(fr)
    np.asarray(img[0, 0, 0])  # force completion (axon quirk)
    t0 = time.time()
    img = render(fr)
    np.asarray(img[0, 0, 0])
    print(f"steady frame: {time.time() - t0:.3f} s (host-blocked, "
          "includes ~30ms tunnel sync)")

    with trace("/tmp/srtpu_whitted_trace") as d:
        img = render(fr)
        np.asarray(img[0, 0, 0])
    print_summary(d, top=40)


if __name__ == "__main__":
    main()
