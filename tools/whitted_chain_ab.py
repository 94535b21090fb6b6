"""Bench-style repetition-chain A/B of whitted frame variants (the
tunnel-sync-amortized methodology bench.py uses — single-frame times
carry ~30 ms sync and +-20% compile luck; chains are the only stable
frame metric). Run: python tools/whitted_chain_ab.py
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
import jax.numpy as jnp
import numpy as np

from whitted_demo import build_scene, set_frame_matrices

from software_rasterizer_tpu.ops.intersect import prepare_rt_scene
from software_rasterizer_tpu.ops.whitted import whitted_render
from software_rasterizer_tpu.utils.rng import make_key

REPS = 8


def main():
    width = height = 1024
    spp = 16
    scene = build_scene()
    set_frame_matrices(scene, 0.0)
    scene.set_ndc_matrix(width, height)
    geom = jax.tree_util.tree_map(jax.device_put, scene.rt_geometry())
    fr = jax.tree_util.tree_map(jax.device_put, scene.rt_frame())

    def chain_time(label, max_depth=5, **kw):
        @jax.jit
        def chain(fr):
            def body(carry, _):
                f2 = fr._replace(mvp=fr.mvp + carry)
                rt = prepare_rt_scene(geom, f2)
                img = whitted_render(rt, width, height, scene.fovy,
                                     make_key(0), spp=spp,
                                     max_depth=max_depth, **kw)
                return img[0, 0, 0] * 0.0, img[0, 0, 0]
            c, outs = jax.lax.scan(body, jnp.float32(0.0),
                                   jnp.arange(REPS))
            return outs

        np.asarray(chain(fr))
        best = 1e30
        for _ in range(3):
            t0 = time.time()
            np.asarray(chain(fr))
            best = min(best, time.time() - t0)
        per = best / REPS
        print(f"{label:32s} {per*1e3:8.2f} ms/frame", flush=True)
        return per

    mode = os.environ.get("CHAIN_MODE", "phong")
    if mode == "phong":
        full = chain_time("full")
        nop = chain_time("no phong", _debug_skip=("phong",))
        print(f"\nphong total (chained):  {1e3*(full-nop):7.2f} ms")
    elif mode == "depths":
        ts = {}
        for md in (0, 1, 2, 3, 5):
            ts[md] = chain_time(f"md={md} no phong", max_depth=md,
                                _debug_skip=("phong",))
        print()
        prev = 0
        for md in (0, 1, 2, 3, 5):
            print(f"md={md}: {ts[md]*1e3:7.2f} ms  "
                  f"(delta {1e3*(ts[md]-prev):+7.2f})")
            prev = ts[md]


if __name__ == "__main__":
    main()
