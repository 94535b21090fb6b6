"""A/B the fused-cull mm2 kernel (trace_nearest_mm2c) against the
prepass+list pipeline (trace_nearest_mm2) on the demo frame's depth-0
rays, same-process slope method. Run: python tools/mm2c_ab.py
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

from software_rasterizer_tpu.ops.camera import camera_rays
from software_rasterizer_tpu.ops.intersect import prepare_rt_scene, MM2_CHUNK
from software_rasterizer_tpu.ops.pallas_trace import (
    trace_nearest_mm2, trace_nearest_mm2c,
)

R_LO, R_HI = 1, 5


def slope(make):
    ts = {}
    for r in (R_LO, R_HI):
        f = jax.jit(make(r))
        out = f()
        np.asarray(out.reshape(-1)[0])
        best = 1e30
        for _ in range(3):
            t0 = time.time()
            out = f()
            np.asarray(out.reshape(-1)[0])
            best = min(best, time.time() - t0)
        ts[r] = best
    return (ts[R_HI] - ts[R_LO]) / (R_HI - R_LO)


def main():
    width = height = 1024
    scene = build_scene()
    set_frame_matrices(scene, 0.0)
    scene.set_ndc_matrix(width, height)
    geom = jax.tree_util.tree_map(jax.device_put, scene.rt_geometry())
    fr = jax.tree_util.tree_map(jax.device_put, scene.rt_frame())
    rt = jax.jit(lambda f: prepare_rt_scene(geom, f))(fr)
    jax.block_until_ready(rt)

    orig, d = camera_rays(rt.eye, scene.fovy, width, height)
    th, tw = 16, 128

    def to_tiles(a):
        k = a.shape[-1]
        return (a.reshape(height // th, th, width // tw, tw, k)
                .transpose(0, 2, 1, 3, 4).reshape(-1, k))

    orig = jax.device_put(to_tiles(orig))
    d = jax.device_put(to_tiles(d))

    for name, fn in (("mm2 (prepass+list)", trace_nearest_mm2),
                     ("mm2c (fused cull)", trace_nearest_mm2c)):
        def make(r, fn=fn):
            def f():
                acc = jnp.float32(0)
                for _ in range(r):
                    _, fi, t = fn(rt.mt_coef, rt.chunk_lo, rt.chunk_hi,
                                  orig + acc * 1e-30, d,
                                  chunk=MM2_CHUNK, block=2048)
                    acc = acc + t[0]
                return acc
            return f
        s = slope(make)
        print(f"{name:22s} {s*1e3:7.2f} ms @1M", flush=True)

    _, i1, _ = jax.jit(lambda: trace_nearest_mm2(
        rt.mt_coef, rt.chunk_lo, rt.chunk_hi, orig, d,
        chunk=MM2_CHUNK, block=2048))()
    _, i2, _ = jax.jit(lambda: trace_nearest_mm2c(
        rt.mt_coef, rt.chunk_lo, rt.chunk_hi, orig, d,
        chunk=MM2_CHUNK, block=2048))()
    print("winners identical:", bool((np.asarray(i1) == np.asarray(i2)).all()))


if __name__ == "__main__":
    main()
