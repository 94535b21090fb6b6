"""Config sweep of the mm2s HBM-streaming trace kernel on the 318K-tri
stress scene (real TPU): block x chunk grid, reports Mrays/s each."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from software_rasterizer_tpu.ops.camera import camera_rays
from software_rasterizer_tpu.ops.intersect import prepare_rt_scene
from software_rasterizer_tpu.ops.pallas_trace import (
    chunk_bounds, trace_nearest_mm2_stream,
)
from software_rasterizer_tpu.scenes.stress import build_stress_scene


def main():
    w = h = 1024
    scene = build_stress_scene(levels=3)
    scene.set_ndc_matrix(w, h)
    geom = scene.rt_geometry()
    rt = jax.tree_util.tree_map(
        jax.device_put, prepare_rt_scene(geom, scene.rt_frame())
    )
    orig, d = camera_rays(rt.eye, scene.fovy, w, h)
    th, tw = 16, 128
    pid = (
        jnp.arange(h * w, dtype=jnp.int32)
        .reshape(h // th, th, w // tw, tw).transpose(0, 2, 1, 3).reshape(-1)
    )
    orig, d = jax.device_put(orig[pid]), jax.device_put(d[pid])

    bounds = {}
    for chunk in (128, 256):
        bounds[chunk] = jax.tree_util.tree_map(
            jax.device_put,
            chunk_bounds(rt.v0, rt.v1, rt.v2, rt.tri_valid, chunk),
        )

    for chunk in (128, 256):
        lo, hi = bounds[chunk]
        for block in (2048, 4096):
            fn = jax.jit(lambda o, dd, lo=lo, hi=hi, c=chunk, b=block:
                         trace_nearest_mm2_stream(
                             rt.mt_coef, lo, hi, o, dd, chunk=c, block=b))
            try:
                r = fn(orig, d)
                np.asarray(r[1]).reshape(-1)[0]
                ts = []
                for _ in range(3):
                    t0 = time.time()
                    r = fn(orig, d)
                    np.asarray(r[1]).reshape(-1)[0]
                    ts.append(time.time() - t0)
                t = min(ts)
                print(f"chunk={chunk} block={block}: {t:.4f} s  "
                      f"{w * h / t / 1e6:.3f} Mrays/s", flush=True)
            except Exception as e:
                print(f"chunk={chunk} block={block}: FAIL "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
