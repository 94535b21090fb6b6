"""Isolate the standalone-vs-in-frame mm2 trace gap (4.4 vs ~8 ms at 1M
rays, block 2048): time the SAME trace with (a) a device-put RTScene,
(b) a scene produced by prepare_rt_scene INSIDE the same jit (the frame's
shape), (c) in-jit scene + neutered-ray where (the frame's depth-0 ray
path), (d) in-jit scene + classify epilogue. Slope method.
Run: python tools/inframe_trace_gap.py
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
from software_rasterizer_tpu.ops.intersect import (
    classify_hit, prepare_rt_scene, _trace_tris,
)

R_LO, R_HI = 1, 5


def slope(make):
    ts = {}
    for r in (R_LO, R_HI):
        f = jax.jit(make(r))
        out = f()
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        best = 1e30
        for _ in range(3):
            t0 = time.time()
            out = f()
            np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
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
    rt_put = jax.jit(lambda f: prepare_rt_scene(geom, f))(fr)
    jax.block_until_ready(rt_put)

    orig, d = camera_rays(rt_put.eye, scene.fovy, width, height)
    th, tw = 16, 128

    def to_tiles(a):
        k = a.shape[-1]
        return (a.reshape(height // th, th, width // tw, tw, k)
                .transpose(0, 2, 1, 3, 4).reshape(-1, k))

    orig = jax.device_put(to_tiles(orig))
    d = jax.device_put(to_tiles(d))

    def rep(fn, r):
        def f():
            acc = jnp.float32(0)
            for _ in range(r):
                _, fi, t = fn(acc)
                acc = acc + t[0]
            return acc
        return f

    # (a) scene as INPUT (device-put) — the standalone A/B shape
    s = slope(lambda r: rep(
        lambda acc: _trace_tris(rt_put, orig + acc * 1e-30, d, 512), r))
    print(f"(a) trace, scene device-put:        {s*1e3:7.2f} ms", flush=True)

    # (b) scene PRODUCED in-jit by prepare_rt_scene (the frame's shape)
    def make_b(r):
        def f():
            rt = prepare_rt_scene(geom, fr)
            acc = jnp.float32(0)
            for _ in range(r):
                _, fi, t = _trace_tris(rt, orig + acc * 1e-30, d, 512)
                acc = acc + t[0]
            return acc
        return f
    s = slope(make_b)
    print(f"(b) trace, scene built in-jit:      {s*1e3:7.2f} ms", flush=True)

    # (c) like (b) + the frame's neuter-where on the rays
    def make_c(r):
        def f():
            rt = prepare_rt_scene(geom, fr)
            live = jnp.ones(orig.shape[0], bool)
            acc = jnp.float32(0)
            for _ in range(r):
                o = jnp.where(live[:, None], orig + acc * 1e-30, 1e9)
                dd = jnp.where(live[:, None], d, jnp.asarray(
                    (0.0, 0.0, 1.0), jnp.float32))
                _, fi, t = _trace_tris(rt, o, dd, 512)
                acc = acc + t[0]
            return acc
        return f
    s = slope(make_c)
    print(f"(c) + neuter where:                 {s*1e3:7.2f} ms", flush=True)

    # (d) the frame's full classify step
    def make_d(r):
        def f():
            rt = prepare_rt_scene(geom, fr)
            acc = jnp.float32(0)
            for _ in range(r):
                lh = classify_hit(rt, orig + acc * 1e-30, d, 512)
                acc = acc + lh.st[0]
            return acc
        return f
    s = slope(make_d)
    print(f"(d) full classify_hit:              {s*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
