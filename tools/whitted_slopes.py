"""Slope-based device-cost attribution for the Whitted frame's stages.

Each stage runs R times INSIDE one jitted program with a serializing data
dependency, at two rep counts; (t_hi - t_lo)/(R_hi - R_lo) is the true
per-rep device cost with dispatch/tunnel overhead cancelled.
Run: python tools/whitted_slopes.py
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
    prepare_rt_scene, nearest_hit, nearest_emit_hit, _trace_tris,
    intersect_spheres, _mt_uv,
)
from software_rasterizer_tpu.ops.whitted import (
    whitted_render, whitted_phong_direct, _fetch_color,
)
from software_rasterizer_tpu.utils.rng import make_key

R_LO, R_HI = 1, 5


def slope(make_fn, *args):
    """make_fn(reps) -> jitted fn; returns per-rep seconds."""
    ts = {}
    for r in (R_LO, R_HI):
        f = make_fn(r)
        out = f(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        best = 1e30
        for _ in range(3):
            t0 = time.time()
            out = f(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
            best = min(best, time.time() - t0)
        ts[r] = best
    return (ts[R_HI] - ts[R_LO]) / (R_HI - R_LO)


def chain(stage, r):
    """Repeat `stage` r times with a serializing perturbation."""
    def f(o, d, *extra):
        acc = jnp.float32(0.0)
        for _ in range(r):
            out = stage(o + acc * 1e-30, d, *extra)
            acc = jax.tree_util.tree_leaves(out)[0].reshape(-1)[0].astype(jnp.float32)
        return acc
    return jax.jit(f)


def main():
    width = height = 1024
    spp = 16
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
    key = make_key(0)

    rows = []

    def rec(name, s):
        rows.append((name, s * 1e3))
        print(f"{name:34s} {s*1e3:8.2f} ms")

    # trace kernel alone at the frame's widths
    for w_, label in ((1024 * 1024, "1M"), (512 * 1024, "512K"),
                      (384 * 1024, "384K"), (256 * 1024, "256K"),
                      (128 * 1024, "128K"), (64 * 1024, "64K"),
                      (32 * 1024, "32K")):
        s = slope(
            lambda r, w_=w_: chain(
                lambda o, dd: _trace_tris(rt, o[:w_], dd[:w_], 512)[1], r
            ),
            orig, d,
        )
        rec(f"trace_mm2 @{label}", s)

    # full nearest_hit epilogue delta at 1M
    s = slope(
        lambda r: chain(
            lambda o, dd: nearest_hit(rt, o, dd, 512, defer_color=True).t, r
        ),
        orig, d,
    )
    rec("nearest_hit(defer) @1M", s)

    # sphere intersect alone at 1M
    s = slope(
        lambda r: chain(
            lambda o, dd: intersect_spheres(
                o, dd, rt.sph_c, rt.sph_r, rt.sph_valid, 0.0
            )[0], r
        ),
        orig, d,
    )
    rec("spheres @1M", s)

    # emit-only shadow hit at 384K
    n_s = 384 * 1024
    s = slope(
        lambda r: chain(
            lambda o, dd: nearest_emit_hit(rt, o[:n_s], dd[:n_s], 512).t, r
        ),
        orig, d,
    )
    rec("nearest_emit @384K", s)

    # phong_direct at 384K
    hit = jax.jit(
        lambda o, dd: nearest_hit(rt, o, dd, 512, defer_color=True)
    )(orig, d)
    hit384 = jax.tree_util.tree_map(lambda a: a[:n_s], hit)
    col384 = jax.jit(lambda h: _fetch_color(rt, h))(hit384)
    mask384 = hit384.hit & (hit384.mat_type == 0)
    s = slope(
        lambda r: chain(
            lambda o, dd, h, c, m: whitted_phong_direct(
                rt, h.coords + o[:n_s] * 1e-30, h.normal, c, h.mat,
                dd[:n_s], spp, key, mask=m,
            ), r
        ),
        orig, d, hit384, col384, mask384,
    )
    rec("phong_direct @384K", s)

    # texture fetch at 384K
    s = slope(
        lambda r: chain(
            lambda o, dd, h: _fetch_color(
                rt, h._replace(coords=h.coords + o[:n_s] * 1e-30)
            ), r
        ),
        orig, d, hit384,
    )
    rec("fetch_color @384K", s)

    # full frame slope (serialized on the frame's own output)
    def frame_fn(r):
        def f(fr_):
            acc = jnp.float32(0.0)
            for _ in range(r):
                rt_ = prepare_rt_scene(geom, fr_)
                rt_ = rt_._replace(eye=rt_.eye + acc * 1e-30)
                img = whitted_render(rt_, width, height, scene.fovy, key,
                                     spp=spp, max_depth=scene.max_depth)
                acc = img[0, 0, 0]
            return acc
        return jax.jit(f)

    s = slope(frame_fn, fr)
    rec("FULL FRAME", s)

    print()
    total = dict(rows)["FULL FRAME"]
    print(f"frame total {total:.2f} ms")


if __name__ == "__main__":
    main()
