"""Stage-level wall timing of the Whitted frame's components on the real
chip (finer than tools/profile_whitted.py's op soup): times each stage as
its own jitted program at the widths the real frame uses, so the 0.087 s
budget can be attributed before optimizing. Run: python tools/whitted_stages.py
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
)
from software_rasterizer_tpu.ops.whitted import (
    whitted_render, whitted_phong_direct, _fetch_color,
)
from software_rasterizer_tpu.utils.rng import make_key


def bench(fn, *args, reps=5):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[0])  # force (axon: block_until_ready lies)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[0])
    return (time.time() - t0) / reps


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
    print(f"tris(padded)={rt.v0.shape[0]} spheres={rt.sph_c.shape[0]}")

    orig, d = camera_rays(rt.eye, scene.fovy, width, height)
    # tile order like whitted_render
    th, tw = 16, 128

    def to_tiles(a):
        k = a.shape[-1]
        return (a.reshape(height // th, th, width // tw, tw, k)
                .transpose(0, 2, 1, 3, 4).reshape(-1, k))

    orig = jax.device_put(to_tiles(orig))
    d = jax.device_put(to_tiles(d))
    key = make_key(0)

    n = orig.shape[0]

    # 1. raw trace (t, idx) at 1M
    f_trace = jax.jit(lambda o, dd: _trace_tris(rt, o, dd, 512))
    t = bench(f_trace, orig, d)
    print(f"trace_raw @1M:        {t*1e3:8.2f} ms")

    # 2. full nearest_hit (defer_color)
    f_nh = jax.jit(lambda o, dd: nearest_hit(rt, o, dd, 512, defer_color=True))
    t = bench(f_nh, orig, d)
    print(f"nearest_hit @1M:      {t*1e3:8.2f} ms")

    # 3. emit-only shadow hit at 384K (the depth-0 deferred width)
    n_s = 384 * 1024
    f_sh = jax.jit(lambda o, dd: nearest_emit_hit(rt, o[:n_s], dd[:n_s], 512))
    t = bench(f_sh, orig, d)
    print(f"nearest_emit @384K:   {t*1e3:8.2f} ms")

    # 4. whitted_phong_direct at 384K (includes its shadow trace)
    hit = f_nh(orig, d)
    hit384 = jax.tree_util.tree_map(lambda a: a[:n_s], hit)
    col = jax.jit(lambda h: _fetch_color(rt, h))(hit384)

    f_ph = jax.jit(
        lambda h, c, dd: whitted_phong_direct(
            rt, h.coords, h.normal, c, h.mat, dd[:n_s], spp, key,
            mask=h.hit & (h.mat_type == 0),
        )
    )
    t = bench(f_ph, hit384, col, d)
    print(f"phong_direct @384K:   {t*1e3:8.2f} ms (incl shadow trace)")

    # 5. texture fetch at 384K
    f_tex = jax.jit(lambda h: _fetch_color(rt, h))
    t = bench(f_tex, hit384)
    print(f"fetch_color @384K:    {t*1e3:8.2f} ms")

    # 6. trace at the child-queue widths
    for w_ in (512 * 1024, 256 * 1024, 128 * 1024, 64 * 1024, 32 * 1024):
        f_tr = jax.jit(lambda o, dd, w_=w_: _trace_tris(rt, o[:w_], dd[:w_], 512))
        t = bench(f_tr, orig, d)
        print(f"trace_raw @{w_//1024:4d}K:     {t*1e3:8.2f} ms")

    # 7. full frame for scale
    f_frame = jax.jit(
        lambda f: whitted_render(
            prepare_rt_scene(geom, f), width, height, scene.fovy, key,
            spp=spp, max_depth=scene.max_depth,
        )
    )
    t = bench(f_frame, fr, reps=3)
    print(f"full frame:           {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
