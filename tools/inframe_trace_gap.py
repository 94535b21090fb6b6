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


if __name__ == "__main__" and not (os.environ.get("GAP_LAYOUT")
                                   or os.environ.get("GAP_DIVERGENT")):
    main()


def variants_layout():
    """(e)/(f): rays computed + tile-permuted INSIDE the jit — the real
    frame's shape — without and with a layout barrier after the tiling."""
    width = height = 1024
    scene = build_scene()
    set_frame_matrices(scene, 0.0)
    scene.set_ndc_matrix(width, height)
    geom = jax.tree_util.tree_map(jax.device_put, scene.rt_geometry())
    fr = jax.tree_util.tree_map(jax.device_put, scene.rt_frame())
    th, tw = 16, 128

    def tiles(a):
        k = a.shape[-1]
        return (a.reshape(height // th, th, width // tw, tw, k)
                .transpose(0, 2, 1, 3, 4).reshape(-1, k))

    def make(r, barrier):
        def f():
            rt = prepare_rt_scene(geom, fr)
            o, dd = camera_rays(rt.eye, scene.fovy, width, height)
            o, dd = tiles(o), tiles(dd)
            if barrier:
                o, dd = jax.lax.optimization_barrier((o, dd))
            acc = jnp.float32(0)
            for _ in range(r):
                _, fi, t = _trace_tris(rt, o + acc * 1e-30, dd, 512)
                acc = acc + t[0]
            return acc
        return f

    s = slope(lambda r: make(r, False))
    print(f"(e) in-jit camera+tiles:            {s*1e3:7.2f} ms", flush=True)
    s = slope(lambda r: make(r, True))
    print(f"(f) + optimization_barrier:         {s*1e3:7.2f} ms", flush=True)


if __name__ == "__main__" and os.environ.get("GAP_LAYOUT"):
    variants_layout()


def variants_divergent():
    """(g): classify at 512K on DIVERGENT rays (reflect/refract of the
    depth-0 hits — the real depth-1 queue population) vs (h) coherent
    camera rays at the same width. Tests whether per-block chunk culling
    collapses for child rays."""
    width = height = 1024
    scene = build_scene()
    set_frame_matrices(scene, 0.0)
    scene.set_ndc_matrix(width, height)
    geom = jax.tree_util.tree_map(jax.device_put, scene.rt_geometry())
    fr = jax.tree_util.tree_map(jax.device_put, scene.rt_frame())
    rt = jax.jit(lambda f: prepare_rt_scene(geom, f))(fr)
    jax.block_until_ready(rt)
    th, tw = 16, 128

    def tiles(a):
        k = a.shape[-1]
        return (a.reshape(height // th, th, width // tw, tw, k)
                .transpose(0, 2, 1, 3, 4).reshape(-1, k))

    orig, d = camera_rays(rt.eye, scene.fovy, width, height)
    orig, d = jax.device_put(tiles(orig)), jax.device_put(tiles(d))

    # build the real depth-1 queue on device once
    from software_rasterizer_tpu.ops import optics
    from software_rasterizer_tpu.ops.intersect import surface_attrs
    from software_rasterizer_tpu.ops.path import compact_perm

    @jax.jit
    def children():
        lh = classify_hit(rt, orig, d, 512)
        is_spec = lh.hit & ((lh.mat_type == 1) | (lh.mat_type == 2))
        half = 256 * 1024
        perm, n_spec = compact_perm(is_spec, half)
        lh_c = jax.tree_util.tree_map(lambda a: a[perm], lh)
        o_c, d_c = orig[perm], d[perm]
        h = surface_attrs(rt, o_c, d_c, lh_c, lite=True)
        nrm = h.normal
        refl = optics.normalize(optics.reflect(d_c, nrm))
        refr = optics.normalize(optics.refract(d_c, nrm, h.ior), eps=1e-20)
        slot_ok = jnp.arange(half, dtype=jnp.int32) < n_spec
        co = jnp.concatenate([h.coords + nrm * 1e-5, h.coords - nrm * 1e-5])
        cd = jnp.concatenate([refl, refr])
        live = jnp.concatenate([slot_ok, slot_ok])
        co = jnp.where(live[:, None], co, 1e9)
        cd = jnp.where(live[:, None], cd,
                       jnp.asarray((0.0, 0.0, 1.0), jnp.float32))
        return co, cd, jnp.sum(slot_ok.astype(jnp.int32))

    co, cd, nsp = children()
    co, cd = jax.device_put(np.asarray(co)), jax.device_put(np.asarray(cd))
    print(f"spec parents: {int(nsp)}", flush=True)

    def rep(o_, d_, r):
        def f():
            acc = jnp.float32(0)
            for _ in range(r):
                _, fi, t = _trace_tris(rt, o_ + acc * 1e-30, d_, 512)
                acc = acc + t[0]
            return acc
        return f

    s = slope(lambda r: rep(co, cd, r))
    print(f"(g) trace 512K DIVERGENT children:  {s*1e3:7.2f} ms", flush=True)
    s = slope(lambda r: rep(orig[:512 * 1024], d[:512 * 1024], r))
    print(f"(h) trace 512K coherent camera:     {s*1e3:7.2f} ms", flush=True)

    # cull statistics for the child set
    from software_rasterizer_tpu.ops.pallas_trace import _cull_prepass
    ov = jax.jit(lambda: _cull_prepass(
        rt.chunk_lo, rt.chunk_hi, co, cd, 2048))()
    cnt = np.asarray(ov.sum(axis=1))
    print(f"children cull: chunks/blk mean={cnt.mean():.1f} "
          f"p50={np.median(cnt):.0f} p90={np.percentile(cnt, 90):.0f} "
          f"max={cnt.max()}", flush=True)


if __name__ == "__main__" and os.environ.get("GAP_DIVERGENT"):
    variants_divergent()
