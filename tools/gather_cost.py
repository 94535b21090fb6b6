"""Measure TPU row-gather cost vs (rows, cols) + the whitted epilogue's
component costs, to direct the classify/join restructure. Slope method:
each program performs r DISTINCT gathers (offset indices — CSE-proof);
per-gather cost = (t(r_hi) - t(r_lo)) / (r_hi - r_lo), dispatch overhead
cancelled. Run: python tools/gather_cost.py
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

R_LO, R_HI = 2, 10


def timeit(g, *args, n=5):
    out = g(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    best = 1e30
    for _ in range(n):
        t0 = time.time()
        out = g(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        best = min(best, time.time() - t0)
    return best


def slope(make, *args):
    lo = timeit(jax.jit(make(R_LO)), *args)
    hi = timeit(jax.jit(make(R_HI)), *args)
    return (hi - lo) / (R_HI - R_LO)


def main():
    key = jax.random.PRNGKey(0)
    f_rows = 5888 + 3

    for n in (1024 * 1024, 384 * 1024, 128 * 1024):
        idx0 = jax.random.randint(key, (n,), 0, f_rows, jnp.int32)
        for cols in (1, 9, 12, 16, 40):
            tab = jax.random.normal(key, (f_rows, cols), jnp.float32)

            def make(r):
                def f(tab, idx):
                    acc = jnp.zeros((cols,), jnp.float32)
                    for k in range(r):
                        g = tab[(idx + k) % f_rows]   # distinct: no CSE
                        acc = acc + g[k]
                    return acc
                return f

            s = slope(make, tab, idx0)
            print(f"gather rows={n//1024:5d}K cols={cols:3d}: "
                  f"{s*1e3:7.2f} ms  ({s/n*1e9:5.2f} ns/row)", flush=True)

    # one-hot matmul join for comparison (the <=1024-prim path)
    n = 1024 * 1024
    idx0 = jax.random.randint(key, (n,), 0, f_rows, jnp.int32)
    tab = jax.random.normal(key, (f_rows, 40), jnp.float32)

    def make_oh(r):
        def f(tab, idx):
            acc = jnp.zeros((40,), jnp.float32)
            for k in range(r):
                i = (idx + k) % f_rows
                iota = jax.lax.broadcasted_iota(jnp.int32, (n, f_rows), 1)
                oh = (i[:, None] == iota).astype(jnp.float32)
                g = jnp.dot(oh, tab, precision=jax.lax.Precision.HIGHEST)
                acc = acc + g[k]
            return acc
        return f

    # (skipped: a (1M, 5891) one-hot would be ~23 GFLOP/rep — measured
    # uneconomical long ago; keep the row-gather numbers authoritative)

    # interp chain cost at 384K
    n = 384 * 1024
    a = jax.random.normal(key, (n, 40), jnp.float32)
    u = jax.random.uniform(key, (n,))
    v = jax.random.uniform(key, (n,))

    def make_interp(r):
        def f(a, u, v):
            acc = jnp.float32(0)
            for k in range(r):
                w = 1.0 - u - v + jnp.float32(k) * 1e-12
                n0, n1, n2 = a[:, 9:12], a[:, 12:15], a[:, 15:18]
                uv0, uv1, uv2 = a[:, 18:20], a[:, 20:22], a[:, 22:24]
                tn = w[:, None] * n0 + u[:, None] * n1 + v[:, None] * n2
                tn = tn / jnp.maximum(
                    jnp.linalg.norm(tn, axis=-1, keepdims=True), 1e-20)
                tuv = w[:, None] * uv0 + u[:, None] * uv1 + v[:, None] * uv2
                acc = acc + tn.reshape(-1)[0] + tuv.reshape(-1)[0]
            return acc
        return f

    print(f"interp chain @384K: {slope(make_interp, a, u, v)*1e3:7.2f} ms",
          flush=True)

    # cull-list statistics of the demo scene
    from whitted_demo import build_scene, set_frame_matrices
    from software_rasterizer_tpu.ops.camera import camera_rays
    from software_rasterizer_tpu.ops.intersect import prepare_rt_scene
    from software_rasterizer_tpu.ops.pallas_trace import _cull_prepass

    scene = build_scene()
    set_frame_matrices(scene, 0.0)
    scene.set_ndc_matrix(1024, 1024)
    geom = jax.tree_util.tree_map(jax.device_put, scene.rt_geometry())
    fr = jax.tree_util.tree_map(jax.device_put, scene.rt_frame())
    rt = jax.jit(lambda f: prepare_rt_scene(geom, f))(fr)
    jax.block_until_ready(rt)
    orig, d = camera_rays(rt.eye, scene.fovy, 1024, 1024)
    th, tw = 16, 128

    def to_tiles(x):
        k = x.shape[-1]
        return (x.reshape(1024 // th, th, 1024 // tw, tw, k)
                .transpose(0, 2, 1, 3, 4).reshape(-1, k))

    orig, d = to_tiles(orig), to_tiles(d)
    ov = jax.jit(lambda o, dd: _cull_prepass(
        rt.chunk_lo, rt.chunk_hi, o, dd, 2048))(orig, d)
    cnt = np.asarray(ov.sum(axis=1))
    print(f"cull: nc={ov.shape[1]} blocks={ov.shape[0]} "
          f"chunks/block mean={cnt.mean():.1f} p50={np.median(cnt):.0f} "
          f"p90={np.percentile(cnt, 90):.0f} max={cnt.max()}", flush=True)


if __name__ == "__main__":
    main()
