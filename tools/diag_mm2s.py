"""Diagnose mm2s-vs-brute winner mismatches on the 318K-tri stress
scene (run on the real TPU). Counts mismatching rays and inspects
whether mismatches are ULP-level t ties (MXU HIGHEST matmul vs scalar
f32 Moller-Trumbore) or real kernel bugs."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from software_rasterizer_tpu.ops.camera import camera_rays
from software_rasterizer_tpu.ops.intersect import (
    _cull_granule, _intersect_tri_raw, _mt_uv, prepare_rt_scene,
)
from software_rasterizer_tpu.ops.pallas_trace import trace_nearest_mm2_stream
from software_rasterizer_tpu.scenes.stress import build_stress_scene


def main():
    w = h = 512
    scene = build_stress_scene(levels=int(os.environ.get('LEVELS', 3)))
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

    mm2s = jax.jit(lambda o, dd: trace_nearest_mm2_stream(
        rt.mt_coef, rt.chunk_lo, rt.chunk_hi, o, dd,
        chunk=_cull_granule(rt.v0.shape[0]), block=2048,
    ))

    def brute(o, dd, block=8192):
        nb = o.shape[0] // block
        return jax.lax.map(
            lambda od: _intersect_tri_raw(
                od[0], od[1], rt.v0, rt.v1, rt.v2, rt.tri_valid,
                chunk=2048, cull_chunks=True,
            ),
            (o.reshape(nb, block, 3), dd.reshape(nb, block, 3)),
        )
    brute = jax.jit(brute)

    hs, is_, _ = mm2s(orig, d)
    hb, ib, _tb = brute(orig, d)
    hs = np.asarray(hs)
    is_ = np.asarray(is_).reshape(-1)
    hb = np.asarray(hb).reshape(-1)
    ib = np.asarray(ib).reshape(-1)

    hit_mis = hs != hb
    idx_mis = (is_ != ib)
    print(f"rays: {hs.size}, hit mismatches: {hit_mis.sum()}, "
          f"idx mismatches: {idx_mis.sum()}")
    bad = np.where(idx_mis)[0][:20]
    if bad.size:
        from software_rasterizer_tpu.ops.pallas_trace import _cull_prepass
        ov = jax.jit(lambda: _cull_prepass(
            rt.chunk_lo, rt.chunk_hi, orig, d, 2048))()
        o_np = np.asarray(orig)
        d_np = np.asarray(d)
        v0 = np.asarray(rt.v0)
        v1 = np.asarray(rt.v1)
        v2 = np.asarray(rt.v2)
        for i in bad:
            a, b = int(is_[i]), int(ib[i])
            row = []
            for j in (a, b):
                if j < 0:
                    row.append((j, None))
                    continue
                _, _, t = _mt_uv(
                    jnp.asarray(o_np[i][None]), jnp.asarray(d_np[i][None]),
                    jnp.asarray(v0[j][None]), jnp.asarray(v1[j][None]),
                    jnp.asarray(v2[j][None]),
                )
                row.append((j, float(t[0])))
            # det of each winner (threshold-flip detector: the MXU
            # bilinear det vs the FMA det straddling the 1e-6 cut) and
            # whether the brute winner's CHUNK was in the cull list
            # (cull-bug detector)
            def det_of(j):
                if j < 0:
                    return None
                e1 = v1[j] - v0[j]
                e2 = v2[j] - v0[j]
                return float(np.dot(e1, np.cross(d_np[i], e2)))

            gran = _cull_granule(rt.v0.shape[0])
            blk = i // 2048
            cb = (ib[i] // gran) if ib[i] >= 0 else -1
            visited = bool(np.asarray(ov)[blk, cb]) if cb >= 0 else None
            print(f"ray {i}: mm2s={row[0]} det={det_of(int(is_[i]))}, "
                  f"brute={row[1]} det={det_of(int(ib[i]))} "
                  f"brute_chunk_visited={visited}")


if __name__ == "__main__":
    main()
