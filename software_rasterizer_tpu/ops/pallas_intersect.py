"""Pallas TPU kernel: fused Moller-Trumbore nearest-hit.

The XLA path (ops/intersect.py) materializes (rays x tris) planes
between fusions; this kernel keeps the whole sweep in VMEM: for each
ray tile, loop over triangle chunks, compute the masked t-plane in
registers, and carry only the per-ray (best_t, best_index) pair. One
kernel per trace instead of ~10 fusions.

Layout notes (pallas_guide.md):
  * rays arrive as six (N,) component vectors -> (R_TILE,) blocks;
  * triangles as a (16, F) component matrix (v0, e1, e2, valid, pad to
    a sublane multiple), fully VMEM-resident (F <= ~100K);
  * the inner plane is (R_TILE, TC) with TC=128 lanes — full VPU width.

Semantics identical to ops/intersect._mt_chunk (thresholds 1e-6, strict
`<` nearest). u/v are recomputed for the winner outside (same epilogue
as the XLA path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30  # python float: pallas kernels cannot capture traced constants


def _kernel_v2(tc_sub: int):
    """Plane orientation: (triangles on SUBLANES, rays on LANES).

    Triangle count pads to the 8-sublane granule instead of 128 lanes —
    for small scenes (Cornell: 36 tris -> 40 rows vs 128 lanes) this
    more than triples useful occupancy; the nearest-min reduction runs
    across sublanes. Rays fill the full 128-lane dimension."""

    def kernel(ox, oy, oz, dx, dy, dz, tri, t_out, i_out):
        r = ox.shape[0]
        rox = ox[:].reshape(1, r)
        roy = oy[:].reshape(1, r)
        roz = oz[:].reshape(1, r)
        rdx = dx[:].reshape(1, r)
        rdy = dy[:].reshape(1, r)
        rdz = dz[:].reshape(1, r)
        f = tri.shape[0]
        n_chunks = max(f // tc_sub, 1)
        tc = min(tc_sub, f)

        def body(ci, carry):
            bt, bi = carry                         # (1, r)
            sl = ci * tc
            # tri is (F, 16) sublane-major: each column slice is already
            # a (tc, 1) sublane vector -- no lane->sublane transpose
            v0x = tri[pl.ds(sl, tc), 0:1]
            v0y = tri[pl.ds(sl, tc), 1:2]
            v0z = tri[pl.ds(sl, tc), 2:3]
            e1x = tri[pl.ds(sl, tc), 3:4]
            e1y = tri[pl.ds(sl, tc), 4:5]
            e1z = tri[pl.ds(sl, tc), 5:6]
            e2x = tri[pl.ds(sl, tc), 6:7]
            e2y = tri[pl.ds(sl, tc), 7:8]
            e2z = tri[pl.ds(sl, tc), 8:9]
            vld = tri[pl.ds(sl, tc), 9:10]

            px = rdy * e2z - rdz * e2y             # (tc, r)
            py = rdz * e2x - rdx * e2z
            pz = rdx * e2y - rdy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv = 1.0 / jnp.where(jnp.abs(det) < 1e-6, 1.0, det)

            tx = rox - v0x
            ty = roy - v0y
            tz = roz - v0z
            u = (tx * px + ty * py + tz * pz) * inv

            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            v = (rdx * qx + rdy * qy + rdz * qz) * inv
            t = (e2x * qx + e2y * qy + e2z * qz) * inv

            ok = (
                (jnp.abs(det) >= 1e-6)
                & (u >= 0.0) & (u <= 1.0)
                & (v >= 0.0) & (u + v <= 1.0)
                & (t >= 1e-6)
                & (vld > 0.5)
            )
            t = jnp.where(ok, t, BIG)
            ct = jnp.min(t, axis=0, keepdims=True)               # (1, r)
            ca = jnp.argmin(t, axis=0).astype(jnp.int32).reshape(1, r) + sl
            better = ct < bt
            return (jnp.where(better, ct, bt), jnp.where(better, ca, bi))

        init = (
            jnp.full((1, r), BIG, jnp.float32),
            jnp.full((1, r), -1, jnp.int32),
        )
        bt, bi = jax.lax.fori_loop(0, n_chunks, body, init)
        t_out[:] = bt.reshape(r)
        i_out[:] = jnp.where(bt < BIG, bi, -1).reshape(r)

    return kernel


def _kernel(tc: int):
    def kernel(ox, oy, oz, dx, dy, dz, tri, t_out, i_out):
        r = ox.shape[0]
        rox = ox[:].reshape(r, 1)
        roy = oy[:].reshape(r, 1)
        roz = oz[:].reshape(r, 1)
        rdx = dx[:].reshape(r, 1)
        rdy = dy[:].reshape(r, 1)
        rdz = dz[:].reshape(r, 1)
        n_chunks = tri.shape[1] // tc

        def body(ci, carry):
            bt, bi = carry
            sl = ci * tc
            v0x = tri[0, pl.ds(sl, tc)].reshape(1, tc)
            v0y = tri[1, pl.ds(sl, tc)].reshape(1, tc)
            v0z = tri[2, pl.ds(sl, tc)].reshape(1, tc)
            e1x = tri[3, pl.ds(sl, tc)].reshape(1, tc)
            e1y = tri[4, pl.ds(sl, tc)].reshape(1, tc)
            e1z = tri[5, pl.ds(sl, tc)].reshape(1, tc)
            e2x = tri[6, pl.ds(sl, tc)].reshape(1, tc)
            e2y = tri[7, pl.ds(sl, tc)].reshape(1, tc)
            e2z = tri[8, pl.ds(sl, tc)].reshape(1, tc)
            vld = tri[9, pl.ds(sl, tc)].reshape(1, tc)

            px = rdy * e2z - rdz * e2y
            py = rdz * e2x - rdx * e2z
            pz = rdx * e2y - rdy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv = 1.0 / jnp.where(jnp.abs(det) < 1e-6, 1.0, det)

            tx = rox - v0x
            ty = roy - v0y
            tz = roz - v0z
            u = (tx * px + ty * py + tz * pz) * inv

            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            v = (rdx * qx + rdy * qy + rdz * qz) * inv
            t = (e2x * qx + e2y * qy + e2z * qz) * inv

            ok = (
                (jnp.abs(det) >= 1e-6)
                & (u >= 0.0) & (u <= 1.0)
                & (v >= 0.0) & (u + v <= 1.0)
                & (t >= 1e-6)
                & (vld > 0.5)
            )
            t = jnp.where(ok, t, BIG)
            ct = jnp.min(t, axis=1, keepdims=True)
            ca = jnp.argmin(t, axis=1).astype(jnp.int32).reshape(r, 1) + sl
            better = ct < bt
            return (jnp.where(better, ct, bt), jnp.where(better, ca, bi))

        init = (
            jnp.full((r, 1), BIG, jnp.float32),
            jnp.full((r, 1), -1, jnp.int32),
        )
        bt, bi = jax.lax.fori_loop(0, n_chunks, body, init)
        t_out[:] = bt.reshape(r)
        i_out[:] = jnp.where(bt < BIG, bi, -1).reshape(r)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("ray_tile", "chunk", "interpret", "layout")
)
def mt_nearest_pallas(
    orig, d, v0, v1, v2, valid,
    ray_tile: int = 1024,
    chunk: int = 128,
    interpret: bool = False,
    layout: str = "tri_sub",
):
    """Nearest triangle per ray. orig/d (N,3); tris (F,3) x3 + valid (F,).
    Returns (t, idx) each (N,); idx -1 / t BIG on miss.

    layout="tri_sub" (default): (tris-on-sublanes x rays-on-lanes) planes
    — triangle count pads to 8, rays fill 128 lanes. layout="ray_sub":
    the transposed orientation (rays on sublanes, tri chunk on lanes)."""
    n = orig.shape[0]
    f = v0.shape[0]

    if layout == "tri_sub":
        fpad = (-f) % (chunk if f > chunk else 8)
    else:
        fpad = (-f) % chunk
    if fpad:
        v0 = jnp.pad(v0, ((0, fpad), (0, 0)))
        v1 = jnp.pad(v1, ((0, fpad), (0, 0)))
        v2 = jnp.pad(v2, ((0, fpad), (0, 0)))
        valid = jnp.pad(valid, (0, fpad))
    e1 = v1 - v0
    e2 = v2 - v0
    # (16, F): components padded to a sublane multiple of 8
    tri = jnp.concatenate(
        [
            v0.T, e1.T, e2.T,
            valid.astype(jnp.float32)[None, :],
            jnp.zeros((6, v0.shape[0]), jnp.float32),
        ],
        axis=0,
    )

    npad = (-n) % ray_tile
    if npad:
        orig = jnp.pad(orig, ((0, npad), (0, 0)))
        d = jnp.pad(d, ((0, npad), (0, 0)), constant_values=1.0)
    n_tot = n + npad

    comps = [orig[:, 0], orig[:, 1], orig[:, 2], d[:, 0], d[:, 1], d[:, 2]]
    grid = (n_tot // ray_tile,)
    ray_spec = pl.BlockSpec((ray_tile,), lambda i: (i,), memory_space=pltpu.VMEM)
    if layout == "tri_sub":
        kern = _kernel_v2(chunk)
        tri = tri.T  # (F, 16) sublane-major for the tri_sub kernel
    else:
        kern = _kernel(chunk)
    t, idx = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[ray_spec] * 6 + [
            pl.BlockSpec(tri.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((ray_tile,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((ray_tile,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tot,), jnp.float32),
            jax.ShapeDtypeStruct((n_tot,), jnp.int32),
        ],
        interpret=interpret,
    )(*comps, tri)
    return t[:n], idx[:n]
