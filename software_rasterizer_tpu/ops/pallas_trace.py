"""Fused MXU ray-triangle trace kernel (Pallas).

The hot op of every integrator is the nearest-hit sweep: rays x all
triangles, masked min over t (reference: BVHAcceleration::intersection +
Triangle Moller-Trumbore, Triangle.cpp:104-145, driven by
Scene::traceScene, Scene.cpp:349-396). Round-1 shipped it as an XLA
broadcast-FMA chain (ops/intersect._mt_chunk): ~58 VPU ops per
(ray, triangle). Profiling showed the bounce loop HBM/dispatch-bound,
with the chip mostly idle.

TPU-first reformulation: Moller-Trumbore is BILINEAR in (ray, triangle).
With the scalar-triple identities

    u*det = o.(d x e2) - d.(e2 x v0)
    v*det = d.(o x e1) - d.(v0 x e1)
    t*det = o.n - v0.n          (n = e1 x e2)
    det   = -d.n

every term is a product of a RAY feature and a TRIANGLE constant. So one
matmul computes all four quantities for every (ray, triangle) pair:

    phi(o, d) = [o_x d_y, o_x d_z, o_y d_x, o_y d_z, o_z d_x, o_z d_y,
                 d_x, d_y, d_z, o_x, o_y, o_z, 1]          (13 features)
    [u', v', t', det] = C_tri (4F x 13) @ phi^T (13 x N)   <- MXU

The kernel streams triangle-chunk coefficient blocks through VMEM,
runs the (4C x Nblk) matmul at HIGHEST precision (6-pass bf16 ~ f32),
applies the reference's exact rejection thresholds (|det| >= 1e-6,
0 <= u,v, u+v <= 1, t >= 1e-6) and folds a two-pass (min-t, lowest
index among equals) reduce — all resident in VMEM. Only (best_t,
best_index) per ray ever reaches HBM: the (rays x tris) intermediate
planes that made the XLA path bandwidth-bound never materialize.

The winner's exact f32 (u, v, t) are recomputed outside by
ops/intersect._mt_uv, so integrator-visible values keep the same
precision as the scalar oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30   # plain float: a jnp scalar here becomes a captured
             # constant in the nested jits and trips a lowering-cache
             # KeyError ('closed_call') on the axon backend
N_FEATURES = 13


def mt_ray_features(orig, d, transposed: bool = False):
    """phi(o, d): (N, 13) bilinear Moller-Trumbore ray features —
    or (13, N) directly when `transposed` (feature-major is what the
    trace kernels consume; stacking on axis 0 avoids a separate (N,13)
    -> (13,N) relayout of the 1M-row feature matrix)."""
    ox, oy, oz = orig[:, 0], orig[:, 1], orig[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    return jnp.stack(
        [
            ox * dy, ox * dz, oy * dx, oy * dz, oz * dx, oz * dy,
            dx, dy, dz,
            ox, oy, oz,
            jnp.ones_like(ox),
        ],
        axis=0 if transposed else 1,
    )


def mt_tri_coef(v0, v1, v2, valid):
    """Per-triangle coefficient matrix (4F, 13): rows [u' | v' | t' | det]
    blocks of F. Invalid (padding) triangles get all-zero rows, so their
    det = 0 fails the |det| >= 1e-6 test with no separate mask input."""
    e1 = v1 - v0
    e2 = v2 - v0
    n = jnp.cross(e1, e2)
    f = v0.shape[0]
    z = jnp.zeros((f,), v0.dtype)

    e1x, e1y, e1z = e1[:, 0], e1[:, 1], e1[:, 2]
    e2x, e2y, e2z = e2[:, 0], e2[:, 1], e2[:, 2]

    # u' = o.(d x e2) - d.(e2 x v0)
    d_coef_u = -jnp.cross(e2, v0)
    rows_u = jnp.stack(
        [e2z, -e2y, -e2z, e2x, e2y, -e2x,
         d_coef_u[:, 0], d_coef_u[:, 1], d_coef_u[:, 2],
         z, z, z, z],
        axis=1,
    )
    # v' = d.(o x e1) - d.(v0 x e1)
    d_coef_v = -jnp.cross(v0, e1)
    rows_v = jnp.stack(
        [-e1z, e1y, e1z, -e1x, -e1y, e1x,
         d_coef_v[:, 0], d_coef_v[:, 1], d_coef_v[:, 2],
         z, z, z, z],
        axis=1,
    )
    # t' = o.n - v0.n
    rows_t = jnp.stack(
        [z, z, z, z, z, z, z, z, z,
         n[:, 0], n[:, 1], n[:, 2],
         -jnp.sum(v0 * n, axis=1)],
        axis=1,
    )
    # det = -d.n
    rows_d = jnp.stack(
        [z, z, z, z, z, z,
         -n[:, 0], -n[:, 1], -n[:, 2],
         z, z, z, z],
        axis=1,
    )
    coef = jnp.concatenate([rows_u, rows_v, rows_t, rows_d], axis=0)
    vmask = jnp.tile(valid, 4)[:, None]
    return jnp.where(vmask, coef, 0.0)


def _trace_kernel(coef_ref, phi_ref, t_ref, f_ref, *, chunk: int,
                  precision=jax.lax.Precision.HIGHEST):
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        t_ref[...] = jnp.full_like(t_ref, 1e30)
        f_ref[...] = jnp.full_like(f_ref, -1)
    best_t = t_ref[0]
    best_f = f_ref[0]

    prod = jax.lax.dot_general(
        coef_ref[0], phi_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32,
    )  # (4C, Nblk)
    up = prod[0:chunk]
    vp = prod[chunk:2 * chunk]
    tp = prod[2 * chunk:3 * chunk]
    det = prod[3 * chunk:4 * chunk]

    absd = jnp.abs(det)
    inv = 1.0 / jnp.where(absd < 1e-6, 1.0, det)
    u = up * inv
    v = vp * inv
    t = tp * inv
    ok = (
        (absd >= 1e-6)
        & (u >= 0.0) & (u <= 1.0)
        & (v >= 0.0) & (u + v <= 1.0)
        & (t >= 1e-6)
    )
    tm = jnp.where(ok, t, 1e30)
    # two-pass exact resolve: min t, then lowest row among equal-t slots
    ct = jnp.min(tm, axis=0, keepdims=True)                      # (1, Nblk)
    rows = jax.lax.broadcasted_iota(jnp.int32, tm.shape, 0)
    ca = jnp.min(
        jnp.where(tm == ct, rows, jnp.int32(0x7FFFFFFF)), axis=0, keepdims=True
    ) + ci * chunk
    better = ct < best_t
    f_ref[0] = jnp.where(better, ca, best_f)
    t_ref[0] = jnp.where(better, ct, best_t)


@functools.partial(jax.jit, static_argnames=("chunk", "block", "interpret",
                                             "precision"))
def trace_nearest_mm(coef, orig, d, chunk: int = 512, block: int = 2048,
                     interpret: bool = False,
                     precision=jax.lax.Precision.HIGHEST):
    """Nearest-triangle sweep on the MXU.

    coef: (4F, 13) from `mt_tri_coef` (F a multiple of 8; zero rows for
    padding). orig/d: (N, 3). Returns (hit (N,) bool, idx (N,) i32).

    Grid: (ray blocks, triangle chunks); the output block for a ray
    block stays VMEM-resident across the chunk axis (index map ignores
    it), carrying the running (best_t, best_index).
    """
    f4 = coef.shape[0]
    f = f4 // 4
    chunk = min(chunk, f)
    n = orig.shape[0]
    nb = -(-n // block)
    n_pad = nb * block
    if n_pad != n:
        orig = jnp.pad(orig, ((0, n_pad - n), (0, 0)))
        d = jnp.pad(d, ((0, n_pad - n), (0, 0)), constant_values=1.0)
    phi = mt_ray_features(orig, d, transposed=True)      # (13, N_pad)

    if f % chunk:
        pad = chunk - f % chunk
        cf = coef.reshape(4, f, N_FEATURES)
        cf = jnp.pad(cf, ((0, 0), (0, pad), (0, 0)))
        coef = cf.reshape(4 * (f + pad), N_FEATURES)
        f += pad
    nc = f // chunk
    # chunk-major coefficient layout: (nc, 4C, 13)
    coef_c = (
        coef.reshape(4, nc, chunk, N_FEATURES)
        .transpose(1, 0, 2, 3)
        .reshape(nc, 4 * chunk, N_FEATURES)
    )

    grid = (nb, nc)
    t, fi = pl.pallas_call(
        functools.partial(_trace_kernel, chunk=chunk, precision=precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4 * chunk, N_FEATURES), lambda i, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_FEATURES, block), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, 1, block), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, block), jnp.int32),
        ],
        interpret=interpret,
    )(coef_c, phi)
    t = t.reshape(-1)[:n]
    fi = fi.reshape(-1)[:n]
    hit = t < BIG
    return hit, jnp.where(hit, fi, -1), t


MM2C_SUPER = 8   # chunks per super-chunk of the fused cull's 2nd level


def _trace_kernel2c(cab_ref, cab2_ref, coef_ref, o_ref, d_ref, phi_ref,
                    t_ref, f_ref, *, nc: int, nsc: int, chunk: int,
                    precision=jax.lax.Precision.HIGHEST):
    """mm2 with the cull prepass FUSED IN: one kernel per ray block
    slab-tests chunk AABBs against the block's rays (the exact
    `_cull_prepass_kernel` math) and runs the matmul+resolve only under
    `lax.cond` when any ray enters — identical chunk-skip decisions and
    winner selection to the prepass+list pipeline, minus the separate
    prepass dispatch, the (nb, nc) mask materialization, and the XLA
    cumsum/scatter list build that ran per trace call.

    r5: the cull is TWO-LEVEL — MM2C_SUPER-chunk super-AABBs (cab2)
    gate descent into the per-chunk loop. The whitted über-kernel
    measured the flat per-chunk cond loop as most of a culled-out
    block's fixed cost (49.9 -> 34.8 ms/frame there); blocks whose rays
    miss a whole region now pay one cond per super."""
    ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]            # (rows, 128)
    dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]
    ix = 1.0 / jnp.where(dx == 0.0, 1e-30, dx)
    iy = 1.0 / jnp.where(dy == 0.0, 1e-30, dy)
    iz = 1.0 / jnp.where(dz == 0.0, 1e-30, dz)
    phi = phi_ref[...]
    n = phi.shape[1]

    def slab_enter(ab_ref, c):
        t0 = (ab_ref[0, c] - ox) * ix
        t1 = (ab_ref[3, c] - ox) * ix
        tmin = jnp.minimum(t0, t1)
        tmax = jnp.maximum(t0, t1)
        t0 = (ab_ref[1, c] - oy) * iy
        t1 = (ab_ref[4, c] - oy) * iy
        tmin = jnp.maximum(tmin, jnp.minimum(t0, t1))
        tmax = jnp.minimum(tmax, jnp.maximum(t0, t1))
        t0 = (ab_ref[2, c] - oz) * iz
        t1 = (ab_ref[5, c] - oz) * iz
        tmin = jnp.maximum(tmin, jnp.minimum(t0, t1))
        tmax = jnp.minimum(tmax, jnp.maximum(t0, t1))
        return jnp.any(tmax >= jnp.maximum(tmin, 0.0))

    def body(c, carry):
        enter = slab_enter(cab_ref, c)

        def visit(carry):
            best_t, best_f = carry
            prod = jax.lax.dot_general(
                coef_ref[c], phi,
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=precision,
                preferred_element_type=jnp.float32,
            )  # (4C, Nblk)
            up = prod[0:chunk]
            vp = prod[chunk:2 * chunk]
            tp = prod[2 * chunk:3 * chunk]
            det = prod[3 * chunk:4 * chunk]
            absd = jnp.abs(det)
            inv = 1.0 / jnp.where(absd < 1e-6, 1.0, det)
            u = up * inv
            v = vp * inv
            t = tp * inv
            ok = (
                (absd >= 1e-6)
                & (u >= 0.0) & (u <= 1.0)
                & (v >= 0.0) & (u + v <= 1.0)
                & (t >= 1e-6)
            )
            tm = jnp.where(ok, t, 1e30)
            ct = jnp.min(tm, axis=0, keepdims=True)
            rows_i = jax.lax.broadcasted_iota(jnp.int32, tm.shape, 0)
            cf = jnp.min(
                jnp.where(tm == ct, rows_i, jnp.int32(0x7FFFFFFF)),
                axis=0, keepdims=True,
            ) + c * chunk
            better = ct < best_t
            return (
                jnp.where(better, ct, best_t),
                jnp.where(better, cf, best_f),
            )

        return jax.lax.cond(enter, visit, lambda c_: c_, carry)

    def super_body(sc, carry):
        def descend(carry):
            return jax.lax.fori_loop(
                sc * MM2C_SUPER,
                jnp.minimum((sc + 1) * MM2C_SUPER, nc), body, carry)

        return jax.lax.cond(
            slab_enter(cab2_ref, sc), descend, lambda c_: c_, carry)

    init = (
        jnp.full((1, n), 1e30, jnp.float32),
        jnp.full((1, n), 0x7FFFFFFF, jnp.int32),
    )
    best_t, best_f = jax.lax.fori_loop(0, nsc, super_body, init)
    miss = best_t >= 1e30
    t_ref[0] = best_t
    f_ref[0] = jnp.where(miss, -1, best_f)


def trace_nearest_mm2c(coef, chunk_lo, chunk_hi, orig, d, chunk: int = 128,
                       block: int = 2048, interpret: bool = False):
    """`trace_nearest_mm2` with the (two-level) cull fused into the
    kernel (_trace_kernel2c) — no prepass dispatch, no list build.
    Identical winner selection."""
    f4 = coef.shape[0]
    f = f4 // 4
    n = orig.shape[0]
    nb = -(-n // block)
    n_pad = nb * block
    if n_pad != n:
        orig = jnp.pad(orig, ((0, n_pad - n), (0, 0)))
        d = jnp.pad(d, ((0, n_pad - n), (0, 0)), constant_values=1.0)
    phi = mt_ray_features(orig, d, transposed=True)      # (13, N_pad)

    if f % chunk:
        pad = chunk - f % chunk
        cf = coef.reshape(4, f, N_FEATURES)
        cf = jnp.pad(cf, ((0, 0), (0, pad), (0, 0)))
        coef = cf.reshape(4 * (f + pad), N_FEATURES)
        f += pad
    nc = f // chunk
    assert chunk_lo.shape[0] == nc, (chunk_lo.shape, nc)
    coef_c = (
        coef.reshape(4, nc, chunk, N_FEATURES)
        .transpose(1, 0, 2, 3)
        .reshape(nc, 4 * chunk, N_FEATURES)
    )
    rows = block // 128
    cab = jnp.concatenate(
        [chunk_lo.T, chunk_hi.T], axis=0
    ).astype(jnp.float32)                                # (6, nc)
    # super-chunk AABBs for the cull's first level (tail super may be
    # short — the descent loop clamps to nc)
    nsc = -(-nc // MM2C_SUPER)
    pad_c = nsc * MM2C_SUPER - nc
    lo_p = jnp.pad(chunk_lo, ((0, pad_c), (0, 0)), constant_values=BIG)
    hi_p = jnp.pad(chunk_hi, ((0, pad_c), (0, 0)), constant_values=-BIG)
    cab2 = jnp.concatenate([
        lo_p.reshape(nsc, MM2C_SUPER, 3).min(1).T,
        hi_p.reshape(nsc, MM2C_SUPER, 3).max(1).T,
    ], axis=0).astype(jnp.float32)                       # (6, nsc)
    oc = orig.T.reshape(3, nb * rows, 128)
    dc = d.T.reshape(3, nb * rows, 128)

    t, fi = pl.pallas_call(
        functools.partial(_trace_kernel2c, nc=nc, nsc=nsc, chunk=chunk),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # cab
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # cab2
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # coef table
            pl.BlockSpec((3, rows, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, rows, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_FEATURES, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, 1, block), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, block), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(cab, cab2, coef_c, oc, dc, phi)
    t = t.reshape(-1)[:n]
    fi = fi.reshape(-1)[:n]
    hit = t < BIG
    return hit, jnp.where(hit, fi, -1), t


def mt_tri_table(v0, v1, v2, valid):
    """(F, 12) packed [v0 | e1 | e2 | pad] rows for the VPU kernel;
    invalid rows zeroed (det = 0 -> rejected). Also returns n_tri, the
    1 + index of the last valid triangle (loop bound: rt_geometry packs
    padding at the tail, so the loop usually runs exactly F_real times;
    interior invalid rows are still rejected by the det test)."""
    f = v0.shape[0]
    e1 = v1 - v0
    e2 = v2 - v0
    tab = jnp.concatenate([v0, e1, e2, jnp.zeros((f, 3), v0.dtype)], axis=1)
    tab = jnp.where(valid[:, None], tab, 0.0)
    n_tri = jnp.where(
        jnp.any(valid),
        f - jnp.argmax(jnp.flip(valid.astype(jnp.int32))),
        0,
    ).astype(jnp.int32)
    return tab, n_tri


def _vpu_trace_kernel(n_ref, tri_ref, o_ref, d_ref, t_ref, f_ref):
    """Per-program: rays (R,128) x a scalar-broadcast loop over valid
    triangles. ~58 VPU ops per triangle on full (R,128) tiles — at
    reference scene sizes (36-6K tris) this is the speed-of-light shape:
    no (rays x tris) plane ever exists, no MXU pass overhead, exact
    f32 with the reference's thresholds."""
    ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]        # (R, 128)
    dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]
    n_tri = n_ref[0]

    def body(f, carry):
        best_t, best_f = carry
        v0x = tri_ref[f, 0]
        v0y = tri_ref[f, 1]
        v0z = tri_ref[f, 2]
        e1x = tri_ref[f, 3]
        e1y = tri_ref[f, 4]
        e1z = tri_ref[f, 5]
        e2x = tri_ref[f, 6]
        e2y = tri_ref[f, 7]
        e2z = tri_ref[f, 8]
        # p = d x e2
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv = 1.0 / jnp.where(jnp.abs(det) < 1e-6, 1.0, det)
        tx = ox - v0x
        ty = oy - v0y
        tz = oz - v0z
        u = (tx * px + ty * py + tz * pz) * inv
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv
        t = (e2x * qx + e2y * qy + e2z * qz) * inv
        ok = (
            (jnp.abs(det) >= 1e-6)
            & (u >= 0.0) & (u <= 1.0)
            & (v >= 0.0) & (u + v <= 1.0)
            & (t >= 1e-6)
        )
        tm = jnp.where(ok, t, 1e30)
        better = tm < best_t   # strict <: first (lowest) index wins ties
        return (
            jnp.where(better, tm, best_t),
            jnp.where(better, f, best_f),
        )

    init = (
        jnp.full(ox.shape, 1e30, jnp.float32),
        jnp.full(ox.shape, -1, jnp.int32),
    )
    best_t, best_f = jax.lax.fori_loop(0, n_tri, body, init)
    t_ref[...] = best_t
    f_ref[...] = best_f


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def trace_nearest_vpu(tri_table, n_tri, orig, d, block: int = 2048,
                      interpret: bool = False):
    """Nearest-triangle sweep, fused VPU kernel (small scenes).

    tri_table/n_tri from `mt_tri_table`. orig/d: (N,3).
    Returns (hit (N,) bool, idx (N,) i32)."""
    n = orig.shape[0]
    assert block % 128 == 0
    rows = block // 128
    nb = -(-n // block)
    n_pad = nb * block
    if n_pad != n:
        orig = jnp.pad(orig, ((0, n_pad - n), (0, 0)))
        d = jnp.pad(d, ((0, n_pad - n), (0, 0)), constant_values=1.0)
    oc = orig.T.reshape(3, nb * rows, 128)
    dc = d.T.reshape(3, nb * rows, 128)

    t, fi = pl.pallas_call(
        _vpu_trace_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((3, rows, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, rows, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb * rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((nb * rows, 128), jnp.int32),
        ],
        interpret=interpret,
    )(n_tri.reshape(1), tri_table, oc, dc)
    t = t.reshape(-1)[:n]
    fi = fi.reshape(-1)[:n]
    hit = t < BIG
    return hit, jnp.where(hit, fi, -1), t


def chunk_bounds(v0, v1, v2, valid, chunk: int):
    """Per-chunk AABBs over BVH-leaf-ordered triangles (the culling
    granule of trace_nearest_mm2). Returns (lo (nc,3), hi (nc,3));
    invalid rows contribute nothing (empty chunks get inverted boxes
    that fail every slab test)."""
    f = v0.shape[0]
    if f % chunk:
        pad = chunk - f % chunk
        v0 = jnp.pad(v0, ((0, pad), (0, 0)))
        v1 = jnp.pad(v1, ((0, pad), (0, 0)))
        v2 = jnp.pad(v2, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
        f += pad
    nc = f // chunk
    m = valid[:, None]
    lo = jnp.where(m, jnp.minimum(jnp.minimum(v0, v1), v2), 1e30)
    hi = jnp.where(m, jnp.maximum(jnp.maximum(v0, v1), v2), -1e30)
    return (
        lo.reshape(nc, chunk, 3).min(1),
        hi.reshape(nc, chunk, 3).max(1),
    )


def _cull_prepass_kernel(cab_ref, o_ref, d_ref, m_ref, *, nc: int,
                         mask_rows: int):
    """Per-ray-block chunk mask: m[c] = any ray of this block enters
    chunk c's AABB (exact ops/bvh.slab_test semantics, so culling is
    identical to the XLA prepass). Replaces the (N_pad, nc) slab plane
    the XLA prepass materializes in HBM (~40% of a culled trace at 1M
    rays) with an in-VMEM loop."""
    ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]            # (rows, 128)
    dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]
    ix = 1.0 / jnp.where(dx == 0.0, 1e-30, dx)
    iy = 1.0 / jnp.where(dy == 0.0, 1e-30, dy)
    iz = 1.0 / jnp.where(dz == 0.0, 1e-30, dz)
    # the mask plane holds up to mask_rows*128 chunk bits: bit c lives
    # at (c // 128, c % 128)
    sub = jax.lax.broadcasted_iota(jnp.int32, (mask_rows, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (mask_rows, 128), 1)

    def body(c, row):
        # cab is (6, nc): rows lo_xyz|hi_xyz — nc on the MINOR axis, so
        # the SMEM window pads 6 x pad128(nc) words instead of nc x 128
        # (an (nc, 6) layout exceeds the 1 MB SMEM limit past ~2K chunks)
        t0 = (cab_ref[0, c] - ox) * ix
        t1 = (cab_ref[3, c] - ox) * ix
        tmin = jnp.minimum(t0, t1)
        tmax = jnp.maximum(t0, t1)
        t0 = (cab_ref[1, c] - oy) * iy
        t1 = (cab_ref[4, c] - oy) * iy
        tmin = jnp.maximum(tmin, jnp.minimum(t0, t1))
        tmax = jnp.minimum(tmax, jnp.maximum(t0, t1))
        t0 = (cab_ref[2, c] - oz) * iz
        t1 = (cab_ref[5, c] - oz) * iz
        tmin = jnp.maximum(tmin, jnp.minimum(t0, t1))
        tmax = jnp.minimum(tmax, jnp.maximum(t0, t1))
        hit = jnp.any(tmax >= jnp.maximum(tmin, 0.0))
        sel = (sub == c // 128) & (lane == c % 128)
        return jnp.where(sel & hit, 1, row)

    m_ref[0] = jax.lax.fori_loop(
        0, nc, body, jnp.zeros((mask_rows, 128), jnp.int32)
    )


def _cull_prepass(chunk_lo, chunk_hi, orig, d, block: int,
                  interpret: bool = False):
    """(nb, nc) bool per-block chunk overlap via the Pallas kernel.
    orig/d must already be padded to nb*block rows."""
    nc = chunk_lo.shape[0]
    mask_rows = max(8, -(-nc // 128))
    n = orig.shape[0]
    nb = n // block
    rows = block // 128
    cab = jnp.concatenate(
        [chunk_lo.T, chunk_hi.T], axis=0
    ).astype(jnp.float32)                                # (6, nc)
    oc = orig.T.reshape(3, nb * rows, 128)
    dc = d.T.reshape(3, nb * rows, 128)
    m = pl.pallas_call(
        functools.partial(_cull_prepass_kernel, nc=nc,
                          mask_rows=mask_rows),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, rows, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, rows, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, mask_rows, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, mask_rows, 128), jnp.int32),
        interpret=interpret,
    )(cab, oc, dc)
    return m.reshape(nb, mask_rows * 128)[:, :nc] != 0


def _trace_kernel2(cnt_ref, lst_ref, coef_ref, phi_ref, t_ref, f_ref, *,
                   chunk: int, precision=jax.lax.Precision.HIGHEST):
    """Culled sweep: this ray block visits ONLY its listed chunks.

    The running best rides as (1, Nblk) planes: each chunk resolves its
    own (min t, lowest-row-among-equals) via two sublane reduces, then
    folds into the carry with two cheap selects. Round 3 carried FULL
    (chunk, Nblk) planes instead (reduces looked ~2x the matmul's
    epilogue share per chunk) — but cull statistics on the demo frame
    (tools/gather_cost.py: mean 1.9 chunks/block, p50 = 0) showed the
    per-BLOCK fixed cost of initializing + finally resolving those 1 MB
    carry planes dominating the whole kernel at 26.7 us/block; with
    per-chunk resolves the fixed cost is two (1, Nblk) rows and the
    zero-chunk majority of blocks becomes ~free (measured 13.7 -> 5.3 ms
    at 1M rays on the demo scene).

    Tie-break stays exactly the reference's lowest-global-index rule:
    within a chunk the lowest row wins (min over rows among equal t);
    across chunks the EARLIER chunk wins equal t (strict <, ascending
    chunk list, and chunk order == global index order)."""
    b = pl.program_id(0)
    cnt = cnt_ref[b]
    phi = phi_ref[...]
    n = phi.shape[1]

    def body(j, carry):
        best_t, best_f = carry                                   # (1, Nblk)
        c = lst_ref[0, 0, j]
        prod = jax.lax.dot_general(
            coef_ref[c], phi,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32,
        )  # (4C, Nblk)
        up = prod[0:chunk]
        vp = prod[chunk:2 * chunk]
        tp = prod[2 * chunk:3 * chunk]
        det = prod[3 * chunk:4 * chunk]
        absd = jnp.abs(det)
        inv = 1.0 / jnp.where(absd < 1e-6, 1.0, det)
        u = up * inv
        v = vp * inv
        t = tp * inv
        ok = (
            (absd >= 1e-6)
            & (u >= 0.0) & (u <= 1.0)
            & (v >= 0.0) & (u + v <= 1.0)
            & (t >= 1e-6)
        )
        tm = jnp.where(ok, t, 1e30)
        ct = jnp.min(tm, axis=0, keepdims=True)                  # (1, Nblk)
        rows = jax.lax.broadcasted_iota(jnp.int32, tm.shape, 0)
        cf = jnp.min(
            jnp.where(tm == ct, rows, jnp.int32(0x7FFFFFFF)),
            axis=0, keepdims=True,
        ) + c * chunk
        # equal t across chunks: the earlier (lower-index) chunk wins
        # via strict <; chunk lists are ascending
        better = ct < best_t
        return (
            jnp.where(better, ct, best_t),
            jnp.where(better, cf, best_f),
        )

    init = (
        jnp.full((1, n), 1e30, jnp.float32),
        jnp.full((1, n), 0x7FFFFFFF, jnp.int32),
    )
    best_t, best_f = jax.lax.fori_loop(0, cnt, body, init)
    miss = best_t >= 1e30
    t_ref[0] = best_t
    f_ref[0] = jnp.where(miss, -1, best_f)


# NOT @jax.jit: callers are jitted, and a nested jit here trips a
# lowering-cache KeyError ('closed_call') on the axon backend.
def trace_nearest_mm2(coef, chunk_lo, chunk_hi, orig, d, chunk: int = 128,
                      block: int = 2048, interpret: bool = False,
                      cull: bool = True):
    """Chunk-culled nearest-triangle sweep on the MXU.

    Like `trace_nearest_mm`, but each 2048-ray block first slab-tests
    the per-chunk AABBs (XLA, vectorized) and the kernel loops over only
    the SURVIVING chunk list — the two-level vectorized-BVH cull of
    ops/intersect._intersect_tri_raw moved inside one Pallas program
    (no lax.cond kernel storm, running best in VMEM). Exact: the slab
    test is conservative, skipped chunks contain no hits.

    coef: (4F, 13) from `mt_tri_coef`; chunk_lo/hi: (nc, 3) from
    `chunk_bounds` with the SAME chunk size. Requires the whole (nc,
    4*chunk, 13) coefficient table to fit VMEM (~F<=16K at chunk=128).
    """
    f4 = coef.shape[0]
    f = f4 // 4
    n = orig.shape[0]
    nb = -(-n // block)
    n_pad = nb * block
    if n_pad != n:
        orig = jnp.pad(orig, ((0, n_pad - n), (0, 0)))
        d = jnp.pad(d, ((0, n_pad - n), (0, 0)), constant_values=1.0)
    phi = mt_ray_features(orig, d, transposed=True)      # (13, N_pad)

    if f % chunk:
        pad = chunk - f % chunk
        cf = coef.reshape(4, f, N_FEATURES)
        cf = jnp.pad(cf, ((0, 0), (0, pad), (0, 0)))
        coef = cf.reshape(4 * (f + pad), N_FEATURES)
        f += pad
    nc = f // chunk
    assert chunk_lo.shape[0] == nc, (chunk_lo.shape, nc)
    coef_c = (
        coef.reshape(4, nc, chunk, N_FEATURES)
        .transpose(1, 0, 2, 3)
        .reshape(nc, 4 * chunk, N_FEATURES)
    )

    if cull:
        ov = _cull_prepass(chunk_lo, chunk_hi, orig, d, block,
                           interpret=interpret)          # (nb, nc)
        pos = jnp.cumsum(ov.astype(jnp.int32), axis=1) - 1
        counts = jnp.sum(ov.astype(jnp.int32), axis=1)
        tgt = jnp.where(ov, pos, nc)
        lists = jnp.zeros((nb, nc), jnp.int32)
        src = jnp.broadcast_to(
            jnp.arange(nc, dtype=jnp.int32)[None, :], (nb, nc)
        )
        lists = jax.vmap(
            lambda l, tg, s: l.at[tg].set(s, mode="drop")
        )(lists, tgt, src)
    else:
        counts = jnp.full((nb,), nc, jnp.int32)
        lists = jnp.broadcast_to(
            jnp.arange(nc, dtype=jnp.int32)[None, :], (nb, nc)
        )

    t, fi = pl.pallas_call(
        functools.partial(_trace_kernel2, chunk=chunk),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # counts
            pl.BlockSpec((1, 1, nc), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),                 # chunk list
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # coef table
            pl.BlockSpec((N_FEATURES, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, 1, block), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, block), jnp.int32),
        ],
        # the (chunk, block) running-best planes + the (4*chunk, block)
        # product push scoped VMEM past the 16M default
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(counts, lists[:, None, :], coef_c, phi)
    t = t.reshape(-1)[:n]
    fi = fi.reshape(-1)[:n]
    hit = t < BIG
    return hit, jnp.where(hit, fi, -1), t


def _trace_kernel3(cnt_ref, lst_ref, coef_hbm, phi_ref, t_ref, f_ref,
                   buf_ref, sem_ref, *, chunk: int,
                   precision=jax.lax.Precision.HIGHEST):
    """HBM-STREAMING culled sweep: like `_trace_kernel2`, but the
    coefficient table stays in HBM and each listed chunk's (4C, 13)
    block is DMAed into a double-buffered VMEM scratch one step ahead
    of its matmul — the VMEM-residency cap that pinned mm2 at ~16K
    triangles disappears (the table streams at ~26 KB/chunk, trivially
    hidden behind the (4C x Nblk) matmul)."""
    b = pl.program_id(0)
    cnt = cnt_ref[b]
    phi = phi_ref[...]
    n = phi.shape[1]

    rows4 = buf_ref.shape[2]          # 4*chunk coefficient columns

    def dma(j, slot):
        # coef_hbm is FEATURE-MAJOR (16, nc*4C) — features padded
        # 13 -> 16 with zero rows (an HBM slice's sublane extent must be
        # 8-aligned) — so the dynamic slice runs along the MINOR axis at
        # 4*chunk (= 512, 128-aligned) offsets. Mosaic rejects a
        # row-range slice of an (nc*4C, 13) layout outright (the
        # sliced-away minor dim isn't lane-aligned).
        c = lst_ref[0, 0, j]
        return pltpu.make_async_copy(
            coef_hbm.at[:, pl.ds(c * rows4, rows4)],
            buf_ref.at[slot], sem_ref.at[slot],
        )

    @pl.when(cnt > 0)
    def _():
        dma(0, 0).start()

    def body(j, carry):
        best_t, best_f = carry                                   # (C, Nblk)
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < cnt)
        def _():
            dma(j + 1, 1 - slot).start()

        dma(j, slot).wait()
        c = lst_ref[0, 0, j]
        prod = jax.lax.dot_general(
            buf_ref[slot], phi,
            dimension_numbers=(((0,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32,
        )  # (4C, Nblk): contraction over the 13 features of both
        up = prod[0:chunk]
        vp = prod[chunk:2 * chunk]
        tp = prod[2 * chunk:3 * chunk]
        det = prod[3 * chunk:4 * chunk]
        absd = jnp.abs(det)
        inv = 1.0 / jnp.where(absd < 1e-6, 1.0, det)
        u = up * inv
        v = vp * inv
        t = tp * inv
        ok = (
            (absd >= 1e-6)
            & (u >= 0.0) & (u <= 1.0)
            & (v >= 0.0) & (u + v <= 1.0)
            & (t >= 1e-6)
        )
        tm = jnp.where(ok, t, 1e30)
        rows = jax.lax.broadcasted_iota(jnp.int32, tm.shape, 0)
        fm = rows + c * chunk
        better = tm < best_t
        return (
            jnp.where(better, tm, best_t),
            jnp.where(better, fm, best_f),
        )

    init = (
        jnp.full((chunk, n), 1e30, jnp.float32),
        jnp.full((chunk, n), 0x7FFFFFFF, jnp.int32),
    )
    best_t, best_f = jax.lax.fori_loop(0, cnt, body, init)
    ct = jnp.min(best_t, axis=0, keepdims=True)                  # (1, Nblk)
    cf = jnp.min(
        jnp.where(best_t == ct, best_f, jnp.int32(0x7FFFFFFF)),
        axis=0, keepdims=True,
    )
    miss = ct >= 1e30
    t_ref[0] = ct
    f_ref[0] = jnp.where(miss, -1, cf)


def trace_nearest_mm2_stream(coef, chunk_lo, chunk_hi, orig, d,
                             chunk: int = 128, block: int = 2048,
                             interpret: bool = False, cull: bool = True):
    """Chunk-culled nearest-triangle sweep with the coefficient table
    streamed from HBM (double-buffered per-chunk DMA) — the large-scene
    tier above `trace_nearest_mm2`'s ~16K-triangle VMEM residency cap.
    Identical math, thresholds, and tie rules to mm2; supports up to
    the cull-mask limit of mask_rows*128 chunks (sized from nc).

    coef: (4F, 13) from `mt_tri_coef`; chunk_lo/hi: (nc, 3) from
    `chunk_bounds` with the SAME chunk size.
    """
    f4 = coef.shape[0]
    f = f4 // 4
    n = orig.shape[0]
    nb = -(-n // block)
    n_pad = nb * block
    if n_pad != n:
        orig = jnp.pad(orig, ((0, n_pad - n), (0, 0)))
        d = jnp.pad(d, ((0, n_pad - n), (0, 0)), constant_values=1.0)
    phi = mt_ray_features(orig, d, transposed=True)      # (13, N_pad)

    if f % chunk:
        pad = chunk - f % chunk
        cf = coef.reshape(4, f, N_FEATURES)
        cf = jnp.pad(cf, ((0, 0), (0, pad), (0, 0)))
        coef = cf.reshape(4 * (f + pad), N_FEATURES)
        f += pad
    nc = f // chunk
    assert chunk_lo.shape[0] == nc, (chunk_lo.shape, nc)
    coef_c = (
        coef.reshape(4, nc, chunk, N_FEATURES)
        .transpose(1, 0, 2, 3)
        .reshape(nc, 4 * chunk, N_FEATURES)
    )

    if cull:
        ov = _cull_prepass(chunk_lo, chunk_hi, orig, d, block,
                           interpret=interpret)          # (nb, nc)
        pos = jnp.cumsum(ov.astype(jnp.int32), axis=1) - 1
        counts = jnp.sum(ov.astype(jnp.int32), axis=1)
        tgt = jnp.where(ov, pos, nc)
        lists = jnp.zeros((nb, nc), jnp.int32)
        src = jnp.broadcast_to(
            jnp.arange(nc, dtype=jnp.int32)[None, :], (nb, nc)
        )
        lists = jax.vmap(
            lambda l, tg, s: l.at[tg].set(s, mode="drop")
        )(lists, tgt, src)
    else:
        counts = jnp.full((nb,), nc, jnp.int32)
        lists = jnp.broadcast_to(
            jnp.arange(nc, dtype=jnp.int32)[None, :], (nb, nc)
        )

    # feature-major flat table (16, nc*4C): per-chunk DMA slices the
    # minor axis at 4*chunk-aligned offsets; features padded 13 -> 16
    # so the DMA's sublane extent is 8-aligned (see _trace_kernel3.dma)
    coef_c = jnp.pad(
        coef_c.reshape(nc * 4 * chunk, N_FEATURES).T,
        ((0, 16 - N_FEATURES), (0, 0)),
    )
    phi = jnp.pad(phi, ((0, 16 - N_FEATURES), (0, 0)))   # (16, N_pad)

    t, fi = pl.pallas_call(
        functools.partial(_trace_kernel3, chunk=chunk),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # counts
            pl.BlockSpec((1, 1, nc), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),                 # chunk list
            pl.BlockSpec(memory_space=pl.ANY),                     # coef (HBM)
            pl.BlockSpec((16, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, 1, block), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, block), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 16, 4 * chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(counts, lists[:, None, :], coef_c, phi)
    t = t.reshape(-1)[:n]
    fi = fi.reshape(-1)[:n]
    hit = t < BIG
    return hit, jnp.where(hit, fi, -1), t
