"""Persistent per-block Whitted über-kernel (Pallas).

Round 4 measured the wavefront whitted frame to exhaustion: trace
kernels ~10-15 ms, all deferred-Phong stages 7 ms, frame 82.9 ms — over
60% of the frame was XLA-side orchestration (queue builds, compaction,
parent-chain folds, per-depth dispatch glue) that resisted every
attribution modality (PERFORMANCE.md r4). This kernel removes the
orchestration by construction: ONE Pallas program per 2048-ray screen
tile walks every lane's whole recursion tree (reference:
Scene::whittedRayTracing, Scene.cpp:478-617) with

  * a PER-LANE DFS over the binary (reflect/refract) recursion tree —
    the queue machinery, its capacity schedule, and its overflow
    accounting all disappear (the DFS stack covers the full tree, so
    there are NO dropped child rays);
  * an in-kernel chunk-culled MXU trace (the mm2 bilinear form,
    ops/pallas_trace) per 2048-lane block — a per-128-lane-row shape
    was built first and measured 5.6x SLOWER (scalar-branch overload;
    PERFORMANCE.md r5 log);
  * winner attributes joined in-kernel by per-chunk ONE-HOT MATMULS
    (Mosaic has no per-lane gather; the (40, chunk) @ (chunk, 128)
    product is the supported form, skipped for chunks holding no
    winner);
  * texture terms DEFERRED through fixed per-lane slots: a textured
    diffuse terminal emits (tex, u, v, weight*emit*diff) into one of
    K_SLOTS per-lane slots; the caller multiplies texels in at XLA
    level. Slot overflow is counted per pixel and recovered exactly by
    whitted_render_exact's patch pass (the only inexactness channel —
    the DFS itself is lossless).

Applicability (dispatched by ops/whitted.whitted_render): TPU backend
(or interpret mode), ONE emitter (the spp loop then collapses — the
reference's per-sample emitter pick is deterministic, ops/whitted),
triangles <= 16K (VMEM-resident coefficient + attribute tables),
spheres <= 32, (16, 128)-divisible frames. Everything else falls back
to the level-synchronous wavefront.

Faithful semantics (Scene.cpp cites in ops/whitted's docstring): depth
cap -> black, miss -> background, shadow-bias origin lift, the
|t^2-dist^2| shadow quirk, Fresnel kr / (1-kr) recursion weights, the
sphere Properties.color == 0 quirk, EPSILON ray offsets.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_FEATURES = 13
ATTR_COLS = 40
SUPER = 8      # chunks per super-chunk (two-level cull granule)
EPS = 1e-5          # Scene.hpp:160
BIG = 1e30
SENT = 0x7FFFFFF0   # winner sentinel: no chunk matches
MISS_ORIG = 1e9     # canned dead-lane ray (ops/whitted semantics)

# attr table row layout (ATTR_COLS rows per triangle, feature-major per
# chunk): see pack_uber_tables
_A_V0, _A_V1, _A_V2 = 0, 3, 6
_A_N0, _A_N1, _A_N2 = 9, 12, 15
_A_UV0, _A_UV1, _A_UV2 = 18, 20, 22
_A_KD, _A_EMIT = 24, 27
_A_MTYPE, _A_IOR, _A_TEX = 30, 31, 32
_A_KA, _A_KS, _A_SPEC = 33, 36, 39


def pack_uber_tables(scene, chunk: int = 64):
    """Kernel operand tables from an RTScene.

    `chunk`: the kernel's cull/matmul granule. The sweep is epilogue-
    bound (the (chunk, N) accept/resolve planes of each visited chunk),
    so FINER culling keeps winning until the loop's fixed cost bites.
    Frame-0 probe: 512 -> 88.6, 256 -> 54.7, 128 -> 36.6, 64 -> 31.3,
    32 -> 27.7, 16 -> 34.6 ms — but across the BENCH ROTATION SWEEP
    chunk=32 develops a heavy tail (median 39.2, p90 55.6: rotated-
    frame chunk AABBs lose tightness and the 184-chunk loop's fixed
    cost bites on spec-heavy frames) while **chunk=64 is both fast and
    stable (median 31.0, p10 30.5, p90 31.4)**. 64 is the default.

    Returns (coef_c (nc, 4*chunk, 13), attr_c (nc, ATTR_COLS, chunk),
    cab (6, nsc*SUPER), cab2 (6, nsc), sph (S, 24), nc, chunk)."""
    from software_rasterizer_tpu.ops.pallas_trace import chunk_bounds

    coef = scene.mt_coef                       # (4F, 13)
    f = coef.shape[0] // 4
    if f % chunk:
        pad = chunk - f % chunk
        cf = coef.reshape(4, f, N_FEATURES)
        cf = jnp.pad(cf, ((0, 0), (0, pad), (0, 0)))
        coef = cf.reshape(4 * (f + pad), N_FEATURES)
    fp = coef.shape[0] // 4
    nc = fp // chunk
    coef_c = (
        coef.reshape(4, nc, chunk, N_FEATURES)
        .transpose(1, 0, 2, 3)
        .reshape(nc, 4 * chunk, N_FEATURES)
    )
    lo, hi = chunk_bounds(scene.v0, scene.v1, scene.v2, scene.tri_valid,
                          chunk)
    assert lo.shape[0] == nc, (lo.shape, nc)
    # TWO-LEVEL cull: super-chunk AABBs over SUPER consecutive chunks
    # (BVH-leaf order keeps them tight). The sweep tests supers first
    # and descends only into entered ones — the flat 46-cond cull loop
    # was most of the sweep's per-block fixed cost (all-dead rows pay
    # ~nsc conds instead of nc).
    nsc = -(-nc // SUPER)
    pad_c = nsc * SUPER - nc
    lo_p = jnp.pad(lo, ((0, pad_c), (0, 0)), constant_values=BIG)
    hi_p = jnp.pad(hi, ((0, pad_c), (0, 0)), constant_values=-BIG)
    cab2 = jnp.concatenate([
        lo_p.reshape(nsc, SUPER, 3).min(1).T,
        hi_p.reshape(nsc, SUPER, 3).max(1).T,
    ], axis=0).astype(jnp.float32)             # (6, nsc)
    # cab padded to nsc*SUPER columns (inverted boxes): the inner cull
    # loop reads fixed SUPER-sized windows; padded chunks never enter,
    # so the (cond-guarded) coef/attr reads for them never execute
    cab = jnp.concatenate([lo_p.T, hi_p.T], axis=0).astype(jnp.float32)

    f0 = scene.v0.shape[0]
    mt = scene.tri_mat
    valid = scene.tri_valid[:, None]
    rows = jnp.concatenate([
        scene.v0, scene.v1, scene.v2,                      # 0:9
        scene.n0, scene.n1, scene.n2,                      # 9:18
        scene.uv0, scene.uv1, scene.uv2,                   # 18:24
        jnp.where(valid, scene.mat_kd[mt], 0.0),           # 24:27
        jnp.where(valid, scene.mat_emit[mt], 0.0),         # 27:30
        scene.mat_type[mt][:, None].astype(jnp.float32),   # 30
        scene.mat_ior[mt][:, None],                        # 31
        scene.tri_tex[:, None].astype(jnp.float32),        # 32
        jnp.where(valid, scene.mat_ka[mt], 0.0),           # 33:36
        jnp.where(valid, scene.mat_ks[mt], 0.0),           # 36:39
        scene.mat_spec[mt][:, None],                       # 39
    ], axis=1).astype(jnp.float32)                         # (F, 40)
    if fp != f0:
        rows = jnp.pad(rows, ((0, fp - f0), (0, 0)))
    attr_c = (
        rows.reshape(nc, chunk, ATTR_COLS).transpose(0, 2, 1)
    )                                                      # (nc, 40, chunk)

    sm = scene.sph_mat
    s = scene.sph_c.shape[0]
    sph = jnp.concatenate([
        scene.sph_c,                                       # 0:3
        scene.sph_r[:, None],                              # 3
        jnp.where(scene.sph_valid[:, None],
                  scene.mat_emit[sm], 0.0),                # 4:7
        scene.sph_valid.astype(jnp.float32)[:, None],      # 7
        scene.mat_type[sm][:, None].astype(jnp.float32),   # 8
        scene.mat_ior[sm][:, None],                        # 9
        jnp.where(scene.sph_valid[:, None],
                  scene.mat_ka[sm], 0.0),                  # 10:13
        jnp.where(scene.sph_valid[:, None],
                  scene.mat_ks[sm], 0.0),                  # 13:16
        scene.mat_spec[sm][:, None],                       # 16
        jnp.zeros((s, 7)),                                 # 17:24 pad
    ], axis=1).astype(jnp.float32)                         # (S, 24)
    return coef_c, attr_c, cab, cab2, sph, nc, chunk


def _norm3(x, y, z, eps=0.0):
    n = jnp.sqrt(x * x + y * y + z * z)
    ok = n > eps
    inv = jnp.where(n > 0, 1.0 / jnp.where(n > 0, n, 1.0), 0.0)
    inv = jnp.where(ok, inv, 0.0)
    return x * inv, y * inv, z * inv


def _uber_kernel(scal_ref, cab_ref, cab2_ref, sph_ref, coef_ref, attr_ref,
                 o_ref, d_ref,
                 rgb_ref, slot_ref, ovf_ref, nray_ref,
                 ts_ref, fs_ref, aj_ref, sh_ref, phi_s, win_s, aj2_ref,
                 *, nc: int, nsc: int, chunk: int, rows: int,
                 max_depth: int, k_slots: int, n_sph_pad: int,
                 _ablate: int = 0,
                 precision=jax.lax.Precision.HIGHEST):
    """One 2048-ray screen tile's full Whitted render.

    scal_ref (SMEM f32): [ec_x, ec_y, ec_z, bg_r, bg_g, bg_b,
    shadow_bias, n_sph, any_emitter]. Scratch: ts/fs (rows,128) winner
    planes, aj (ATTR_COLS, rows, 128) tri attribute join, sh (4, rows,
    128) shadow [t, emit_rgb]."""
    shape = (rows, 128)
    zero = jnp.zeros(shape, jnp.float32)
    izero = jnp.zeros(shape, jnp.int32)
    ec_x, ec_y, ec_z = scal_ref[0], scal_ref[1], scal_ref[2]
    bg_r, bg_g, bg_b = scal_ref[3], scal_ref[4], scal_ref[5]
    shadow_bias = scal_ref[6]
    any_e = scal_ref[7] > 0.0

    n = rows * 128

    def tri_sweep(ox, oy, oz, dx, dy, dz):
        """Chunk-culled MXU winner search over the whole 2048-lane
        block; writes ts_ref (backend winner t, BIG miss) and fs_ref
        (global winner index, SENT miss), both back in (rows, 128)
        layout. Same math / thresholds / tie rules as
        ops/pallas_trace._trace_kernel2c.

        Mosaic has no lane<->sublane relayout primitive, so the (13, N)
        ray-feature matrix is assembled with `rows` STATIC row stores
        into the phi_s scratch (each a contiguous (13, 128) vector
        move); results relayout back the same way. The first per-row
        kernel shape (one cond + one N=128 matmul per (row, chunk))
        measured 5.6x SLOWER than the wavefront — ~3000 scalar branches
        per block-iteration dominated everything; this block shape has
        2*nc conds and 16x larger matmuls."""
        if _ablate != 5:   # 5: timing probe — sweep sans phi build
            for r in range(rows):
                oxr, oyr, ozr = ox[r:r + 1], oy[r:r + 1], oz[r:r + 1]
                dxr, dyr, dzr = dx[r:r + 1], dy[r:r + 1], dz[r:r + 1]
                phi_s[:, 128 * r:128 * (r + 1)] = jnp.concatenate([
                    oxr * dyr, oxr * dzr, oyr * dxr, oyr * dzr,
                    ozr * dxr, ozr * dyr,
                    dxr, dyr, dzr, oxr, oyr, ozr,
                    jnp.ones((1, 128), jnp.float32),
                ], axis=0)                                    # (13,128)
        phi = phi_s[...]
        # NOTE a vectorized all-chunks cull + branch-free extraction
        # loop was built and measured SLOWER (sweep 15.5 -> 21.5 ms at
        # 1024^2): the (C_pad, N) slab batch costs full-width vector
        # work per chunk where this sequential form pays two vregs per
        # op, and Mosaic's cond overhead proved small. PERFORMANCE.md
        # r5 negative results.
        ix = 1.0 / jnp.where(dx == 0.0, 1e-30, dx)
        iy = 1.0 / jnp.where(dy == 0.0, 1e-30, dy)
        iz = 1.0 / jnp.where(dz == 0.0, 1e-30, dz)

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

        def chunk_body(c, carry):
            enter = slab_enter(cab_ref, c)

            def visit(carry):
                best_t, best_f = carry
                prod = jax.lax.dot_general(
                    coef_ref[c], phi,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    precision=precision,
                    preferred_element_type=jnp.float32,
                )                                             # (4C,N)
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
                tm = jnp.where(ok, t, BIG)
                ct = jnp.min(tm, axis=0, keepdims=True)       # (1,N)
                ri = jax.lax.broadcasted_iota(jnp.int32, tm.shape, 0)
                cf = jnp.min(
                    jnp.where(tm == ct, ri, jnp.int32(SENT)),
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
                    sc * SUPER, (sc + 1) * SUPER, chunk_body, carry)

            return jax.lax.cond(
                slab_enter(cab2_ref, sc), descend, lambda c_: c_, carry)

        init = (
            jnp.full((1, n), BIG, jnp.float32),
            jnp.full((1, n), SENT, jnp.int32),
        )
        bt, bf = jax.lax.fori_loop(0, nsc, super_body, init)
        bf = jnp.where(bt < BIG, bf, SENT)
        for r in range(rows):
            ts_ref[r:r + 1, :] = bt[:, 128 * r:128 * (r + 1)]
            fs_ref[r:r + 1, :] = bf[:, 128 * r:128 * (r + 1)]

    def set_join_win(win):
        """Stage the (rows, 128) masked winner plane into win_s's
        (1, N) layout (static row stores)."""
        for r in range(rows):
            win_s[:, 128 * r:128 * (r + 1)] = win[r:r + 1, :]

    def tri_join(row_lo, row_hi):
        """One-hot attribute join at block width: acc (k, N) = sum over
        winner chunks of attr[c, row_lo:row_hi] @ onehot(win in chunk
        c). The loop runs only over [min, max] of the block's winner
        chunk ids — a primary tile's winners usually live in 1-2 chunks
        (BVH-leaf face order is spatially coherent) and a shadow join
        whose tri winners are absent (the emitter is a sphere) loops
        ZERO times. Reads win_s; the result stays in aj2_ref."""
        k = row_hi - row_lo
        win = win_s[...]
        aj2_ref[pl.ds(0, k), :] = jnp.zeros((k, n), jnp.float32)
        valid = win < SENT
        c_lo = jnp.min(jnp.where(valid, win, SENT)) // chunk
        c_hi = (jnp.max(jnp.where(valid, win, -1)) + chunk) // chunk

        def chunk_body(c, _):
            inchunk = (win >= c * chunk) & (win < (c + 1) * chunk)

            @pl.when(jnp.any(inchunk))
            def _():
                loc = jnp.where(inchunk, win - c * chunk, -1)
                ri = jax.lax.broadcasted_iota(jnp.int32, (chunk, n), 0)
                oh = (ri == loc).astype(jnp.float32)          # (chunk,N)
                part = jax.lax.dot_general(
                    attr_ref[c, pl.ds(row_lo, k), :], oh,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    precision=precision,
                    preferred_element_type=jnp.float32,
                )                                             # (k,N)
                aj2_ref[pl.ds(0, k), :] = aj2_ref[pl.ds(0, k), :] + part
            return 0

        jax.lax.fori_loop(jnp.minimum(c_lo, nc), jnp.minimum(c_hi, nc),
                          chunk_body, 0)

    def scatter_join(out_ref, k):
        """aj2 (k, N) -> out_ref (k, rows, 128) via static row moves."""
        for r in range(rows):
            out_ref[pl.ds(0, k), r:r + 1, :] = (
                aj2_ref[pl.ds(0, k), 128 * r:128 * (r + 1)]
                .reshape(k, 1, 128)
            )

    def sph_sweep(ox, oy, oz, dx, dy, dz, want_attrs: bool):
        """Nearest sphere per lane, block-level scalar-broadcast loop.
        Returns (st, attrs dict) — exact quadratic, reference rules
        (ops/intersect.intersect_spheres)."""
        big = jnp.full(shape, BIG, jnp.float32)
        carry = {
            "t": big, "i": jnp.full(shape, -1, jnp.int32),
            "ex": zero, "ey": zero, "ez": zero,
            "cx": zero, "cy": zero, "cz": zero,
            "mt": zero, "ior": zero,
            "kax": zero, "kay": zero, "kaz": zero,
            "ksx": zero, "ksy": zero, "ksz": zero, "se": zero,
        }
        keys = list(carry.keys())

        def body(s, c):
            vals = [c[k] for k in keys]
            (t_, i_, ex, ey, ez, cx, cy, cz, mt_, io_,
             kax, kay, kaz, ksx, ksy, ksz, se) = vals
            scx = sph_ref[s, 0]
            scy = sph_ref[s, 1]
            scz = sph_ref[s, 2]
            rr = sph_ref[s, 3]
            ok_s = sph_ref[s, 7] > 0.0
            lx = ox - scx
            ly = oy - scy
            lz = oz - scz
            a = dx * dx + dy * dy + dz * dz
            b = 2.0 * (dx * lx + dy * ly + dz * lz)
            c0 = lx * lx + ly * ly + lz * lz - rr * rr
            disc = b * b - 4.0 * a * c0
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            q = -0.5 * (b + jnp.where(b >= 0, sq, -sq))
            q = jnp.where(q == 0.0, 1e-30, q)
            x0 = q / a
            x1 = c0 / q
            both = (x0 > 0.0) & (x1 > 0.0)
            ts = jnp.where(both, jnp.minimum(x0, x1),
                           jnp.where(x0 > 0.0, x0, x1))
            okh = (disc >= 0.0) & (ts > 0.0) & ok_s
            ts = jnp.where(okh, ts, BIG)
            bet = ts < t_
            out = {
                "t": jnp.where(bet, ts, t_),
                "i": jnp.where(bet, s, i_),
                "ex": jnp.where(bet, sph_ref[s, 4], ex),
                "ey": jnp.where(bet, sph_ref[s, 5], ey),
                "ez": jnp.where(bet, sph_ref[s, 6], ez),
            }
            if want_attrs:
                out.update({
                    "cx": jnp.where(bet, scx, cx),
                    "cy": jnp.where(bet, scy, cy),
                    "cz": jnp.where(bet, scz, cz),
                    "mt": jnp.where(bet, sph_ref[s, 8], mt_),
                    "ior": jnp.where(bet, sph_ref[s, 9], io_),
                    "kax": jnp.where(bet, sph_ref[s, 10], kax),
                    "kay": jnp.where(bet, sph_ref[s, 11], kay),
                    "kaz": jnp.where(bet, sph_ref[s, 12], kaz),
                    "ksx": jnp.where(bet, sph_ref[s, 13], ksx),
                    "ksy": jnp.where(bet, sph_ref[s, 14], ksy),
                    "ksz": jnp.where(bet, sph_ref[s, 15], ksz),
                    "se": jnp.where(bet, sph_ref[s, 16], se),
                })
            else:
                out.update({k: c[k] for k in keys[5:]})
            return out

        # static bound: invalid (padding) rows self-reject via col 7
        return jax.lax.fori_loop(0, n_sph_pad, body, carry)

    # ---- persistent DFS state (pl.run_scoped scratch) -----------------
    def main(cur_ref, stk_ref, live_ref, dep_ref, sp_ref, cnt_ref):
        # cur_ref (9, rows, 128): [o(3) | d(3) | w(3)]
        # stk_ref (max_depth, 10, rows, 128): [o, d, w, depth]
        # live/dep/sp/cnt: (rows,128) i32
        for i in range(3):
            cur_ref[i] = o_ref[i]
            cur_ref[3 + i] = d_ref[i]
            cur_ref[6 + i] = jnp.ones(shape, jnp.float32)
        live_ref[...] = jnp.ones(shape, jnp.int32)
        dep_ref[...] = izero
        sp_ref[...] = izero
        cnt_ref[...] = izero
        rgb_ref[0] = zero
        rgb_ref[1] = zero
        rgb_ref[2] = zero
        for s in range(k_slots):
            slot_ref[6 * s] = jnp.full(shape, -1.0)       # tex id
            for j in range(1, 6):
                slot_ref[6 * s + j] = zero
        ovf_ref[...] = izero
        nray_ref[0] = izero
        nray_ref[1] = izero

        def body(carry):
            live = live_ref[...] != 0
            nray_ref[0] = nray_ref[0] + live.astype(jnp.int32)
            if _ablate == 3:   # probe: count ITERATIONS in nray[1]
                nray_ref[1] = nray_ref[1] + 1
            # neuter dead lanes: canned miss ray fails every slab test,
            # so all-dead rows skip all chunks
            ox = jnp.where(live, cur_ref[0], MISS_ORIG)
            oy = jnp.where(live, cur_ref[1], MISS_ORIG)
            oz = jnp.where(live, cur_ref[2], MISS_ORIG)
            dx = jnp.where(live, cur_ref[3], 0.0)
            dy = jnp.where(live, cur_ref[4], 0.0)
            dz = jnp.where(live, cur_ref[5], 1.0)
            wr = cur_ref[6]
            wg = cur_ref[7]
            wb = cur_ref[8]
            depth = dep_ref[...]

            # ---- main trace: triangles (MXU) + spheres ----
            tri_sweep(ox, oy, oz, dx, dy, dz)
            if _ablate in (4, 5):   # probe: tri sweep only (5: no phi)
                rgb_ref[0] = rgb_ref[0] + jnp.where(
                    live, ts_ref[...], 0.0)
                live_ref[...] = izero
                return jnp.int32(0)
            sph = sph_sweep(ox, oy, oz, dx, dy, dz, True)
            tt = ts_ref[...]
            st = sph["t"]
            use_s = st < tt
            hit = live & (jnp.minimum(st, tt) < BIG)
            tri_win = live & (tt < BIG) & ~use_s

            if _ablate == 1:   # timing probe: main sweep only
                rgb_ref[0] = rgb_ref[0] + jnp.where(
                    hit, jnp.minimum(st, tt), 0.0)
                live_ref[...] = izero
                return jnp.int32(0)

            # ---- tri attribute join at winner chunks ----
            set_join_win(jnp.where(tri_win, fs_ref[...], SENT))
            tri_join(0, ATTR_COLS)
            scatter_join(aj_ref, ATTR_COLS)

            # exact per-lane (u, v, t) recompute (the _mt_uv oracle
            # formula) so integrator-visible values match the wavefront
            v0x, v0y, v0z = aj_ref[0], aj_ref[1], aj_ref[2]
            e1x = aj_ref[3] - v0x
            e1y = aj_ref[4] - v0y
            e1z = aj_ref[5] - v0z
            e2x = aj_ref[6] - v0x
            e2y = aj_ref[7] - v0y
            e2z = aj_ref[8] - v0z
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
            t_ex = (e2x * qx + e2y * qy + e2z * qz) * inv
            t = jnp.where(use_s, st, t_ex)
            cx_ = ox + dx * t
            cy_ = oy + dy * t
            cz_ = oz + dz * t

            # merged winner attributes
            w_b = 1.0 - u - v
            nx = w_b * aj_ref[9] + u * aj_ref[12] + v * aj_ref[15]
            ny = w_b * aj_ref[10] + u * aj_ref[13] + v * aj_ref[16]
            nz = w_b * aj_ref[11] + u * aj_ref[14] + v * aj_ref[17]
            nx, ny, nz = _norm3(nx, ny, nz, 1e-20)
            snx = cx_ - sph["cx"]
            sny = cy_ - sph["cy"]
            snz = cz_ - sph["cz"]
            snx, sny, snz = _norm3(snx, sny, snz, 1e-20)
            nx = jnp.where(use_s, snx, nx)
            ny = jnp.where(use_s, sny, ny)
            nz = jnp.where(use_s, snz, nz)
            mtype = jnp.where(
                use_s, sph["mt"], aj_ref[_A_MTYPE]
            )
            mtype_i = jnp.round(mtype).astype(jnp.int32)
            ior = jnp.where(use_s, sph["ior"], aj_ref[_A_IOR])
            kax = jnp.where(use_s, sph["kax"], aj_ref[_A_KA])
            kay = jnp.where(use_s, sph["kay"], aj_ref[_A_KA + 1])
            kaz = jnp.where(use_s, sph["kaz"], aj_ref[_A_KA + 2])
            ksx = jnp.where(use_s, sph["ksx"], aj_ref[_A_KS])
            ksy = jnp.where(use_s, sph["ksy"], aj_ref[_A_KS + 1])
            ksz = jnp.where(use_s, sph["ksz"], aj_ref[_A_KS + 2])
            sexp = jnp.where(use_s, sph["se"], aj_ref[_A_SPEC])
            tex = jnp.where(use_s, -1.0, aj_ref[_A_TEX])
            # diffuse color: texel (DEFERRED via slots) for textured
            # tris — their Kd contributes NOTHING in-kernel; Kd for
            # untextured tris; ZERO for spheres (Object.hpp:36-40 quirk)
            texed_win = (tex >= 0.0) & ~use_s
            kdx = jnp.where(use_s | texed_win, 0.0, aj_ref[_A_KD])
            kdy = jnp.where(use_s | texed_win, 0.0, aj_ref[_A_KD + 1])
            kdz = jnp.where(use_s | texed_win, 0.0, aj_ref[_A_KD + 2])
            uvx = w_b * aj_ref[_A_UV0] + u * aj_ref[_A_UV1] \
                + v * aj_ref[_A_UV2]
            uvy = w_b * aj_ref[_A_UV0 + 1] + u * aj_ref[_A_UV1 + 1] \
                + v * aj_ref[_A_UV2 + 1]

            if _ablate == 2:   # timing probe: + join + attrs/recompute
                rgb_ref[0] = rgb_ref[0] + jnp.where(
                    hit, t + nx + kdx + kax + uvx + mtype, 0.0)
                live_ref[...] = izero
                return jnp.int32(0)

            # ---- classify ----
            miss = live & ~hit
            rgb_ref[0] = rgb_ref[0] + jnp.where(miss, wr * bg_r, 0.0)
            rgb_ref[1] = rgb_ref[1] + jnp.where(miss, wg * bg_g, 0.0)
            rgb_ref[2] = rgb_ref[2] + jnp.where(miss, wb * bg_b, 0.0)
            is_diff = hit & (mtype_i == 0)
            is_spec = hit & ((mtype_i == 1) | (mtype_i == 2))
            is_glass = is_spec & (mtype_i == 1)
            if _ablate != 3:
                nray_ref[1] = nray_ref[1] + is_diff.astype(jnp.int32)

            def _phong_and_shadow():
                # ---- Phong direct toward the (single) emitter center
                llx, lly, llz = _norm3(ec_x - cx_, ec_y - cy_, ec_z - cz_)
                ndl = nx * llx + ny * lly + nz * llz
                side = jnp.where(ndl >= 0.0, 1.0, -1.0)
                bias = shadow_bias * jnp.maximum(
                    1.0,
                    jnp.maximum(jnp.abs(cx_),
                                jnp.maximum(jnp.abs(cy_), jnp.abs(cz_))),
                )
                sox = cx_ + nx * (side * bias)
                soy = cy_ + ny * (side * bias)
                soz = cz_ + nz * (side * bias)
                diff = jnp.maximum(0.0, ndl)
                # refl of -l about n; spec = max(0,-(d.refl))^se
                mldn = (-llx) * nx + (-lly) * ny + (-llz) * nz
                rlx = -llx - 2.0 * mldn * nx
                rly = -lly - 2.0 * mldn * ny
                rlz = -llz - 2.0 * mldn * nz
                rlx, rly, rlz = _norm3(rlx, rly, rlz)
                sdot = jnp.maximum(
                    0.0, -(dx * rlx + dy * rly + dz * rlz))
                spec = jnp.where(
                    sdot > 0.0,
                    jnp.exp(sexp * jnp.log(jnp.maximum(sdot, 1e-30))),
                    jnp.where(sexp == 0.0, 1.0, 0.0),
                )

                # ---- shadow trace (diffuse lanes; others canned) ----
                shx = jnp.where(is_diff, sox, MISS_ORIG)
                shy = jnp.where(is_diff, soy, MISS_ORIG)
                shz = jnp.where(is_diff, soz, MISS_ORIG)
                sdx = jnp.where(is_diff, llx, 0.0)
                sdy = jnp.where(is_diff, lly, 0.0)
                sdz = jnp.where(is_diff, llz, 1.0)
                tri_sweep(shx, shy, shz, sdx, sdy, sdz)
                sph2 = sph_sweep(shx, shy, shz, sdx, sdy, sdz, False)
                tt2 = ts_ref[...]
                st2 = sph2["t"]
                use_s2 = st2 < tt2
                t_sh = jnp.where(use_s2, st2, tt2)
                hit_sh = t_sh < BIG
                # emit-only join for the shadow winner (rows 27:30)
                set_join_win(jnp.where(
                    is_diff & (tt2 < BIG) & ~use_s2, fs_ref[...], SENT))
                tri_join(_A_EMIT, _A_EMIT + 3)
                scatter_join(sh_ref, 3)
                emx = jnp.where(use_s2, sph2["ex"], sh_ref[0])
                emy = jnp.where(use_s2, sph2["ey"], sh_ref[1])
                emz = jnp.where(use_s2, sph2["ez"], sh_ref[2])
                lit = hit_sh & (
                    jnp.sqrt(emx * emx + emy * emy + emz * emz) >= EPS
                ) & any_e
                ddx = sdx * t_sh
                ddy = sdy * t_sh
                ddz = sdz * t_sh
                dist2 = ddx * ddx + ddy * ddy + ddz * ddz
                in_shadow = jnp.abs(t_sh * t_sh - dist2) > 1e-6
                amb = jnp.where(in_shadow, 0.0, 1.0)

                dep_gate = (is_diff & lit).astype(jnp.float32)
                rgb_ref[0] = rgb_ref[0] + dep_gate * wr * (
                    amb * (kax + diff * kdx) * emx + spec * ksx * emx)
                rgb_ref[1] = rgb_ref[1] + dep_gate * wg * (
                    amb * (kay + diff * kdy) * emy + spec * ksy * emy)
                rgb_ref[2] = rgb_ref[2] + dep_gate * wb * (
                    amb * (kaz + diff * kdz) * emz + spec * ksz * emz)

                # ---- texture slot (textured diffuse terminal) ----
                # term = w * emit * diff * amb * texel; the texel
                # multiply happens at XLA level (Mosaic has no per-lane
                # gather). The in-kernel deposit above already used
                # Kd == 0 for textured winners, so the slot term is
                # purely additive.
                want_slot = (
                    is_diff & lit & texed_win & (amb > 0.0)
                    & (diff > 0.0)
                )
                swr = wr * emx * diff * amb
                swg = wg * emy * diff * amb
                swb = wb * emz * diff * amb
                cnt = cnt_ref[...]
                for s in range(k_slots):
                    here = want_slot & (cnt == s)
                    slot_ref[6 * s] = jnp.where(
                        here, tex, slot_ref[6 * s])
                    slot_ref[6 * s + 1] = jnp.where(
                        here, uvx, slot_ref[6 * s + 1])
                    slot_ref[6 * s + 2] = jnp.where(
                        here, uvy, slot_ref[6 * s + 2])
                    slot_ref[6 * s + 3] = jnp.where(
                        here, swr, slot_ref[6 * s + 3])
                    slot_ref[6 * s + 4] = jnp.where(
                        here, swg, slot_ref[6 * s + 4])
                    slot_ref[6 * s + 5] = jnp.where(
                        here, swb, slot_ref[6 * s + 5])
                over = want_slot & (cnt >= k_slots)
                ovf_ref[...] = ovf_ref[...] | over.astype(jnp.int32)
                cnt_ref[...] = cnt + want_slot.astype(jnp.int32)

            # Predicated on the block having ANY diffuse lane this
            # iteration — deep specular-chain iterations (the glass-
            # region DFS tail) skip a full sweep + join + the
            # transcendental-heavy Phong math.
            pl.when(jnp.any(is_diff))(_phong_and_shadow)

            # ---- specular: Fresnel fork (Tools.cpp:250-293) ----
            # Like the diffuse section, predicated: iterations whose
            # live lanes are all terminal (diffuse/miss leaves — common
            # in the DFS tail) skip the Fresnel/refract math, the push
            # chains, and the continue-state writes entirely. `pop`
            # reads sp BEFORE the section (push only touches cont
            # lanes, disjoint from pop lanes, so per-lane values agree).
            can_spawn = is_spec & (depth < max_depth)
            cont = can_spawn
            pop = live & ~cont & (sp_ref[...] > 0)

            def _spec_section():
                cosi = jnp.clip(dx * nx + dy * ny + dz * nz, -1.0, 1.0)
                exiting = cosi > 0
                etai = jnp.where(exiting, ior, 1.0)
                etat = jnp.where(exiting, 1.0, ior)
                sint = etai / etat * jnp.sqrt(
                    jnp.maximum(0.0, 1.0 - cosi * cosi))
                tir = sint >= 1.0
                cost = jnp.sqrt(jnp.maximum(0.0, 1.0 - sint * sint))
                ci = jnp.abs(cosi)
                rs = (etat * ci - etai * cost) / (etat * ci + etai * cost)
                rp = (etai * ci - etat * cost) / (etai * ci + etat * cost)
                kr = jnp.where(tir, 1.0, (rs * rs + rp * rp) * 0.5)
                kr = jnp.clip(kr, 0.0, 1.0)

                rfx = dx - 2.0 * cosi * nx
                rfy = dy - 2.0 * cosi * ny
                rfz = dz - 2.0 * cosi * nz
                rfx, rfy, rfz = _norm3(rfx, rfy, rfz)

                entering = cosi < 0
                r_etai = jnp.where(entering, 1.0, ior)
                r_etat = jnp.where(entering, ior, 1.0)
                nnx2 = jnp.where(entering, nx, -nx)
                nny2 = jnp.where(entering, ny, -ny)
                nnz2 = jnp.where(entering, nz, -nz)
                eta = r_etai / r_etat
                kk = 1.0 - eta * eta * (1.0 - ci * ci)
                rr_s = eta * ci - jnp.sqrt(jnp.maximum(kk, 0.0))
                rrx = eta * dx + rr_s * nnx2
                rry = eta * dy + rr_s * nny2
                rrz = eta * dz + rr_s * nnz2
                tir2 = kk < 0
                rrx = jnp.where(tir2, 0.0, rrx)
                rry = jnp.where(tir2, 0.0, rry)
                rrz = jnp.where(tir2, 0.0, rrz)
                has_refr = (
                    jnp.sqrt(rrx * rrx + rry * rry + rrz * rrz) > 1e-6
                ) & (jnp.abs(kr - 1.0) > 1e-6)
                rrx, rry, rrz = _norm3(rrx, rry, rrz, 1e-20)

                idotn = cosi
                side_g = jnp.where(idotn < 0, 1.0, -1.0)  # glass refl
                rdotn = rfx * nx + rfy * ny + rfz * nz
                side_m = jnp.where(rdotn > 0, 1.0, -1.0)  # mirror refl
                side_r = jnp.where(idotn > 0, 1.0, -1.0)  # refract
                refl_side = jnp.where(is_glass, side_g, side_m)
                rox = cx_ + nx * refl_side * EPS
                roy = cy_ + ny * refl_side * EPS
                roz = cz_ + nz * refl_side * EPS
                qox = cx_ + nx * side_r * EPS
                qoy = cy_ + ny * side_r * EPS
                qoz = cz_ + nz * side_r * EPS
                refl_w = jnp.where(is_glass, kr, 1.0)

                # push the refract child (glass, refraction, depth ok)
                push = can_spawn & is_glass & has_refr
                sp = sp_ref[...]
                pvals = [qox, qoy, qoz, rrx, rry, rrz,
                         wr * (1.0 - kr), wg * (1.0 - kr),
                         wb * (1.0 - kr)]
                for lvl in range(max_depth):
                    here = push & (sp == lvl)
                    for j in range(9):
                        stk_ref[lvl, j] = jnp.where(
                            here, pvals[j], stk_ref[lvl, j])
                    stk_ref[lvl, 9] = jnp.where(
                        here, (depth + 1).astype(jnp.float32),
                        stk_ref[lvl, 9])
                sp_ref[...] = sp + push.astype(jnp.int32)

                # continue into the reflect child
                cur_ref[0] = jnp.where(cont, rox, cur_ref[0])
                cur_ref[1] = jnp.where(cont, roy, cur_ref[1])
                cur_ref[2] = jnp.where(cont, roz, cur_ref[2])
                cur_ref[3] = jnp.where(cont, rfx, cur_ref[3])
                cur_ref[4] = jnp.where(cont, rfy, cur_ref[4])
                cur_ref[5] = jnp.where(cont, rfz, cur_ref[5])
                cur_ref[6] = jnp.where(cont, wr * refl_w, cur_ref[6])
                cur_ref[7] = jnp.where(cont, wg * refl_w, cur_ref[7])
                cur_ref[8] = jnp.where(cont, wb * refl_w, cur_ref[8])
                dep_ref[...] = jnp.where(cont, depth + 1, dep_ref[...])

            pl.when(jnp.any(can_spawn))(_spec_section)

            def _pop_section():
                sp = sp_ref[...]
                spm1 = jnp.maximum(sp - 1, 0)
                popv = [zero] * 10
                for lvl in range(max_depth):
                    here = pop & (spm1 == lvl)
                    for j in range(10):
                        popv[j] = jnp.where(
                            here, stk_ref[lvl, j], popv[j])
                sp_ref[...] = jnp.where(pop, spm1, sp)
                for j in range(9):
                    cur_ref[j] = jnp.where(pop, popv[j], cur_ref[j])
                dep_ref[...] = jnp.where(
                    pop, jnp.round(popv[9]).astype(jnp.int32),
                    dep_ref[...])

            pl.when(jnp.any(pop))(_pop_section)

            new_live = cont | pop
            live_ref[...] = new_live.astype(jnp.int32)
            return jnp.sum(new_live.astype(jnp.int32))

        jax.lax.while_loop(lambda c: c > 0, body, jnp.int32(1))

    pl.run_scoped(
        main,
        pltpu.VMEM((9, rows, 128), jnp.float32),
        pltpu.VMEM((max(max_depth, 1), 10, rows, 128), jnp.float32),
        pltpu.VMEM((rows, 128), jnp.int32),
        pltpu.VMEM((rows, 128), jnp.int32),
        pltpu.VMEM((rows, 128), jnp.int32),
        pltpu.VMEM((rows, 128), jnp.int32),
    )


@functools.partial(
    jax.jit,
    static_argnames=("max_depth", "k_slots", "block", "chunk",
                     "interpret", "_ablate"),
)
def whitted_uber_trace(scene, orig, d, max_depth: int = 5,
                       k_slots: int = 4, block: int = 2048,
                       chunk: int = 64, shadow_bias=1e-4,
                       interpret: bool = False, _ablate: int = 0):
    """Run the über-kernel over (N,3) rays (tile-order lanes). Returns
    (rgb (N,3) pre-texture, slots (N, k_slots, 6), ovf (N,) bool,
    rays_main (), rays_shadow ()). The caller applies texture slots and
    (rarely) the exact-overflow patch."""
    coef_c, attr_c, cab, cab2, sph, nc, chunk = pack_uber_tables(
        scene, chunk)
    n = orig.shape[0]
    rows = block // 128
    nb = -(-n // block)
    n_pad = nb * block
    if n_pad != n:
        orig = jnp.pad(orig, ((0, n_pad - n), (0, 0)),
                       constant_values=MISS_ORIG)
        d = jnp.pad(d, ((0, n_pad - n), (0, 0)), constant_values=1.0)
    oc = orig.T.reshape(3, nb * rows, 128)
    dc = d.T.reshape(3, nb * rows, 128)

    scal = jnp.concatenate([
        scene.emitter_cr[0, 0:3].astype(jnp.float32),
        scene.background.astype(jnp.float32),
        jnp.stack([
            jnp.asarray(shadow_bias, jnp.float32),
            (scene.n_emitters > 0).astype(jnp.float32),
        ]),
    ])

    rgb, slots, ovf, nray = pl.pallas_call(
        functools.partial(
            _uber_kernel, nc=nc, nsc=cab2.shape[1], chunk=chunk,
            rows=rows, max_depth=max_depth, k_slots=k_slots,
            n_sph_pad=sph.shape[0], _ablate=_ablate,
        ),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),              # scal
            pl.BlockSpec(memory_space=pltpu.SMEM),              # cab
            pl.BlockSpec(memory_space=pltpu.SMEM),              # cab2
            pl.BlockSpec(memory_space=pltpu.SMEM),              # sph
            pl.BlockSpec(memory_space=pltpu.VMEM),              # coef
            pl.BlockSpec(memory_space=pltpu.VMEM),              # attr
            pl.BlockSpec((3, rows, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, rows, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((3, rows, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6 * k_slots, rows, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, rows, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, nb * rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((6 * k_slots, nb * rows, 128),
                                 jnp.float32),
            jax.ShapeDtypeStruct((nb * rows, 128), jnp.int32),
            jax.ShapeDtypeStruct((2, nb * rows, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, 128), jnp.float32),               # ts
            pltpu.VMEM((rows, 128), jnp.int32),                 # fs
            pltpu.VMEM((ATTR_COLS, rows, 128), jnp.float32),    # aj
            pltpu.VMEM((4, rows, 128), jnp.float32),            # sh
            pltpu.VMEM((N_FEATURES, block), jnp.float32),       # phi_s
            pltpu.VMEM((1, block), jnp.int32),                  # win_s
            pltpu.VMEM((ATTR_COLS, block), jnp.float32),        # aj2
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(scal, cab, cab2, sph, coef_c, attr_c, oc, dc)

    rgb = rgb.reshape(3, n_pad).T[:n]
    slots = slots.reshape(k_slots, 6, n_pad).transpose(2, 0, 1)[:n]
    ovf = ovf.reshape(n_pad)[:n] != 0
    rays_main = jnp.sum(nray[0].reshape(n_pad)[:n])
    rays_shadow = jnp.sum(nray[1].reshape(n_pad)[:n])
    return rgb, slots, ovf, rays_main, rays_shadow
