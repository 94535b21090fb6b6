"""Fused path-tracing bounce kernel (Pallas).

Profiling the XLA wavefront (PERFORMANCE.md r2) split the 1024^2@16spp
Cornell render ~1.2 s traces + ~1.4 s of per-bounce elementwise fusions:
tens of small HBM-bound ops per bounce (RNG, NEE evaluation, state
updates), each paying dispatch + memory-latency overhead at wavefront
width. This kernel fuses ONE WHOLE BOUNCE GROUP — light sampling,
Russian roulette, hemisphere BRDF sampling, BOTH traces (NEE shadow +
next bounce, one shared triangle loop), NEE evaluation, and the state
update — into a single VMEM-resident program. State leaves HBM only at
compaction (group) boundaries.

Semantics are the reference's, lane for lane (Scene.cpp citations in
ops/path.py):
  * sampleLight bounding-sphere direction scheme (Scene.cpp:429-476),
  * RR-before-sample with survival p_rr (:797-798),
  * uniform-hemisphere BRDF via toWorld (Material.cpp:14-34,
    Tools.cpp:315-327),
  * emissive shading point short-circuits to its color (:676-680),
  * indirect discards emitter hits (:813-815),
  * the |t^2 - d^2| <= 1e-4 shadow acceptance and 1e-6*N offsets.

RNG: the TPU-native PRNG (pltpu.prng_*), seeded per (seed, program,
group) — a different stream than the XLA path's counter-based
jax.random, so agreement with the scalar oracle is statistical (the
estimator is identical; only the sample points differ).

Applicability (dispatched by ops/path.py): triangles + spheres with
UNTEXTURED materials (hit color == Kd; Cornell and the demo scenes
qualify), F <= 512, O <= 8 emitters. Anything else falls back to the
XLA wavefront.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SEED_ABLATE = False  # tools/seed_ab.py timing A/B only
INV_2PI = 0.15915494309189535
INV_PI = 0.3183098861837907
TWO_PI = 6.283185307179586
EPS = 1e-5


class _Rng:
    """Counter-based per-lane hash RNG (lowbias32 finalizer) — backend
    independent (no pltpu.prng dependence, so CPU interpret mode works),
    deterministic in (seed, absolute lane id, draw counter). Quality is
    ample for MC integration (verified statistically vs the scalar
    oracle in tests/test_path.py)."""

    def __init__(self, seed, lane):
        self.seed = seed.astype(jnp.uint32)
        self.lane = lane.astype(jnp.uint32)
        self.ctr = 0

    def uniform(self):
        self.ctr += 1
        x = self.lane * jnp.uint32(0x9E3779B1)
        x = x ^ (self.seed + jnp.uint32((self.ctr * 0x85EBCA6B) & 0xFFFFFFFF))
        x = x ^ (x >> 16)
        x = x * jnp.uint32(0x7FEB352D)
        x = x ^ (x >> 15)
        x = x * jnp.uint32(0x846CA68B)
        x = x ^ (x >> 16)
        # Mosaic lacks a u32->f32 cast; the 24-bit value fits i32
        return (x >> 8).astype(jnp.int32).astype(jnp.float32) * jnp.float32(
            1.0 / (1 << 24)
        )

    def gauss3(self):
        """Three standard normals per lane (Box-Muller), for
        glm::sphericalRand-style unit-sphere sampling."""
        u1 = self.uniform()
        u2 = self.uniform()
        u3 = self.uniform()
        u4 = self.uniform()
        r1 = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-12)))
        r2 = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u3, 1e-12)))
        return (
            r1 * jnp.cos(TWO_PI * u2),
            r1 * jnp.sin(TWO_PI * u2),
            r2 * jnp.cos(TWO_PI * u4),
        )

    def sphere(self):
        """Uniform unit-sphere direction via glm::sphericalRand's own
        (z, phi) parameterization (z ~ U[-1,1], phi ~ U[0,2pi]) — same
        distribution as gauss3+normalize at a third of the transcendental
        cost (2 uniforms, 1 sqrt, 1 sincos pair; no logs, no normalize)."""
        z = 1.0 - 2.0 * self.uniform()
        r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
        phi = TWO_PI * self.uniform()
        return r * jnp.cos(phi), r * jnp.sin(phi), z


def _norm3(x, y, z, eps=0.0):
    n = jnp.sqrt(x * x + y * y + z * z)
    ok = n > eps
    inv = jnp.where(n > 0, 1.0 / jnp.where(n > 0, n, 1.0), 0.0)
    inv = jnp.where(ok, inv, 0.0)
    return x * inv, y * inv, z * inv


def _to_world(lx, ly, lz, nx, ny, nz):
    """Tools::toWorld (Tools.cpp:315-327), component form."""
    use_x = jnp.abs(nx) > jnp.abs(ny)
    inv_a = 1.0 / jnp.sqrt(jnp.maximum(nx * nx + nz * nz, 1e-30))
    inv_b = 1.0 / jnp.sqrt(jnp.maximum(ny * ny + nz * nz, 1e-30))
    cx = jnp.where(use_x, nz * inv_a, 0.0)
    cy = jnp.where(use_x, 0.0, nz * inv_b)
    cz = jnp.where(use_x, -nx * inv_a, -ny * inv_b)
    # b = c x n
    bx = cy * nz - cz * ny
    by = cz * nx - cx * nz
    bz = cx * ny - cy * nx
    return (
        lx * bx + ly * cx + lz * nx,
        lx * by + ly * cy + lz * ny,
        lx * bz + ly * cz + lz * nz,
    )


def _dual_trace(scal_ref, tri_ref, attr_ref, sph_ref, ox, oy, oz,
                lax_, lay, laz, bx_, by_, bz_):
    """Nearest hit for TWO ray sets sharing origins (o): directions
    A = NEE shadow (needs emit + normal), B = next bounce (needs
    normal, kd, emit). One loop over triangles then spheres; triangle
    constants broadcast from SMEM. Returns dicts of planes."""
    n_tri = scal_ref[0]
    n_sph = scal_ref[3]
    big = jnp.full(ox.shape, 1e30, jnp.float32)
    zero = jnp.zeros(ox.shape, jnp.float32)
    # the B set also reports whether its winner is a SPHERE: spheres'
    # Properties.color stays (0,0,0) in the reference (Object.hpp:36-40),
    # so an emissive-sphere shading point must contribute BLACK, not Kd

    def tri_body(f, c):
        (tA, exA, eyA, ezA, nxA, nyA, nzA,
         tB, nxB, nyB, nzB, kxB, kyB, kzB, exB, eyB, ezB, sB) = c
        v0x = tri_ref[f, 0]
        v0y = tri_ref[f, 1]
        v0z = tri_ref[f, 2]
        e1x = tri_ref[f, 3]
        e1y = tri_ref[f, 4]
        e1z = tri_ref[f, 5]
        e2x = tri_ref[f, 6]
        e2y = tri_ref[f, 7]
        e2z = tri_ref[f, 8]
        tx = ox - v0x
        ty = oy - v0y
        tz = oz - v0z
        # q = tvec x e1 is shared by both ray sets
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x

        def mt(dx, dy, dz):
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv = 1.0 / jnp.where(jnp.abs(det) < 1e-6, 1.0, det)
            u = (tx * px + ty * py + tz * pz) * inv
            v = (dx * qx + dy * qy + dz * qz) * inv
            t = (e2x * qx + e2y * qy + e2z * qz) * inv
            ok = (
                (jnp.abs(det) >= 1e-6)
                & (u >= 0.0) & (u <= 1.0)
                & (v >= 0.0) & (u + v <= 1.0)
                & (t >= 1e-6)
            )
            return jnp.where(ok, t, 1e30), u, v

        n0x = attr_ref[f, 0]
        n0y = attr_ref[f, 1]
        n0z = attr_ref[f, 2]
        n1x = attr_ref[f, 3]
        n1y = attr_ref[f, 4]
        n1z = attr_ref[f, 5]
        n2x = attr_ref[f, 6]
        n2y = attr_ref[f, 7]
        n2z = attr_ref[f, 8]

        tmA, uA, vA = mt(lax_, lay, laz)
        betA = tmA < tA
        wA = 1.0 - uA - vA
        tA = jnp.where(betA, tmA, tA)
        nxA = jnp.where(betA, wA * n0x + uA * n1x + vA * n2x, nxA)
        nyA = jnp.where(betA, wA * n0y + uA * n1y + vA * n2y, nyA)
        nzA = jnp.where(betA, wA * n0z + uA * n1z + vA * n2z, nzA)
        exA = jnp.where(betA, attr_ref[f, 12], exA)
        eyA = jnp.where(betA, attr_ref[f, 13], eyA)
        ezA = jnp.where(betA, attr_ref[f, 14], ezA)

        tmB, uB, vB = mt(bx_, by_, bz_)
        betB = tmB < tB
        wB = 1.0 - uB - vB
        tB = jnp.where(betB, tmB, tB)
        nxB = jnp.where(betB, wB * n0x + uB * n1x + vB * n2x, nxB)
        nyB = jnp.where(betB, wB * n0y + uB * n1y + vB * n2y, nyB)
        nzB = jnp.where(betB, wB * n0z + uB * n1z + vB * n2z, nzB)
        kxB = jnp.where(betB, attr_ref[f, 9], kxB)
        kyB = jnp.where(betB, attr_ref[f, 10], kyB)
        kzB = jnp.where(betB, attr_ref[f, 11], kzB)
        exB = jnp.where(betB, attr_ref[f, 12], exB)
        eyB = jnp.where(betB, attr_ref[f, 13], eyB)
        ezB = jnp.where(betB, attr_ref[f, 14], ezB)
        sB = jnp.where(betB, 0.0, sB)
        return (tA, exA, eyA, ezA, nxA, nyA, nzA,
                tB, nxB, nyB, nzB, kxB, kyB, kzB, exB, eyB, ezB, sB)

    init = (big, zero, zero, zero, zero, zero, zero,
            big, zero, zero, zero, zero, zero, zero, zero, zero, zero,
            zero)
    out = jax.lax.fori_loop(0, n_tri, tri_body, init)

    def sph_body(s, c):
        (tA, exA, eyA, ezA, nxA, nyA, nzA,
         tB, nxB, nyB, nzB, kxB, kyB, kzB, exB, eyB, ezB, sB) = c
        cx = sph_ref[s, 0]
        cy = sph_ref[s, 1]
        cz = sph_ref[s, 2]
        rr = sph_ref[s, 3]
        lx = ox - cx
        ly = oy - cy
        lz = oz - cz
        c0 = lx * lx + ly * ly + lz * lz - rr * rr

        vs_ok = sph_ref[s, 7] > 0.0   # validity flag column

        def hit_sph(dx, dy, dz):
            a = dx * dx + dy * dy + dz * dz
            b = 2.0 * (dx * lx + dy * ly + dz * lz)
            disc = b * b - 4.0 * a * c0
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            q = -0.5 * (b + jnp.where(b >= 0, sq, -sq))
            q = jnp.where(q == 0.0, 1e-30, q)
            x0 = q / a
            x1 = c0 / q
            both = (x0 > 0.0) & (x1 > 0.0)
            t = jnp.where(both, jnp.minimum(x0, x1),
                          jnp.where(x0 > 0.0, x0, x1))
            ok = (disc >= 0.0) & (t > 0.0) & vs_ok
            return jnp.where(ok, t, 1e30)

        inv_r = 1.0 / jnp.maximum(rr, 1e-20)
        tsA = hit_sph(lax_, lay, laz)
        bA = tsA < tA
        tA = jnp.where(bA, tsA, tA)
        nxA = jnp.where(bA, (ox + lax_ * tsA - cx) * inv_r, nxA)
        nyA = jnp.where(bA, (oy + lay * tsA - cy) * inv_r, nyA)
        nzA = jnp.where(bA, (oz + laz * tsA - cz) * inv_r, nzA)
        exA = jnp.where(bA, sph_ref[s, 4], exA)
        eyA = jnp.where(bA, sph_ref[s, 5], eyA)
        ezA = jnp.where(bA, sph_ref[s, 6], ezA)

        tsB = hit_sph(bx_, by_, bz_)
        bB = tsB < tB
        tB = jnp.where(bB, tsB, tB)
        nxB = jnp.where(bB, (ox + bx_ * tsB - cx) * inv_r, nxB)
        nyB = jnp.where(bB, (oy + by_ * tsB - cy) * inv_r, nyB)
        nzB = jnp.where(bB, (oz + bz_ * tsB - cz) * inv_r, nzB)
        # sphere winner: kd from its material; the reference's
        # Properties.color quirk (color = 0) is applied by the caller
        # via the is-sphere flag... the path integrator's `col` is only
        # consumed at EMISSIVE hits; emissive spheres shade as their
        # diffuse color in the reference (SphereLight Kd) — matching
        # nearest_hit's kd join.
        kxB = jnp.where(bB, sph_ref[s, 8], kxB)
        kyB = jnp.where(bB, sph_ref[s, 9], kyB)
        kzB = jnp.where(bB, sph_ref[s, 10], kzB)
        exB = jnp.where(bB, sph_ref[s, 4], exB)
        eyB = jnp.where(bB, sph_ref[s, 5], eyB)
        ezB = jnp.where(bB, sph_ref[s, 6], ezB)
        sB = jnp.where(bB, 1.0, sB)
        return (tA, exA, eyA, ezA, nxA, nyA, nzA,
                tB, nxB, nyB, nzB, kxB, kyB, kzB, exB, eyB, ezB, sB)

    out = jax.lax.fori_loop(0, n_sph, sph_body, out)
    (tA, exA, eyA, ezA, nxA, nyA, nzA,
     tB, nxB, nyB, nzB, kxB, kyB, kzB, exB, eyB, ezB, sB) = out
    return (
        {"t": tA, "emit": (exA, eyA, ezA), "nrm": (nxA, nyA, nzA)},
        {"t": tB, "nrm": (nxB, nyB, nzB), "kd": (kxB, kyB, kzB),
         "emit": (exB, eyB, ezB), "is_sphere": sB},
    )


MM_SENT = 0x7FFFFF0   # winner sentinel for the MXU dual trace


def pack_mm_tables(scene, chunk: int = 64):
    """Coefficient/attribute tables for the in-kernel MXU dual trace
    (the >512-triangle tier of the fused path kernel): coef_c (nc,
    4*chunk, 13) bilinear Moller-Trumbore blocks (ops/pallas_trace),
    attr24_c (nc, 24, chunk) = [v0|v1|v2|n0|n1|n2|kd|emit] feature-major
    per chunk, cab (6, nc) chunk AABBs, cab2 super-chunk AABBs.

    chunk=64 measured best on the spot cow (0.844 Mpaths/s vs 0.74 at
    256, 0.851 at 32 with much longer compiles): the NEE half's culling
    gets finer while the uncullable bounce half's epilogue cost is
    granule-independent."""
    from software_rasterizer_tpu.ops.pallas_trace import (
        N_FEATURES, chunk_bounds,
    )

    coef = scene.mt_coef
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
    cab = jnp.concatenate([lo.T, hi.T], axis=0).astype(jnp.float32)
    # two-level cull (r5, proven in the whitted über-kernel): 8-chunk
    # super-AABBs gate descent into the per-chunk loop
    nsc = -(-lo.shape[0] // 8)
    pad_c = nsc * 8 - lo.shape[0]
    lo_p = jnp.pad(lo, ((0, pad_c), (0, 0)), constant_values=1e30)
    hi_p = jnp.pad(hi, ((0, pad_c), (0, 0)), constant_values=-1e30)
    cab2 = jnp.concatenate([
        lo_p.reshape(nsc, 8, 3).min(1).T,
        hi_p.reshape(nsc, 8, 3).max(1).T,
    ], axis=0).astype(jnp.float32)
    f0 = scene.v0.shape[0]
    valid = scene.tri_valid[:, None]
    rows24 = jnp.concatenate([
        scene.v0, scene.v1, scene.v2,
        scene.n0, scene.n1, scene.n2,
        jnp.where(valid, scene.mat_kd[scene.tri_mat], 0.0),
        jnp.where(valid, scene.mat_emit[scene.tri_mat], 0.0),
    ], axis=1).astype(jnp.float32)
    if fp != f0:
        rows24 = jnp.pad(rows24, ((0, fp - f0), (0, 0)))
    attr24_c = rows24.reshape(nc, chunk, 24).transpose(0, 2, 1)
    return coef_c, attr24_c, cab, cab2, nc


def _make_dual_trace_mm(cab_ref, cab2_ref, coef_ref, attr_ref, phi_s, win_s,
                        aj_s,
                        nc: int, chunk: int, rows: int,
                        precision=jax.lax.Precision.HIGHEST):
    """Dual-ray nearest hit via the chunk-culled MXU sweep — the
    >512-triangle tier of the persistent path kernel. Ray sets A (NEE
    shadow) and B (next bounce) sweep SEPARATELY — a first version
    swept both as one (13, 2N) matrix under a UNION cull, which threw
    away the coherent halves' culling: divergent bounce columns enter
    essentially every chunk, so the union did too. Split sweeps let the
    NEE half (rays converging on the light's bounding sphere) and the
    restart-heavy B iterations skip chunks independently.

    Winner attributes join via per-chunk one-hot matmuls over the 24-row
    table (both halves share one join pass); (u, v, t) recompute exactly
    per lane (oracle _mt_uv formula), so integrator-visible values match
    the XLA wavefront's nearest_hit. Triangle results only — the caller
    merges the sphere loop on top."""

    def dual(ox, oy, oz, lax_, lay, laz, bx_, by_, bz_):
        n = rows * 128
        for r in range(rows):
            oxr, oyr, ozr = ox[r:r + 1], oy[r:r + 1], oz[r:r + 1]
            for h, (ddx, ddy, ddz) in enumerate(
                    ((lax_, lay, laz), (bx_, by_, bz_))):
                dxr = ddx[r:r + 1]
                dyr = ddy[r:r + 1]
                dzr = ddz[r:r + 1]
                c0 = h * n + 128 * r
                phi_s[:, c0:c0 + 128] = jnp.concatenate([
                    oxr * dyr, oxr * dzr, oyr * dxr, oyr * dzr,
                    ozr * dxr, ozr * dyr,
                    dxr, dyr, dzr, oxr, oyr, ozr,
                    jnp.ones((1, 128), jnp.float32),
                ], axis=0)

        def slab(ab_ref, c, ix, iy, iz):
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

        def sweep(h, dx_, dy_, dz_):
            phi = phi_s[:, h * n:(h + 1) * n]
            ix = 1.0 / jnp.where(dx_ == 0.0, 1e-30, dx_)
            iy = 1.0 / jnp.where(dy_ == 0.0, 1e-30, dy_)
            iz = 1.0 / jnp.where(dz_ == 0.0, 1e-30, dz_)

            def chunk_body(c, carry):
                def visit(carry):
                    best_t, best_f = carry
                    prod = jax.lax.dot_general(
                        coef_ref[c], phi,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        precision=precision,
                        preferred_element_type=jnp.float32,
                    )
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
                    ri = jax.lax.broadcasted_iota(
                        jnp.int32, tm.shape, 0)
                    cf = jnp.min(
                        jnp.where(tm == ct, ri, jnp.int32(MM_SENT)),
                        axis=0, keepdims=True,
                    ) + c * chunk
                    better = ct < best_t
                    return (
                        jnp.where(better, ct, best_t),
                        jnp.where(better, cf, best_f),
                    )

                return jax.lax.cond(
                    slab(cab_ref, c, ix, iy, iz), visit,
                    lambda c_: c_, carry)

            def super_body(sc, carry):
                def descend(carry):
                    return jax.lax.fori_loop(
                        sc * 8, jnp.minimum((sc + 1) * 8, nc),
                        chunk_body, carry)

                return jax.lax.cond(
                    slab(cab2_ref, sc, ix, iy, iz), descend,
                    lambda c_: c_, carry)

            init = (
                jnp.full((1, n), 1e30, jnp.float32),
                jnp.full((1, n), MM_SENT, jnp.int32),
            )
            bt, bf = jax.lax.fori_loop(
                0, -(-nc // 8), super_body, init)
            win_s[:, h * n:(h + 1) * n] = jnp.where(
                bt < 1e30, bf, MM_SENT)

        sweep(0, lax_, lay, laz)
        sweep(1, bx_, by_, bz_)

        # one-hot join over the 24-row table (both halves at once)
        win = win_s[...]
        aj_s[...] = jnp.zeros((24, 2 * n), jnp.float32)

        def join_body(c, _):
            inchunk = (win >= c * chunk) & (win < (c + 1) * chunk)

            @pl.when(jnp.any(inchunk))
            def _():
                loc = jnp.where(inchunk, win - c * chunk, -1)
                ri = jax.lax.broadcasted_iota(
                    jnp.int32, (chunk, 2 * n), 0)
                oh = (ri == loc).astype(jnp.float32)
                part = jax.lax.dot_general(
                    attr_ref[c], oh,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    precision=precision,
                    preferred_element_type=jnp.float32,
                )
                aj_s[...] = aj_s[...] + part
            return 0

        jax.lax.fori_loop(0, nc, join_body, 0)

        # split halves back into (rows, 128) planes
        def half(h, k):
            outs = []
            for r in range(rows):
                c0 = h * n + 128 * r
                outs.append(aj_s[k:k + 1, c0:c0 + 128])
            return jnp.concatenate(outs, axis=0)         # (rows,128)

        def hit_of(h, dxp, dyp, dzp):
            tb = jnp.concatenate(
                [win_s[0:1, h * n + 128 * r:h * n + 128 * (r + 1)]
                 for r in range(rows)], axis=0)
            hitm = tb < MM_SENT
            v0x, v0y, v0z = half(h, 0), half(h, 1), half(h, 2)
            e1x = half(h, 3) - v0x
            e1y = half(h, 4) - v0y
            e1z = half(h, 5) - v0z
            e2x = half(h, 6) - v0x
            e2y = half(h, 7) - v0y
            e2z = half(h, 8) - v0z
            # exact per-lane (u, v, t): the _mt_uv oracle formula
            px = dyp * e2z - dzp * e2y
            py = dzp * e2x - dxp * e2z
            pz = dxp * e2y - dyp * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv = 1.0 / jnp.where(jnp.abs(det) < 1e-6, 1.0, det)
            tx = ox - v0x
            ty = oy - v0y
            tz = oz - v0z
            u = (tx * px + ty * py + tz * pz) * inv
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            t = (e2x * qx + e2y * qy + e2z * qz) * inv
            v = (dxp * qx + dyp * qy + dzp * qz) * inv
            w = 1.0 - u - v
            nx = w * half(h, 9) + u * half(h, 12) + v * half(h, 15)
            ny = w * half(h, 10) + u * half(h, 13) + v * half(h, 16)
            nz = w * half(h, 11) + u * half(h, 14) + v * half(h, 17)
            t = jnp.where(hitm, t, 1e30)
            return {
                "t": t, "nrm": (nx, ny, nz),
                "kd": (half(h, 18), half(h, 19), half(h, 20)),
                "emit": (half(h, 21), half(h, 22), half(h, 23)),
            }

        ha = hit_of(0, lax_, lay, laz)
        hb = hit_of(1, bx_, by_, bz_)
        return (
            {"t": ha["t"], "emit": ha["emit"], "nrm": ha["nrm"]},
            {"t": hb["t"], "nrm": hb["nrm"], "kd": hb["kd"],
             "emit": hb["emit"],
             "is_sphere": jnp.zeros_like(hb["t"])},
        )

    return dual


def _sph_dual_merge(scal_ref, sph_ref, ox, oy, oz, lax_, lay, laz,
                    bx_, by_, bz_, sh, nxt):
    """Fold the sphere loop's nearest hits into (sh, nxt) from a
    triangle-only dual trace (same math as _dual_trace's sphere stage)."""
    n_sph = scal_ref[3]
    (tA, (exA, eyA, ezA), (nxA, nyA, nzA)) = (
        sh["t"], sh["emit"], sh["nrm"])
    (tB, (nxB, nyB, nzB), (kxB, kyB, kzB), (exB, eyB, ezB), sB) = (
        nxt["t"], nxt["nrm"], nxt["kd"], nxt["emit"], nxt["is_sphere"])

    def sph_body(s, c):
        (tA, exA, eyA, ezA, nxA, nyA, nzA,
         tB, nxB, nyB, nzB, kxB, kyB, kzB, exB, eyB, ezB, sB) = c
        cx = sph_ref[s, 0]
        cy = sph_ref[s, 1]
        cz = sph_ref[s, 2]
        rr = sph_ref[s, 3]
        lx = ox - cx
        ly = oy - cy
        lz = oz - cz
        c0 = lx * lx + ly * ly + lz * lz - rr * rr
        vs_ok = sph_ref[s, 7] > 0.0

        def hit_sph(dx, dy, dz):
            a = dx * dx + dy * dy + dz * dz
            b = 2.0 * (dx * lx + dy * ly + dz * lz)
            disc = b * b - 4.0 * a * c0
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            q = -0.5 * (b + jnp.where(b >= 0, sq, -sq))
            q = jnp.where(q == 0.0, 1e-30, q)
            x0 = q / a
            x1 = c0 / q
            both = (x0 > 0.0) & (x1 > 0.0)
            t = jnp.where(both, jnp.minimum(x0, x1),
                          jnp.where(x0 > 0.0, x0, x1))
            ok = (disc >= 0.0) & (t > 0.0) & vs_ok
            return jnp.where(ok, t, 1e30)

        inv_r = 1.0 / jnp.maximum(rr, 1e-20)
        tsA = hit_sph(lax_, lay, laz)
        bA = tsA < tA
        tA = jnp.where(bA, tsA, tA)
        nxA = jnp.where(bA, (ox + lax_ * tsA - cx) * inv_r, nxA)
        nyA = jnp.where(bA, (oy + lay * tsA - cy) * inv_r, nyA)
        nzA = jnp.where(bA, (oz + laz * tsA - cz) * inv_r, nzA)
        exA = jnp.where(bA, sph_ref[s, 4], exA)
        eyA = jnp.where(bA, sph_ref[s, 5], eyA)
        ezA = jnp.where(bA, sph_ref[s, 6], ezA)

        tsB = hit_sph(bx_, by_, bz_)
        bB = tsB < tB
        tB = jnp.where(bB, tsB, tB)
        nxB = jnp.where(bB, (ox + bx_ * tsB - cx) * inv_r, nxB)
        nyB = jnp.where(bB, (oy + by_ * tsB - cy) * inv_r, nyB)
        nzB = jnp.where(bB, (oz + bz_ * tsB - cz) * inv_r, nzB)
        kxB = jnp.where(bB, sph_ref[s, 8], kxB)
        kyB = jnp.where(bB, sph_ref[s, 9], kyB)
        kzB = jnp.where(bB, sph_ref[s, 10], kzB)
        exB = jnp.where(bB, sph_ref[s, 4], exB)
        eyB = jnp.where(bB, sph_ref[s, 5], eyB)
        ezB = jnp.where(bB, sph_ref[s, 6], ezB)
        sB = jnp.where(bB, 1.0, sB)
        return (tA, exA, eyA, ezA, nxA, nyA, nzA,
                tB, nxB, nyB, nzB, kxB, kyB, kzB, exB, eyB, ezB, sB)

    out = jax.lax.fori_loop(
        0, n_sph, sph_body,
        (tA, exA, eyA, ezA, nxA, nyA, nzA,
         tB, nxB, nyB, nzB, kxB, kyB, kzB, exB, eyB, ezB, sB))
    (tA, exA, eyA, ezA, nxA, nyA, nzA,
     tB, nxB, nyB, nzB, kxB, kyB, kzB, exB, eyB, ezB, sB) = out
    return (
        {"t": tA, "emit": (exA, eyA, ezA), "nrm": (nxA, nyA, nzA)},
        {"t": tB, "nrm": (nxB, nyB, nzB), "kd": (kxB, kyB, kzB),
         "emit": (exB, eyB, ezB), "is_sphere": sB},
    )


def _bounce_kernel(scal_ref, ecr_ref, tri_ref, attr_ref, sph_ref,
                   state_ref, live_ref, out_state_ref, out_live_ref,
                   acc_ref, *, n_bounces: int, p_rr: float, o_pad: int):
    pid = pl.program_id(0)

    def V(i):
        return state_ref[i]

    px, py, pz = V(0), V(1), V(2)
    nx, ny, nz = V(3), V(4), V(5)
    kx, ky, kz = V(6), V(7), V(8)
    ex, ey, ez = V(9), V(10), V(11)
    cx_, cy_, cz_ = V(12), V(13), V(14)
    tx_, ty_, tz_ = V(15), V(16), V(17)
    live = live_ref[...] != 0
    shape = px.shape
    rows, _ = shape
    lane = (
        pl.program_id(0) * (rows * 128)
        + jax.lax.broadcasted_iota(jnp.int32, shape, 0) * 128
        + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    )
    rng = _Rng(scal_ref[2].astype(jnp.uint32), lane)
    acc_r = jnp.zeros(shape, jnp.float32)
    acc_g = jnp.zeros(shape, jnp.float32)
    acc_b = jnp.zeros(shape, jnp.float32)

    n_e = scal_ref[1]
    any_e = n_e > 0
    n_e_f = jnp.maximum(n_e, 1).astype(jnp.float32)

    for _ in range(n_bounces):
        nnx, nny, nnz = _norm3(nx, ny, nz)

        # ---- sampleLight (Scene.cpp:429-476)
        u_pick = rng.uniform()
        k_e = jnp.minimum(
            jnp.floor(u_pick * n_e_f).astype(jnp.int32),
            jnp.maximum(n_e - 1, 0),
        )
        ccx = jnp.zeros(shape, jnp.float32)
        ccy = jnp.zeros(shape, jnp.float32)
        ccz = jnp.zeros(shape, jnp.float32)
        crad = jnp.zeros(shape, jnp.float32)
        for o in range(o_pad):
            sel = k_e == o
            ccx = jnp.where(sel, ecr_ref[o, 0], ccx)
            ccy = jnp.where(sel, ecr_ref[o, 1], ccy)
            ccz = jnp.where(sel, ecr_ref[o, 2], ccz)
            crad = jnp.where(sel, ecr_ref[o, 3], crad)
        blx, bly, blz = _norm3(ccx - px, ccy - py, ccz - pz)
        g1, g2, g3 = rng.gauss3()
        sx, sy, sz = _norm3(g1, g2, g3, 1e-20)
        flip = sx * blx + sy * bly + sz * blz < 0
        sx = jnp.where(flip, -sx, sx)
        sy = jnp.where(flip, -sy, sy)
        sz = jnp.where(flip, -sz, sz)
        h1, h2, h3 = rng.gauss3()
        hx, hy, hz = _norm3(h1, h2, h3, 1e-20)
        sx, sy, sz = _norm3(sx + 1e-6 * hx, sy + 1e-6 * hy, sz + 1e-6 * hz)
        spx = ccx + sx * crad
        spy = ccy + sy * crad
        spz = ccz + sz * crad
        llx, lly, llz = _norm3(spx - px, spy - py, spz - pz)
        cos_t = llx * blx + lly * bly + llz * blz
        pdf_l = jnp.where(any_e, cos_t * INV_2PI, 0.0)

        # ---- RR + uniform hemisphere (Material.cpp:14-34)
        u_rr = rng.uniform()
        survive = u_rr <= p_rr
        x1 = rng.uniform()
        x2 = rng.uniform()
        zl = jnp.abs(1.0 - 2.0 * x1)
        rl = jnp.sqrt(jnp.maximum(0.0, 1.0 - zl * zl))
        phi = TWO_PI * x2
        wx, wy, wz = _to_world(
            rl * jnp.cos(phi), rl * jnp.sin(phi), zl, nnx, nny, nnz
        )
        wx, wy, wz = _norm3(wx, wy, wz)
        wdn = wx * nnx + wy * nny + wz * nnz
        cos_o = jnp.maximum(0.0, wdn)
        pdf_b = jnp.where(wdn > 0, INV_2PI, 0.0)
        frx = jnp.where(wdn > 0, kx * INV_PI, 0.0)
        fry = jnp.where(wdn > 0, ky * INV_PI, 0.0)
        frz = jnp.where(wdn > 0, kz * INV_PI, 0.0)

        # ---- both traces, one primitive loop
        ox = px + 1e-6 * nnx
        oy = py + 1e-6 * nny
        oz = pz + 1e-6 * nnz
        sh, nxt = _dual_trace(
            scal_ref, tri_ref, attr_ref, sph_ref,
            ox, oy, oz, llx, lly, llz, wx, wy, wz,
        )

        # ---- NEE evaluation (_nee_eval / Scene.cpp:671-717)
        tA = sh["t"]
        hitA = tA < 1e30
        scx = ox + llx * tA
        scy = oy + lly * tA
        scz = oz + llz * tA
        dist2 = (px - scx) ** 2 + (py - scy) ** 2 + (pz - scz) ** 2
        not_shadow = jnp.abs(tA * tA - dist2) <= 1e-4
        seA = sh["emit"]
        lit = hitA & (
            jnp.sqrt(seA[0] ** 2 + seA[1] ** 2 + seA[2] ** 2) > EPS
        ) & any_e
        snA = sh["nrm"]
        # shadow normal: nearest_hit normalizes interpolated normals
        snx, sny, snz = _norm3(snA[0], snA[1], snA[2], 1e-20)
        cos_on = jnp.maximum(0.0, nnx * llx + nny * lly + nnz * llz)
        cos_ln = jnp.maximum(0.0, -(snx * llx + sny * lly + snz * llz))
        ldn = llx * nnx + lly * nny + llz * nnz
        pdf_ok_l = (pdf_l >= EPS) & (pdf_l < 1e30) & (pdf_l == pdf_l)
        denom = jnp.where(pdf_ok_l, pdf_l, 1.0) * jnp.maximum(dist2, 1e-30)
        scale = jnp.where(
            lit & not_shadow & pdf_ok_l, cos_on * cos_ln / denom, 0.0
        )
        fr_gate = ldn > 0
        neex = seA[0] * jnp.where(fr_gate, kx * INV_PI, 0.0) * scale
        neey = seA[1] * jnp.where(fr_gate, ky * INV_PI, 0.0) * scale
        neez = seA[2] * jnp.where(fr_gate, kz * INV_PI, 0.0) * scale
        cur_emissive = jnp.sqrt(ex * ex + ey * ey + ez * ez) > EPS
        dirx = jnp.where(cur_emissive, cx_, neex)
        diry = jnp.where(cur_emissive, cy_, neey)
        dirz = jnp.where(cur_emissive, cz_, neez)
        acc_r = acc_r + jnp.where(live, tx_ * dirx, 0.0)
        acc_g = acc_g + jnp.where(live, ty_ * diry, 0.0)
        acc_b = acc_b + jnp.where(live, tz_ * dirz, 0.0)

        # ---- state update
        tB = nxt["t"]
        hitB = tB < 1e30
        neB = nxt["emit"]
        emisB = jnp.sqrt(neB[0] ** 2 + neB[1] ** 2 + neB[2] ** 2) > EPS
        pdf_ok = pdf_b >= EPS
        live = live & survive & pdf_ok & hitB & ~emisB
        wgt = cos_o / jnp.maximum(pdf_b * p_rr, 1e-30)
        tx_ = tx_ * frx * wgt
        ty_ = ty_ * fry * wgt
        tz_ = tz_ * frz * wgt
        px = ox + wx * tB
        py = oy + wy * tB
        pz = oz + wz * tB
        nB = nxt["nrm"]
        nx, ny, nz = _norm3(nB[0], nB[1], nB[2], 1e-20)
        kB = nxt["kd"]
        kx, ky, kz = kB[0], kB[1], kB[2]
        ex, ey, ez = neB[0], neB[1], neB[2]
        # untextured: color == Kd for triangles; SPHERE winners keep the
        # reference's Properties.color = (0,0,0) quirk (Object.hpp:36-40)
        isphB = nxt["is_sphere"] > 0.5
        cx_ = jnp.where(isphB, 0.0, kB[0])
        cy_ = jnp.where(isphB, 0.0, kB[1])
        cz_ = jnp.where(isphB, 0.0, kB[2])

    for i, v in enumerate([px, py, pz, nx, ny, nz, kx, ky, kz,
                           ex, ey, ez, cx_, cy_, cz_, tx_, ty_, tz_]):
        out_state_ref[i] = v
    out_live_ref[...] = live.astype(jnp.int32)
    acc_ref[0] = acc_r
    acc_ref[1] = acc_g
    acc_ref[2] = acc_b


def pack_scene_tables(scene):
    """SMEM operand tables from an RTScene: (scalars (4,), ecr (O,4),
    tri_geo (F,12), tri_attr (F,16), sph (S,12))."""
    f = scene.v0.shape[0]
    attr = jnp.concatenate([
        scene.n0, scene.n1, scene.n2,                       # 0:9
        jnp.where(scene.tri_valid[:, None], scene.mat_kd[scene.tri_mat], 0.0),
        jnp.where(scene.tri_valid[:, None], scene.mat_emit[scene.tri_mat], 0.0),
        jnp.zeros((f, 1)),
    ], axis=1).astype(jnp.float32)                           # (F,16)
    s = scene.sph_c.shape[0]
    sph = jnp.concatenate([
        scene.sph_c,                                         # 0:3
        scene.sph_r[:, None],                                # 3
        jnp.where(scene.sph_valid[:, None], scene.mat_emit[scene.sph_mat], 0.0),
        scene.sph_valid.astype(jnp.float32)[:, None],        # 7 validity
        jnp.where(scene.sph_valid[:, None], scene.mat_kd[scene.sph_mat], 0.0),
        jnp.zeros((s, 1)),
    ], axis=1).astype(jnp.float32)                           # (S,12)
    n_sph = jnp.where(
        jnp.any(scene.sph_valid),
        s - jnp.argmax(jnp.flip(scene.sph_valid.astype(jnp.int32))),
        0,
    ).astype(jnp.int32)
    return attr, sph, n_sph


@functools.partial(
    jax.jit,
    static_argnames=("n_bounces", "p_rr", "o_pad", "block", "interpret"),
)
def fused_bounce_group(scene, state, live, seed, n_bounces: int,
                       p_rr: float = 0.8, o_pad: int = None,
                       block: int = 1024, interpret: bool = False):
    """Run `n_bounces` fused bounces. state: (18, N) f32 rows
    [pos, nrm, kd, emit, color, throughput] (component-major);
    live: (N,) bool; seed: () i32. Returns (acc (3, N), new_state,
    new_live)."""
    if o_pad is None:
        o_pad = scene.emitter_cr.shape[0]
    n = state.shape[1]
    assert block % 128 == 0
    rows = block // 128
    nb = -(-n // block)
    n_pad = nb * block
    if n_pad != n:
        state = jnp.pad(state, ((0, 0), (0, n_pad - n)))
        live = jnp.pad(live, (0, n_pad - n))

    attr, sph, n_sph = pack_scene_tables(scene)
    scal = jnp.stack([
        scene.n_tri.astype(jnp.int32),
        scene.n_emitters.astype(jnp.int32),
        seed.astype(jnp.int32),
        n_sph,
    ])

    st = state.reshape(18, nb * rows, 128)
    lv = live.astype(jnp.int32).reshape(nb * rows, 128)

    out_state, out_live, acc = pl.pallas_call(
        functools.partial(
            _bounce_kernel, n_bounces=n_bounces, p_rr=p_rr, o_pad=o_pad
        ),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),             # scalars
            pl.BlockSpec(memory_space=pltpu.SMEM),             # ecr
            pl.BlockSpec(memory_space=pltpu.SMEM),             # tri geo
            pl.BlockSpec(memory_space=pltpu.SMEM),             # tri attr
            pl.BlockSpec(memory_space=pltpu.SMEM),             # spheres
            pl.BlockSpec((18, rows, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((18, rows, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, rows, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((18, nb * rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((nb * rows, 128), jnp.int32),
            jax.ShapeDtypeStruct((3, nb * rows, 128), jnp.float32),
        ],
        interpret=interpret,
    )(scal, scene.emitter_cr.astype(jnp.float32), scene.tri_table, attr,
      sph, st, lv)

    acc = acc.reshape(3, n_pad)[:, :n]
    out_state = out_state.reshape(18, n_pad)[:, :n]
    out_live = out_live.reshape(n_pad)[:n] != 0
    return acc, out_state, out_live


class _RngDyn:
    """Counter-based per-lane hash RNG with a DYNAMIC stream index:
    each lane draws from stream (seed, lane, base + i) where `base` is a
    per-lane i32 plane (sample*8*MAXD + depth*8 here) and `i` the static
    draw slot within one iteration. Same lowbias32 finalizer as _Rng."""

    def __init__(self, seed, lane, base):
        self.seed = seed.astype(jnp.uint32)
        self.lane = lane.astype(jnp.uint32)
        self.base = base.astype(jnp.uint32)
        self.i = 0

    def uniform(self):
        ctr = self.base + jnp.uint32(self.i)
        self.i += 1
        # two full mixing rounds: the single-round variant leaves enough
        # (lane, ctr)-avalanche structure to bias consecutive-draw PAIRS
        # (measured +3-4 percent image-mean bias through the (z, phi)
        # sphere warp); finalizing ctr first before combining with lane
        # removes it (validated vs the XLA estimator in tests)
        c = ctr * jnp.uint32(0x85EBCA6B) + self.seed
        c = c ^ (c >> 16)
        c = c * jnp.uint32(0x7FEB352D)
        c = c ^ (c >> 15)
        x = self.lane * jnp.uint32(0x9E3779B1) ^ c
        x = x ^ (x >> 16)
        x = x * jnp.uint32(0x7FEB352D)
        x = x ^ (x >> 15)
        x = x * jnp.uint32(0x846CA68B)
        x = x ^ (x >> 16)
        return (x >> 8).astype(jnp.int32).astype(jnp.float32) * jnp.float32(
            1.0 / (1 << 24)
        )

    def sphere(self):
        z = 1.0 - 2.0 * self.uniform()
        r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
        phi = TWO_PI * self.uniform()
        return r * jnp.cos(phi), r * jnp.sin(phi), z


def _pt_kernel(scal_ref, seeds_ref, cam_ref, ecr_ref, tri_ref, attr_ref,
               sph_ref, *rest, p_rr: float, o_pad: int, width: int,
               height: int, rows: int, spp_static: int,
               mm: bool = False, nc: int = 0, chunk: int = 0):
    """One WHOLE path-traced frame tile per program: camera-ray
    generation, primary trace, the full RR bounce loop, AND sample
    regeneration — a persistent wavefront. When a lane's path dies it
    immediately restarts its pixel's next sample (the camera ray rides
    the same dual-trace slot as live lanes' bounce rays), so utilization
    tracks the per-lane total bounce budget (~spp * E[path length]),
    not spp * max_depth. Each program while-loops until every lane has
    consumed `spp` samples — programs retire independently, so the
    straggler cost is the per-1024-lane-block max, not the global max.

    Semantics per sample are identical to `_bounce_kernel` (reference
    citations in the module docstring), plus the primary stage:
      * camera rays aim at the z=0 plane (RayTracing.cpp:52-58 quirk);
      * primary miss contributes the background color once per sample;
      * unit-sphere draws use glm::sphericalRand's own (z, phi) scheme.

    RNG: each SAMPLE gets an independent jax.random-derived 32-bit seed
    (seeds_ref, computed outside from fold_in(key, start_sample + s));
    within a sample, draws are keyed (sample seed, absolute lane,
    depth*8 + draw). Deriving the cross-sample variation from
    full-strength jax.random seeds rather than a counter stride through
    the in-kernel hash removes measurable cross-sample correlation
    (image-mean spread matched the XLA estimator's only with this
    structure), and start_sample-resumed runs reproduce the monolithic
    per-sample streams exactly.

    `mm=True` (the >512-triangle tier): the SMEM scalar-broadcast
    triangle loop is replaced by the chunk-culled MXU dual sweep
    (_make_dual_trace_mm); `rest` then carries (cab, coef_c, attr24_c,
    acc_ref, phi_s, win_s, aj_s)."""
    if mm:
        (cab_ref, cab2_ref, coef_ref, attr24_ref, acc_ref, phi_s,
         win_s, aj_s) = rest
        dual_mm = _make_dual_trace_mm(
            cab_ref, cab2_ref, coef_ref, attr24_ref, phi_s, win_s, aj_s,
            nc, chunk, rows)
    else:
        (acc_ref,) = rest
    pid = pl.program_id(0)
    shape = (rows, 128)
    n_e = scal_ref[1]
    spp = scal_ref[4]
    lane_off = scal_ref[6]
    max_d = scal_ref[7]
    any_e = n_e > 0
    n_e_f = jnp.maximum(n_e, 1).astype(jnp.float32)

    lane = (
        lane_off
        + pid * (rows * 128)
        + jax.lax.broadcasted_iota(jnp.int32, shape, 0) * 128
        + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    )
    inb = lane < width * height

    # camera ray of this lane (constant across the loop)
    eye_x, eye_y, eye_z = cam_ref[0], cam_ref[1], cam_ref[2]
    scale = cam_ref[3]
    aspect = cam_ref[4]
    bg_r, bg_g, bg_b = cam_ref[5], cam_ref[6], cam_ref[7]
    lane_c = jnp.where(inb, lane, 0)
    py_i = lane_c // width
    px_i = lane_c - py_i * width
    cxp = (2.0 * (px_i.astype(jnp.float32) + 0.5) / width - 1.0) * aspect * scale
    cyp = (1.0 - 2.0 * (py_i.astype(jnp.float32) + 0.5) / height) * scale
    cdx, cdy, cdz = _norm3(cxp - eye_x, cyp - eye_y, 0.0 * cxp - eye_z)

    zero = jnp.zeros(shape, jnp.float32)
    izero = jnp.zeros(shape, jnp.int32)
    # state: [pos(3), nrm(3), kd(3), emit(3), color(3), tp(3)] + flags.
    # liveness rides the carry as i32 — an i1 vector in the scf.while
    # carry fails Mosaic legalization ('scf.yield')
    init = (
        izero,                                        # live (0/1)
        jnp.where(inb, 0, spp),                       # next_s
        izero,                                        # depth
        (zero,) * 18,                                 # packed f32 state
        (zero, zero, zero),                           # acc
    )

    def cond(c):
        live_i, next_s, _, _, _ = c
        return jnp.any((live_i != 0) | (next_s < spp))

    def body(c):
        live_i, next_s, depth, st, acc = c
        live = live_i != 0
        (px, py, pz, nx, ny, nz, kx, ky, kz,
         ex, ey, ez, cx_, cy_, cz_, tx_, ty_, tz_) = st
        acc_r, acc_g, acc_b = acc

        restart = (~live) & (next_s < spp)
        # per-sample seed: the current sample index of a live lane is
        # next_s - 1 (seeds_ref holds one jax.random seed per sample).
        # local_s is PER-LANE, so the r2-advice "SMEM scalar load" is
        # structurally impossible (it would be a per-lane gather, which
        # Mosaic rejects — tools/gather_probe.py); the select chain is
        # the supported form, and tools/seed_ab.py measures its cost
        # (_SEED_ABLATE short-circuits it for that timing A/B only).
        local_s = jnp.maximum(next_s - 1, 0)
        if _SEED_ABLATE:
            seed = jnp.full(shape, seeds_ref[0], jnp.int32)
        else:
            seed = jnp.zeros(shape, jnp.int32)
            for k in range(spp_static):
                seed = jnp.where(local_s == k, seeds_ref[k], seed)
        rng = _RngDyn(seed, lane, depth * 8)

        nnx, nny, nnz = _norm3(nx, ny, nz)

        # ---- sampleLight (Scene.cpp:429-476)
        u_pick = rng.uniform()
        k_e = jnp.minimum(
            jnp.floor(u_pick * n_e_f).astype(jnp.int32),
            jnp.maximum(n_e - 1, 0),
        )
        ccx = jnp.zeros(shape, jnp.float32)
        ccy = jnp.zeros(shape, jnp.float32)
        ccz = jnp.zeros(shape, jnp.float32)
        crad = jnp.zeros(shape, jnp.float32)
        for o in range(o_pad):
            sel = k_e == o
            ccx = jnp.where(sel, ecr_ref[o, 0], ccx)
            ccy = jnp.where(sel, ecr_ref[o, 1], ccy)
            ccz = jnp.where(sel, ecr_ref[o, 2], ccz)
            crad = jnp.where(sel, ecr_ref[o, 3], crad)
        blx, bly, blz = _norm3(ccx - px, ccy - py, ccz - pz)
        sx, sy, sz = rng.sphere()
        flip = sx * blx + sy * bly + sz * blz < 0
        sx = jnp.where(flip, -sx, sx)
        sy = jnp.where(flip, -sy, sy)
        sz = jnp.where(flip, -sz, sz)
        hx, hy, hz = rng.sphere()
        sx, sy, sz = _norm3(sx + 1e-6 * hx, sy + 1e-6 * hy, sz + 1e-6 * hz)
        spx = ccx + sx * crad
        spy = ccy + sy * crad
        spz = ccz + sz * crad
        llx, lly, llz = _norm3(spx - px, spy - py, spz - pz)
        cos_t = llx * blx + lly * bly + llz * blz
        pdf_l = jnp.where(any_e, cos_t * INV_2PI, 0.0)

        # ---- RR + uniform hemisphere (Material.cpp:14-34)
        u_rr = rng.uniform()
        survive = u_rr <= p_rr
        x1 = rng.uniform()
        x2 = rng.uniform()
        zl = jnp.abs(1.0 - 2.0 * x1)
        rl = jnp.sqrt(jnp.maximum(0.0, 1.0 - zl * zl))
        phi = TWO_PI * x2
        wx, wy, wz = _to_world(
            rl * jnp.cos(phi), rl * jnp.sin(phi), zl, nnx, nny, nnz
        )
        wx, wy, wz = _norm3(wx, wy, wz)
        wdn = wx * nnx + wy * nny + wz * nnz
        cos_o = jnp.maximum(0.0, wdn)
        pdf_b = jnp.where(wdn > 0, INV_2PI, 0.0)

        # ---- both traces, one primitive loop; restarting lanes ride
        # the B slot with their camera ray
        ox = jnp.where(restart, eye_x, px + 1e-6 * nnx)
        oy = jnp.where(restart, eye_y, py + 1e-6 * nny)
        oz = jnp.where(restart, eye_z, pz + 1e-6 * nnz)
        bxd = jnp.where(restart, cdx, wx)
        byd = jnp.where(restart, cdy, wy)
        bzd = jnp.where(restart, cdz, wz)
        if mm:
            sh, nxt = dual_mm(ox, oy, oz, llx, lly, llz, bxd, byd, bzd)
            sh, nxt = _sph_dual_merge(
                scal_ref, sph_ref, ox, oy, oz, llx, lly, llz,
                bxd, byd, bzd, sh, nxt,
            )
        else:
            sh, nxt = _dual_trace(
                scal_ref, tri_ref, attr_ref, sph_ref,
                ox, oy, oz, llx, lly, llz, bxd, byd, bzd,
            )

        # ---- NEE evaluation for live lanes (Scene.cpp:671-717)
        tA = sh["t"]
        hitA = tA < 1e30
        scx = ox + llx * tA
        scy = oy + lly * tA
        scz = oz + llz * tA
        dist2 = (px - scx) ** 2 + (py - scy) ** 2 + (pz - scz) ** 2
        not_shadow = jnp.abs(tA * tA - dist2) <= 1e-4
        seA = sh["emit"]
        lit = hitA & (
            jnp.sqrt(seA[0] ** 2 + seA[1] ** 2 + seA[2] ** 2) > EPS
        ) & any_e
        snA = sh["nrm"]
        snx, sny, snz = _norm3(snA[0], snA[1], snA[2], 1e-20)
        cos_on = jnp.maximum(0.0, nnx * llx + nny * lly + nnz * llz)
        cos_ln = jnp.maximum(0.0, -(snx * llx + sny * lly + snz * llz))
        ldn = llx * nnx + lly * nny + llz * nnz
        pdf_ok_l = (pdf_l >= EPS) & (pdf_l < 1e30) & (pdf_l == pdf_l)
        denom = jnp.where(pdf_ok_l, pdf_l, 1.0) * jnp.maximum(dist2, 1e-30)
        nee_s = jnp.where(
            lit & not_shadow & pdf_ok_l & (ldn > 0),
            cos_on * cos_ln / denom * INV_PI, 0.0,
        )
        cur_emissive = jnp.sqrt(ex * ex + ey * ey + ez * ez) > EPS
        dirx = jnp.where(cur_emissive, cx_, seA[0] * kx * nee_s)
        diry = jnp.where(cur_emissive, cy_, seA[1] * ky * nee_s)
        dirz = jnp.where(cur_emissive, cz_, seA[2] * kz * nee_s)
        acc_r = acc_r + jnp.where(live, tx_ * dirx, 0.0)
        acc_g = acc_g + jnp.where(live, ty_ * diry, 0.0)
        acc_b = acc_b + jnp.where(live, tz_ * dirz, 0.0)

        # ---- primary miss -> background, once per restarted sample
        tB = nxt["t"]
        hitB = tB < 1e30
        p_miss = restart & ~hitB
        acc_r = acc_r + jnp.where(p_miss, bg_r, 0.0)
        acc_g = acc_g + jnp.where(p_miss, bg_g, 0.0)
        acc_b = acc_b + jnp.where(p_miss, bg_b, 0.0)

        # ---- state update
        neB = nxt["emit"]
        emisB = jnp.sqrt(neB[0] ** 2 + neB[1] ** 2 + neB[2] ** 2) > EPS
        pdf_ok = pdf_b >= EPS
        depth_n = depth + 1
        live_b = (
            live & survive & pdf_ok & hitB & ~emisB & (depth_n < max_d)
        )
        new_live = live_b | (restart & hitB)
        wgt = jnp.where(wdn > 0, cos_o / jnp.maximum(pdf_b * p_rr, 1e-30),
                        0.0) * INV_PI
        tx_n = jnp.where(restart, 1.0, tx_ * kx * wgt)
        ty_n = jnp.where(restart, 1.0, ty_ * ky * wgt)
        tz_n = jnp.where(restart, 1.0, tz_ * kz * wgt)
        kB = nxt["kd"]
        nB = nxt["nrm"]
        nxn, nyn, nzn = _norm3(nB[0], nB[1], nB[2], 1e-20)
        # untextured: color == Kd for triangles; SPHERE winners keep the
        # reference's Properties.color = (0,0,0) quirk (Object.hpp:36-40)
        # — a primary (restart) hit on an emissive SPHERE must shade
        # black, exactly like nearest_hit's color join
        isphB = nxt["is_sphere"] > 0.5
        st_n = (
            ox + bxd * tB, oy + byd * tB, oz + bzd * tB,
            nxn, nyn, nzn,
            kB[0], kB[1], kB[2],
            neB[0], neB[1], neB[2],
            jnp.where(isphB, 0.0, kB[0]),
            jnp.where(isphB, 0.0, kB[1]),
            jnp.where(isphB, 0.0, kB[2]),
            tx_n, ty_n, tz_n,
        )
        st_n = tuple(
            jnp.where(new_live, a, b) for a, b in zip(st_n, st)
        )
        return (
            new_live.astype(jnp.int32),
            jnp.where(restart, next_s + 1, next_s),
            jnp.where(restart, 0, depth_n),
            st_n,
            (acc_r, acc_g, acc_b),
        )

    _, _, _, _, acc = jax.lax.while_loop(cond, body, init)
    acc_ref[0] = acc[0]
    acc_ref[1] = acc[1]
    acc_ref[2] = acc[2]


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "spp", "p_rr", "max_bounces",
                     "o_pad", "block", "interpret", "n_lanes",
                     "_force_mm"),
)
def fused_path_camera_render(scene, key, width: int, height: int,
                             fovy_deg: float, spp: int,
                             start_sample=0, lane_offset=0,
                             p_rr: float = 0.8, max_bounces: int = 16,
                             o_pad: int = None, block: int = 1024,
                             interpret: bool = False, n_lanes: int = None,
                             _force_mm: bool = None):
    """Render `spp` full path-tracing samples of the (width x height)
    camera frame in ONE kernel (grid over 1024-lane pixel blocks).
    Returns the UN-normalized radiance sum `acc (N, 3)` (divide by spp
    for the frame). `start_sample` keys the RNG streams for progressive
    accumulation; `lane_offset` + `n_lanes` restrict the program to a
    contiguous pixel range (screen-sharded meshes: each device renders
    [lane_offset, lane_offset + n_lanes) with ABSOLUTE pixel ids and the
    same per-sample streams, so sharded == monolithic per sample).
    Applicability mirrors `fused_bounce_group` (untextured small
    scenes) plus: rays must be THE camera frame."""
    if o_pad is None:
        o_pad = scene.emitter_cr.shape[0]
    n = width * height if n_lanes is None else n_lanes
    # the kernel's per-sample seed select is unrolled O(spp) inside the
    # bounce loop; callers batch larger sample counts over start_sample
    # (ops/path.path_render, render/pathtracer.py) instead of growing
    # the kernel body
    assert spp <= 256, "batch large spp over start_sample calls"
    assert block % 128 == 0
    rows = block // 128
    nb = -(-n // block)

    # >512 triangles: the SMEM scalar loop becomes the MXU dual sweep
    # (VMEM-resident coefficient/attr tables; SMEM would overflow and
    # the loop would crawl). The gate mirrors the mm2 trace tier.
    # _force_mm: test hook — both tiers share RNG streams, so forcing
    # mm on a small scene gives a near-exact A/B (tests/test_path_mm).
    mm = (scene.v0.shape[0] > 512) if _force_mm is None else _force_mm
    attr, sph, n_sph = pack_scene_tables(scene)
    if mm:
        coef_c, attr24_c, cab, cab2, nc_mm = pack_mm_tables(scene)
        mm_chunk = coef_c.shape[1] // 4
        # the SMEM triangle tables are unused in mm mode — pass 1-row
        # dummies so the (F, *) tables never hit the SMEM budget
        tri_smem = jnp.zeros((1, 12), jnp.float32)
        attr_smem = jnp.zeros((1, 16), jnp.float32)
    else:
        tri_smem, attr_smem = scene.tri_table, attr
        nc_mm = mm_chunk = 0
    skeys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
        key, jnp.asarray(start_sample, jnp.int32) + jnp.arange(spp)
    )
    seeds = jax.vmap(
        lambda k: jax.random.bits(k, (), jnp.uint32)
    )(skeys).astype(jnp.int32)
    scal = jnp.stack([
        scene.n_tri.astype(jnp.int32),
        scene.n_emitters.astype(jnp.int32),
        jnp.zeros((), jnp.int32),
        n_sph,
        jnp.asarray(spp, jnp.int32),
        jnp.asarray(start_sample, jnp.int32),
        jnp.asarray(lane_offset, jnp.int32),
        jnp.asarray(max_bounces, jnp.int32),
    ])
    scale = jnp.tan(jnp.radians(jnp.float32(fovy_deg)) * 0.5)
    cam = jnp.concatenate([
        scene.eye.astype(jnp.float32),
        jnp.stack([scale, jnp.float32(width / float(height))]),
        scene.background.astype(jnp.float32),
    ])

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),             # scalars
        pl.BlockSpec(memory_space=pltpu.SMEM),             # seeds
        pl.BlockSpec(memory_space=pltpu.SMEM),             # camera
        pl.BlockSpec(memory_space=pltpu.SMEM),             # ecr
        pl.BlockSpec(memory_space=pltpu.SMEM),             # tri geo
        pl.BlockSpec(memory_space=pltpu.SMEM),             # tri attr
        pl.BlockSpec(memory_space=pltpu.SMEM),             # spheres
    ]
    operands = [scal, seeds, cam, scene.emitter_cr.astype(jnp.float32),
                tri_smem, attr_smem, sph]
    scratch = []
    if mm:
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.SMEM),         # cab
            pl.BlockSpec(memory_space=pltpu.SMEM),         # cab2
            pl.BlockSpec(memory_space=pltpu.VMEM),         # coef_c
            pl.BlockSpec(memory_space=pltpu.VMEM),         # attr24_c
        ]
        operands += [cab, cab2, coef_c, attr24_c]
        scratch = [
            pltpu.VMEM((13, 2 * block), jnp.float32),      # phi_s
            pltpu.VMEM((1, 2 * block), jnp.int32),         # win_s
            pltpu.VMEM((24, 2 * block), jnp.float32),      # aj_s
        ]

    acc = pl.pallas_call(
        functools.partial(
            _pt_kernel, p_rr=p_rr, o_pad=o_pad, width=width, height=height,
            rows=rows, spp_static=spp, mm=mm, nc=nc_mm, chunk=mm_chunk,
        ),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((3, rows, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, nb * rows, 128), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(100 << 20) if mm else None),
        interpret=interpret,
    )(*operands)
    return acc.reshape(3, nb * rows * 128)[:, :n]
