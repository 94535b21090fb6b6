"""Mosaic layout probes (round 3): measure whether an in-kernel
lane-major <-> feature-major relayout is cheap enough to put the
chunk-culled MXU trace INSIDE a persistent integrator kernel.

Probes (each: one Pallas kernel, grid over 2048-ray blocks, REPS
chained iterations in-kernel so the tunnel sync amortizes):
  A. baseline: VPU math on (rows,128) planes only
  B. reshape (rows,128) -> (1, N) x13 (build phi feature-major),
     one (4C,13)@(13,N) HIGHEST matmul, reshape (1,N) -> (rows,128) x2
  C. B plus a 40-column one-hot attribute join (attr^T (40,C) @
     onehot (C,N)) and 40 reshapes back to lane-major

Run on the real TPU:  python tools/mosaic_probe.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 16
N = ROWS * 128
CHUNK = 128
REPS = 64


def _probe_a(o_ref, out_ref):
    x = o_ref[0]
    y = o_ref[1]
    z = o_ref[2]

    def body(i, c):
        x, y, z = c
        x = x * 1.000001 + y
        y = y * 0.999999 + z
        z = z + x * 0.000001
        return (x, y, z)

    x, y, z = jax.lax.fori_loop(0, REPS * 13, body, (x, y, z))
    out_ref[...] = x + y + z


def _probe_b(o_ref, coef_ref, out_ref):
    x = o_ref[0]
    y = o_ref[1]
    z = o_ref[2]

    def body(i, c):
        x, y, z = c
        feats = [x, y, z, x * y, x * z, y * z, x + y, y + z, x + z,
                 x - y, y - z, x - z, x * x]
        phi = jnp.concatenate(
            [f.reshape(1, N) for f in feats], axis=0
        )  # (13, N)
        prod = jax.lax.dot_general(
            coef_ref[...], phi,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (4C, N)
        t = jnp.min(prod[0:CHUNK], axis=0, keepdims=True)      # (1, N)
        f = jnp.min(prod[CHUNK:2 * CHUNK], axis=0, keepdims=True)
        tl = t.reshape(ROWS, 128)
        fl = f.reshape(ROWS, 128)
        return (x + tl * 1e-9, y + fl * 1e-9, z)

    x, y, z = jax.lax.fori_loop(0, REPS, body, (x, y, z))
    out_ref[...] = x + y + z


def _probe_c(o_ref, coef_ref, attr_ref, out_ref):
    x = o_ref[0]
    y = o_ref[1]
    z = o_ref[2]

    def body(i, c):
        x, y, z = c
        feats = [x, y, z, x * y, x * z, y * z, x + y, y + z, x + z,
                 x - y, y - z, x - z, x * x]
        phi = jnp.concatenate(
            [f.reshape(1, N) for f in feats], axis=0
        )
        prod = jax.lax.dot_general(
            coef_ref[...], phi,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        t = jnp.min(prod[0:CHUNK], axis=0, keepdims=True)      # (1, N)
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, N), 0)
        win = jnp.argmin(prod[0:CHUNK], axis=0)[None, :]       # (1, N)
        onehot = (rows_i == win).astype(jnp.float32)           # (C, N)
        attrs = jax.lax.dot_general(
            attr_ref[...], onehot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (40, N)
        upd = [attrs[k].reshape(ROWS, 128) for k in range(40)]
        acc = upd[0]
        for u in upd[1:]:
            acc = acc + u
        return (x + acc * 1e-9, y + t.reshape(ROWS, 128) * 1e-9, z)

    x, y, z = jax.lax.fori_loop(0, REPS, body, (x, y, z))
    out_ref[...] = x + y + z


def run(name, kernel, extra):
    nb = 64  # 128K rays
    o = jnp.asarray(np.random.rand(3, nb * ROWS, 128), jnp.float32)
    fn = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((3, ROWS, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in extra],
        out_specs=pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * ROWS, 128), jnp.float32),
    )
    f = jax.jit(lambda o, *e: fn(o, *e))
    try:
        t0 = time.time()
        r = f(o, *extra)
        np.asarray(r[0, 0])
        compile_s = time.time() - t0
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:400]}")
        return
    ts = []
    for _ in range(5):
        t0 = time.time()
        r = f(o, *extra)
        np.asarray(r[0, 0])
        ts.append(time.time() - t0)
    best = min(ts)
    per_blk_iter_us = best / nb / REPS * 1e6
    print(f"{name}: {best*1e3:.1f} ms total, {per_blk_iter_us:.2f} us per "
          f"block-iteration (compile {compile_s:.0f}s)")


def main():
    coef = jnp.asarray(np.random.rand(4 * CHUNK, 13), jnp.float32)
    attr = jnp.asarray(np.random.rand(40, CHUNK), jnp.float32)
    run("A (VPU baseline)", _probe_a, [])
    run("B (phi reshape + trace matmul)", _probe_b, [coef])
    run("C (B + 40-col one-hot join)", _probe_c, [coef, attr])


if __name__ == "__main__":
    main()
