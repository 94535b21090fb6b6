"""Mosaic gather probes (round 3): can a Pallas TPU kernel do a
PER-LANE dynamic gather from a VMEM-resident table? Decides whether
texture fetches can live inside the fused integrator kernels.

Probes (grid over 2048-lane blocks, correctness-checked vs numpy):
  A. jnp.take along a flat f32 table, (16,128) i32 indices
  B. table[idx] via jnp.take_along_axis on a broadcast table
  C. one-hot MXU join (the known-supported fallback) for timing contrast

Run:  python tools/gather_probe.py          (real TPU)
      JAX_PLATFORMS=cpu python ...          (interpret only)
"""

import functools
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 16
N = ROWS * 128
TABLE = 1 << 20           # 1M-entry table (a 1024x1024 texture channel)
REPS = 32


def _kernel_take(tab_ref, idx_ref, out_ref):
    tab = tab_ref[0]                      # (TABLE,) f32 in VMEM
    idx = idx_ref[...]                    # (ROWS, 128) i32

    def body(i, acc):
        # vary the index stream so REPS iterations don't collapse
        j = (idx + i) % TABLE
        return acc + jnp.take(tab, j, axis=0)

    out_ref[...] = jax.lax.fori_loop(0, REPS, body,
                                     jnp.zeros((ROWS, 128), jnp.float32))


def run_take(interpret):
    tab = jnp.arange(TABLE, dtype=jnp.float32) * 0.5
    idx = jnp.asarray(
        np.random.RandomState(0).randint(0, TABLE, (ROWS, 128)), jnp.int32
    )
    f = pl.pallas_call(
        _kernel_take,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.float32),
        interpret=interpret,
    )
    out = jax.jit(lambda t, i: f(t[None], i))(tab, idx)
    out = np.asarray(out)
    want = np.zeros((ROWS, 128), np.float32)
    idx_np = np.asarray(idx)
    tab_np = np.asarray(tab)
    for i in range(REPS):
        want += tab_np[(idx_np + i) % TABLE]
    ok = np.allclose(out, want)
    print(f"take gather: ok={ok}")
    return ok


def main():
    interpret = jax.default_backend() != "tpu"
    print(f"backend={jax.default_backend()} interpret={interpret}")
    try:
        ok = run_take(interpret)
        if ok and not interpret:
            # time it
            tab = jnp.arange(TABLE, dtype=jnp.float32) * 0.5
            idx = jnp.asarray(
                np.random.RandomState(0).randint(0, TABLE, (ROWS, 128)),
                jnp.int32,
            )
            f = jax.jit(lambda t, i: pl.pallas_call(
                _kernel_take,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.float32),
            )(t[None], i))
            r = f(tab, idx)
            np.asarray(r[0, 0])
            t0 = time.time()
            for _ in range(10):
                r = f(tab, idx)
            np.asarray(r[0, 0])
            dt = (time.time() - t0) / 10
            print(f"{REPS} gathers of {N} lanes: {dt * 1e3:.3f} ms "
                  f"-> {REPS * N / dt / 1e9:.2f} Ggathers/s")
    except Exception as e:
        print(f"take gather FAILED: {type(e).__name__}: {str(e)[:400]}")


if __name__ == "__main__":
    main()
