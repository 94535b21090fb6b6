"""Micro-bench: texture-fetch gather formulations at whitted wavefront
widths (v5e). Compares the shipped u8[N,3] row gather against a packed
i32 1-D gather (RGB in one word) and f32[N,3] rows.

    python tools/tex_gather_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, reps=10):
    r = jax.jit(f)(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), r)
    # one-element fetch to defeat the axon block_until_ready quirk
    np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
    best = 1e30
    for _ in range(reps):
        t0 = time.time()
        r = jax.jit(f)(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
        best = min(best, time.time() - t0)
    return best


def main():
    key = jax.random.PRNGKey(0)
    k, hm, wm = 2, 1024, 1024
    atlas_u8 = jax.device_put(
        jax.random.randint(key, (k, hm, wm, 3), 0, 255, jnp.int32).astype(jnp.uint8)
    )
    a = np.asarray(atlas_u8).astype(np.int32)
    packed = jax.device_put(
        jnp.asarray(a[..., 0] | (a[..., 1] << 8) | (a[..., 2] << 16)).reshape(-1)
    )

    ITERS = 20

    def chain(one_gather):
        """Run `one_gather(xs) -> (N,3) f32` ITERS times with a data
        dependency so per-iteration device time = slope."""
        def f(tid, ys, xs):
            def body(i, carry):
                xs_c, acc = carry
                out = one_gather(tid, ys, xs_c)
                # feed a cheap function of the output back into the index
                bump = (out[:, 0] * 0.0).astype(jnp.int32)
                return (xs_c ^ 1 ^ bump, acc + out[:, 1])
            _, acc = jax.lax.fori_loop(0, ITERS, body, (xs, jnp.zeros(xs.shape[0])))
            return acc
        return f

    for n in (1 << 20, 1 << 19):
        tid = jax.device_put(jax.random.randint(key, (n,), 0, k, jnp.int32))
        ys = jax.device_put(jax.random.randint(key, (n,), 0, hm, jnp.int32))
        xs = jax.device_put(jax.random.randint(key, (n,), 0, wm, jnp.int32))

        def g_u8(tid, ys, xs):
            out = atlas_u8[tid, ys, xs]
            return out.astype(jnp.float32) / 255.0

        def g_packed(tid, ys, xs):
            lin = (tid * hm + ys) * wm + xs
            w = packed[lin]
            r = (w & 255).astype(jnp.float32)
            g = ((w >> 8) & 255).astype(jnp.float32)
            b = ((w >> 16) & 255).astype(jnp.float32)
            return jnp.stack([r, g, b], axis=-1) / 255.0

        t_base = timeit(chain(lambda tid, ys, xs: jnp.zeros((xs.shape[0], 3))),
                        tid, ys, xs)
        t_u8 = timeit(chain(g_u8), tid, ys, xs)
        t_pk = timeit(chain(g_packed), tid, ys, xs)
        print(f"n={n}: per-gather u8[N,3] {(t_u8 - t_base)/ITERS*1e3:7.2f} ms"
              f" | packed-i32 {(t_pk - t_base)/ITERS*1e3:7.2f} ms"
              f" (loop overhead {t_base*1e3:.1f} ms total)")

    # correctness
    tid = jnp.zeros((16,), jnp.int32)
    ys = jnp.arange(16, dtype=jnp.int32)
    xs = jnp.arange(16, dtype=jnp.int32) * 7
    ref = np.asarray(atlas_u8)[0, np.asarray(ys), np.asarray(xs)].astype(np.float32) / 255.0
    lin = (tid * hm + ys) * wm + xs
    w = packed[lin]
    got = np.stack([np.asarray((w & 255), np.float32),
                    np.asarray(((w >> 8) & 255), np.float32),
                    np.asarray(((w >> 16) & 255), np.float32)], -1) / 255.0
    assert np.array_equal(ref, got), (ref, got)
    print("bit-exact vs u8 path: OK")


if __name__ == "__main__":
    main()
