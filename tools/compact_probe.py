"""Micro-benchmark of stream-compaction permutation variants on the TPU.

compact_perm (ops/path.py) builds perm via one scatter-set with unique
out-of-range redirects; the whitted profile still attributes ~4.9 ms at
524288 lanes / 262144 cap to that scatter (fusion.28). Candidates:

  A current: .at[where(live,pos,cap+i)].set(i, drop, unique)
  B sorted scatter-max: .at[pos].max(where(live,i,-1), drop, sorted)
    pos=cumsum(live)-1 is non-decreasing, so indices_are_sorted=True;
    dead lanes lose the max against their slot's live writer.
  C sorted+unique scatter-set of only-live values via pos with dead
    lanes redirected PAST cap in-order (keeps global sortedness:
    where(live, pos, cap+pos2) is NOT sorted; skip)
  D gather-free: no perm at all (lower bound reference).

Run: python tools/compact_probe.py [N] [CAP]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *a, n=20):
    r = f(*a)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), r)
    np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])  # axon quirk
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
    return (time.perf_counter() - t0) / n, r


def variant_a(live, cap):
    n = live.shape[0]
    pos = jnp.cumsum(live.astype(jnp.int32)) - 1
    tgt = jnp.where(live, pos, cap + jnp.arange(n, dtype=jnp.int32))
    perm = jnp.zeros((cap,), jnp.int32)
    perm = perm.at[tgt].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop", unique_indices=True
    )
    return perm, jnp.sum(live.astype(jnp.int32))


def variant_b(live, cap):
    pos = jnp.cumsum(live.astype(jnp.int32)) - 1
    n = live.shape[0]
    val = jnp.where(live, jnp.arange(n, dtype=jnp.int32), -1)
    perm = jnp.zeros((cap,), jnp.int32)
    perm = perm.at[pos].max(
        val, mode="drop", indices_are_sorted=True
    )
    return perm, jnp.sum(live.astype(jnp.int32))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 524288
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 262144
    key = jax.random.PRNGKey(0)
    live = jax.random.uniform(key, (n,)) < 0.18

    fa = jax.jit(lambda l: variant_a(l, cap))
    fb = jax.jit(lambda l: variant_b(l, cap))

    ta, (pa, na) = timeit(fa, live)
    tb, (pb, nb) = timeit(fb, live)
    pa, pb = np.asarray(pa), np.asarray(pb)
    na = int(np.asarray(na))
    eq = np.array_equal(pa[:na], pb[:na])
    print(f"n={n} cap={cap} n_live={na}")
    print(f"A set/unique/drop : {ta*1e3:8.3f} ms")
    print(f"B max/sorted/drop : {tb*1e3:8.3f} ms   live-prefix equal: {eq}")


if __name__ == "__main__":
    main()
