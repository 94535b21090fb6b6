"""PRNG key construction.

Integrators consume `jax.random` keys; any impl works. The pipelines
default to the hardware-accelerated RBG generator — profiling showed
the (default) threefry2x32 custom-calls costing ~0.5 ms per draw at
wavefront widths, several times per bounce. RBG uses the TPU's native
RngBitGenerator. Override with SRT_PRNG_IMPL=threefry2x32 for
cross-backend bit-identical streams.
"""

from __future__ import annotations

import os


def make_key(seed: int):
    import jax

    impl = os.environ.get("SRT_PRNG_IMPL", "rbg")
    try:
        return jax.random.key(seed, impl=impl)
    except Exception:
        return jax.random.PRNGKey(seed)
