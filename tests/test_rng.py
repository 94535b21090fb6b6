"""Direct statistical tests of the in-kernel hash RNGs (VERDICT r2
item 10): kernel RNG quality must not rest only on image-level
tolerances. Tests the GENERATOR ITSELF — uniformity and the pair
structures the integrators actually consume (consecutive draws within a
bounce, lane-adjacent draws at the same counter) — and proves the
detector has power by failing the documented single-round variant that
caused the r2 +3-4% image-mean bias incident (ops/pallas_path._RngDyn
docstring)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from software_rasterizer_tpu.ops.pallas_path import _Rng, _RngDyn

N = 1 << 20
SEED = 1234567


def _pair_chi2(ua, ub, bins=16):
    """Chi-square of the joint (ua, ub) occupancy on a bins x bins grid,
    normalized to a z-score vs the chi-square null (mean dof, var 2dof).
    Independent uniforms give |z| < ~3; structured pairs explode."""
    h = np.histogram2d(ua, ub, bins=bins, range=[[0, 1], [0, 1]])[0]
    e = len(ua) / float(bins * bins)
    chi2 = float(((h - e) ** 2 / e).sum())
    dof = bins * bins - 1
    return (chi2 - dof) / np.sqrt(2 * dof)


def _single_round(lane, ctr, seed=SEED):
    """The r2 bias incident's generator: ONE lowbias32 multiply round
    over lane^ctr (the shipped _RngDyn finalizes ctr separately first,
    then runs two full rounds)."""
    x = ((lane * 0x9E3779B1) & 0xFFFFFFFF) ^ (
        (seed + ctr * 0x85EBCA6B) & 0xFFFFFFFF
    )
    x ^= x >> 16
    x = (x * 0x7FEB352D) & 0xFFFFFFFF
    x ^= x >> 16
    return (x >> 8) / float(1 << 24)


def _rngdyn_uniform(base, offset):
    lane = jnp.arange(N, dtype=jnp.int32)
    r = _RngDyn(jnp.uint32(SEED), lane, jnp.full((N,), base, jnp.int32))
    u = None
    for _ in range(offset + 1):
        u = r.uniform()
    return np.asarray(u)


def test_rngdyn_marginal_uniformity():
    """Mean/variance and 1-D equidistribution of the draws used at the
    first bounce slots."""
    for base, k in ((0, 0), (8, 3), (16, 5)):
        u = _rngdyn_uniform(base, k)
        assert abs(u.mean() - 0.5) < 3e-3, (base, k, u.mean())
        assert abs(u.std() - np.sqrt(1 / 12.0)) < 3e-3
        h = np.histogram(u, bins=64, range=(0, 1))[0]
        e = N / 64.0
        z = (((h - e) ** 2 / e).sum() - 63) / np.sqrt(2 * 63)
        assert abs(z) < 6.0, (base, k, z)


def test_rngdyn_consecutive_draw_pairs():
    """Joint distribution of consecutive draws within a bounce (the
    (z, phi) sphere-warp inputs — exactly the pairing that amplified
    the single-round bias)."""
    for base in (0, 8, 16, 24):
        u1 = _rngdyn_uniform(base, 0)
        u2 = _rngdyn_uniform(base, 1)
        z = _pair_chi2(u1, u2)
        assert abs(z) < 6.0, (base, z)


def test_rngdyn_lane_adjacent_pairs():
    """Adjacent lanes at the same counter (neighboring pixels draw at
    identical slots every bounce — structure here prints as image
    texture)."""
    zsum, dofn = 0.0, 0
    for base in (0, 8, 16, 24):
        u = _rngdyn_uniform(base, 0)
        z = _pair_chi2(u[:-1], u[1:])
        assert abs(z) < 6.0, (base, z)


def test_rng_ctr_class_pairs():
    """_Rng (static draw counter): consecutive draws of one iteration."""
    lane = jnp.arange(N, dtype=jnp.int32)
    r = _Rng(jnp.uint32(SEED), lane)
    u1 = np.asarray(r.uniform())
    u2 = np.asarray(r.uniform())
    assert abs(u1.mean() - 0.5) < 3e-3
    z = _pair_chi2(u1, u2)
    assert abs(z) < 6.0, z


def test_single_round_variant_is_detected():
    """The detector must FAIL the documented single-round variant —
    proof the passing thresholds above are meaningful (measured: the
    variant's lane-adjacent pair z-score is ~245 at this N; shipped is
    ~-1.4)."""
    lanes = np.arange(N, dtype=np.uint64)
    worst = 0.0
    for base in (0, 8, 16, 24):
        u = _single_round(lanes, np.uint64(base))
        worst = max(worst, abs(_pair_chi2(u[:-1], u[1:])))
    assert worst > 50.0, worst
