"""Optics helpers vs scalar oracles (Tools.cpp formulas)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from software_rasterizer_tpu.ops import optics


def _refract_oracle(i, n, ior):
    cosi = np.clip(np.dot(i, n), -1, 1)
    etai, etat = 1.0, ior
    nn = n.copy()
    if cosi < 0:
        cosi = -cosi
    else:
        etai, etat = etat, etai
        nn = -n
    eta = etai / etat
    k = 1 - eta * eta * (1 - cosi * cosi)
    return np.zeros(3) if k < 0 else eta * i + (eta * cosi - np.sqrt(k)) * nn


def _fresnel_oracle(i, n, ior):
    cosi = np.clip(np.dot(i, n), -1, 1)
    etai, etat = 1.0, ior
    if cosi > 0:
        etai, etat = etat, etai
    sint = etai / etat * np.sqrt(max(0.0, 1 - cosi * cosi))
    if sint >= 1:
        return 1.0
    cost = np.sqrt(max(0.0, 1 - sint * sint))
    cosi = abs(cosi)
    rs = (etat * cosi - etai * cost) / (etat * cosi + etai * cost)
    rp = (etai * cosi - etat * cost) / (etai * cosi + etat * cost)
    return (rs * rs + rp * rp) / 2


def test_reflect():
    i = jnp.asarray([[1.0, -1.0, 0.0]]) / np.sqrt(2)
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    out = np.asarray(optics.reflect(i, n))[0]
    np.testing.assert_allclose(out, [1 / np.sqrt(2), 1 / np.sqrt(2), 0], atol=1e-6)


@pytest.mark.parametrize("ior", [1.49, 1.0, 2.4])
def test_refract_fresnel_oracle(ior):
    rng = np.random.RandomState(11)
    for _ in range(20):
        i = rng.randn(3)
        i /= np.linalg.norm(i)
        n = rng.randn(3)
        n /= np.linalg.norm(n)
        got_r = np.asarray(optics.refract(jnp.asarray(i[None], jnp.float32),
                                          jnp.asarray(n[None], jnp.float32), ior))[0]
        np.testing.assert_allclose(got_r, _refract_oracle(i, n, ior), atol=1e-4)
        got_f = float(optics.fresnel(jnp.asarray(i[None], jnp.float32),
                                     jnp.asarray(n[None], jnp.float32), ior)[0])
        assert np.isclose(got_f, _fresnel_oracle(i, n, ior), atol=1e-4)


def test_to_world_orthonormal():
    rng = np.random.RandomState(5)
    for _ in range(10):
        n = rng.randn(3)
        n /= np.linalg.norm(n)
        nj = jnp.asarray(n[None], jnp.float32)
        # z axis maps to N
        out = np.asarray(optics.to_world(jnp.asarray([[0.0, 0.0, 1.0]]), nj))[0]
        np.testing.assert_allclose(out, n, atol=1e-5)
        # unit local vectors stay unit (frame is orthonormal)
        local = rng.randn(3)
        local /= np.linalg.norm(local)
        w = np.asarray(optics.to_world(jnp.asarray(local[None], jnp.float32), nj))[0]
        assert np.isclose(np.linalg.norm(w), 1.0, atol=1e-5)
        # hemisphere preserved: local.z>0 -> dot(world, n)>0
        assert np.sign(np.dot(w, n)) == np.sign(local[2])
