"""Fragment shader unit tests vs scalar NumPy oracles (Shader.cpp impls)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from software_rasterizer_tpu.ops import shading as sh


def _blinn_phong_oracle(eye, pos, normal, kd, payload_color, lights):
    """Direct transcription of Shader::BlinnPhong (Shader.cpp:510-543)."""
    n = normal / np.linalg.norm(normal)
    total = np.zeros(3)
    for lp, li in lights:
        lp, li = np.asarray(lp, float), np.asarray(li, float)
        light_dir = lp - pos
        att = np.sqrt((lp[0] - pos[0]) ** 2 + (lp[1] - pos[1]) ** 2)
        distribution = li / att
        la = sh.KA * li
        cos_t = max(0.0, np.dot(n, light_dir / np.linalg.norm(light_dir)))
        ld = cos_t * np.asarray(kd) * distribution
        v = eye - pos
        h = light_dir + v
        h = h / np.linalg.norm(h)
        cos_a = max(0.0, np.dot(n, h))
        ls = (cos_a ** sh.P_EXP) * sh.KS * distribution
        total += la + ld + ls
    return total * np.asarray(payload_color)


def test_blinn_phong_matches_oracle():
    eye = np.array([0.0, 0.0, -0.9], np.float32)
    pos = np.array([100.0, 120.0, 30.0], np.float32)
    normal = np.array([0.3, 0.8, -0.2], np.float32)
    kd = np.array([0.7, 0.5, 0.2], np.float32)
    lights = [((0.9, 0.9, -0.9), (100, 100, 100)), ((0, 0.8, 0.9), (50, 50, 50))]
    lp = jnp.asarray([l[0] for l in lights], jnp.float32)
    li = jnp.asarray([l[1] for l in lights], jnp.float32)
    got = sh.blinn_phong(
        jnp.asarray(eye), jnp.asarray(pos), jnp.asarray(normal),
        jnp.asarray(kd), jnp.asarray(kd), lp, li,
    )
    want = _blinn_phong_oracle(eye, pos, normal, kd, kd, lights)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4)


def test_blinn_phong_batched():
    rng = np.random.RandomState(0)
    pos = rng.rand(4, 5, 3).astype(np.float32) * 100
    nrm = rng.randn(4, 5, 3).astype(np.float32)
    kd = rng.rand(4, 5, 3).astype(np.float32)
    eye = jnp.asarray([0.0, 0.0, -0.9])
    lp = jnp.asarray([[0.9, 0.9, -0.9]])
    li = jnp.asarray([[100.0, 100.0, 100.0]])
    out = sh.blinn_phong(eye, jnp.asarray(pos), jnp.asarray(nrm), jnp.asarray(kd), jnp.asarray(kd), lp, li)
    assert out.shape == (4, 5, 3)
    # spot-check one element against the oracle
    want = _blinn_phong_oracle(
        np.asarray(eye), pos[2, 3], nrm[2, 3], kd[2, 3], kd[2, 3],
        [((0.9, 0.9, -0.9), (100, 100, 100))],
    )
    np.testing.assert_allclose(np.asarray(out)[2, 3], want, rtol=1e-3)


def test_normal_shader():
    n = jnp.asarray([[0.0, 0.0, 2.0]])
    out = np.asarray(sh.shade_normal(n))
    np.testing.assert_allclose(out, [[0.5, 0.5, 1.0]], atol=1e-6)


def test_texture_shader_uses_texel():
    atlas = jnp.zeros((1, 4, 4, 3)).at[0, 1, 2].set(jnp.asarray([1.0, 0.5, 0.25]))
    wh = jnp.asarray([[4, 4]], jnp.int32)
    uv = jnp.asarray([[2.1 / 4, 1.1 / 4]])
    out = sh.shade_texture(
        jnp.asarray([0.0, 0.0, -1.0]),
        jnp.asarray([[10.0, 10.0, 1.0]]),
        jnp.asarray([[0.0, 0.0, -1.0]]),
        uv,
        jnp.asarray([0]),
        atlas,
        wh,
        jnp.asarray([[100.0, 100.0, -1.0]]),
        jnp.asarray([[100.0, 100.0, 100.0]]),
    )
    # proportionality to the texel color squared (kd * payload_color both texel)
    o = np.asarray(out)[0]
    assert o[0] > o[1] > o[2] > 0


def test_bump_changes_normal_only_with_texture_gradient():
    # flat texture -> dU=dV=0 -> ln=(0,0,1) -> TBN'(ln) keeps n
    atlas = jnp.ones((1, 8, 8, 3)) * 0.5
    wh = jnp.asarray([[8, 8]], jnp.int32)
    n = jnp.asarray([[0.1, 0.9, 0.2]])
    n = n / jnp.linalg.norm(n)
    new_n, _ = sh._tbn_perturbed_normal(
        n, jnp.asarray([[0.4, 0.4]]), jnp.asarray([0]), atlas, wh
    )
    # with zero gradient the perturbed normal must still be unit length and
    # close to (t.n, b.n, n.n)=(0,0,1) mapped — i.e. dot with original ~ n.n=1
    nn = np.asarray(new_n)[0]
    assert np.isclose(np.linalg.norm(nn), 1.0, atol=1e-5)


def test_shade_fragments_dispatch():
    atlas = jnp.ones((1, 4, 4, 3)) * 0.25
    wh = jnp.asarray([[4, 4]], jnp.int32)
    kw = dict(
        eye=jnp.asarray([0.0, 0.0, -1.0]),
        position=jnp.asarray([[5.0, 5.0, 1.0]] * 5),
        normal=jnp.asarray([[0.0, 0.0, -1.0]] * 5),
        uv=jnp.asarray([[0.5, 0.5]] * 5),
        color=jnp.asarray([[0.3, 0.6, 0.9]] * 5),
        tex_id=jnp.asarray([0] * 5),
        atlas=atlas,
        tex_wh=wh,
        light_pos=jnp.asarray([[50.0, 50.0, -1.0]]),
        light_int=jnp.asarray([[100.0, 100.0, 100.0]]),
    )
    st = jnp.asarray([0, 1, 2, 3, 4], jnp.int32)
    out = np.asarray(sh.shade_fragments(st, **kw))
    # NORMAL row is the normal visualization
    np.testing.assert_allclose(out[0], [0.5, 0.5, 0.0], atol=1e-6)
    # PHONG row uses vertex color, TEXTURE row uses texel -> different
    assert not np.allclose(out[1], out[2])
