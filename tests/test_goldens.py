"""Golden self-regression renders (SURVEY.md section 4: the reference's
quality control is golden images; here they are automated).

Goldens were generated on the CPU backend at fixed keys
(tests/goldens/cornell_goldens.npz). Tolerances absorb backend fp
differences while catching semantic drift; the PATH golden compares the
deterministic same-key image exactly on CPU and statistics loosely."""

import pathlib

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from software_rasterizer_tpu.ops.intersect import prepare_rt_scene
from software_rasterizer_tpu.ops.path import path_render
from software_rasterizer_tpu.ops.raster import render_raster_frame
from software_rasterizer_tpu.ops.whitted import whitted_render
from software_rasterizer_tpu.scenes import build_cornell_scene

GOLDENS = pathlib.Path(__file__).parent / "goldens" / "cornell_goldens.npz"


@pytest.fixture(scope="module")
def goldens():
    return np.load(GOLDENS)


def test_raster_golden(goldens):
    scene = build_cornell_scene()
    scene.set_ndc_matrix(96, 96)
    geom = jax.tree_util.tree_map(jnp.asarray, scene.raster_geometry())
    img, z = render_raster_frame(geom, scene.raster_frame(), 96, 96)
    img, z = np.asarray(img), np.asarray(z)
    want = goldens["raster"]
    # coverage must match except a sliver of edge pixels
    got_cov = np.isfinite(z)
    want_cov = np.isfinite(goldens["raster_z"])
    assert (got_cov != want_cov).mean() < 0.01
    both = got_cov & want_cov
    np.testing.assert_allclose(img[both], want[both], rtol=1e-3, atol=1e-3)


def test_whitted_golden(goldens):
    scene = build_cornell_scene()
    scene.set_ndc_matrix(64, 64)
    rt = prepare_rt_scene(scene.rt_geometry(), scene.rt_frame())
    img = np.asarray(whitted_render(
        rt, 64, 64, scene.fovy, jax.random.PRNGKey(0), spp=1, max_depth=4
    ))
    want = goldens["whitted"]
    # a handful of shadow-knife-edge pixels may flip between backends
    close = np.isclose(img, want, rtol=5e-3, atol=5e-3)
    assert close.mean() > 0.995


def test_path_golden_statistics(goldens):
    scene = build_cornell_scene()
    scene.set_ndc_matrix(48, 48)
    rt = prepare_rt_scene(scene.rt_geometry(), scene.rt_frame())
    img = path_render(rt, 48, 48, scene.fovy, jax.random.PRNGKey(0), spp=8)
    mean = float(jnp.mean(jnp.clip(img, 0, 1)))
    assert abs(mean - float(goldens["path_mean"])) < 0.03
    if jax.default_backend() == "cpu":
        # same backend + same key -> bit-for-bit reproduction
        np.testing.assert_allclose(
            np.asarray(img), goldens["path_img"], rtol=1e-5, atol=1e-6
        )
