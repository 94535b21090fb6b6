"""Auxiliary subsystems: metrics, debug validation, config round-trip
(SURVEY.md section 5)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from software_rasterizer_tpu.config import RenderConfig
from software_rasterizer_tpu.ops.intersect import prepare_rt_scene
from software_rasterizer_tpu.scenes import build_cornell_scene
from software_rasterizer_tpu.utils.debug import (
    debug_mode,
    validate_raster_geometry,
    validate_rt_scene,
)
from software_rasterizer_tpu.utils.metrics import FrameMetrics, MetricsRecorder


def test_metrics_recorder(tmp_path):
    path = str(tmp_path / "metrics.jsonl")
    rec = MetricsRecorder(path)
    with rec.timed("raster", "s", 64, 64):
        pass
    rec.record(FrameMetrics("path", "s", 64, 64, draw_s=0.5, spp=8))
    assert len(rec.frames) == 2
    m = rec.frames[1]
    assert m.mpaths_per_s == pytest.approx(64 * 64 * 8 / 0.5 / 1e6)
    s = rec.summary()
    assert s["frames"] == 2 and s["min_s"] <= s["median_s"] <= s["max_s"]
    import json

    lines = [json.loads(l) for l in open(path)]
    assert lines[1]["mpaths_per_s"] == m.to_dict()["mpaths_per_s"]


def test_validate_clean_scene():
    scene = build_cornell_scene()
    scene.set_ndc_matrix(32, 32)
    rt = prepare_rt_scene(scene.rt_geometry(), scene.rt_frame())
    assert validate_rt_scene(rt) == []
    assert validate_raster_geometry(scene.raster_geometry()) == []


def test_validate_detects_corruption():
    scene = build_cornell_scene()
    scene.set_ndc_matrix(32, 32)
    rt = prepare_rt_scene(scene.rt_geometry(), scene.rt_frame())
    bad = rt._replace(
        v0=np.asarray(rt.v0).copy(),
        tri_mat=np.asarray(rt.tri_mat) + 100,
    )
    v0 = np.asarray(bad.v0)
    v0[0, 0] = np.nan
    bad = bad._replace(v0=v0)
    errs = validate_rt_scene(bad)
    assert any("v0" in e for e in errs)
    assert any("tri_mat" in e for e in errs)


def test_debug_mode_catches_nan():
    import jax.numpy as jnp

    with pytest.raises(FloatingPointError):
        with debug_mode():
            jax.jit(lambda x: jnp.log(x))(jnp.float32(-1.0)).block_until_ready()


def test_config_roundtrip():
    c = RenderConfig(width=256, spp=8, raster_tile=(64, 128))
    c2 = RenderConfig.from_json(c.to_json())
    assert c2 == c
