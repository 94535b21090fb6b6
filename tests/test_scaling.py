"""Multi-device scaling efficiency on the virtual 8-device CPU mesh
(SURVEY.md section 5.8, VERDICT r1 item 9).

Wall-clock scaling cannot be certified on this host (4 cores < 8
devices, and per-device XLA CPU programs are themselves multi-threaded),
so the asserted metric is program-level WORK efficiency: total
process-CPU-time of the monolithic render divided by the sharded
render's at identical total work. It exposes overhead the sharding adds
— shard padding, psum collectives, per-device duplicated scene
transforms — independently of host core contention. Correctness of the
sharded image (bit-exact vs monolithic) is covered by test_parallel.py.
"""

import time

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from software_rasterizer_tpu.ops.intersect import prepare_rt_scene
from software_rasterizer_tpu.ops.path import path_render
from software_rasterizer_tpu.parallel import (
    make_render_mesh,
    sharded_path_render,
)
from software_rasterizer_tpu.scenes import build_cornell_scene


def _cpu_time(f, repeats=3):
    f()  # compile
    best = 1e9
    for _ in range(repeats):
        c0 = time.process_time()
        f()
        best = min(best, time.process_time() - c0)
    return best


def test_sharding_work_efficiency_8dev():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    w, spp = 64, 8
    scene = build_cornell_scene()
    scene.set_ndc_matrix(w, w)
    rt = jax.tree_util.tree_map(
        jnp.asarray, prepare_rt_scene(scene.rt_geometry(), scene.rt_frame())
    )
    block = w * w // 4
    mesh = make_render_mesh(n_spp=2, devices=jax.devices()[:8])

    cm = _cpu_time(lambda: path_render(
        rt, w, w, scene.fovy, jax.random.PRNGKey(1), spp=spp,
        max_bounces=8, block=block,
    ).block_until_ready())
    cs = _cpu_time(lambda: sharded_path_render(
        rt, mesh, w, w, scene.fovy, jax.random.PRNGKey(1), spp=spp,
        max_bounces=8, block=block,
    ).block_until_ready())
    eff = cm / cs
    # >= 0.8: sharding may add at most 25% total-work overhead
    # (measured ~1.2-1.4 on this workload: shards compile to tighter
    # programs than the monolith, so the ratio usually EXCEEDS 1)
    assert eff >= 0.8, (cm, cs, eff)
