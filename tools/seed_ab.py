"""ADVICE-r2/VERDICT-r4 item 9: cost of the fused path kernel's O(spp)
per-sample seed select chain (ops/pallas_path._pt_kernel).

The suggested "SMEM scalar load by local_s" is structurally impossible:
local_s is a PER-LANE (rows,128) array (lanes sit at different sample
indices), not a scalar — an SMEM load by it would be a per-lane gather,
which Mosaic does not support (tools/gather_probe.py). What CAN be
measured is the chain's cost: A/B the real kernel against one whose
seed select is ablated to seeds_ref[0] (wrong values, same everything
else). Run on the real TPU: python tools/seed_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from software_rasterizer_tpu.ops import pallas_path
from software_rasterizer_tpu.ops.intersect import prepare_rt_scene
from software_rasterizer_tpu.scenes import build_cornell_scene
from software_rasterizer_tpu.utils.rng import make_key

WIDTH = HEIGHT = 1024
SPP = 64   # one fused dispatch of the bench's per-dispatch sample batch


def bench_once(label):
    scene = build_cornell_scene()
    scene.set_ndc_matrix(WIDTH, HEIGHT)
    rt = jax.tree_util.tree_map(
        jax.device_put, prepare_rt_scene(scene.rt_geometry(), scene.rt_frame())
    )

    @jax.jit
    def render(key):
        return pallas_path.fused_path_camera_render(
            rt, key, WIDTH, HEIGHT, scene.fovy, SPP,
            p_rr=0.8, max_bounces=16,
        )

    out = render(make_key(0))
    np.asarray(out.reshape(-1)[0])
    best = 1e30
    for i in range(4):
        t0 = time.time()
        out = render(make_key(i + 1))
        np.asarray(out.reshape(-1)[0])
        best = min(best, time.time() - t0)
    mpaths = WIDTH * HEIGHT * SPP / best / 1e6
    print(f"{label:24s} {best*1e3:8.1f} ms  {mpaths:7.1f} Mpaths/s",
          flush=True)
    return best


def main():
    t_real = bench_once("real seed chain")

    # ablate: constant seed (values wrong on purpose; timing-only —
    # _pt_kernel reads the module global at trace time)
    pallas_path._SEED_ABLATE = True
    try:
        t_abl = bench_once("seed chain ablated")
    finally:
        pallas_path._SEED_ABLATE = False
    print(f"\nseed-select chain cost: {1e3*(t_real-t_abl):+7.1f} ms "
          f"({100*(t_real-t_abl)/t_real:+.1f}% of the dispatch)")


if __name__ == "__main__":
    main()
