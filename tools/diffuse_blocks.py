"""Measure the diffuse-live 2048-lane block fraction per depth in the
bench whitted frame (1024^2 demo scene, tile order) — sizes the
block-compacted deferred shading cap.

    python tools/diffuse_blocks.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "examples"),
)

import jax
import jax.numpy as jnp
import numpy as np

from whitted_demo import build_scene, set_frame_matrices

from software_rasterizer_tpu.ops.camera import camera_rays
from software_rasterizer_tpu.ops.intersect import prepare_rt_scene
from software_rasterizer_tpu.ops.whitted import (
    _neuter_dead, blocked_nearest_hit,
)
from software_rasterizer_tpu.ops import optics


def main():
    width = height = 1024
    scene_h = build_scene()
    # sweep the bench's rotation range: cap must cover every frame
    worst = {}
    for ang in [0.0, 45.0, 90.0, 135.0, 180.0, 225.0, 270.0, 315.0]:
        set_frame_matrices(scene_h, ang)
        scene_h.set_ndc_matrix(width, height)
        geom = jax.tree_util.tree_map(jax.device_put, scene_h.rt_geometry())
        fr = jax.tree_util.tree_map(jax.device_put, scene_h.rt_frame())
        from software_rasterizer_tpu.ops.intersect import prepare_rt_scene
        scene = prepare_rt_scene(geom, fr)

        orig, d = camera_rays(scene.eye, scene_h.fovy, width, height)
        th, tw = 16, 128
        def to_tiles(a):
            k = a.shape[-1]
            return (a.reshape(height // th, th, width // tw, tw, k)
                    .transpose(0, 2, 1, 3, 4).reshape(-1, k))
        orig, d = to_tiles(orig), to_tiles(d)

        rays = {"orig": orig, "dir": d, "live": jnp.ones(orig.shape[0], bool)}
        ang_fracs = {}
        for depth in range(3):
            n = rays["orig"].shape[0]
            t_orig, t_dir = _neuter_dead(rays["live"], rays["orig"], rays["dir"])
            hit = blocked_nearest_hit(scene, t_orig, t_dir)
            live = rays["live"]
            is_diffuse = live & hit.hit & (hit.mat_type == 0)
            nb = n // 2048
            blk = np.asarray(is_diffuse[: nb * 2048].reshape(nb, 2048).any(1))
            frac = blk.mean()
            ang_fracs[depth] = float(frac)
            worst[depth] = max(worst.get(depth, 0.0), float(frac))
            if depth == 0 and ang == 0.0:
                print(f"ang={ang} depth={depth}: {blk.sum()}/{nb} blocks "
                      f"({frac:.3f}), diffuse lanes "
                      f"{float(np.asarray(is_diffuse.mean())):.3f}")
            # children: specular only (simplified — reuse real fresnel dirs)
            is_spec = live & hit.hit & ((hit.mat_type == 1) | (hit.mat_type == 2))
            idotn = jnp.sum(rays["dir"] * hit.normal, axis=-1)
            refl = optics.normalize(optics.reflect(rays["dir"], hit.normal))
            off = jnp.where(idotn[:, None] < 0, hit.normal, -hit.normal) * 1e-5
            rays = {
                "orig": hit.coords + off,
                "dir": refl,
                "live": is_spec,
            }
        print(f"ang={ang}: depth fracs "
              + ", ".join(f"d{k}={v:.3f}" for k, v in sorted(ang_fracs.items())))
    print("WORST per depth:", {k: round(v, 3) for k, v in sorted(worst.items())})


if __name__ == "__main__":
    main()
