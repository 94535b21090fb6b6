"""Dump the optimized HLO of the bench whitted frame and print the
biggest fusions' computation bodies, so profiler rows (fusion.N /
whitted_render.N) can be attributed to source ops.

    python tools/whitted_hlo.py [FUSION_NAME ...]
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "examples"),
)

import jax

from whitted_demo import build_scene, set_frame_matrices

from software_rasterizer_tpu.ops.intersect import prepare_rt_scene
from software_rasterizer_tpu.ops.whitted import whitted_render
from software_rasterizer_tpu.utils.rng import make_key


def main():
    names = sys.argv[1:]
    width = height = 1024
    scene = build_scene()
    set_frame_matrices(scene, 0.0)
    scene.set_ndc_matrix(width, height)
    geom = jax.tree_util.tree_map(jax.device_put, scene.rt_geometry())
    fr = jax.tree_util.tree_map(jax.device_put, scene.rt_frame())

    @jax.jit
    def render(fr):
        rt = prepare_rt_scene(geom, fr)
        return whitted_render(rt, width, height, scene.fovy, make_key(0),
                              spp=16, max_depth=scene.max_depth)

    txt = render.lower(fr).compile().as_text()
    path = "/tmp/whitted_opt.hlo"
    with open(path, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {path}")

    # print the call line of each requested fusion (shows operands +
    # metadata source line) plus its computation name
    for nm in names:
        pat = re.compile(rf"^\s*.*{re.escape(nm)} = .*$", re.M)
        for m in pat.finditer(txt):
            line = m.group(0)
            print("=" * 70)
            print(line[:2000])


if __name__ == "__main__":
    main()
