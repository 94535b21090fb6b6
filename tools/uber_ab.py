"""A/B the whitted über-kernel vs the wavefront on the real chip:
the bench demo frame at 1024^2, spp=16, chained-repetition timing
(the only trustworthy modality on this platform, PERFORMANCE.md).

Usage: python tools/uber_ab.py [width] [reps]
"""
import sys, time, functools
sys.path.insert(0, ".")
sys.path.insert(0, "examples")
import jax, jax.numpy as jnp, numpy as np
from whitted_demo import build_scene, set_frame_matrices
from software_rasterizer_tpu.ops.intersect import prepare_rt_scene
from software_rasterizer_tpu.ops.whitted import whitted_render
from software_rasterizer_tpu.utils.rng import make_key

W = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
scene = build_scene(); set_frame_matrices(scene, 0.0); scene.set_ndc_matrix(W, W)
geom = jax.tree_util.tree_map(jax.device_put, scene.rt_geometry())
frame = jax.tree_util.tree_map(jax.device_put, scene.rt_frame())

def chain(uber):
    @jax.jit
    def run(fr):
        def body(carry, _):
            fr2 = fr._replace(mvp=fr.mvp + carry)
            rt = prepare_rt_scene(geom, fr2)
            img, st = whitted_render(rt, W, W, scene.fovy, make_key(0), spp=16,
                                     max_depth=scene.max_depth, with_stats=True,
                                     uber=uber)
            return img[0,0,0]*0.0, (img[0,0,0], st["dropped_rays"],
                                    st["rays_main"], st["rays_shadow"])
        _, ch = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(REPS))
        return ch
    return run

for name, ub in (("uber", True), ("wavefront", False)):
    run = chain(ub)
    t0 = time.time(); out = run(frame); v = np.asarray(out[0]); compile_s = time.time()-t0
    walls = []
    for _ in range(3):
        t0 = time.time(); np.asarray(run(frame)[0]); walls.append(time.time()-t0)
    per = min(walls)/REPS
    print(f"{name}: {per*1e3:.2f} ms/frame (compile {compile_s:.1f}s) "
          f"dropped={int(np.asarray(out[1]).sum())} "
          f"rays_main={int(np.asarray(out[2])[0])} rays_shadow={int(np.asarray(out[3])[0])}",
          flush=True)
