"""RayTracing pipeline (reference: src/RayTracing.cpp).

draw(): updatePosition analog (device transform via prepare_rt_scene) then
the wavefront Whitted integrator over the full framebuffer. Queue
overflow is HANDLED, not just counted: frames whose specular child
queues overflowed re-trace the affected pixels at lossless capacity
(ops/whitted.whitted_render_exact), and the per-frame integrator stats
(dropped_rays before the fixup, rays_main, rays_shadow) are surfaced on
`self.last_stats`.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np

from software_rasterizer_tpu.models.scene import Scene
from software_rasterizer_tpu.ops.intersect import prepare_rt_scene
from software_rasterizer_tpu.ops.whitted import whitted_render_exact
from software_rasterizer_tpu.render.pipeline import Primitive, RenderingPipeline
from software_rasterizer_tpu.utils.rng import make_key


class RayTracing(RenderingPipeline):
    def __init__(self, width: int, height: int, spp: int = 1, max_depth: int = 5,
                 block: int = 8192, chunk: int = 512, seed: int = 0):
        super().__init__(width, height)
        self.spp = spp
        self.max_depth = max_depth
        self.block = block
        self.chunk = chunk
        self.key = make_key(seed)
        self._geom_cache: Dict[str, object] = {}
        #: per-scene integrator stats of the last draw() —
        #: {scene_name: {"dropped_rays": int (pass-1 count; the exact
        #:  second pass re-renders those pixels), "rays_main": int,
        #:  "rays_shadow": int}}
        self.last_stats: Optional[Dict[str, dict]] = None

    def set_spp(self, spp: int):
        self.spp = spp

    def _geometry(self, scene: Scene):
        g = self._geom_cache.get(scene.name)
        if g is None:
            g = scene.rt_geometry()
            g = jax.tree_util.tree_map(jax.device_put, g)
            self._geom_cache[scene.name] = g
        return g

    def invalidate(self, scene_name=None):
        if scene_name is None:
            self._geom_cache.clear()
        else:
            self._geom_cache.pop(scene_name, None)

    def draw(self, primitive: Primitive = Primitive.TRIANGLES):
        if primitive not in (Primitive.LINES, Primitive.TRIANGLES):
            raise ValueError("Primitive Type is not supported!")
        self.last_stats = {}
        for scene in self.scenes.values():
            geom = self._geometry(scene)
            frame = scene.rt_frame()
            rt = prepare_rt_scene(geom, frame)
            self.key, sub = jax.random.split(self.key)
            img, stats = whitted_render_exact(
                rt, self.width, self.height, scene.fovy, sub,
                spp=self.spp, max_depth=scene.max_depth,
                block=self.block, chunk=self.chunk, return_stats=True,
            )
            self.last_stats[scene.name] = {
                k: int(stats[k])
                for k in ("dropped_rays", "rays_main", "rays_shadow")
            }
            self.frame = np.array(img)  # writable copy (clear() mutates)
