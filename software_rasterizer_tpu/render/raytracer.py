"""RayTracing pipeline (reference: src/RayTracing.cpp).

draw(): updatePosition analog (device transform via prepare_rt_scene) then
the wavefront Whitted integrator over the full framebuffer.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np

from software_rasterizer_tpu.models.scene import Scene
from software_rasterizer_tpu.ops.intersect import prepare_rt_scene
from software_rasterizer_tpu.ops.whitted import whitted_render
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
        for scene in self.scenes.values():
            geom = self._geometry(scene)
            frame = scene.rt_frame()
            rt = prepare_rt_scene(geom, frame)
            self.key, sub = jax.random.split(self.key)
            img = whitted_render(
                rt, self.width, self.height, scene.fovy, sub,
                spp=self.spp, max_depth=scene.max_depth,
                block=self.block, chunk=self.chunk,
            )
            self.frame = np.array(img)  # writable copy (clear() mutates)
