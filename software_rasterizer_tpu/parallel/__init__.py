"""Multi-device / multi-host parallelism (NEW vs the reference, which is
single-process TBB only — SURVEY.md 2.9: the renderer's parallel axes are
sample-parallelism (spp, the renderer's "data parallel") and screen-tile
parallelism (the renderer's "spatial/context parallel"))."""

from software_rasterizer_tpu.parallel.mesh import RenderMesh, make_render_mesh
from software_rasterizer_tpu.parallel.render import (
    sharded_path_render,
    sharded_raster_render,
    sharded_whitted_render,
    sharded_whitted_render_exact,
)

__all__ = [
    "RenderMesh",
    "make_render_mesh",
    "sharded_path_render",
    "sharded_raster_render",
    "sharded_whitted_render",
    "sharded_whitted_render_exact",
]
