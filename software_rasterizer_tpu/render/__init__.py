"""User-facing render pipelines (reference: include/base/Render.hpp,
include/render/{Rasterizer,RayTracing,PathTracing}.hpp)."""

from software_rasterizer_tpu.render.pipeline import (  # noqa: F401
    Buffers,
    Primitive,
    RenderingPipeline,
    pipeline_from_config,
)
from software_rasterizer_tpu.render.pathtracer import PathTracing  # noqa: F401
from software_rasterizer_tpu.render.rasterizer import TraditionalRasterizer  # noqa: F401
from software_rasterizer_tpu.render.raytracer import RayTracing  # noqa: F401
