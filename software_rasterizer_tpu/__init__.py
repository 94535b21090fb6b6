"""software_rasterizer_tpu — a TPU-native rendering framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of the
reference CPU renderer "SoftRasterizer" (C++17, AVX2+TBB):

  * traditional triangle rasterization (vertex transform, barycentric
    coverage, z-buffer, 5 fragment-shader types),
  * Whitted-style recursive ray tracing (Moller-Trumbore + BVH,
    Phong direct lighting, Fresnel reflect/refract),
  * Monte Carlo path tracing (NEE + uniform-hemisphere indirect with
    Russian-roulette termination),

re-designed TPU-first: scenes are SoA pytrees of device arrays, integrators
are wavefront loops (`lax.scan`) instead of recursion, hot loops are fused
Pallas kernels on (8,128)-aligned screen tiles, and scaling axes
(framebuffer tiles, samples-per-pixel) shard over a `jax.sharding.Mesh`.

Layout:
  models/    scene data model: meshes, spheres, materials, lights, Scene
  ops/       device kernels: raster, intersect, BVH, shading, integrators
  parallel/  device-mesh sharding, multi-host render, checkpointing
  render/    user-facing pipelines (Rasterizer / RayTracing / PathTracing)
  utils/     host-side: transforms, OBJ/MTL/texture loaders, image IO
"""

__version__ = "0.1.0"

import os as _os

# TPU compiles of the deeply-scanned integrators are expensive (minutes);
# the persistent cache makes every process after the first start in
# seconds. The env var alone is NOT enough in this environment — the
# site initialization imports jax before any user package, so jax's
# env-derived config is already frozen; set the config directly.
# Opt out by setting SRT_NO_COMPILATION_CACHE.
if not _os.environ.get("SRT_NO_COMPILATION_CACHE"):
    _cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", _os.path.expanduser("~/.cache/srtpu_jax")
    )
    try:
        import jax as _jax

        if _jax.config.jax_compilation_cache_dir is None:
            _jax.config.update("jax_compilation_cache_dir", _cache_dir)
            _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
            _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # never let cache config break imports
        pass

from software_rasterizer_tpu.config import RenderConfig  # noqa: F401
