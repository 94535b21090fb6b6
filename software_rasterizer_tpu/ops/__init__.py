"""Device compute: raster/intersect/BVH kernels, shaders, integrators.

Everything here is pure jnp / Pallas over flattened scene arrays —
recursion becomes `lax.scan` wavefronts, SIMD lanes become VPU lanes,
TBB tiles become sharded framebuffer tiles (SURVEY.md section 2.9).
"""
