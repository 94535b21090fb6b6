"""Camera ray generation (reference: RayTracing.cpp:52-58).

Quirk preserved: rays aim at the plane z=0 — dir = normalize((x,y,0)-eye)
with x/y from the fov/aspect mapping, fovy converted with glm::radians
here (unlike the raster projection path).
"""

from __future__ import annotations

import jax.numpy as jnp


def camera_rays(eye, fovy_deg: float, width: int, height: int):
    """Returns (origins (N,3), dirs (N,3)) in row-major pixel order."""
    import jax

    scale = jnp.tan(jnp.radians(jnp.float32(fovy_deg) * 0.5))
    aspect = width / float(height)
    yy = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    x = (2.0 * (xx + 0.5) / width - 1.0) * aspect * scale
    y = (1.0 - 2.0 * (yy + 0.5) / height) * scale
    target = jnp.stack([x, y, jnp.zeros_like(x)], axis=-1).reshape(-1, 3)
    eye = jnp.asarray(eye, jnp.float32)
    d = target - eye
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(eye, d.shape)
    return o, d
