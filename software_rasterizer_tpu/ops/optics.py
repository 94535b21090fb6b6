"""Geometric optics helpers (reference: src/Tools.cpp).

reflect / refract / fresnel / toWorld as jnp functions over batched
vectors, matching the reference formulas exactly (Tools.cpp:250-327).
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize(v, eps: float = 0.0):
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return jnp.where(n > eps, v / jnp.where(n > 0, n, 1.0), 0.0)


def reflect(i, n):
    """Tools::reflect (Tools.cpp:250-253): I - 2(I.N)N."""
    return i - 2.0 * jnp.sum(i * n, axis=-1, keepdims=True) * n


def refract(i, n, ior):
    """Tools::refract (Tools.cpp:255-269). Returns 0-vector on total
    internal reflection (matching the reference's k<0 branch).

    i: (...,3); n: (...,3); ior: (...,) or scalar.
    """
    cosi = jnp.clip(jnp.sum(i * n, axis=-1), -1.0, 1.0)
    ior = jnp.broadcast_to(jnp.asarray(ior, i.dtype), cosi.shape)
    entering = cosi < 0
    etai = jnp.where(entering, 1.0, ior)
    etat = jnp.where(entering, ior, 1.0)
    nn = jnp.where(entering[..., None], n, -n)
    ci = jnp.abs(cosi)
    eta = etai / etat
    k = 1.0 - eta * eta * (1.0 - ci * ci)
    out = eta[..., None] * i + (eta * ci - jnp.sqrt(jnp.maximum(k, 0.0)))[..., None] * nn
    return jnp.where((k < 0)[..., None], 0.0, out)


def fresnel(i, n, ior):
    """Tools::fresnel (Tools.cpp:271-293): unpolarized Fresnel reflectance,
    1.0 on total internal reflection."""
    cosi = jnp.clip(jnp.sum(i * n, axis=-1), -1.0, 1.0)
    ior = jnp.broadcast_to(jnp.asarray(ior, i.dtype), cosi.shape)
    exiting = cosi > 0
    etai = jnp.where(exiting, ior, 1.0)
    etat = jnp.where(exiting, 1.0, ior)
    sint = etai / etat * jnp.sqrt(jnp.maximum(0.0, 1.0 - cosi * cosi))
    tir = sint >= 1.0
    cost = jnp.sqrt(jnp.maximum(0.0, 1.0 - sint * sint))
    ci = jnp.abs(cosi)
    rs = (etat * ci - etai * cost) / (etat * ci + etai * cost)
    rp = (etai * ci - etat * cost) / (etai * ci + etat * cost)
    return jnp.where(tir, 1.0, (rs * rs + rp * rp) / 2.0)


def to_world(local, n):
    """Tools::toWorld (Tools.cpp:315-327): tangent-frame transform
    worldRay = x*B + y*C + z*N with the reference's branch on |N.x|>|N.y|."""
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    use_x = jnp.abs(nx) > jnp.abs(ny)
    inv_a = 1.0 / jnp.sqrt(jnp.maximum(nx * nx + nz * nz, 1e-30))
    c_a = jnp.stack([nz * inv_a, jnp.zeros_like(nx), -nx * inv_a], axis=-1)
    inv_b = 1.0 / jnp.sqrt(jnp.maximum(ny * ny + nz * nz, 1e-30))
    c_b = jnp.stack([jnp.zeros_like(nx), nz * inv_b, -ny * inv_b], axis=-1)
    c = jnp.where(use_x[..., None], c_a, c_b)
    b = jnp.cross(c, n)
    return (
        local[..., 0:1] * b + local[..., 1:2] * c + local[..., 2:3] * n
    )
