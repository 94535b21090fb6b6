"""Monte-Carlo sampling primitives (reference: Material.cpp:14-47,
Scene.cpp:398-476, Triangle.cpp:187-213, Sphere.cpp:156-183).

All samplers take explicit jax PRNG keys — counter-based per
(pixel, sample, bounce), replacing the reference's SHARED UNLOCKED
mt19937 (Tools.cpp:295-300, a data race; SURVEY.md 3.4) with
device-count-invariant determinism.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from software_rasterizer_tpu.ops import optics

PI = jnp.float32(jnp.pi)
INV_PI = jnp.float32(1.0 / jnp.pi)
UNIFORM_HEMI_PDF = jnp.float32(0.5 / jnp.pi)  # Material.hpp uniform_sampling_on_sphere


def sample_uniform_hemisphere(key, n):
    """Material::sample for DIFFUSE_AND_GLOSSY (Material.cpp:14-34):
    z = |1-2*x1|, r = sqrt(1-z^2), phi = 2*pi*x2, mapped by toWorld(N).

    n: (...,3) normals. Returns wi (...,3) (NOT normalized by the
    reference either before toWorld; frame is orthonormal so it is unit).
    """
    shape = n.shape[:-1]
    k1, k2 = jax.random.split(key)
    x1 = jax.random.uniform(k1, shape)
    x2 = jax.random.uniform(k2, shape)
    z = jnp.abs(1.0 - 2.0 * x1)
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * PI * x2
    local = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
    return optics.to_world(local, n)


def hemisphere_pdf(wi, n):
    """Material::pdf (Material.cpp:41-47): 1/2pi if wi.N > 0 else 0."""
    return jnp.where(jnp.sum(wi * n, axis=-1) > 0, UNIFORM_HEMI_PDF, 0.0)


def fr_diffuse(kd, wi, n):
    """Material::fr_contribution (Material.cpp:53-63): Kd/pi if wi.N>0."""
    return jnp.where(
        (jnp.sum(wi * n, axis=-1) > 0)[..., None], kd * INV_PI, 0.0
    )


def sample_unit_sphere(key, shape):
    """glm::sphericalRand(1.0): uniform direction on the unit sphere."""
    v = jax.random.normal(key, shape + (3,))
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)


def pick_emissive_object(scene, key, n: int):
    """Uniformly pick one emissive object per lane (Scene.cpp:416-418).
    Returns (center (N,3), radius (N,), any_emitter scalar bool)."""
    from software_rasterizer_tpu.ops.intersect import _onehot_rows

    n_emissive = scene.n_emitters
    u = jax.random.uniform(key, (n,))
    k = jnp.floor(u * jnp.maximum(n_emissive, 1).astype(jnp.float32)).astype(jnp.int32)
    k = jnp.minimum(k, jnp.maximum(n_emissive - 1, 0))
    cr = _onehot_rows(k, scene.emitter_cr)   # gather-free emitter pick
    return cr[:, 0:3], cr[:, 3], n_emissive > 0


def sample_light_dir(scene, key, p):
    """Scene::sampleLight (Scene.cpp:429-476): bounding-sphere direction
    sampling with the hemisphere flip + 1e-6 perturbation.

    p: (N,3) shading points. Returns (light_dir (N,3), pdf (N,)).
    pdf = cos(theta)/(2 pi) with theta against the baseline direction.
    """
    n = p.shape[0]
    k_pick, k_dir, k_pert = jax.random.split(key, 3)
    center, radius, any_e = pick_emissive_object(scene, k_pick, n)
    baseline = optics.normalize(center - p)
    s = sample_unit_sphere(k_dir, (n,))
    s = jnp.where(jnp.sum(s * baseline, axis=-1, keepdims=True) < 0, -s, s)
    pert = sample_unit_sphere(k_pert, (n,)) * 1e-6
    s = optics.normalize(s + pert)
    sample_pos = center + s * radius[:, None]
    light_dir = optics.normalize(sample_pos - p)
    cos_t = jnp.sum(light_dir * baseline, axis=-1)
    pdf = UNIFORM_HEMI_PDF * cos_t
    pdf = jnp.where(any_e, pdf, 0.0)
    return light_dir, pdf
