"""Scalar oracle of the reference Whitted integrator
(Scene::whittedRayTracing, Scene.cpp:478-617), literal recursion in
double precision over a numpy-fied RTScene. With a single emissive
object the integrator is fully deterministic, so the wavefront version
must match to fp tolerance."""

from __future__ import annotations

import numpy as np

EPS = 1e-5
BIG = 1e30


def trace(s, o, d):
    """Scene::traceScene over triangles AND spheres."""
    best = None
    # triangles (Moller-Trumbore, Triangle.cpp:104-145)
    v0, v1, v2 = s["v0"], s["v1"], s["v2"]
    e1 = v1 - v0
    e2 = v2 - v0
    p = np.cross(d[None], e2)
    det = np.sum(e1 * p, axis=-1)
    tvec = o[None] - v0
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / det
        u = np.sum(tvec * p, axis=-1) * inv
        q = np.cross(tvec, e1)
        v = np.sum(d[None] * q, axis=-1) * inv
        t = np.sum(e2 * q, axis=-1) * inv
    ok = ((np.abs(det) >= 1e-6) & (u >= 0) & (u <= 1) & (v >= 0)
          & (u + v <= 1) & (t >= 1e-6) & s["tri_valid"])
    t = np.where(ok, t, BIG)
    i = int(np.argmin(t))
    if t[i] < BIG:
        w = 1.0 - u[i] - v[i]
        nrm = w * s["n0"][i] + u[i] * s["n1"][i] + v[i] * s["n2"][i]
        nrm = nrm / np.linalg.norm(nrm)
        mat = int(s["tri_mat"][i])
        uvi = (w * s["uv0"][i] + u[i] * s["uv1"][i] + v[i] * s["uv2"][i])
        tex = int(s["tri_tex"][i])
        if tex >= 0:
            tw, th = s["tex_wh"][tex]
            ui = min(int(np.clip(uvi[0], 0, 1) * tw), tw - 1)
            vi = min(int(np.clip(uvi[1], 0, 1) * th), th - 1)
            oob = (int(np.clip(uvi[0], 0, 1) * tw) >= tw
                   or int(np.clip(uvi[1], 0, 1) * th) >= th)
            texel = s["textures"][tex, vi, ui]
            if texel.dtype == np.uint8:
                texel = texel.astype(np.float64) / 255.0
            color = np.zeros(3) if oob else texel
        else:
            color = s["mat_kd"][mat]
        best = {"t": t[i], "coords": o + d * t[i], "normal": nrm,
                "color": np.asarray(color, np.float64),
                "emit": s["mat_emit"][mat], "mat": mat}
    # spheres (Sphere.cpp:106-146)
    for si in range(s["sph_c"].shape[0]):
        if not s["sph_valid"][si]:
            continue
        c, r = s["sph_c"][si], s["sph_r"][si]
        l = o - c
        a = d @ d
        b = 2 * d @ l
        cc = l @ l - r * r
        disc = b * b - 4 * a * cc
        if disc < 0:
            continue
        sq = np.sqrt(disc)
        qq = -0.5 * (b + (sq if b >= 0 else -sq))
        x0, x1 = qq / a, (cc / qq if qq != 0 else BIG)
        if x0 > x1:
            x0, x1 = x1, x0
        tt = x0 if x0 > 0 else x1
        if tt <= 0:
            continue
        if best is None or tt < best["t"]:
            coords = o + d * tt
            nrm = (coords - c) / np.linalg.norm(coords - c)
            mat = int(s["sph_mat"][si])
            best = {"t": tt, "coords": coords, "normal": nrm,
                    "color": np.zeros(3), "emit": s["mat_emit"][mat],
                    "mat": mat}
    return best


def sample_light_on_center(s, p):
    """sampleLightOnCenter (Scene.cpp:398-427) — deterministic with one
    emitter: direction to its bbox-sphere center."""
    centers = s["emitter_center"][s["emitter_mask"]]
    if len(centers) == 0:
        return None
    c = centers[0]
    return (c - p) / np.linalg.norm(c - p)


def whitted(s, o, d, depth=0, max_depth=5):
    d = d / np.linalg.norm(d)
    if depth > max_depth:
        return np.zeros(3)
    hit = trace(s, o, d)
    if hit is None:
        return s["background"].astype(np.float64)
    n = hit["normal"] / np.linalg.norm(hit["normal"])
    p = hit["coords"]
    mat = hit["mat"]
    mtype = int(s["mat_type"][mat])
    ior = float(s["mat_ior"][mat])

    if mtype == 0:  # DIFFUSE_AND_GLOSSY: sampled Phong (spp=1 -> one term)
        l = sample_light_on_center(s, p)
        if l is None:
            return np.zeros(3)
        # same scale-aware normal bias as ops/whitted.py SHADOW_BIAS
        # (the f64 reference needs none; our f32 hit points do)
        side = 1.0 if (n @ l) >= 0.0 else -1.0
        p_off = p + n * (1e-4 * max(1.0, float(np.max(np.abs(p)))) * side)
        shadow = trace(s, p_off, l)
        if shadow is None or np.linalg.norm(shadow["emit"]) < EPS:
            return np.zeros(3)
        diff = max(0.0, n @ l)
        refl = -l - 2 * (-l @ n) * n
        refl = refl / np.linalg.norm(refl)
        spec = max(0.0, -(d @ refl)) ** float(s["mat_spec"][mat])
        dist2 = np.sum((p_off - shadow["coords"]) ** 2)
        is_shadow = abs(shadow["t"] ** 2 - dist2) > 1e-6
        emit = shadow["emit"]
        ambient = np.zeros(3) if is_shadow else emit
        diffuse = np.zeros(3) if is_shadow else diff * emit
        specular = spec * emit
        return (ambient * s["mat_ka"][mat] + hit["color"] * diffuse
                + specular * s["mat_ks"][mat])

    def _refract(i, nn, ior_):
        cosi = np.clip(i @ nn, -1, 1)
        etai, etat, nref = 1.0, ior_, nn
        if cosi < 0:
            cosi = -cosi
        else:
            etai, etat = etat, etai
            nref = -nn
        eta = etai / etat
        k = 1 - eta * eta * (1 - cosi * cosi)
        return np.zeros(3) if k < 0 else eta * i + (eta * cosi - np.sqrt(k)) * nref

    def _fresnel(i, nn, ior_):
        cosi = np.clip(i @ nn, -1, 1)
        etai, etat = 1.0, ior_
        if cosi > 0:
            etai, etat = etat, etai
        sint = etai / etat * np.sqrt(max(0.0, 1 - cosi * cosi))
        if sint >= 1:
            return 1.0
        cost = np.sqrt(max(0.0, 1 - sint * sint))
        ci = abs(cosi)
        rs = (etat * ci - etai * cost) / (etat * ci + etai * cost)
        rp = (etai * ci - etat * cost) / (etai * ci + etat * cost)
        return (rs * rs + rp * rp) / 2

    if mtype == 1:  # REFLECTION_AND_REFRACTION
        kr = np.clip(_fresnel(d, n, ior), 0.0, 1.0)
        refl_dir = d - 2 * (d @ n) * n
        refl_dir /= np.linalg.norm(refl_dir)
        refr_dir = _refract(d, n, ior)
        refl_off = n * EPS if (d @ n) < 0 else -n * EPS
        refr_off = n * EPS if (d @ n) > 0 else -n * EPS
        refl_col = whitted(s, p + refl_off, refl_dir, depth + 1, max_depth)
        refr_col = np.zeros(3)
        if np.linalg.norm(refr_dir) > 1e-6 and abs(kr - 1.0) > 1e-6:
            refr_col = whitted(s, p + refr_off,
                               refr_dir / np.linalg.norm(refr_dir),
                               depth + 1, max_depth)
        return refl_col * kr + refr_col * (1.0 - kr)

    # REFLECTION
    refl_dir = d - 2 * (d @ n) * n
    refl_dir /= np.linalg.norm(refl_dir)
    off = n * EPS if (refl_dir @ n) > 0 else -n * EPS
    return whitted(s, p + off, refl_dir, depth + 1, max_depth)
