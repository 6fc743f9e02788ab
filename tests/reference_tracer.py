"""Scalar numpy reference path tracer — the independent test oracle.

A straightforward per-ray loop transcription of the estimator semantics in
SURVEY §3.4 (``pathTraceKernel`` and its device library,
``/root/reference/CudaTracer/CudaTracer.cu:106-585``), written against plain
numpy with *pre-drawn* uniforms. Feeding it the same threefry uniform blocks
the JAX wavefront consumes makes the two implementations comparable
ray-for-ray, which pins down the masked-wavefront logic (where-cascades,
active masking, Beer-Lambert ordering) far more tightly than statistical
tests can.
"""
from __future__ import annotations

import math

import numpy as np

RAY_BUMP_EPSILON = 1e-4
INV_PI = 0.31830988618


def _normalize(v):
    return v / max(np.linalg.norm(v), 1e-20)


class SceneView:
    """Numpy view of a device Scene pytree."""

    def __init__(self, scene):
        g = lambda v: np.stack([np.asarray(v.x), np.asarray(v.y), np.asarray(v.z)], -1)
        self.sph_c = g(scene.sph_center)
        self.sph_r = np.asarray(scene.sph_radius)
        self.sph_m = np.asarray(scene.sph_mat)
        self.tri_v0, self.tri_v1, self.tri_v2 = g(scene.tri_v0), g(scene.tri_v1), g(scene.tri_v2)
        self.tri_n0, self.tri_n1, self.tri_n2 = g(scene.tri_n0), g(scene.tri_n1), g(scene.tri_n2)
        self.tri_m = np.asarray(scene.tri_mat)
        m = scene.materials
        self.diffuse, self.specular = g(m.diffuse), g(m.specular)
        self.absorption, self.emission = g(m.absorption), g(m.emission)
        self.spec_exp, self.ior = np.asarray(m.spec_exp), np.asarray(m.ior)
        self.diff_avg, self.spec_avg = np.asarray(m.diff_avg), np.asarray(m.spec_avg)
        self.refr_avg, self.roughness = np.asarray(m.refr_avg), np.asarray(m.roughness)
        self.flags = np.asarray(m.flags)
        self.pl_pos, self.pl_power = g(scene.pl_pos), g(scene.pl_power)
        self.al_power = g(scene.al_power)
        self.al_tri0 = np.asarray(scene.al_tri0)
        self.background = np.array([float(scene.background.x),
                                    float(scene.background.y),
                                    float(scene.background.z)])


def intersect_sphere(o, d, c, r, max_t):
    v = o - c
    b = 2.0 * np.dot(d, v)
    cc = np.dot(v, v) - r * r
    disc = b * b - 4 * cc
    if disc < 0:
        return None
    sq = math.sqrt(disc)
    t0, t1 = (-b - sq) / 2, (-b + sq) / 2
    t = t1 if t0 < 0 else t0
    if t < 0 or t > max_t:
        return None
    return t


def intersect_triangle(o, d, v0, v1, v2, max_t):
    e1, e2 = v1 - v0, v2 - v0
    q = np.cross(d, e2)
    det = np.dot(e1, q)
    if abs(det) <= 1e-7:
        return None
    inv = 1.0 / det
    s = o - v0
    r = np.cross(s, e1)
    t = np.dot(e2, r) * inv
    if t <= 0 or t > max_t:
        return None
    w1 = np.dot(s, q) * inv
    w2 = np.dot(d, r) * inv
    w0 = 1.0 - w1 - w2
    if w0 < 0 or w1 < 0 or w2 < 0:
        return None
    return t, w0, w1, w2


def nearest_hit(sv: SceneView, o, d):
    best_t, kind, idx, bary = math.inf, None, -1, None
    for i in range(len(sv.sph_r)):
        t = intersect_sphere(o, d, sv.sph_c[i], sv.sph_r[i], best_t)
        if t is not None:
            best_t, kind, idx = t, "sphere", i
    for i in range(len(sv.tri_m)):
        res = intersect_triangle(o, d, sv.tri_v0[i], sv.tri_v1[i], sv.tri_v2[i], best_t)
        if res is not None:
            best_t, kind, idx, bary = res[0], "tri", i, res[1:]
    if kind is None:
        return None
    point = o + d * best_t
    if kind == "sphere":
        normal = _normalize(point - sv.sph_c[idx])
        mat = sv.sph_m[idx]
    else:
        w0, w1, w2 = bary
        normal = sv.tri_n0[idx] * w0 + sv.tri_n1[idx] * w1 + sv.tri_n2[idx] * w2
        mat = sv.tri_m[idx]
    return best_t, point, normal, mat


def occluded(sv, o, d, max_dist):
    for i in range(len(sv.sph_r)):
        if intersect_sphere(o, d, sv.sph_c[i], sv.sph_r[i], max_dist) is not None:
            return True
    for i in range(len(sv.tri_m)):
        if intersect_triangle(o, d, sv.tri_v0[i], sv.tri_v1[i], sv.tri_v2[i], max_dist) is not None:
            return True
    return False


def rotate_y_to(target, sample):
    w = 1.0 + target[1]
    r = np.array([target[2], 0.0, -target[0]])
    n2 = w * w + np.dot(r, r)
    if n2 < 1e-12:
        return np.array([sample[0], -sample[1], -sample[2]])
    inv = 1.0 / math.sqrt(n2)
    w, r = w * inv, r * inv
    t = np.cross(r, sample) + sample * w
    return sample + 2.0 * np.cross(r, t)


def lambert_dir(normal, u_theta, u_s):
    theta = u_theta * 2 * math.pi
    y = math.sqrt(u_s)
    r = math.sqrt(max(1 - y * y, 0.0))
    return rotate_y_to(normal, np.array([r * math.cos(theta), y, r * math.sin(theta)]))


def phong_dir(axis, exponent, u_theta, u_s):
    if not math.isfinite(exponent):
        return axis
    theta = u_theta * 2 * math.pi
    y = max(u_s, 1e-12) ** (1.0 / (exponent + 1.0))
    r = math.sqrt(max(1 - y * y, 0.0))
    return rotate_y_to(axis, np.array([r * math.cos(theta), y, r * math.sin(theta)]))


def beckmann_dir(normal, roughness, u1, u2):
    u1 = min(u1, 1 - 1e-7)
    theta = math.atan(-(roughness ** 2) * math.log1p(-u1))
    phi = u2 * 2 * math.pi
    m = np.array([math.sin(theta) * math.cos(phi), math.cos(theta),
                  math.sin(theta) * math.sin(phi)])
    return rotate_y_to(normal, m)


def shade(sv, point, normal, diffuse, diff_avg, uniforms, ucol):
    radiance = np.zeros(3)
    for i in range(len(sv.pl_pos)):
        radiance += _one_light(sv, point, normal, diffuse, diff_avg, sv.pl_pos[i], sv.pl_power[i])
    for li in range(len(sv.al_tri0)):
        u1, u2, u3, upick = (uniforms[3 + 4 * li + k][ucol] for k in range(4))
        inv_total = 1.0 / max(u1 + u2 + u3, 1e-12)
        w = np.array([u1, u2, u3]) * inv_total
        tri = sv.al_tri0[li] if upick > 0.5 else sv.al_tri0[li] + 1
        lp = sv.tri_v0[tri] * w[0] + sv.tri_v1[tri] * w[1] + sv.tri_v2[tri] * w[2]
        radiance += _one_light(sv, point, normal, diffuse, diff_avg, lp, sv.al_power[li])
    return radiance


def _one_light(sv, point, normal, diffuse, diff_avg, light_pos, power):
    offset = light_pos - point
    d2 = np.dot(offset, offset)
    dist = math.sqrt(max(d2, 1e-12))
    w_i = offset / dist
    if occluded(sv, point + RAY_BUMP_EPSILON * normal, w_i, dist - 2 * RAY_BUMP_EPSILON):
        return np.zeros(3)
    l_i = power / (4 * math.pi * max(d2, 1e-12))
    cos_l = max(0.0, np.dot(normal, w_i))
    return cos_l * l_i * diffuse * diff_avg * INV_PI


def trace_one(sv: SceneView, origin, direction, uniform_blocks, max_bounces, col):
    """Trace one ray; uniform_blocks[b] is the [U, N] block for bounce b and
    ``col`` selects this ray's column."""
    o, d = origin.copy(), direction.copy()
    rad0, rad1 = np.zeros(3), np.ones(3)
    for b in range(max_bounces):
        u = uniform_blocks[b]
        h = nearest_hit(sv, o, d)
        if h is None:
            rad0 += sv.background * rad1
            break
        t, point, normal, mat = h
        cos_i = np.dot(-d, normal)
        inside = cos_i <= 0
        direct = sv.emission[mat].copy()
        if not inside:
            direct += shade(sv, point, normal, sv.diffuse[mat], sv.diff_avg[mat], u, col)

        # scatter
        last = b == max_bounces - 1
        alive = True
        if last:
            indirect = np.ones(3)
        else:
            indirect, o, d, alive = scatter_one(
                sv, o, d, point, normal, mat, cos_i,
                u[0][col], u[1][col], u[2][col])
        if inside:
            rad1 = rad1 * np.exp(-t * sv.absorption[mat])
        rad0 += rad1 * direct
        rad1 = rad1 * indirect
        if not alive or last:
            break
    return rad0


def scatter_one(sv, o, d, point, normal, mat, cos_i, u_branch, u_a, u_b):
    ior = sv.ior[mat]
    outside = cos_i > 0
    n1, n2 = (1.0, ior) if outside else (ior, 1.0)
    cos_pos = abs(cos_i)
    n = n1 / n2
    sin_t2 = n * n * (1 - cos_pos * cos_pos)
    if sin_t2 > 1:
        fres = 1.0
    else:
        cos_t = math.sqrt(1 - sin_t2)
        r_s = (n1 * cos_pos - n2 * cos_t) / (n1 * cos_pos + n2 * cos_t)
        r_p = (n2 * cos_pos - n1 * cos_t) / (n2 * cos_pos + n1 * cos_t)
        fres = (r_s * r_s + r_p * r_p) / 2

    r = u_branch
    if sv.diff_avg[mat] > 0:
        r -= sv.diff_avg[mat]
        if r < 0:
            return (sv.diffuse[mat],
                    point + RAY_BUMP_EPSILON * normal,
                    lambert_dir(normal, u_a, u_b), True)
    if sv.spec_avg[mat] > 0:
        r -= sv.spec_avg[mat] * (1.0 if (sv.flags[mat] & 1) else fres)
        if r < 0:
            if sv.flags[mat] & 3:
                mn = beckmann_dir(normal, sv.roughness[mat], u_a, u_b)
                cos_m = abs(np.dot(d, mn))
                w_o = d + 2 * cos_m * mn
                half = _normalize(w_o - d)
                nh, nl = abs(np.dot(normal, half)), abs(np.dot(normal, w_o))
                vh = max(abs(np.dot(d, half)), 1e-12)
                nv = max(abs(cos_i), 1e-6)
                geometric = min(1.0, 2 * nh * nl / vh, 2 * nh * nv / vh)
                return (sv.specular[mat] * geometric / nv,
                        point + RAY_BUMP_EPSILON * mn, w_o, True)
            # reference quirk: cosI was flipped positive before reflRay
            # (CudaTracer.cu:238/484), so inside hits reflect with +|cosI|
            w_o = d + 2 * cos_pos * normal
            new_d = phong_dir(w_o, sv.spec_exp[mat], u_a, u_b)
            return (sv.specular[mat], point + RAY_BUMP_EPSILON * normal, new_d, True)
    if sv.refr_avg[mat] > 0:
        r -= sv.refr_avg[mat] * (1 - fres)
        if r < 0:
            if sin_t2 > 1:
                return np.ones(3), o, d, False
            cos_t = math.sqrt(1 - sin_t2)
            w_o = _normalize(n * d + (n * cos_pos - cos_t) * normal)
            return np.ones(3), point + RAY_BUMP_EPSILON * w_o, w_o, True
    return np.zeros(3), o, d, False
