"""Next-event estimation (direct lighting).

Behavioral spec: ``CudaTracer/CudaTracer.cu:345-455`` (``shade``,
``getAreaLightPoint``, ``lineOfSight``). Deliberately replicated estimator
quirks (see SURVEY §3.4): area lights use the point-light ``power/(4 pi d^2)``
falloff with no light-side cosine or area pdf; only the diffuse lobe receives
NEE; area-light points are drawn with the reference's center-biased
3-normalized-uniforms scheme (``CudaTracer.cu:399-404``) and a 50/50 pick
between the light's two triangles.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..constants import INV_PI, RAY_BUMP_EPSILON
from .intersect import any_hit
from .vec import Vec3

_EPS = 1e-12

# RNG rows consumed per area light: 3 barycentric + 1 triangle pick.
UNIFORMS_PER_AREA_LIGHT = 4


def _light_contribution(scene, point: Vec3, normal: Vec3, diffuse: Vec3,
                        diff_avg, light_point: Vec3, power: Vec3, grid=None,
                        grid_diff: bool = True):
    """Shared shadow-ray + falloff logic of ``lineOfSight`` + both light
    loops (CudaTracer.cu:354-387, 420-455). ``grid`` switches the shadow
    sweep to the DDA walk of ops/grid.py (identical semantics)."""
    offset = light_point - point
    dist2 = offset.norm2()
    dist = jnp.sqrt(jnp.maximum(dist2, _EPS))
    w_i = offset * (1.0 / dist)
    origin = point + normal * RAY_BUMP_EPSILON
    max_d = dist - 2.0 * RAY_BUMP_EPSILON
    if grid is None:
        visible = ~any_hit(origin, w_i, max_d, scene)
    else:
        from .grid import any_hit_grid
        visible = ~any_hit_grid(origin, w_i, max_d, scene, grid,
                                differentiable=grid_diff)
    l_i = power * (1.0 / (4.0 * jnp.pi * jnp.maximum(dist2, _EPS)))
    cos_l = jnp.maximum(0.0, normal.dot(w_i))
    scale = jnp.where(visible, cos_l, 0.0) * diff_avg * INV_PI
    return l_i * diffuse * scale


def shade(scene, point: Vec3, normal: Vec3, diffuse: Vec3, diff_avg,
          uniforms, grid=None, grid_diff: bool = True) -> Vec3:
    """Direct radiance at each surfel from all point and area lights.

    ``uniforms`` is a ``[UNIFORMS_PER_AREA_LIGHT * num_area_lights, N]``
    block of U[0,1) rows (threefry), consumed 4 rows per area light.
    """
    n = point.x.shape[0]
    radiance = Vec3.zeros((n,))

    for i in range(scene.num_point_lights):
        lp = Vec3(scene.pl_pos.x[i], scene.pl_pos.y[i], scene.pl_pos.z[i])
        power = Vec3(scene.pl_power.x[i], scene.pl_power.y[i], scene.pl_power.z[i])
        radiance = radiance + _light_contribution(
            scene, point, normal, diffuse, diff_avg, lp, power, grid=grid,
            grid_diff=grid_diff)

    for li in range(scene.num_area_lights):
        u1, u2, u3, upick = (uniforms[UNIFORMS_PER_AREA_LIGHT * li + k] for k in range(4))
        light_point = area_light_point(scene, li, u1, u2, u3, upick)
        power = Vec3(scene.al_power.x[li], scene.al_power.y[li], scene.al_power.z[li])
        radiance = radiance + _light_contribution(
            scene, point, normal, diffuse, diff_avg, light_point, power,
            grid=grid, grid_diff=grid_diff)

    return radiance


def area_light_point(scene, light_idx: int, u1, u2, u3, upick) -> Vec3:
    """Sample a point on area light ``light_idx`` with the reference's
    center-biased scheme (CudaTracer.cu:392-418): three uniforms normalized
    into barycentric weights, 50/50 triangle pick (u > 0.5 -> first)."""
    inv_total = 1.0 / jnp.maximum(u1 + u2 + u3, _EPS)
    w0, w1, w2 = u1 * inv_total, u2 * inv_total, u3 * inv_total
    tri0 = scene.al_tri0[light_idx]
    tri = jnp.where(upick > 0.5, tri0, tri0 + 1)
    v0 = Vec3(scene.tri_v0.x[tri], scene.tri_v0.y[tri], scene.tri_v0.z[tri])
    v1 = Vec3(scene.tri_v1.x[tri], scene.tri_v1.y[tri], scene.tri_v1.z[tri])
    v2 = Vec3(scene.tri_v2.x[tri], scene.tri_v2.y[tri], scene.tri_v2.z[tri])
    return v0 * w0 + v1 * w1 + v2 * w2
