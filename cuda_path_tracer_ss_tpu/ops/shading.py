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

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..constants import INV_PI, RAY_BUMP_EPSILON
from .intersect import any_hit
from .vec import Vec3

_EPS = 1e-12

# RNG rows consumed per area light: 3 barycentric + 1 triangle pick.
UNIFORMS_PER_AREA_LIGHT = 4


def _shadow_query(scene, point: Vec3, normal: Vec3, light_point: Vec3,
                  grid=None, grid_diff: bool = True):
    """Shadow ray toward one light sample: epsilon-bumped origin, distance
    shortened by 2 epsilon, any-hit occlusion (``lineOfSight``,
    CudaTracer.cu:420-455). Returns (visible, w_i, dist2) with dist2
    clamped away from zero. ``grid`` switches the sweep to the DDA walk of
    ops/grid.py (identical semantics)."""
    offset = light_point - point
    dist2 = jnp.maximum(offset.norm2(), _EPS)
    dist = jnp.sqrt(dist2)
    w_i = offset * (1.0 / dist)
    origin = point + normal * RAY_BUMP_EPSILON
    max_d = dist - 2.0 * RAY_BUMP_EPSILON
    if grid is None:
        visible = ~any_hit(origin, w_i, max_d, scene)
    else:
        from .grid import any_hit_grid
        visible = ~any_hit_grid(origin, w_i, max_d, scene, grid,
                                differentiable=grid_diff)
    return visible, w_i, dist2


def _light_contribution(scene, point: Vec3, normal: Vec3, diffuse: Vec3,
                        diff_avg, light_point: Vec3, power: Vec3, grid=None,
                        grid_diff: bool = True):
    """Shadow ray + the reference's point-source falloff
    (CudaTracer.cu:354-387)."""
    visible, w_i, dist2 = _shadow_query(scene, point, normal, light_point,
                                        grid=grid, grid_diff=grid_diff)
    l_i = power * (1.0 / (4.0 * jnp.pi * dist2))
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


# ---------------------------------------------------------------------------
# Physically-correct direct lighting (the ``physical=True`` estimator mode —
# a capability beyond the reference, which has no unbiased option). The
# reference-parity ``shade`` above stays the default.
# ---------------------------------------------------------------------------

def _tri_verts(scene, tri):
    v0 = Vec3(scene.tri_v0.x[tri], scene.tri_v0.y[tri], scene.tri_v0.z[tri])
    v1 = Vec3(scene.tri_v1.x[tri], scene.tri_v1.y[tri], scene.tri_v1.z[tri])
    v2 = Vec3(scene.tri_v2.x[tri], scene.tri_v2.y[tri], scene.tri_v2.z[tri])
    return v0, v1, v2


def _tri_area_normal(scene, tri):
    """(area, raw geometric normal, verts) of triangle ``tri``."""
    v0, v1, v2 = _tri_verts(scene, tri)
    n_raw = (v1 - v0).cross(v2 - v0)
    area = 0.5 * jnp.sqrt(jnp.maximum(n_raw.norm2(), _EPS))
    return area, n_raw, (v0, v1, v2)


def area_light_sample_uniform(scene, light_idx: int, u1, u2, upick):
    """Uniform-area sample on area light ``light_idx`` (both triangles,
    picked proportionally to their areas; sqrt-reparameterized barycentrics).
    Returns (point, geometric normal, total light area, emitted radiance)
    — the emitted radiance is the light triangles' MATERIAL emission, i.e.
    exactly the radiance a path sees when it hits the light, so NEE and
    BSDF sampling estimate the same integral."""
    tri0 = scene.al_tri0[light_idx]
    area0, n0_raw, (a0, b0, c0) = _tri_area_normal(scene, tri0)
    area1, n1_raw, (a1, b1, c1) = _tri_area_normal(scene, tri0 + 1)
    total = area0 + area1
    first = upick < (area0 / total)

    from .vec import where as vwhere
    va = vwhere(first, a0, a1)
    vb = vwhere(first, b0, b1)
    vc = vwhere(first, c0, c1)
    n_raw = vwhere(first, n0_raw, n1_raw)
    n_l = n_raw.normalize(eps=_EPS)

    su = jnp.sqrt(jnp.clip(u1, 0.0, 1.0))
    w0 = 1.0 - su
    w1 = su * (1.0 - u2)
    w2 = su * u2
    point = va * w0 + vb * w1 + vc * w2

    mat = scene.tri_mat[tri0]  # both halves share the light material
    l_e = Vec3(scene.materials.emission.x[mat],
               scene.materials.emission.y[mat],
               scene.materials.emission.z[mat])
    return point, n_l, total, l_e


def light_areas(scene):
    """Per-triangle total-light-area table ``[num_triangles]``: 0 for
    non-emitting triangles, else the owning area light's TOTAL area (both
    halves) — the quantity the BSDF-hit MIS weight needs."""
    areas = jnp.zeros((scene.num_triangles,), jnp.float32)
    for li in range(scene.num_area_lights):
        tri0 = scene.al_tri0[li]
        t0, _, _ = _tri_area_normal(scene, tri0)
        t1, _, _ = _tri_area_normal(scene, tri0 + 1)
        total = t0 + t1
        areas = areas.at[tri0].set(total).at[tri0 + 1].set(total)
    return areas


class GlossLobe(NamedTuple):
    """Description of the Phong glossy lobe at each surfel — what
    ``shade_physical`` needs to light-sample it. Built by the integrator
    from the material + incoming ray (ops/bsdf.py's scatter draws the same
    lobe for the continuation)."""

    axis: Vec3        # unit lobe axis (sampling.phong_lobe_axis of the
                      # mirror direction scatter() would reflect about)
    exponent: jax.Array  # Phong exponent (inf == delta mirror: pdf 0)
    weight: Vec3      # branch albedo (the material's specular color)
    prob: jax.Array   # branch probability (spec_avg * Fresnel, or 0 where
                      # the specular branch is Cook-Torrance — that lobe is
                      # not light-sampled)


class CTLobe(NamedTuple):
    """Description of the Cook-Torrance (Beckmann) specular lobe at each
    surfel — what ``shade_physical`` needs to light-sample it. The sampler
    draws a microfacet normal m ~ Beckmann about the surfel normal and maps
    it to the outgoing direction w = d + 2|d.m| m (ops/bsdf.py's scatter);
    for any light direction w the unique reflection-preimage is
    h = normalize(w - d) (automatically on the d.h < 0 side), with density
    p(w) = beckmann_pdf(h) / (4 |d.h|) and the sampler's weight
    specular * G(h) / nv — so the implied f satisfies
    f(w) cos = prob * weight(w) * p(w), same convention as GlossLobe.
    The sampler's OTHER preimage branch (d.m > 0, which emits unnormalized
    quirk directions) is not light-sampled; its continuations carry
    prev_pdf = 0 (full emission weight), keeping the estimator unbiased."""

    axis: Vec3        # unit lobe axis: the image of +Y under the sampler's
                      # rotate_y_to(normal) (phong_lobe_axis of the raw
                      # surfel normal)
    roughness: jax.Array  # Beckmann roughness (0 == delta mirror: pdf 0)
    weight: Vec3      # the material's specular color
    prob: jax.Array   # branch probability (spec_avg * Fresnel-or-1), 0
                      # where the specular branch is mirror/Phong instead
    d: Vec3           # incoming ray direction (unit, pointing at surface)
    normal: Vec3      # RAW surfel normal — G's nh/nl use it exactly as
                      # scatter() does (unnormalized for triangle surfels)
    nv: jax.Array     # max(|cos_i|, 1e-6), scatter's clamped view cosine


def ct_lobe_terms(ct: CTLobe, w: Vec3):
    """(implied f*cos toward ``w``, solid-angle density p_ct) of the
    Cook-Torrance lobe's reflection branch — both the NEE integrand and the
    competing-strategy density the MIS weights need."""
    from .sampling import beckmann_pdf

    h = (w - ct.d).normalize(eps=_EPS)
    dh = jnp.maximum(jnp.abs(ct.d.dot(h)), _EPS)
    p_dir = beckmann_pdf(ct.axis, ct.roughness, h) / (4.0 * dh)
    p_ct = ct.prob * p_dir
    # geometric attenuation exactly as scatter() computes it for this h
    nh = jnp.abs(ct.normal.dot(h))
    nl = jnp.abs(ct.normal.dot(w))
    geometric = jnp.minimum(jnp.minimum(1.0, 2.0 * nh * nl / dh),
                            2.0 * nh * ct.nv / dh)
    f_cos = ct.weight * (geometric / ct.nv * p_ct)
    return f_cos, p_ct


class BidirNEE(NamedTuple):
    """Per-ray context the bidirectional estimator threads into
    ``shade_physical`` so each NEE contribution can carry the THIRD
    competitor — the light tracer's camera-connection technique — in its
    power-heuristic weight (render/bidir.py). ``mult`` is
    ``(nu / n_lights) * T`` with T the chain ratio computed in the
    integrator; the light-sample-dependent factors (emission-direction
    density into this vertex, the reverse-scatter lambda) are computed
    here, per light sample, with the shared chain-model pdfs."""

    mult: jax.Array      # [N] (nu / n_lights) * T
    out_dir: Vec3        # [N] -d_in: toward the previous eye vertex
    m: object            # MaterialLookup at this vertex
    normal: Vec3         # RAW surfel normal (scatter()'s convention)
    prev_cos_out: jax.Array  # [N] |n_hat . d_out| at the previous vertex
    t2_arr: jax.Array    # [N] squared length of the arrival segment
    is_primary: jax.Array  # scalar bool: this vertex is the primary hit


def shade_physical(scene, point: Vec3, normal: Vec3, diffuse: Vec3, diff_avg,
                   uniforms, grid=None, grid_diff: bool = True,
                   mis: bool = False, gloss: GlossLobe | None = None,
                   ct: CTLobe | None = None,
                   bidir: BidirNEE | None = None) -> Vec3:
    """Unbiased next-event estimation for the diffuse lobe.

    Point lights: irradiance ``power/(4 pi d^2) * cos`` (same as the
    reference — already physical for an isotropic point source). Area
    lights: uniform-area sampling with the correct change of measure,
    ``f_d * cos_surf * L_e * |cos_light| * A / d^2`` (two-sided emitter),
    where ``f_d = diff_avg * diffuse / pi`` and ``L_e`` is the light
    material's emission — the same radiance a BSDF-sampled path sees on
    hitting the light, so the two estimators agree in expectation
    (validated statistically in tests/test_physical.py). The surfel normal
    is normalized before the cosine (triangle surfel normals arrive
    unnormalized from barycentric interpolation).

    ``mis=True`` applies the power-heuristic weight against the diffuse
    BSDF strategy: w = p_l^2 / (p_l^2 + p_b^2) with solid-angle densities
    p_l = d^2 / (A |cos_l|) and p_b = diff_avg cos_s / pi (the effective
    density of the branch-then-cosine-sample continuation). The integrator
    weights BSDF-hit emission with the complementary factor.

    ``gloss`` adds light sampling of the Phong specular lobe (a second MIS
    strategy pair, independent of the diffuse one because exactly one
    branch fires per scatter). The lobe's implied f satisfies
    ``f_g(w) cos_s = prob * weight * phong_pdf(w)`` (branch weights act as
    albedos — the estimator's convention, see ops/bsdf.py), so the NEE term
    needs NO cosine or pdf division: ``weight * prob*phong_pdf(w_i) * L_e
    |cos_l| A / d^2``, weighted by the power heuristic against
    ``p_g = prob * phong_pdf(w_i)``.

    ``ct`` adds light sampling of the Cook-Torrance/Beckmann lobe the same
    way (see ``CTLobe``/``ct_lobe_terms``). The same shadow ray serves all
    lobes — one visibility query per light sample."""
    from .sampling import phong_pdf

    n = point.x.shape[0]
    radiance = Vec3.zeros((n,))
    n_unit = normal.normalize(eps=_EPS)
    zeros1 = jnp.zeros((n,), jnp.float32)

    def lobe_terms(w_i):
        """Per-lobe (f*cos, density) pairs toward w_i: diffuse, Phong
        glossy, Cook-Torrance."""
        cos_s = jnp.maximum(0.0, n_unit.dot(w_i))
        f_cos_d = diffuse * (diff_avg * INV_PI * cos_s)
        if gloss is None:
            f_cos_g, p_g = Vec3.zeros((n,)), zeros1
        else:
            p_g = gloss.prob * phong_pdf(gloss.axis, gloss.exponent, w_i)
            f_cos_g = gloss.weight * p_g
        if ct is None:
            f_cos_ct, p_ct = Vec3.zeros((n,)), zeros1
        else:
            f_cos_ct, p_ct = ct_lobe_terms(ct, w_i)
        return f_cos_d, f_cos_g, p_g, f_cos_ct, p_ct, cos_s

    for i in range(scene.num_point_lights):
        lp = Vec3(scene.pl_pos.x[i], scene.pl_pos.y[i], scene.pl_pos.z[i])
        power = Vec3(scene.pl_power.x[i], scene.pl_power.y[i],
                     scene.pl_power.z[i])
        visible, w_i, dist2 = _shadow_query(scene, point, n_unit, lp,
                                            grid=grid, grid_diff=grid_diff)
        f_cos_d, f_cos_g, _, f_cos_ct, _, _ = lobe_terms(w_i)
        irr = power * (1.0 / (4.0 * jnp.pi * dist2))
        vis = jnp.where(visible, 1.0, 0.0)
        # point lights have no competing BSDF-sampling strategy (a sampled
        # ray hits them with probability 0) — always full weight
        radiance = radiance + irr * (f_cos_d + f_cos_g + f_cos_ct) * vis

    for li in range(scene.num_area_lights):
        u1, u2, _u3, upick = (uniforms[UNIFORMS_PER_AREA_LIGHT * li + k]
                              for k in range(4))
        lp, n_l, area, l_e = area_light_sample_uniform(scene, li, u1, u2,
                                                       upick)
        visible, w_i, dist2 = _shadow_query(scene, point, n_unit, lp,
                                            grid=grid, grid_diff=grid_diff)
        f_cos_d, f_cos_g, p_g, f_cos_ct, p_ct, cos_s = lobe_terms(w_i)
        cos_l = jnp.abs(n_l.dot(w_i))  # two-sided emitter
        geo = jnp.where(visible, cos_l * area / dist2, 0.0)
        w_mis_d = 1.0
        w_mis_g = 1.0
        w_mis_ct = 1.0
        if mis:
            p_l = dist2 / jnp.maximum(area * cos_l, _EPS)
            p_b = diff_avg * cos_s * INV_PI
            if bidir is None:
                r_lt_d = r_lt_g = r_lt_ct = 0.0
            else:
                # nu * p_LT / p_NEE for this labeled path: emission density
                # into this vertex (area measure) times the reverse-scatter
                # lambda of the NEE lobe times the carried chain ratio.
                # At the primary hit the light tracer's connection IS this
                # vertex: no lambda factor, and only the diffuse lobe
                # (connections evaluate f_d) competes.
                from .bsdf import chain_model_pdfs
                # receiving cosine is the unclamped |cos| — the same
                # area-measure conversion the light tracer's pf_0 uses
                l_emit = (0.5 * cos_l * INV_PI
                          * jnp.abs(n_unit.dot(w_i)) / dist2)
                d_rev = -w_i                      # travel: light sample -> x
                cos_rev = w_i.dot(bidir.normal)   # (-d_rev) . raw normal
                lam_d, lam_g, lam_ct, _ = chain_model_pdfs(
                    d_rev, bidir.normal, bidir.m, cos_rev, bidir.out_dir)
                geo_prev = bidir.prev_cos_out / jnp.maximum(bidir.t2_arr,
                                                            _EPS)
                base = bidir.mult * l_emit
                r_lt_d = base * jnp.where(bidir.is_primary, 1.0,
                                          lam_d * geo_prev)
                r_lt_g = jnp.where(bidir.is_primary, 0.0,
                                   base * lam_g * geo_prev)
                r_lt_ct = jnp.where(bidir.is_primary, 0.0,
                                    base * lam_ct * geo_prev)
            # clamp each competing ratio before squaring — the squares
            # overflow to inf when a density underflows, and reverse-mode
            # AD of the quotient then yields NaN (constants.MIS_RATIO_CLAMP)
            from ..constants import MIS_RATIO_CLAMP as _RC
            rl_d = jnp.minimum(r_lt_d * p_l, _RC)
            rl_g = jnp.minimum(r_lt_g * p_l, _RC)
            rl_ct = jnp.minimum(r_lt_ct * p_l, _RC)
            w_mis_d = (p_l * p_l) / jnp.maximum(
                p_l * p_l + p_b * p_b + rl_d * rl_d, _EPS)
            w_mis_g = (p_l * p_l) / jnp.maximum(
                p_l * p_l + p_g * p_g + rl_g * rl_g, _EPS)
            w_mis_ct = (p_l * p_l) / jnp.maximum(
                p_l * p_l + p_ct * p_ct + rl_ct * rl_ct, _EPS)
        radiance = radiance + l_e * (f_cos_d * (geo * w_mis_d)
                                     + f_cos_g * (geo * w_mis_g)
                                     + f_cos_ct * (geo * w_mis_ct))

    return radiance
