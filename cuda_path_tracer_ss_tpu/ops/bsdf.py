"""BSDF branch selection and scattering.

Behavioral spec: ``computeIndirectRadianceAndScatter``
(``CudaTracer/CudaTracer.cu:208-318``). One uniform walks the branch weights
Russian-roulette style: diffuse -> specular (Fresnel-weighted unless the
PURE_REFLECTION flag is set) -> refraction (1-Fresnel weighted) -> absorbed.
Branch weights act as albedos (no division by the branch probability — the
remainder doubles as Russian roulette), exactly as the reference.

Replicated quirk: ``MAT_FLAG_COOK_TORRANCE`` is 0x03 and the kernel tests
``flags & 0x03`` (CudaTracer.cu:258), so PURE_REFLECTION(0x01) materials also
take the Cook-Torrance path — with their (implicitly zero) roughness the
Beckmann normal collapses to the macro normal, the geometric term becomes
min(min(1, 2), 2) = 1, and the weight reduces to specular / cos.

Autodiff stance: the discrete branch decision is detached (booleans carry no
gradient); the continuous factors — colors, the Cook-Torrance geometric
term, the sampled directions (reparameterized in roughness/normal) — are
differentiable, so expected gradients match finite differences.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..constants import RAY_BUMP_EPSILON
from ..models.scene import Materials
from .optics import fresnel_reflectance, media_and_sin_t2, reflect_signed, refract
from .sampling import beckmann_direction, lambert_direction, phong_direction
from .vec import Vec3, gather, where as vwhere

_EPS = 1e-12

# RNG rows consumed by scatter(): 1 branch select + 2 direction sample.
UNIFORMS_PER_SCATTER = 3


class MaterialLookup(NamedTuple):
    """Per-ray gathered material fields."""

    diffuse: Vec3
    specular: Vec3
    absorption: Vec3
    emission: Vec3
    spec_exp: jax.Array
    ior: jax.Array
    diff_avg: jax.Array
    spec_avg: jax.Array
    refr_avg: jax.Array
    roughness: jax.Array
    flags: jax.Array


def lookup_materials(materials: Materials, idx) -> MaterialLookup:
    return MaterialLookup(
        diffuse=gather(materials.diffuse, idx),
        specular=gather(materials.specular, idx),
        absorption=gather(materials.absorption, idx),
        emission=gather(materials.emission, idx),
        spec_exp=materials.spec_exp[idx],
        ior=materials.ior[idx],
        diff_avg=materials.diff_avg[idx],
        spec_avg=materials.spec_avg[idx],
        refr_avg=materials.refr_avg[idx],
        roughness=materials.roughness[idx],
        flags=materials.flags[idx],
    )


class Scatter(NamedTuple):
    origin: Vec3      # new ray origin (epsilon-bumped, CudaTracer.h:6)
    direction: Vec3   # new ray direction
    weight: Vec3      # path throughput multiplier ("indirect radiance")
    alive: jax.Array  # False where the path was absorbed
    diffuse_branch: jax.Array  # True where the diffuse lobe was sampled
                               # (the physical mode suppresses the next
                               # hit's emission on these paths — NEE
                               # already counted it)
    gloss_branch: jax.Array    # True where the specular branch sampled the
                               # mirror/Phong lobe (non-Cook-Torrance) —
                               # the physical mode's MIS needs to know
                               # which lobe generated the continuation;
                               # dead code (DCE'd) in the parity estimator
    ct_branch: jax.Array       # True where the specular branch sampled the
                               # Cook-Torrance/Beckmann lobe (same MIS
                               # bookkeeping; DCE'd in the parity estimator)


def scatter_lobe_pdfs(direction: Vec3, normal: Vec3, m: MaterialLookup,
                      cos_i, w: Vec3):
    """Labeled effective solid-angle densities ``(p_diff, p_gloss, p_ct)``
    with which :func:`scatter` emits direction ``w`` from this surfel —
    branch probability times lobe density, the ``prev_pdf`` convention of
    the physical estimator's MIS (render/integrator.py).

    This is the *evaluation* form of the sampling cascade: unlike
    :func:`scatter` it takes the outgoing direction as an input, so it can
    score directions produced by OTHER strategies — NEE samples, and (the
    bidirectional use) the reversed segments of a light path, where
    ``direction`` is the reversed continuation and ``w`` the reversed
    arrival segment. Per-label because the framework's path space is
    branch-labeled (exactly one lobe fires per scatter; estimators compete
    only within a label).

    Delta lobes (mirror via infinite ``spec_exp``, Cook-Torrance via
    ``roughness == 0``) and the refraction branch report density 0 — no
    continuous strategy can generate them, so MIS gives their paths full
    weight. The Cook-Torrance quirk branch (``d.m > 0`` preimages, which
    emit unnormalized directions — see the CTLobe doc, ops/shading.py)
    also scores 0, the estimator-wide convention.

    ``cos_i`` is the signed ``dot(-direction, normal)`` exactly as
    :func:`scatter` receives it; ``normal`` may be unnormalized (triangle
    surfels) — lobe axes follow the samplers' own quaternion frames.
    """
    from .sampling import beckmann_pdf, phong_lobe_axis, phong_pdf

    cos_i_pos, sin_t2, n1, n2, _ = media_and_sin_t2(m.ior, cos_i)
    fres = fresnel_reflectance(cos_i_pos, sin_t2, n1, n2)
    pure = (m.flags & 0x01) != 0
    ct = (m.flags & 0x03) != 0
    p_spec = m.spec_avg * jnp.where(pure, 1.0, fres)

    n_unit = normal.normalize(eps=_EPS)
    cos_w = jnp.maximum(0.0, w.dot(n_unit))
    p_diff = m.diff_avg * cos_w * (1.0 / jnp.pi)

    gloss_axis = phong_lobe_axis(reflect_signed(direction, normal, cos_i_pos))
    p_gloss = (jnp.where(ct, 0.0, p_spec)
               * phong_pdf(gloss_axis, m.spec_exp, w))

    m_half = (w - direction).normalize(eps=_EPS)
    dm = direction.dot(m_half)
    ct_prob = jnp.where(ct & (m.roughness > 0.0), p_spec, 0.0)
    p_ct = jnp.where(
        dm < 0.0,
        ct_prob * beckmann_pdf(phong_lobe_axis(normal), m.roughness, m_half)
        / (4.0 * jnp.maximum(jnp.abs(dm), _EPS)),
        0.0)
    return p_diff, p_gloss, p_ct


def chain_model_pdfs(direction: Vec3, normal: Vec3, m: MaterialLookup,
                     cos_i, w: Vec3):
    """Per-label CHAIN-MODEL densities ``(p_diff, p_gloss, p_ct, p_refr)``
    of scattering ``direction -> w`` — the pdf model the bidirectional MIS
    weights are built from (render/bidir.py).

    Differs from :func:`scatter_lobe_pdfs` in exactly one convention: lobes
    with no continuous solid-angle density — the delta mirror
    (``spec_exp == inf``), delta Cook-Torrance (``roughness == 0``), the
    Cook-Torrance quirk preimage (``d.m > 0``), and refraction — report
    their BRANCH PROBABILITY instead of 0. Interior delta vertices appear
    in EVERY strategy that can generate the path (the eye chain and the
    light chain both pass through them), so their singular factors cancel
    in the weight ratios; the branch probability is the finite stand-in
    both sides keep (Veach 10.3.5's practical treatment; mirrors cancel
    exactly, refraction up to the solid-angle compression Jacobian).
    Unbiasedness does NOT depend on the stand-in being the true density —
    only on the forward estimator and the light tracer computing each
    vertex factor with identical formulas at identical arguments, which
    they do by both calling this function (see render/bidir.py's
    consistency note). The final-segment competition keeps using the
    0-for-delta convention (``scatter_lobe_pdfs``/``prev_pdf``), where 0 is
    the true density of the competing NEE technique.
    """
    from .sampling import phong_lobe_axis, phong_pdf

    p_diff, p_gloss, p_ct = scatter_lobe_pdfs(direction, normal, m, cos_i, w)

    cos_i_pos, sin_t2, n1, n2, _ = media_and_sin_t2(m.ior, cos_i)
    fres = fresnel_reflectance(cos_i_pos, sin_t2, n1, n2)
    pure = (m.flags & 0x01) != 0
    ct = (m.flags & 0x03) != 0
    p_spec = m.spec_avg * jnp.where(pure, 1.0, fres)

    # delta mirror: finite spec_exp keeps the continuous Phong density
    p_gloss = jnp.where(ct, 0.0,
                        jnp.where(jnp.isfinite(m.spec_exp), p_gloss, p_spec))
    # delta CT (roughness 0) and the quirk preimage (d.m > 0): branch prob
    m_half = (w - direction).normalize(eps=_EPS)
    dm = direction.dot(m_half)
    p_ct = jnp.where(ct, jnp.where((m.roughness > 0.0) & (dm < 0.0),
                                   p_ct, p_spec), 0.0)
    p_refr = m.refr_avg * (1.0 - fres)
    return p_diff, p_gloss, p_ct, p_refr


def chain_model_pdf_taken(direction: Vec3, normal: Vec3, m: MaterialLookup,
                          cos_i, w: Vec3, sc: "Scatter"):
    """The chain-model density of the branch ``sc`` actually took."""
    p_diff, p_gloss, p_ct, p_refr = chain_model_pdfs(direction, normal, m,
                                                     cos_i, w)
    refr = sc.alive & ~sc.diffuse_branch & ~sc.gloss_branch & ~sc.ct_branch
    return jnp.where(
        sc.diffuse_branch, p_diff,
        jnp.where(sc.gloss_branch, p_gloss,
                  jnp.where(sc.ct_branch, p_ct,
                            jnp.where(refr, p_refr, 0.0))))


def scatter(direction: Vec3, point: Vec3, normal: Vec3, m: MaterialLookup,
            cos_i, u_branch, u_a, u_b) -> Scatter:
    """Sample the next path segment for every ray.

    ``cos_i`` is the signed dot(-direction, normal). ``u_branch/u_a/u_b`` are
    threefry uniform rows [N]; one branch fires per ray, so the two direction
    rows are shared by all branch samplers.
    """
    cos_i_pos, sin_t2, n1, n2, n_ratio = media_and_sin_t2(m.ior, cos_i)
    fres = fresnel_reflectance(cos_i_pos, sin_t2, n1, n2)

    pure = (m.flags & 0x01) != 0
    ct = (m.flags & 0x03) != 0  # deliberate: includes PURE_REFLECTION (see module doc)

    # Branch cascade: cumulative thresholds on one uniform (CudaTracer.cu:211-317).
    p_diff = m.diff_avg
    p_spec = m.spec_avg * jnp.where(pure, 1.0, fres)
    p_refr = m.refr_avg * (1.0 - fres)
    u = jax.lax.stop_gradient(u_branch)
    take_diff = u < p_diff
    take_spec = (~take_diff) & (u < p_diff + p_spec)
    take_refr = (~take_diff) & (~take_spec) & (u < p_diff + p_spec + p_refr)
    take_diff, take_spec, take_refr = (
        jax.lax.stop_gradient(t) for t in (take_diff, take_spec, take_refr))

    # ---- diffuse branch (CudaTracer.cu:216-228) --------------------------
    d_diff = lambert_direction(normal, u_a, u_b)
    o_diff = point + normal * RAY_BUMP_EPSILON
    w_diff = m.diffuse

    # ---- specular: Cook-Torrance microfacet (CudaTracer.cu:258-282) ------
    m_normal = beckmann_direction(normal, m.roughness, u_a, u_b)
    cos_m = jnp.abs(direction.dot(m_normal))
    d_ct = direction + m_normal * (2.0 * cos_m)
    o_ct = point + m_normal * RAY_BUMP_EPSILON
    half = (d_ct - direction).normalize(eps=_EPS)
    nh = jnp.abs(normal.dot(half))
    nl = jnp.abs(normal.dot(d_ct))
    vh = jnp.maximum(jnp.abs(direction.dot(half)), _EPS)
    nv = jnp.maximum(jnp.abs(cos_i), 1e-6)
    geometric = jnp.minimum(jnp.minimum(1.0, 2.0 * nh * nl / vh), 2.0 * nh * nv / vh)
    w_ct = m.specular * (geometric / nv)

    # ---- specular: mirror / Phong lobe (CudaTracer.cu:284-295) -----------
    # The reference flips cosI positive *before* reflRay
    # (computeSinT2AndRefractiveIndexes mutates it, CudaTracer.cu:238, 484),
    # so inside hits reflect with +|cosI| — an unnormalized outward-bent
    # w_o = d + 2|cosI|n rather than the physically correct internal
    # reflection. Quirk replicated: pass the positive cosine.
    d_mirror = reflect_signed(direction, normal, cos_i_pos)
    d_phong = phong_direction(d_mirror, m.spec_exp, u_a, u_b)
    d_gloss = vwhere(jnp.isfinite(m.spec_exp), d_phong, d_mirror)
    o_gloss = point + normal * RAY_BUMP_EPSILON

    d_spec = vwhere(ct, d_ct, d_gloss)
    o_spec = vwhere(ct, o_ct, o_gloss)
    w_spec = vwhere(ct, w_ct, m.specular)

    # ---- refraction (CudaTracer.cu:300-313) ------------------------------
    d_refr = refract(direction, normal, cos_i_pos, sin_t2, n_ratio)
    o_refr = point + d_refr * RAY_BUMP_EPSILON
    w_refr = Vec3.ones(cos_i.shape)
    refr_alive = sin_t2 <= 1.0  # TIR kills the ray (unreachable: Fresnel=1)

    # ---- combine ---------------------------------------------------------
    new_d = vwhere(take_diff, d_diff, vwhere(take_spec, d_spec, d_refr))
    new_o = vwhere(take_diff, o_diff, vwhere(take_spec, o_spec, o_refr))
    weight = vwhere(take_diff, w_diff,
                    vwhere(take_spec, w_spec,
                           vwhere(take_refr, w_refr, Vec3.zeros(cos_i.shape))))
    alive = take_diff | take_spec | (take_refr & refr_alive)
    return Scatter(origin=new_o, direction=new_d, weight=weight, alive=alive,
                   diffuse_branch=take_diff, gloss_branch=take_spec & ~ct,
                   ct_branch=take_spec & ct)
