"""Fresnel, Snell, reflection, refraction.

Behavioral spec: ``CudaTracer/CudaTracer.cu:457-531``. Full unpolarized
Fresnel from the r_s/r_p amplitude equations (not Schlick), media chosen by
hit side, total internal reflection clamps reflectance to 1. All expressions
are guarded so the untaken side of a ``where`` can never inject NaNs into
gradients.
"""
from __future__ import annotations

import jax.numpy as jnp

from .vec import Vec3, sqrt_clamped_grad

_EPS = 1e-12


def media_and_sin_t2(ior, cos_i):
    """(cos_i_pos, sin_t2, n1, n2, n_ratio) — CudaTracer.cu:474-494.
    ``cos_i`` is signed (dot(-d, n)); negative means the ray is inside."""
    outside = cos_i > 0.0
    n1 = jnp.where(outside, 1.0, ior)
    n2 = jnp.where(outside, ior, 1.0)
    cos_i_pos = jnp.abs(cos_i)
    n_ratio = n1 / jnp.maximum(n2, _EPS)
    sin_t2 = n_ratio * n_ratio * (1.0 - cos_i_pos * cos_i_pos)
    return cos_i_pos, sin_t2, n1, n2, n_ratio


def fresnel_reflectance(cos_i_pos, sin_t2, n1, n2):
    """Unpolarized Fresnel reflectance; 1 under TIR — CudaTracer.cu:457-472."""
    # TIR lanes take the where(...)==1 path; guard the sqrt operand so their
    # gradient contribution is exactly zero rather than NaN.
    cos_t = sqrt_clamped_grad(
        jnp.where(sin_t2 < 1.0, jnp.maximum(1.0 - sin_t2, 0.0), 1.0))
    denom_s = n1 * cos_i_pos + n2 * cos_t
    denom_p = n2 * cos_i_pos + n1 * cos_t
    r_s = (n1 * cos_i_pos - n2 * cos_t) / jnp.maximum(denom_s, _EPS)
    r_p = (n2 * cos_i_pos - n1 * cos_t) / jnp.maximum(denom_p, _EPS)
    f = (r_s * r_s + r_p * r_p) * 0.5
    return jnp.where(sin_t2 > 1.0, 1.0, f)


def reflect_signed(direction: Vec3, normal: Vec3, cos_i) -> Vec3:
    """Mirror reflection w_o = d + 2 cos_i n, as
    ``reflRay(Ray&, const SurfaceElement&, float)`` (CudaTracer.cu:496-503).
    NOTE: the reference always calls this with a cosine already flipped
    positive (``computeSinT2AndRefractiveIndexes`` mutates cosI in place,
    CudaTracer.cu:238/484), so callers replicating reference behavior must
    pass ``|cos_i|`` — for inside hits that yields the reference's quirky
    unnormalized outward-bent reflection."""
    return direction + normal * (2.0 * cos_i)


def reflect_abs(direction: Vec3, normal: Vec3) -> Vec3:
    """Reflection about an arbitrary (microfacet) normal with |cos|, as
    ``reflRay(Ray&, const vec3&, const vec3&)`` (CudaTracer.cu:505-514)."""
    c = jnp.abs(direction.dot(normal))
    return direction + normal * (2.0 * c)


def refract(direction: Vec3, normal: Vec3, cos_i_pos, sin_t2, n_ratio) -> Vec3:
    """Snell refraction, normalized — ``refrRay`` (CudaTracer.cu:516-531).
    Under TIR the reference kills the ray (and its sqrt goes NaN — unreachable
    because Fresnel=1 zeroes the branch weight); here the sqrt is clamped and
    the caller masks the ray instead."""
    cos_t = sqrt_clamped_grad(
        jnp.where(sin_t2 < 1.0, jnp.maximum(1.0 - sin_t2, 0.0), 1.0))
    w_o = direction * n_ratio + normal * (n_ratio * cos_i_pos - cos_t)
    return w_o.normalize(eps=_EPS)
