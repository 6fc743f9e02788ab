"""Importance samplers: cosine-hemisphere, Phong lobe, Beckmann NDF.

Behavioral spec: ``CudaTracer/CudaTracer.cu:533-585``. All samplers draw in a
+Y-up local frame and rotate into the target frame with the same half-angle
quaternion construction as the reference's ``rotateVectorToVector``
(``CudaTracer.cu:579-585``), vectorized over the wavefront. Uniform inputs
come in as explicit arrays (counter-based threefry rows), which keeps every
sampler a pure, replayable, differentiable function.
"""
from __future__ import annotations

import jax.numpy as jnp

from .vec import Vec3, where as vwhere

TWO_PI = 2.0 * jnp.pi
_TINY = 1e-12


def rotate_y_to(target: Vec3, sample: Vec3) -> Vec3:
    """Rotate ``sample`` from the +Y frame so that +Y maps onto ``target``.

    Same quaternion as ``rotateVectorToVector(vec3(0,1,0), target)``
    (CudaTracer.cu:579-585): q = normalize(w=1+target.y, r=cross(+Y, target)
    = (target.z, 0, -target.x)). Applied as v' = v + 2 r x (r x v + w v).
    The antipodal case (target == -Y) degenerates to a zero quaternion in the
    reference; here it falls back to a 180-degree flip about X.
    """
    w = 1.0 + target.y
    r = Vec3(target.z, jnp.zeros_like(w), -target.x)
    n2 = w * w + r.norm2()
    degenerate = n2 < 1e-12
    inv = jnp.where(degenerate, 1.0, 1.0 / jnp.sqrt(jnp.maximum(n2, _TINY)))
    w = w * inv
    r = r * inv
    t = r.cross(sample) + sample * w
    rotated = sample + r.cross(t) * 2.0
    flipped = Vec3(sample.x, -sample.y, -sample.z)
    return vwhere(degenerate, flipped, rotated)


def _spherical_cap(y, u_theta) -> Vec3:
    """(r cos(theta), y, r sin(theta)) with r = sqrt(1 - y^2)."""
    theta = u_theta * TWO_PI
    r = jnp.sqrt(jnp.maximum(1.0 - y * y, 0.0))
    return Vec3(r * jnp.cos(theta), y, r * jnp.sin(theta))


def lambert_direction(normal: Vec3, u_theta, u_s) -> Vec3:
    """Cosine-weighted hemisphere about ``normal`` (CudaTracer.cu:533-545)."""
    y = jnp.sqrt(u_s)
    return rotate_y_to(normal, _spherical_cap(y, u_theta))


def phong_direction(axis: Vec3, exponent, u_theta, u_s) -> Vec3:
    """Phong lobe about ``axis``: y = s^(1/(exp+1)) (CudaTracer.cu:547-559).
    An infinite exponent collapses to the axis itself (perfect mirror)."""
    s = jnp.clip(u_s, _TINY, 1.0)
    p = 1.0 / (exponent + 1.0)
    y = jnp.where(jnp.isfinite(exponent), jnp.exp(p * jnp.log(s)), 1.0)
    return rotate_y_to(axis, _spherical_cap(y, u_theta))


def phong_lobe_axis(axis: Vec3) -> Vec3:
    """The actual unit lobe axis of ``phong_direction(axis, ...)``: the image
    of +Y under the ``rotate_y_to`` quaternion. Equals ``normalize(axis)``
    when ``axis`` is unit, and tracks the sampler exactly when a caller
    passes the reference's (possibly unnormalized) mirror directions — so
    ``phong_pdf`` evaluated about this axis is the true density of the
    samples in every case."""
    zero = jnp.zeros_like(axis.x)
    return rotate_y_to(axis, Vec3(zero, jnp.ones_like(axis.x), zero))


def phong_pdf(axis_unit: Vec3, exponent, w: Vec3):
    """Solid-angle density of ``phong_direction`` samples:
    ``(n+1)/(2 pi) * cos(alpha)^n`` on the ``cos(alpha) > 0`` half-space
    around the unit lobe axis, 0 elsewhere. An infinite exponent is a delta
    lobe — density 0, so MIS assigns its continuations full emission weight
    (light sampling cannot compete with a mirror)."""
    cos_a = w.dot(axis_unit)
    finite = jnp.isfinite(exponent)
    e = jnp.where(finite, exponent, 1.0)
    # exp(e log c) like phong_direction's inverse-CDF; the clamp keeps the
    # untaken (cos_a <= 0) side's gradient finite under the outer where
    safe = jnp.maximum(cos_a, _TINY)
    pdf = (e + 1.0) / TWO_PI * jnp.exp(e * jnp.log(safe))
    return jnp.where(finite & (cos_a > 0.0), pdf, 0.0)


def beckmann_pdf(axis_unit: Vec3, roughness, m: Vec3):
    """Solid-angle density of ``beckmann_direction`` samples about the unit
    lobe axis (the image of +Y under its ``rotate_y_to``; equals the
    normalized macro normal for unit inputs, ``phong_lobe_axis`` otherwise).

    The sampler inverts ``u = 1 - exp(-tan(theta)/r^2)`` (the reference's
    quirky ``theta = atan(-m^2 ln(1-u))``, CudaTracer.cu:561-577 — NOT the
    textbook Beckmann NDF), so the exact density of its samples is

        p(m) = exp(-tan(theta)/r^2) * (1 + tan(theta)^2) / (2 pi r^2 sin(theta))

    on the ``cos(theta) > 0`` hemisphere, 0 elsewhere. ``roughness == 0`` is
    a delta at the axis — density 0, so MIS gives those continuations full
    emission weight (same convention as ``phong_pdf``'s infinite exponent).
    The sampler's ``u <= 1 - 1e-7`` clip leaves a 1e-7 atom at
    ``tan(theta) = 16.12 r^2`` that this continuous density ignores
    (negligible at the estimators' tolerance). The ``1/sin(theta)`` pole at
    the axis is integrable (the theta-marginal is finite there)."""
    cos_t = m.dot(axis_unit)
    r2 = roughness * roughness
    valid = (cos_t > 0.0) & (roughness > 0.0)
    # clamped intermediates keep the untaken side's gradient finite under
    # the outer where (roughness is a differentiable inverse-rendering field)
    cos_safe = jnp.maximum(cos_t, _TINY)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, _TINY))
    tan_t = sin_t / cos_safe
    r2_safe = jnp.maximum(r2, _TINY)
    pdf = (jnp.exp(-tan_t / r2_safe) * (1.0 + tan_t * tan_t)
           / (TWO_PI * r2_safe * sin_t))
    return jnp.where(valid, pdf, 0.0)


def beckmann_direction(normal: Vec3, roughness, u1, u2) -> Vec3:
    """Beckmann-distributed microfacet normal about ``normal``:
    theta = atan(-m^2 ln(1-u)) (CudaTracer.cu:561-577). roughness == 0
    degenerates to the macro normal (a perfect mirror) — which is exactly how
    the reference's PURE_REFLECTION materials behave through the
    Cook-Torrance branch (flags quirk at RenderStructs.h:77-78)."""
    u1 = jnp.clip(u1, 0.0, 1.0 - 1e-7)
    theta = jnp.arctan(-(roughness * roughness) * jnp.log1p(-u1))
    phi = u2 * TWO_PI
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    m = Vec3(sin_t * jnp.cos(phi), cos_t, sin_t * jnp.sin(phi))
    return rotate_y_to(normal, m)
