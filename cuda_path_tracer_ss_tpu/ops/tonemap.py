"""Accumulation and tonemapping.

Behavioral spec: ``writeToPixelsKernel`` / ``clearPixels``
(``CudaTracer/CudaTracer.cu:31-49, 63-104``). The reference clamps each
sample's radiance to [0,1], gamma-corrects (1/2.2), quantizes to 8-bit and
accumulates the *quantized integers*, displaying their running mean.

The primary path here is the correct differentiable form — float32 radiance
accumulation, gamma at display time. The reference's integer pipeline is
kept behind ``compat_accumulate``/``compat_display`` for quirk-level golden
parity (SURVEY §3.4 "known behavioral quirks").
"""
from __future__ import annotations

import jax.numpy as jnp

from ..constants import GAMMA_CORRECTION


def tonemap(mean_radiance, gamma: float = GAMMA_CORRECTION):
    """Float radiance image -> [0,1] display image (clamp + gamma)."""
    return jnp.clip(mean_radiance, 0.0, 1.0) ** gamma


def to_uint8(display):
    """[0,1] float -> uint8 with the reference's +0.5 rounding
    (CudaTracer.cu:83-85)."""
    return jnp.clip(255.0 * display + 0.5, 0.0, 255.0).astype(jnp.uint8)


def compat_accumulate(total_uint, sample_radiance, gamma: float = GAMMA_CORRECTION):
    """One reference-style accumulation step: quantize the sample post-gamma
    and add it into the uint32 running total (CudaTracer.cu:83-100)."""
    q = to_uint8(tonemap(sample_radiance, gamma)).astype(jnp.uint32)
    return total_uint + q


def compat_display(total_uint, num_samples):
    """Integer-mean display: total * (1/ticks) + 0.5 -> uint8
    (CudaTracer.cu:94-98)."""
    inv = 1.0 / num_samples
    return jnp.clip(total_uint.astype(jnp.float32) * inv + 0.5, 0.0, 255.0).astype(jnp.uint8)
