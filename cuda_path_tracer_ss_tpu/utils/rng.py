"""Counter-based PRNG streams for the wavefront.

Replaces the reference's stateful per-pixel cuRAND XORWOW array
(``CudaTracer/CudaTracer.cu:22-29`` and every ``curand_uniform`` call site)
with JAX threefry. Keys fold (seed, sample, bounce, pixel), so every draw is
a pure function of those counters: stateless, replayable, differentiable-safe
— and *sharding-invariant*: a pixel's stream depends only on its flat pixel
index, never on the tile layout, so any device mesh produces bitwise the same
image as a single chip.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_key(base: jax.Array, sample_idx) -> jax.Array:
    return jax.random.fold_in(base, sample_idx)


def bounce_key(skey: jax.Array, bounce_idx) -> jax.Array:
    return jax.random.fold_in(skey, bounce_idx)


def per_ray_uniforms(key: jax.Array, pixel_idx: jax.Array, num_uses: int) -> jax.Array:
    """A ``[num_uses, n]`` block of U[0,1): row r, column c is draw r of the
    stream for pixel ``pixel_idx[c]``. Each pixel's stream comes from folding
    its flat index into ``key`` — one cheap threefry per ray."""

    def one(i):
        return jax.random.uniform(jax.random.fold_in(key, i), (num_uses,),
                                  dtype=jnp.float32)

    return jax.vmap(one, out_axes=1)(pixel_idx)
