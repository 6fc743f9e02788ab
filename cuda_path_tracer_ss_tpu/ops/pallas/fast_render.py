"""Forward rendering driven by the fused Pallas bounce kernel.

The analog of the reference's ``generateFrame`` bounce loop
(``CudaTracer.cu:620-633``): eye rays from the jnp path, then a
``lax.while_loop`` whose body is ONE fused kernel launch per bounce, with the
live-ray-count early exit (the reference's ``numRays > 128``) evaluated
on-device between launches. Wavefront padding to a whole number of kernel
blocks replaces buffer shrinking.

Forward-only and PRNG-stream-distinct from the jnp reference path (see
bounce_kernel.py); statistically identical images, validated in
tests/test_pallas.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...constants import DEFAULT_MAX_BOUNCES, LIVE_RAY_CUTOFF
from ...utils import rng
from ..vec import Vec3
from ...render.integrator import eye_rays_for_indices
from .bounce_kernel import DEF_ROWS, LANES, PackedScene, bounce_pallas, pack_scene


def _pad_rows(n: int, block_rows: int) -> int:
    block = block_rows * LANES
    return ((n + block - 1) // block) * block // LANES


def trace_fast(packed: PackedScene, origins: Vec3, directions: Vec3, seed,
               max_bounces: int = DEFAULT_MAX_BOUNCES,
               live_cutoff: int = LIVE_RAY_CUTOFF,
               block_rows: int = DEF_ROWS) -> jax.Array:
    """Trace the wavefront with the fused kernel; returns radiance [N, 3]."""
    n = origins.x.shape[0]
    rows = _pad_rows(n, block_rows)
    pad = rows * LANES - n

    def plane(a, fill=0.0):
        return jnp.pad(a, (0, pad), constant_values=fill).reshape(rows, LANES)

    state = (
        plane(origins.x), plane(origins.y), plane(origins.z),
        plane(directions.x), plane(directions.y), plane(directions.z),
        plane(jnp.zeros((n,), jnp.float32)),
        plane(jnp.zeros((n,), jnp.float32)),
        plane(jnp.zeros((n,), jnp.float32)),
        plane(jnp.ones((n,), jnp.float32)),
        plane(jnp.ones((n,), jnp.float32)),
        plane(jnp.ones((n,), jnp.float32)),
        plane(jnp.ones((n,), jnp.float32), fill=0.0),  # active (pad rays dead)
    )

    def cond(carry):
        b, st = carry
        live = jnp.sum(st[12])
        return (b < max_bounces) & ((b == 0) | (live > live_cutoff))

    def body(carry):
        b, st = carry
        seed_pair = jnp.stack([seed.astype(jnp.int32), b.astype(jnp.int32)])
        st = bounce_pallas(packed, st, seed_pair, last_bounce=False,
                           block_rows=block_rows)
        return b + 1, st

    _, state = jax.lax.while_loop(cond, body, (jnp.int32(0), state))
    r = jnp.stack([state[6].reshape(-1)[:n], state[7].reshape(-1)[:n],
                   state[8].reshape(-1)[:n]], -1)
    return r


@partial(jax.jit, static_argnames=("width", "height", "spp", "max_bounces",
                                   "live_cutoff", "block_rows"))
def render_fast(scene, cam_params, width: int, height: int, spp: int,
                base_key, max_bounces: int = DEFAULT_MAX_BOUNCES,
                live_cutoff: int = LIVE_RAY_CUTOFF,
                block_rows: int = DEF_ROWS) -> jax.Array:
    """Mean radiance image [H, W, 3] via the fused kernel path."""
    packed = pack_scene(scene)
    n = width * height
    pixel_idx = jnp.arange(n, dtype=jnp.int32)
    # one int32 PRNG seed stream per render; per-sample/bounce/block folding
    # happens in-kernel
    seeds = jax.random.randint(base_key, (spp,), 0, jnp.iinfo(jnp.int32).max,
                               dtype=jnp.int32)

    def body(acc, s):
        skey = rng.sample_key(base_key, s)
        k_eye, _ = jax.random.split(skey)
        ju = rng.per_ray_uniforms(k_eye, pixel_idx, 2)
        o, d = eye_rays_for_indices(cam_params, width, height, pixel_idx,
                                    ju[0], ju[1])
        r = trace_fast(packed, o, d, seeds[s], max_bounces=max_bounces,
                       live_cutoff=live_cutoff, block_rows=block_rows)
        return acc + r, None

    acc, _ = jax.lax.scan(body, jnp.zeros((n, 3), jnp.float32),
                          jnp.arange(spp))
    return (acc / spp).reshape(height, width, 3)
