"""Wavefront compaction: the ``thrust::partition`` analog (reference C10,
``CudaTracer.cu:629-631``).

Under XLA's static shapes the buffer can never shrink, so "compaction" has
two TPU-native forms:

* **Masking** (the default everywhere in this framework): rays carry an
  ``active`` flag; dead lanes still flow through the VPU but every update is
  masked. Zero data movement.
* **Sorting** (this module): a stable key-sort moves live rays into a dense
  prefix, preserving the reference's partition semantics exactly (stable =
  thrust::partition's relative-order guarantee is *stronger* than needed —
  thrust::partition is unstable — so images stay deterministic).

Benchmark verdict (800x800 Cornell, v5e): sorting buys nothing for the XLA
wavefront — the whole static buffer is processed regardless, so the sort's
13-plane shuffle is pure overhead; masking wins at every scene size tested.
Sorting becomes useful only for a kernel whose grid can skip dead *tiles*
(per-block early exit in ops/pallas/megakernel.py achieves the same effect
without any data movement, because camera rays are spatially coherent).
Kept as a first-class op for scenes with incoherent death patterns and for
parity with the reference's architecture.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def partition_by_activity(state):
    """Stable-partition any pytree of [N]-leading arrays so entries where
    ``state.active`` is True form a dense prefix. Returns (state, live_count).
    """
    active = state.active
    # stable argsort of (not active): False (live) sorts first
    order = jnp.argsort(jnp.logical_not(active), stable=True)
    new_state = jax.tree.map(lambda a: a[order], state)
    return new_state, jnp.sum(active)


def live_count(state) -> jax.Array:
    return jnp.sum(state.active)
