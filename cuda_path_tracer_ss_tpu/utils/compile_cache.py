"""Persistent JAX/XLA compilation cache.

The Mosaic (Pallas-TPU) megakernel costs 100-450 s to compile cold; JAX's
in-process cache only helps within one interpreter. This module turns on
JAX's *persistent* compilation cache so compiled executables (including the
Mosaic custom-calls inside them) survive process restarts — the second run
of the CLI, bench, or a training script skips straight past compilation.

The reference has no analogue (CUDA kernels are AOT-compiled by nvcc at
build time, CudaTracer/Makefile); this is the JIT-world equivalent of that
build step being "already done".

Usage: call :func:`enable_persistent_cache` once before the first ``jit``
execution (the CLI and ``bench.py`` do this by default). Opt out with
``CPT_NO_COMPILE_CACHE=1``; point somewhere else with
``CPT_COMPILE_CACHE_DIR=/path``.
"""
from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "cuda_path_tracer_ss_tpu", "xla"
)


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Enable JAX's on-disk compilation cache. Returns the dir, or ``None``
    if disabled via ``CPT_NO_COMPILE_CACHE``.

    Safe to call multiple times; later calls with a different directory
    re-point the cache. Never raises: on any failure (read-only filesystem,
    ancient jax) it degrades to the in-process cache and returns ``None``.
    """
    if os.environ.get("CPT_NO_COMPILE_CACHE"):
        return None
    cache_dir = (
        cache_dir
        or os.environ.get("CPT_COMPILE_CACHE_DIR")
        or DEFAULT_CACHE_DIR
    )
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache everything that takes >=1 s to compile (the megakernel takes
        # minutes; tiny jnp helpers aren't worth the disk round-trip).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        # Minimum serialized-executable size to persist, in bytes. 0 (the
        # JAX default) means no size floor — set explicitly so a future
        # JAX default change can't silently start skipping small
        # executables that are still expensive to compile over the tunnel.
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return cache_dir
    except Exception:
        return None
