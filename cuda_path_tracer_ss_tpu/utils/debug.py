"""Numerical-health checks.

The reference ships no sanitizers (SURVEY §5 'Race detection'); its main race
surface (in-place ray-buffer partition) doesn't exist here because shapes are
static and updates functional. What remains worth guarding is numerics:
NaN/Inf escaping a ``where`` in the estimator. ``checked_render`` wraps the
differentiable renderer in ``jax.experimental.checkify`` float checks;
``assert_finite`` is a cheap post-hoc scan for pipelines and tests.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def checked_render(scene, cam_params, width, height, spp, key, max_bounces=8):
    """Render with float (NaN/Inf) checkify instrumentation; raises with the
    failing op's provenance if any non-finite value appears."""
    from ..render.integrator import render

    def fn(scene, cam_params, key):
        return render(scene, cam_params, width, height, spp, key,
                      max_bounces=max_bounces, live_cutoff=None)

    checked = checkify.checkify(fn, errors=checkify.float_checks)
    err, img = jax.jit(checked)(scene, cam_params, key)
    err.throw()
    return img


def assert_finite(tree, name: str = "output"):
    """Raise if any leaf of a pytree holds NaN/Inf."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = jnp.asarray(leaf)
        if arr.dtype.kind == "f" and not bool(jnp.all(jnp.isfinite(arr))):
            key_str = jax.tree_util.keystr(path)
            raise FloatingPointError(f"non-finite values in {name}{key_str}")
