"""Differentiable rendering: gradients, FD checking, inverse rendering.

The reference is forward-only; differentiability is a new capability of the
TPU build (BASELINE.json north star: dL/d(material params, light emission,
camera) match finite differences; config 4: recover albedo/roughness/light
emission via pixel-gradient descent). The whole estimator is pure JAX, so
``jax.grad`` flows through the bounce scan; discrete branch/hit decisions
are detached and continuous factors reparameterized (see ops/bsdf.py), so
expected gradients match finite differences on the same random streams.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..constants import DEFAULT_MAX_BOUNCES
from ..models.scene import Scene
from .integrator import render

# Scene leaves it makes sense to optimize. Names address nested dataclass
# fields with dots; Vec3 leaves are exposed as [.., 3] arrays for optimizers.
TRAINABLE_FIELDS = (
    "materials.diffuse",
    "materials.specular",
    "materials.emission",
    "materials.absorption",
    "materials.roughness",
    "materials.diff_avg",
    "materials.spec_avg",
    "materials.refr_avg",
    "materials.ior",
    "al_power",
    "pl_power",
    "sph_center",
    "sph_radius",
)


def _is_vec3(obj) -> bool:
    return hasattr(obj, "x") and hasattr(obj, "cross")


def get_field(scene: Scene, name: str):
    obj = scene
    for part in name.split("."):
        obj = getattr(obj, part)
    return obj.to_array() if _is_vec3(obj) else obj


def with_field(scene: Scene, name: str, value) -> Scene:
    parts = name.split(".")

    def rebuild(obj, parts, value):
        if len(parts) == 1:
            cur = getattr(obj, parts[0])
            if _is_vec3(cur):
                from ..ops.vec import Vec3
                value = Vec3.from_array(value)
            return dataclasses.replace(obj, **{parts[0]: value})
        child = rebuild(getattr(obj, parts[0]), parts[1:], value)
        return dataclasses.replace(obj, **{parts[0]: child})

    return rebuild(scene, parts, value)


def extract_params(scene: Scene, names: Iterable[str]) -> Dict[str, jax.Array]:
    return {n: get_field(scene, n) for n in names}


def merge_params(scene: Scene, params: Dict[str, jax.Array]) -> Scene:
    for n, v in params.items():
        scene = with_field(scene, n, v)
    return scene


def make_loss(scene: Scene, cam_params, target, width: int, height: int,
              spp: int, max_bounces: int = 8) -> Callable:
    """Returns ``loss(params, key)`` — MSE between the rendered radiance
    image and ``target``. Passing the key as an argument keeps one jitted
    loss for both fixed-stream (deterministic) and resampled (stochastic)
    optimization."""

    def loss(params, key):
        s = merge_params(scene, params)
        img = render(s, cam_params, width, height, spp, key,
                     max_bounces=max_bounces, live_cutoff=None)
        return jnp.mean((img - target) ** 2)

    return loss


def directional_fd_check(loss: Callable, params: Dict[str, jax.Array],
                         key, eps: float = 2e-3, num_directions: int = 3
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Compare <grad, v> against central differences along random unit
    directions v, with the SAME render key on both sides. Returns (ad, fd)
    arrays of shape [num_directions]."""
    render_key, dir_key = jax.random.split(key)
    grad = jax.grad(loss)(params, render_key)
    ad, fd = [], []
    flat_g, treedef = jax.tree_util.tree_flatten(grad)
    flat_p = treedef.flatten_up_to(params)
    for i in range(num_directions):
        ks = jax.random.split(jax.random.fold_in(dir_key, i), len(flat_p))
        vs = [jax.random.normal(k, p.shape, jnp.float32) for k, p in zip(ks, flat_p)]
        norm = jnp.sqrt(sum(jnp.sum(v * v) for v in vs))
        vs = [v / norm for v in vs]
        plus = treedef.unflatten([p + eps * v for p, v in zip(flat_p, vs)])
        minus = treedef.unflatten([p - eps * v for p, v in zip(flat_p, vs)])
        fd.append((loss(plus, render_key) - loss(minus, render_key)) / (2 * eps))
        ad.append(sum(jnp.sum(g * v) for g, v in zip(flat_g, vs)))
    return np.asarray(jax.device_get(ad)), np.asarray(jax.device_get(fd))


def invert(scene_init: Scene, cam_params, target, field_names: Iterable[str],
           width: int, height: int, spp: int = 4, steps: int = 200,
           lr: float = 5e-2, seed: int = 0,
           max_bounces: int = DEFAULT_MAX_BOUNCES,
           resample_every: int = 0, callback=None):
    """Inverse rendering: gradient-descend the named scene fields toward a
    target image (BASELINE config 4). ``resample_every=k`` folds a new RNG
    key every k steps (stochastic gradients over sample noise); 0 keeps one
    fixed stream (deterministic loss surface)."""
    field_names = tuple(field_names)
    base_key = jax.random.PRNGKey(seed)
    params = extract_params(scene_init, field_names)
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)
    loss = make_loss(scene_init, cam_params, target, width, height, spp,
                     max_bounces)

    @jax.jit
    def update(params, opt_state, key):
        val, grads = jax.value_and_grad(loss)(params, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, val

    losses = []
    for step in range(steps):
        key = (jax.random.fold_in(base_key, step // resample_every)
               if resample_every else base_key)
        params, opt_state, val = update(params, opt_state, key)
        losses.append(float(val))
        if callback:
            callback(step, float(val), params)
    return merge_params(scene_init, params), params, losses
