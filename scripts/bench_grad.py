#!/usr/bin/env python
"""Gradient-step throughput: pallas replay-VJP engine vs jnp autodiff.

Measures one jitted value_and_grad step of the inverse-rendering MSE loss
(render/inverse.py::make_loss) on the real chip — the workload behind
`cli invert` (VERDICT round 1 "next round" item 1: done bar is pallas
training >= 5x the jnp engine). Timings force a host read because
block_until_ready does not reliably block on the axon backend.

Usage: python scripts/bench_grad.py [width] [spp] [repeats]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from cuda_path_tracer_ss_tpu.models import presets
from cuda_path_tracer_ss_tpu.models.camera import Camera
from cuda_path_tracer_ss_tpu.render import inverse
from cuda_path_tracer_ss_tpu.render.integrator import camera_arrays

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 256
SPP = int(sys.argv[2]) if len(sys.argv) > 2 else 16
REPEATS = int(sys.argv[3]) if len(sys.argv) > 3 else 5
BOUNCES = 8
FIELDS = ("materials.diffuse", "al_power")  # linear-VJP subset
FIELDS_FULL = FIELDS + ("materials.roughness", "materials.ior")


def measure(engine: str, fields=FIELDS, label=None):
    scene = presets.cornell()
    cp = camera_arrays(Camera())
    target = jnp.zeros((SIZE, SIZE, 3), jnp.float32)
    loss = inverse.make_loss(scene, cp, target, SIZE, SIZE, SPP,
                             max_bounces=BOUNCES, engine=engine,
                             field_names=fields)
    params = inverse.extract_params(scene, fields)
    engine = label or engine
    step = jax.jit(jax.value_and_grad(loss))
    seed = jnp.int32(7)

    t0 = time.time()
    val, grads = step(params, seed)
    # host reads force completion (axon: block_until_ready unreliable)
    sync = float(val) + float(sum(jnp.sum(g) for g in
                                  jax.tree_util.tree_leaves(grads)))
    compile_s = time.time() - t0

    t0 = time.time()
    for _ in range(REPEATS):
        val, grads = step(params, seed)
    sync = float(val) + float(sum(jnp.sum(g) for g in
                                  jax.tree_util.tree_leaves(grads)))
    dt = (time.time() - t0) / REPEATS
    rays = SIZE * SIZE * SPP / dt
    print(f"{engine:8s}: {dt * 1e3:9.1f} ms/grad-step  "
          f"{rays / 1e6:7.1f} M primary rays/s (fwd+bwd)  "
          f"[compile+first {compile_s:.0f}s]  loss={float(val):.6f}",
          flush=True)
    return dt


def main():
    print(f"grad step: cornell {SIZE}x{SIZE}, {SPP} spp, {BOUNCES} bounces, "
          f"{REPEATS} reps, backend={jax.default_backend()}", flush=True)
    pal = ("pallas" if jax.default_backend() == "tpu"
           else "pallas_interpret")
    print(f"-- linear fields: {','.join(FIELDS)}", flush=True)
    dt_p = measure(pal, FIELDS, label="pal-lin")
    dt_j = measure("jnp", FIELDS)
    print(f"speedup pallas/jnp (linear fields): {dt_j / dt_p:.1f}x",
          flush=True)
    print(f"-- full fields: {','.join(FIELDS_FULL)}", flush=True)
    dt_pf = measure(pal, FIELDS_FULL, label="pal-full")
    dt_jf = measure("jnp", FIELDS_FULL)
    print(f"speedup pallas/jnp (full path adjoint): {dt_jf / dt_pf:.1f}x",
          flush=True)


if __name__ == "__main__":
    main()
