#!/usr/bin/env python
"""Sweep the backward-kernel block size (bwd_rows) for the replay VJP.

The forward kernel measured fastest at 32-row blocks (docs/PERF.md); the
backward kernel shipped at 8 on a VMEM-caution guess. Measure, don't guess.

Usage: python scripts/bench_bwd_rows.py [rows ...]   (default: 8 16 32)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from cuda_path_tracer_ss_tpu.models import presets
from cuda_path_tracer_ss_tpu.models.camera import Camera
from cuda_path_tracer_ss_tpu.ops.pallas.megakernel import pack_scene
from cuda_path_tracer_ss_tpu.ops.pallas.megakernel_vjp import (
    render_megakernel_diff)
from cuda_path_tracer_ss_tpu.render.integrator import camera_arrays

SIZE, SPP, BOUNCES, REPEATS = 256, 16, 8, 5
ROWS = [int(a) for a in sys.argv[1:]] or [8, 16, 32]


def main():
    scene = presets.cornell()
    packed = pack_scene(scene)
    cp = camera_arrays(Camera())
    target = jnp.zeros((SIZE, SIZE, 3), jnp.float32)

    for rows in ROWS:
        def loss(mats, seed):
            from cuda_path_tracer_ss_tpu.ops.pallas.megakernel import (
                PackedScene)
            p = PackedScene(packed.spheres, packed.triangles, mats,
                            packed.point_lights, packed.area_lights,
                            packed.background, packed.counts)
            img = render_megakernel_diff(p, cp, seed, SIZE, SIZE, SPP,
                                         max_bounces=BOUNCES, bwd_rows=rows)
            return jnp.mean((img - target) ** 2)

        step = jax.jit(jax.value_and_grad(loss))
        t0 = time.time()
        try:
            val, g = step(packed.materials, jnp.int32(7))
            sync = float(val) + float(g.sum())
        except Exception as e:  # VMEM overflow etc. — report, keep sweeping
            print(f"bwd_rows={rows:3d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            continue
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(REPEATS):
            val, g = step(packed.materials, jnp.int32(7))
        sync = float(val) + float(g.sum())
        dt = (time.time() - t0) / REPEATS
        print(f"bwd_rows={rows:3d}: {dt * 1e3:8.1f} ms/grad-step  "
              f"[compile+first {compile_s:.0f}s]  loss={float(val):.6f} "
              f"gsum={sync - float(val):.6f}", flush=True)


if __name__ == "__main__":
    main()
