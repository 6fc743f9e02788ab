#!/usr/bin/env python
"""Headline benchmark: rays/s/chip at 800x800 Cornell scene, 8 bounces
(BASELINE.json metric). Prints ONE JSON line.

Baseline derivation (BASELINE.md): the reference reports 30-45 samples/pixel/s
at 512x512 on a GTX 760 => midpoint 37.5 * 512^2 = 9.83M primary rays/s.
``vs_baseline`` is our primary-rays/s over that midpoint.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

from cuda_path_tracer_ss_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()  # megakernel compile survives process restarts

BASELINE_PRIMARY_RAYS_PER_S = 37.5 * 512 * 512  # 9.83M, GTX 760 midpoint

WIDTH = HEIGHT = 800
SPP = 2000    # the reference's quoted 30-45 spp/s is a progressive average
              # at ~2000 spp (README.md:32) — matching its workload also
              # amortizes launch overhead and the persistent-regeneration
              # dead-lane tail (spp-per-launch sweep in docs/PERF.md:
              # 64 -> 268.6, 1024 -> 350.3, 2000 -> 359.5 M rays/s)
BOUNCES = 8
REPEATS = 2   # ~3.6 s device time per render at 2000 spp; 2 repeats bound
              # the run time while the single end sync (~45 ms) stays noise


# NOTE: deliberately self-contained (duplicates cli.cmd_benchmark's shape):
# the driver runs this file cold at round end and it must not depend on CLI
# plumbing. Keep the host-read sync rule in both places.
def _measure_pallas():
    from cuda_path_tracer_ss_tpu.models import presets
    from cuda_path_tracer_ss_tpu.models.camera import Camera
    from cuda_path_tracer_ss_tpu.render.integrator import camera_arrays
    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel import (
        pack_scene, render_megakernel)

    scene = presets.cornell()
    # scene upload happens once, as the reference's cudaMemcpy setup does
    # (CudaTracer.cu:696-700); repacking per frame costs ~100 ms of tiny-op
    # dispatch on the remote backend
    packed = jax.block_until_ready(pack_scene(scene))
    cam_params = camera_arrays(Camera())

    def run(seed):
        return render_megakernel(packed, cam_params, seed, WIDTH, HEIGHT,
                                 SPP, BOUNCES)

    # compile + warmup (float() forces a real host sync: block_until_ready
    # does not reliably block on the remote-tunnel backend)
    float(run(0).sum())

    # Dispatch is async: queue all repeats and sync ONCE at the end, so the
    # measured rate is sustained device throughput, not device time plus a
    # per-call host/tunnel round trip (~45 ms, profiler-measured — PERF.md).
    t0 = time.perf_counter()
    acc = run(1000).sum()
    for i in range(1, REPEATS):
        acc = acc + run(1000 + i).sum()
    checksum = float(acc)
    dt = time.perf_counter() - t0
    assert checksum > 0
    return WIDTH * HEIGHT * SPP * REPEATS / dt, "pallas-megakernel", SPP


def _measure_jnp():
    """Fallback when the Pallas path cannot run (no TPU / Mosaic failure):
    the differentiable masked-wavefront estimator with early exit."""
    from cuda_path_tracer_ss_tpu.models import presets
    from cuda_path_tracer_ss_tpu.models.camera import Camera
    from cuda_path_tracer_ss_tpu.render.integrator import camera_arrays, render

    import jax.numpy as jnp

    spp = 8  # the jnp path gains nothing from high spp per call
    scene = presets.cornell()
    cam_params = camera_arrays(Camera())

    def run(seed):
        return render(scene, cam_params, WIDTH, HEIGHT, spp, jnp.int32(seed),
                      max_bounces=BOUNCES, live_cutoff=128)

    float(run(0).sum())
    t0 = time.perf_counter()
    for i in range(REPEATS):
        checksum = float(run(1000 + i).sum())
    dt = time.perf_counter() - t0
    assert checksum > 0
    return WIDTH * HEIGHT * spp * REPEATS / dt, "jnp-wavefront", spp


def _wait_for_backend(probe_timeout=240, attempts=5, sleep_s=120):
    """The axon tunnel can wedge so hard that ``jax.devices()`` blocks
    forever (observed in-session); probing in a SUBPROCESS with a timeout is
    the only way to avoid hanging this process. Retries across several
    minutes because observed outages are transient."""
    import subprocess
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.devices(); print(jax.default_backend())"],
                timeout=probe_timeout, capture_output=True, text=True)
            if r.returncode == 0:
                return r.stdout.strip().splitlines()[-1]
        except subprocess.TimeoutExpired:
            pass
        print(f"backend probe {i + 1}/{attempts} failed; retrying in "
              f"{sleep_s}s", file=sys.stderr)
        time.sleep(sleep_s)
    return None


def main():
    backend = _wait_for_backend()
    if backend is None:
        # Emit an honest, machine-readable failure line rather than hanging
        # the driver: the device never became reachable.
        print(json.dumps({
            "metric": "primary_rays_per_s_per_chip_800x800_cornell_8bounce",
            "value": 0.0,
            "unit": "rays/s",
            "vs_baseline": 0.0,
            "engine": "unreachable",
            "error": "TPU tunnel unreachable (jax.devices() hung in all "
                     "probes); no measurement taken",
        }))
        sys.exit(1)

    # The remote TPU tunnel occasionally aborts transiently; retry the fast
    # path once before falling back so the recorded number reflects the
    # kernel, not a hiccup.
    last_err = None
    rays_per_s = engine = spp = None
    for attempt in range(2):
        try:
            rays_per_s, engine, spp = _measure_pallas()
            break
        except Exception as e:  # noqa: BLE001 — always emit a benchmark line
            last_err = e
            print(f"pallas attempt {attempt + 1} failed "
                  f"({type(e).__name__}: {e})", file=sys.stderr)
            time.sleep(10)
    if rays_per_s is None:
        print("falling back to jnp engine", file=sys.stderr)
        rays_per_s, engine, spp = _measure_jnp()

    print(json.dumps({
        "metric": "primary_rays_per_s_per_chip_800x800_cornell_8bounce",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / BASELINE_PRIMARY_RAYS_PER_S, 3),
        "engine": engine,
        # spp per timed call: the fallback engine's number is a legitimate
        # primary-rays/s but measured at a different spp than the pallas path
        "spp": spp,
    }))


if __name__ == "__main__":
    main()
