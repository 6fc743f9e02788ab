#!/usr/bin/env python
"""VPU-op roofline audit of the forward megakernel (round 5, ROADMAP item 1
close-out). Extracts the EXACT kernel computation from the pallas_call's
jaxpr, walks the bounce-loop body, and counts vector element-ops per
bounce-step per lane. Combined with the measured sustained throughput and
the v5e's VPU issue width this yields the utilization fraction — the
number that says whether material-sorted batching (or any less-work-per-
ray scheme) still has room to matter.

Usage: python scripts/roofline_audit.py [--physical]
Runs on CPU (tracing only — no TPU needed).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("CPT_NO_COMPILE_CACHE", "1")
import jax

jax.config.update("jax_platforms", "cpu")

import math

import jax.numpy as jnp
import numpy as np

from cuda_path_tracer_ss_tpu.models import presets
from cuda_path_tracer_ss_tpu.models.camera import Camera
from cuda_path_tracer_ss_tpu.ops.pallas.megakernel import (pack_scene,
                                                           render_megakernel)
from cuda_path_tracer_ss_tpu.render.integrator import camera_arrays

# Elementwise / transcendental primitives that execute on the VPU, with a
# slot-cost weight (transcendentals micro-sequence into several VPU slots;
# 1 is deliberately optimistic for them, so the utilization estimate is a
# LOWER bound on how busy the VPU really is).
ELEMENTWISE = {
    "add": 1, "sub": 1, "mul": 1, "div": 3, "max": 1, "min": 1,
    "neg": 1, "abs": 1, "sign": 1, "floor": 1, "ceil": 1, "round": 1,
    "and": 1, "or": 1, "xor": 1, "not": 1, "select_n": 1,
    "eq": 1, "ne": 1, "lt": 1, "le": 1, "gt": 1, "ge": 1,
    "exp": 4, "log": 4, "log1p": 4, "rsqrt": 2, "sqrt": 2,
    "sin": 4, "cos": 4, "atan2": 8, "asin": 8, "tanh": 4, "pow": 6,
    "integer_pow": 1, "shift_right_logical": 1, "shift_left": 1,
    "rem": 3, "convert_element_type": 1, "is_finite": 1,
    "nextafter": 2, "clamp": 2, "square": 1, "logistic": 4, "erf_inv": 8,
}
# moves/layout ops — count at weight 1 (they occupy issue slots too)
MOVES = {"broadcast_in_dim", "iota", "transpose", "reshape", "concatenate",
         "gather", "dynamic_slice", "dynamic_update_slice", "rev",
         "reduce_sum", "reduce_max", "reduce_min", "reduce_and",
         "reduce_or", "select_and_scatter_add", "pad", "slice"}


def count_jaxpr(jaxpr, mult=1.0, depth=0, breakdown=None):
    """Total weighted element-ops in a (closed or open) jaxpr; recurses
    into control-flow sub-jaxprs WITHOUT multiplying by trip count (the
    caller decides what one 'step' means)."""
    total = 0.0
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim in ("while", "scan", "cond", "pjit", "custom_vjp_call",
                    "custom_jvp_call", "closed_call", "remat"):
            subs = []
            for k in ("body_jaxpr", "cond_jaxpr", "jaxpr", "call_jaxpr",
                      "branches"):
                v = eqn.params.get(k)
                if v is None:
                    continue
                subs.extend(v if isinstance(v, (tuple, list)) else [v])
            for s in subs:
                sj = getattr(s, "jaxpr", s)
                total += count_jaxpr(sj, mult, depth + 1, breakdown)
            continue
        elems = 0
        for ov in eqn.outvars:
            shape = getattr(ov.aval, "shape", ())
            elems = max(elems, int(np.prod(shape)) if shape else 1)
        w = ELEMENTWISE.get(prim)
        if w is None:
            w = 1 if prim in MOVES else 0
        total += w * elems * mult
        if breakdown is not None and w:
            breakdown[prim] = breakdown.get(prim, 0.0) + w * elems * mult
    return total


def find_pallas_jaxpr(jaxpr):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "pallas_call":
            return eqn.params["jaxpr"]
        for k in ("jaxpr", "call_jaxpr", "body_jaxpr"):
            v = eqn.params.get(k)
            if v is not None:
                sub = getattr(v, "jaxpr", v)
                r = find_pallas_jaxpr(sub)
                if r is not None:
                    return r
    return None


def find_loops(jaxpr, out):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name in ("while", "scan"):
            out.append(eqn)
        for k in ("jaxpr", "call_jaxpr", "body_jaxpr", "cond_jaxpr"):
            v = eqn.params.get(k)
            if v is not None:
                find_loops(getattr(v, "jaxpr", v), out)
        if eqn.primitive.name == "while":
            find_loops(eqn.params["body_jaxpr"].jaxpr, out)


def main(physical=False):
    scene = presets.cornell()
    packed = pack_scene(scene)
    cp = camera_arrays(Camera())
    block_rows = 32
    W = H = 800

    def f(packed, cam):
        return render_megakernel(packed, cam, 0, W, H, 2000,
                                 max_bounces=15, block_rows=block_rows,
                                 physical=physical)

    jx = jax.make_jaxpr(f)(packed, cp)
    kj = find_pallas_jaxpr(jx.jaxpr)
    assert kj is not None, "no pallas_call found"
    kj = getattr(kj, "jaxpr", kj)

    loops = []
    find_loops(kj, loops)
    # the persistent-wavefront kernel is: sample while_loop > bounce
    # while_loop; the innermost biggest body is the bounce step
    best = None
    for eqn in loops:
        body = eqn.params.get("body_jaxpr") or eqn.params.get("jaxpr")
        bj = getattr(body, "jaxpr", body)
        c = count_jaxpr(bj)
        if best is None or c > best[1]:
            best = (bj, c)
    bounce_jaxpr, bounce_ops = best
    lanes = block_rows * 128
    breakdown = {}
    count_jaxpr(bounce_jaxpr, breakdown=breakdown)
    ops_per_lane_bounce = bounce_ops / lanes

    top = sorted(breakdown.items(), key=lambda kv: -kv[1])[:12]
    print(f"kernel: cornell physical={physical}; bounce-step body "
          f"(largest loop body) weighted ops = {bounce_ops:.3g} per "
          f"{block_rows}x128 tile -> {ops_per_lane_bounce:.0f} ops per "
          "lane-bounce")
    print("top primitives (weighted ops/tile-bounce):")
    for k, v in top:
        print(f"  {k:>24}: {v / lanes:8.1f} /lane")

    # ---- how much of a bounce is the branch cascade? ---------------------
    # material-sorted batching can at best let a single-material block
    # skip the three branch blocks it does not take; everything else
    # (sweeps, NEE, RNG, bookkeeping) is shared. Count _scatter_sample's
    # share to bound the lever.
    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel import _scatter_sample
    shape = (block_rows, 128)
    z = jnp.zeros(shape, jnp.float32)
    mf = [z] * 20

    def scat(*a):
        return _scatter_sample(*a, mf)

    sj = jax.make_jaxpr(scat)(z, z, z, z, z, z, z, z, z, z, z, z, z)
    scat_ops = count_jaxpr(sj.jaxpr) / lanes
    print(f"_scatter_sample (all four branch blocks): {scat_ops:.0f} "
          f"ops/lane = {100 * scat_ops / ops_per_lane_bounce:.0f}% of a "
          "bounce-step")

    # ---- roofline ---------------------------------------------------------
    # v5e TensorCore: published 197 bf16 TFLOPs = 4 MXUs x 128x128 x 2
    # flops x clock -> clock ~1.5 GHz. VPU: 4 ALUs x (8 x 128) lanes =
    # 4096 f32 slots/cycle -> 6.16e12 slots/s ceiling (FMA = 1 slot; the
    # op counts above count mul and add separately, so counted-ops over
    # this ceiling OVERSTATES utilization wherever Mosaic fuses).
    peak = 4096 * 1.5e9
    measured_rays = 398.9e6          # BENCH_r04/PERF.md sustained parity
    # bounce-steps per primary ray: persistent regeneration keeps lanes
    # full, so useful bounce-steps/s = rays/s x E[active steps/sample];
    # cornell at 15 bounces measures E = 2.67 (live_ray_stats, the
    # occupancy decay 1.0/0.65/0.40/0.24/...).
    for avg_steps in (2.67,):
        util = measured_rays * avg_steps * ops_per_lane_bounce / peak
        print(f"  E[bounce-steps/sample]={avg_steps:4.2f} -> USEFUL VPU "
              f"issue utilization ~{100 * util:.0f}% of the 4096-slot "
              "1.5 GHz ceiling")
        print(f"  (upper bound for any work-reduction scheme from here: "
              f"{1.0 / util:.1f}x)")


if __name__ == "__main__":
    main(physical="--physical" in sys.argv)
