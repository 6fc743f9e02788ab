"""Grid-vs-linear sweep benchmark on the live backend (VERDICT round 1,
next-step 4: spatial acceleration for large scenes).

Times `render_megakernel` with and without the uniform grid on a
primitive-heavy stress scene, and checks channel-mean parity between the
two variants (same RNG streams -> same image up to float op order).

Usage: python scripts/bench_grid.py [num_spheres] [width] [spp] [preset]
``preset`` defaults to ``stress``; ``stress_dense`` is the 10k-primitive
radius-scaled lattice the round-3 two-level (supercell) culling targets.
"""
import sys
import time

import numpy as np
import jax

sys.path.insert(0, ".")

from cuda_path_tracer_ss_tpu.models import presets            # noqa: E402
from cuda_path_tracer_ss_tpu.models.camera import Camera      # noqa: E402
from cuda_path_tracer_ss_tpu.ops.grid import build_grid       # noqa: E402
from cuda_path_tracer_ss_tpu.ops.pallas.megakernel import (   # noqa: E402
    pack_grid, pack_scene, render_megakernel)
from cuda_path_tracer_ss_tpu.render.integrator import camera_arrays  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
W = H = int(sys.argv[2]) if len(sys.argv) > 2 else 400
SPP = int(sys.argv[3]) if len(sys.argv) > 3 else 16
PRESET = sys.argv[4] if len(sys.argv) > 4 else "stress"
BOUNCES = int(sys.argv[5]) if len(sys.argv) > 5 else 8
REPEATS = 4

scene = getattr(presets, PRESET)(N)
print(f"{PRESET}({N}): {scene.num_spheres} spheres, "
      f"{scene.num_triangles} triangles, backend={jax.default_backend()}")
cp = camera_arrays(Camera())
packed = jax.block_until_ready(pack_scene(scene))
grid = build_grid(scene)
print("grid res", grid.res, "Ks", grid.sph_list.shape[1],
      "Kt", grid.tri_list.shape[1],
      "cells", grid.num_cells,
      "occupied", int(np.count_nonzero(np.asarray(grid.sph_count)
                                       + np.asarray(grid.tri_count))))
pgrid = pack_grid(grid)


def bench(label, pg):
    def run(k):
        return render_megakernel(packed, cp, 0, W, H, SPP, BOUNCES,
                                 sample_offset=k * SPP, packed_grid=pg)

    t0 = time.perf_counter()
    img = run(0)
    s = float(img.sum())           # host read = real sync
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    acc = run(1).sum()
    for i in range(2, REPEATS + 1):
        acc = acc + run(i).sum()
    float(acc)
    dt = time.perf_counter() - t0
    rate = W * H * SPP * REPEATS / dt
    print(f"{label:8s} compile {compile_s:7.1f}s  "
          f"{dt / REPEATS * 1e3:8.2f} ms/render  {rate / 1e6:8.1f} M rays/s")
    return np.asarray(img), rate


img_lin, rate_lin = bench("linear", None)
img_grid, rate_grid = bench("grid", pgrid)

d = np.abs(img_lin - img_grid)
print(f"parity: max abs diff {d.max():.3e}  mean {d.mean():.3e}  "
      f"pixels>1e-3: {int((d.max(-1) > 1e-3).sum())}/{W * H} "
      f"(identical streams; outliers are chaotic glass paths where a "
      f"last-ulp t flip reroutes the whole path)")
print(f"speedup: {rate_grid / rate_lin:.2f}x")
