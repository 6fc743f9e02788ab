#!/bin/bash
# One-shot TPU revalidation after kernel/VJP changes (or a tunnel outage):
# 1. TPU pallas test suite (golden images on the fast engine, cross-engine
#    parity, sharded forward)
# 2. gradient benchmark (linear + full path adjoint vs jnp autodiff)
# 3. FD grad-check through the public CLI with direction-sampled +
#    geometry fields
# 4. headline bench.py JSON line
# Each step appends to the log; a wedged tunnel fails fast via bench.py's
# subprocess probe pattern (timeout per step here).
set -u
LOG=${1:-/tmp/tpu_revalidate.log}
cd "$(dirname "$0")/.."
echo "=== tpu_revalidate $(date) ===" | tee -a "$LOG"

run() {
  echo "--- $1 ---" | tee -a "$LOG"
  shift
  timeout "$1" "${@:2}" 2>&1 | tail -15 | tee -a "$LOG"
  echo "exit=$? at $(date)" | tee -a "$LOG"
}

run "tpu tests" 2400 env CPT_TPU_TESTS=1 python -m pytest tests/test_pallas.py -q
run "grad bench" 2400 python scripts/bench_grad.py
run "grad-check (full fields)" 1200 python -m cuda_path_tracer_ss_tpu.cli \
    grad-check --engine pallas --scene showcase --width 32 --height 32 \
    --spp 4 --bounces 4 \
    --fields materials.diffuse,materials.roughness,materials.ior,sph_center,sph_radius,al_power
run "bench.py" 1800 python bench.py
echo "=== done $(date) ===" | tee -a "$LOG"
