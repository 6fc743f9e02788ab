"""Test configuration: force CPU with 8 virtual devices so sharding tests run
without a TPU pod (SURVEY §4 test strategy, item 5)."""
import os

# The harness environment force-registers a remote TPU backend
# (JAX_PLATFORMS=axon via sitecustomize); tests run on local CPU with 8
# virtual devices, so override both the env var and the config.
# Set CPT_TPU_TESTS=1 to keep the real TPU (for tests/test_pallas.py).
_USE_TPU = os.environ.get("CPT_TPU_TESTS") == "1"
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    # CPU sessions must not flip the persistent compile cache on
    # mid-session: tests/test_cli.py invokes cli.main() IN-PROCESS, which
    # calls enable_persistent_cache() — from then on every later test's
    # CPU executables were written into the real TPU cache dir, and the
    # session segfaulted inside jax's zstandard cache write on a
    # late-session checkify executable (observed twice at the same spot,
    # tests/test_utils.py::test_checked_render_clean_scene_passes). The
    # env gate makes those in-process enables no-ops; TPU sessions keep
    # the cache (the whole point there).
    os.environ.setdefault("CPT_NO_COMPILE_CACHE", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
else:
    # TPU validation runs recompile the same Mosaic kernels every time
    # (100-450 s each over the remote tunnel); reuse them across runs.
    from cuda_path_tracer_ss_tpu.utils.compile_cache import (
        enable_persistent_cache)
    enable_persistent_cache()
jax.config.update("jax_default_matmul_precision", "highest")
