#!/usr/bin/env python
"""Regenerate tests/golden/*.npy after a DELIBERATE estimator change.
Run on CPU: JAX_PLATFORMS=cpu python scripts/regen_golden.py"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

from cuda_path_tracer_ss_tpu.models import presets
from cuda_path_tracer_ss_tpu.models.camera import Camera
from cuda_path_tracer_ss_tpu.render.integrator import camera_arrays, render

out_dir = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
cp = camera_arrays(Camera())
for name in ["cornell_lambert", "cornell", "showcase"]:
    img = render(presets.get_scene(name), cp, 32, 32, 8,
                 jax.random.PRNGKey(42), max_bounces=4, live_cutoff=None)
    path = os.path.join(out_dir, f"{name}_32x32_8spp_4b.npy")
    np.save(path, np.asarray(img))
    print("wrote", path)
