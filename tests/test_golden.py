"""Golden-image regression — SURVEY §4 item 3: fixed threefry seed renders of
the preset scenes must stay byte-stable on CPU. Regenerate deliberately with
scripts/regen_golden.py if the estimator's semantics change on purpose."""
import os

import jax
import numpy as np
import pytest

from cuda_path_tracer_ss_tpu.models import presets
from cuda_path_tracer_ss_tpu.models.camera import Camera
from cuda_path_tracer_ss_tpu.render.integrator import camera_arrays, render

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
CASES = ["cornell_lambert", "cornell", "showcase"]


@pytest.mark.parametrize("name", CASES)
def test_golden_image(name):
    path = os.path.join(GOLDEN_DIR, f"{name}_32x32_8spp_4b.npy")
    want = np.load(path)
    img = render(presets.get_scene(name), camera_arrays(Camera()), 32, 32, 8,
                 42, max_bounces=4, live_cutoff=None)
    # same platform + same seed -> identical float32 output
    np.testing.assert_array_equal(np.asarray(img), want)


@pytest.mark.parametrize("name", ["cornell", "glass"])
def test_golden_image_physical(name):
    """The unbiased estimator's exactness guard: its correctness tests are
    statistical (estimator agreement, quadrature), so byte-stable renders
    are what catch accidental drift in the MIS math."""
    path = os.path.join(GOLDEN_DIR, f"physical_{name}_32x32_8spp_4b.npy")
    want = np.load(path)
    img = render(presets.get_scene(name), camera_arrays(Camera()), 32, 32, 8,
                 42, max_bounces=4, live_cutoff=None, physical=True)
    np.testing.assert_array_equal(np.asarray(img), want)
