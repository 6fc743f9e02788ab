"""Pallas megakernel validation — REAL TPU ONLY.

Run with: CPT_TPU_TESTS=1 python -m pytest tests/test_pallas.py -q

The megakernel's PRNG streams differ from the jnp threefry path, so parity is
statistical: mean images must agree within Monte-Carlo error, plus exact
determinism per seed. Skipped automatically on CPU (the TPU hardware PRNG has
no CPU lowering, not even in interpret mode).
"""
import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="pallas megakernel requires the real TPU (CPT_TPU_TESTS=1)")


@pytest.fixture(scope="module")
def env():
    from cuda_path_tracer_ss_tpu.models import presets
    from cuda_path_tracer_ss_tpu.models.camera import Camera
    from cuda_path_tracer_ss_tpu.render.integrator import camera_arrays
    return presets, camera_arrays(Camera())


def test_matches_jnp_estimator_statistically(env):
    presets, cp = env
    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel import render_fast2
    from cuda_path_tracer_ss_tpu.render.integrator import render

    scene = presets.cornell()
    W = H = 64
    spp = 64
    a = np.asarray(render_fast2(scene, cp, W, H, spp, 1, max_bounces=8))
    b = np.asarray(render(scene, cp, W, H, spp, jax.random.PRNGKey(1),
                          max_bounces=8, live_cutoff=None))
    assert np.all(np.isfinite(a))
    # channel means agree within MC error; pixelwise highly correlated
    np.testing.assert_allclose(a.mean((0, 1)), b.mean((0, 1)), rtol=0.03)
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.99, corr


def test_deterministic_per_seed(env):
    presets, cp = env
    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel import render_fast2
    scene = presets.cornell()
    a = np.asarray(render_fast2(scene, cp, 64, 64, 4, 7, max_bounces=6))
    b = np.asarray(render_fast2(scene, cp, 64, 64, 4, 7, max_bounces=6))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(render_fast2(scene, cp, 64, 64, 4, 8, max_bounces=6))
    assert np.abs(a - c).max() > 0


def test_showcase_finite(env):
    presets, cp = env
    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel import render_fast2
    scene = presets.showcase()
    img = np.asarray(render_fast2(scene, cp, 64, 64, 8, 3, max_bounces=8))
    assert np.all(np.isfinite(img))
    assert img.mean() > 0.01


def test_sharded_megakernel_one_device_matches(env):
    presets, cp = env
    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel import (
        pack_scene, render_megakernel, render_megakernel_sharded)
    from cuda_path_tracer_ss_tpu.parallel.mesh import make_mesh

    scene = presets.cornell()
    packed = pack_scene(scene)
    mesh = make_mesh(1)
    a = np.asarray(render_megakernel(packed, cp, 5, 64, 64, 4, max_bounces=6))
    b = np.asarray(render_megakernel_sharded(packed, cp, 5, 64, 64, 4, mesh,
                                             max_bounces=6))
    np.testing.assert_array_equal(a, b)


def test_sample_clamp_caps_fireflies(env):
    presets, cp = env
    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel import (
        pack_scene, render_megakernel)

    scene = presets.showcase()  # mirror box: has genuine >1 radiance samples
    packed = pack_scene(scene)
    raw = np.asarray(render_megakernel(packed, cp, 11, 64, 64, 16, 8))
    clamped = np.asarray(render_megakernel(packed, cp, 11, 64, 64, 16, 8,
                                           sample_clamp=1.0))
    assert clamped.max() <= 1.0 + 1e-6
    # clamping can only reduce accumulated radiance
    assert np.all(clamped <= raw + 1e-5)
    assert clamped.mean() <= raw.mean()


def test_stress_scene_dynamic_sweep(env):
    # 120 spheres > UNROLL_LIMIT: exercises the while-based dynamic SMEM
    # sweep; channel means must match the jnp estimator.
    presets, cp = env
    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel import (
        pack_scene, render_megakernel)
    from cuda_path_tracer_ss_tpu.render.integrator import render

    scene = presets.stress()
    packed = pack_scene(scene)
    a = np.asarray(render_megakernel(packed, cp, 1, 64, 64, 256, 8))
    b = np.asarray(render(scene, cp, 64, 64, 128, jax.random.PRNGKey(1),
                          max_bounces=8, live_cutoff=None))
    assert np.all(np.isfinite(a))
    np.testing.assert_allclose(a.mean((0, 1)), b.mean((0, 1)), rtol=0.03)


def test_mesh_preset_smooth_normals_match_jnp(env):
    # icosahedron with per-vertex normals: exercises the kernel's barycentric
    # normal interpolation (parity with surfel_at / Primitives.h:71-73)
    presets, cp = env
    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel import (
        pack_scene, render_megakernel)
    from cuda_path_tracer_ss_tpu.render.integrator import render

    scene = presets.mesh_demo()
    packed = pack_scene(scene)
    a = np.asarray(render_megakernel(packed, cp, 2, 64, 64, 128, 6))
    b = np.asarray(render(scene, cp, 64, 64, 64, jax.random.PRNGKey(2),
                          max_bounces=6, live_cutoff=None))
    assert np.all(np.isfinite(a))
    np.testing.assert_allclose(a.mean((0, 1)), b.mean((0, 1)), rtol=0.03)
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.97, corr


def test_point_light_scene_matches_jnp(env):
    # exercises the kernel's point-light NEE loop (num_pls > 0), which no
    # other preset covers
    presets, cp = env
    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel import (
        pack_scene, render_megakernel)
    from cuda_path_tracer_ss_tpu.render.integrator import render

    scene = presets.point_light_spheres()
    packed = pack_scene(scene)
    a = np.asarray(render_megakernel(packed, cp, 4, 64, 64, 64, 6))
    b = np.asarray(render(scene, cp, 64, 64, 64, jax.random.PRNGKey(4),
                          max_bounces=6, live_cutoff=None))
    assert np.all(np.isfinite(a))
    np.testing.assert_allclose(a.mean((0, 1)), b.mean((0, 1)), rtol=0.03)
