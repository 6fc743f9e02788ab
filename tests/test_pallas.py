"""Pallas megakernel validation — REAL TPU ONLY.

Run with: CPT_TPU_TESTS=1 python -m pytest tests/test_pallas.py -q

Round 2 made the megakernel's RNG counter-based and bitwise-shared with the
jnp engine (utils/rng.py), so parity is per-pixel: the TPU render is compared
against CPU-precomputed jnp-engine references (tests/golden/tpu_*.npy —
scripts/regen_golden.py) at the SAME seed. Only cross-platform float
differences separate them (TPU exp/log/rsqrt differ from CPU by ulps, which
a chaotic path can amplify for individual samples), so assertions are
per-pixel-with-outlier-allowance plus channel means — no jnp-engine TPU
compiles anywhere in this file (the round-1 suite's 9-minute cold cost).
"""
import os

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="pallas megakernel requires the real TPU (CPT_TPU_TESTS=1)")

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def env():
    from cuda_path_tracer_ss_tpu.models import presets
    from cuda_path_tracer_ss_tpu.models.camera import Camera
    from cuda_path_tracer_ss_tpu.render.integrator import camera_arrays
    return presets, camera_arrays(Camera())


def _against_reference(presets, cp, name, spp, bounces,
                       outlier_frac=0.02, mean_rtol=0.02):
    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel import render_fast2

    scene = getattr(presets, name)()
    a = np.asarray(render_fast2(scene, cp, 64, 64, spp, 7,
                                max_bounces=bounces))
    want = np.load(os.path.join(GOLDEN,
                                f"tpu_{name}_64x64_{spp}spp_{bounces}b.npy"))
    assert np.all(np.isfinite(a))
    close = np.isclose(a, want, rtol=0.02, atol=2e-3).all(axis=-1)
    assert close.mean() >= 1.0 - outlier_frac, (
        f"{name}: only {close.mean():.4f} of pixels match the CPU reference")
    np.testing.assert_allclose(a.mean((0, 1)), want.mean((0, 1)),
                               rtol=mean_rtol)
    # correlation over the agreeing pixels: the outlier pixels are chaotic
    # path flips (a last-ulp t difference reroutes a whole glass path —
    # ONE hot pixel on stress() moves whole-image corr by ~1.5e-3); their
    # count and mean impact are already bounded by the two asserts above
    corr = np.corrcoef(a[close].ravel(), want[close].ravel())[0, 1]
    assert corr > 0.999, corr


def test_cornell_matches_cpu_reference(env):
    presets, cp = env
    _against_reference(presets, cp, "cornell", 16, 6)


def test_showcase_matches_cpu_reference(env):
    presets, cp = env
    _against_reference(presets, cp, "showcase", 16, 8)


def test_stress_dynamic_sweep_matches_cpu_reference(env):
    # 120 spheres > UNROLL_LIMIT: exercises the while-based dynamic SMEM sweep
    presets, cp = env
    _against_reference(presets, cp, "stress", 8, 6)


def test_mesh_smooth_normals_match_cpu_reference(env):
    # icosahedron with per-vertex normals: barycentric normal interpolation
    presets, cp = env
    _against_reference(presets, cp, "mesh_demo", 16, 6)


def test_point_lights_match_cpu_reference(env):
    presets, cp = env
    _against_reference(presets, cp, "point_light_spheres", 16, 6)


def test_deterministic_per_seed(env):
    presets, cp = env
    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel import render_fast2
    scene = presets.cornell()
    a = np.asarray(render_fast2(scene, cp, 64, 64, 4, 7, max_bounces=6))
    b = np.asarray(render_fast2(scene, cp, 64, 64, 4, 7, max_bounces=6))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(render_fast2(scene, cp, 64, 64, 4, 8, max_bounces=6))
    assert np.abs(a - c).max() > 0


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
    assert np.all(clamped <= raw + 1e-5)
    assert clamped.mean() <= raw.mean()


def test_physical_matches_cpu_reference(env):
    """The unbiased (--physical) estimator in the megakernel on REAL
    hardware vs the CPU jnp engine's physical mode on the same streams —
    the Mosaic compile + numeric check for the round-3 in-kernel MIS port."""
    presets, cp = env
    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel import render_fast2

    scene = presets.cornell()
    a = np.asarray(render_fast2(scene, cp, 64, 64, 16, 7, max_bounces=6,
                                physical=True))
    want = np.load(os.path.join(GOLDEN,
                                "tpu_physical_cornell_64x64_16spp_6b.npy"))
    assert np.all(np.isfinite(a))
    close = np.isclose(a, want, rtol=0.02, atol=2e-3).all(axis=-1)
    assert close.mean() >= 0.98, (
        f"physical: only {close.mean():.4f} of pixels match CPU reference")
    np.testing.assert_allclose(a.mean((0, 1)), want.mean((0, 1)), rtol=0.02)


def test_physical_vjp_trains_on_tpu(env):
    """The physical-mode replay adjoint compiles under Mosaic and matches FD
    on real hardware (spec_avg included — it only trains in physical mode)."""
    presets, cp = env
    import jax.numpy as jnp

    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel import pack_scene
    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel_vjp import (
        render_megakernel_diff)
    from cuda_path_tracer_ss_tpu.render import inverse

    scene = presets.cornell()
    w = h = 32
    target = jnp.zeros((h, w, 3), jnp.float32)

    def loss(params, seed):
        s = inverse.merge_params(scene, params)
        img = render_megakernel_diff(pack_scene(s), cp, seed, w, h, 4,
                                     max_bounces=4, physical=True)
        return jnp.mean((img - target) ** 2)

    params = inverse.extract_params(
        scene, ["materials.diffuse", "materials.emission",
                "materials.spec_avg"])
    ad, fd = inverse.directional_fd_check(loss, params, 0, eps=2e-3,
                                          num_directions=2)
    scale = np.maximum(np.abs(fd), np.abs(ad)).max() + 1e-8
    np.testing.assert_allclose(ad, fd, rtol=0.05, atol=0.02 * scale)


def test_geo_vjp_trains_on_tpu(env):
    """grad_mode='geo' (triangle vertices/normals) compiles under Mosaic and
    produces finite, nonzero, FD-consistent gradients on real hardware.
    Exactness vs the jnp engine is proven on CPU (tests/test_pallas_vjp.py);
    geometry FD here uses an interior-dominated scene so visibility flips
    don't drown the check."""
    presets, cp = env
    import jax
    import jax.numpy as jnp

    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel import pack_scene
    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel_vjp import (
        render_megakernel_diff)
    from cuda_path_tracer_ss_tpu.render import inverse

    scene = presets.cornell()
    w = h = 32
    target = jnp.zeros((h, w, 3), jnp.float32)

    def loss(params, seed):
        s = inverse.merge_params(scene, params)
        img = render_megakernel_diff(pack_scene(s), cp, seed, w, h, 4,
                                     max_bounces=4, grad_mode="geo")
        return jnp.mean((img - target) ** 2)

    params = inverse.extract_params(scene, ["tri_v0", "tri_n0",
                                            "materials.diffuse"])
    g = jax.jit(jax.grad(loss))(params, 0)
    for name, arr in g.items():
        arr = np.asarray(arr)
        assert np.all(np.isfinite(arr)), name
        assert np.abs(arr).max() > 0, f"no gradient flows to {name}"
    # the material gradient must agree with FD even in geo mode (the wider
    # backward must not perturb the linear accumulators); geometry fields
    # are excluded from the FD direction — their FD carries the visibility
    # boundary term the interior adjoint deliberately omits
    params_m = inverse.extract_params(scene, ["materials.diffuse"])
    ad, fd = inverse.directional_fd_check(loss, params_m, 0, eps=2e-3,
                                          num_directions=1)
    scale = np.maximum(np.abs(fd), np.abs(ad)).max() + 1e-8
    np.testing.assert_allclose(ad, fd, rtol=0.06, atol=0.02 * scale)


def test_vjp_trains_on_tpu(env):
    """The fused engine's gradients on real hardware: AD vs FD on the same
    streams (the grad-check bar), then a few Adam steps reduce the loss."""
    presets, cp = env
    import jax.numpy as jnp

    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel import pack_scene
    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel_vjp import (
        render_megakernel_diff)
    from cuda_path_tracer_ss_tpu.render import inverse

    scene = presets.cornell_lambert()
    w = h = 32
    target = jnp.zeros((h, w, 3), jnp.float32)

    def loss(params, seed):
        s = inverse.merge_params(scene, params)
        img = render_megakernel_diff(pack_scene(s), cp, seed, w, h, 4,
                                     max_bounces=4)
        return jnp.mean((img - target) ** 2)

    params = inverse.extract_params(scene, ["materials.diffuse", "al_power"])
    ad, fd = inverse.directional_fd_check(loss, params, 0, eps=2e-3,
                                          num_directions=2)
    scale = np.maximum(np.abs(fd), np.abs(ad)).max() + 1e-8
    np.testing.assert_allclose(ad, fd, rtol=0.05, atol=0.02 * scale)


def test_textured_megakernel_matches_jnp_on_tpu(env):
    """Round 4: the in-kernel texture block (per-lane dynamic_gather texel
    fetches, polynomial atan2 sphere UVs) against the jnp engine ON THE
    SAME CHIP — per-pixel parity without a stored golden (both engines
    run here). Bring-up measurement: max |diff| 7.8e-6 at 32x32."""
    import numpy as np
    presets, cp = env
    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel import (
        pack_scene, render_megakernel)
    from cuda_path_tracer_ss_tpu.render.integrator import render

    scene = presets.textured()
    mk = np.asarray(render_megakernel(pack_scene(scene), cp, 7, 48, 48, 4,
                                      max_bounces=4))
    jn = np.asarray(render(scene, cp, 48, 48, 4, 7, max_bounces=4,
                           live_cutoff=None))
    assert np.all(np.isfinite(mk))
    close = np.isclose(mk, jn, rtol=0.02, atol=2e-3).all(axis=-1)
    assert close.mean() > 0.99, close.mean()
    np.testing.assert_allclose(mk.mean((0, 1)), jn.mean((0, 1)), rtol=0.01)


def test_textured_vjp_trains_on_tpu(env):
    """Round 5 (VERDICT r4 ask #1): TEXTURED scenes train on the fast
    engine on real hardware — the replay kernel re-simulates the texture
    block and scatters color-map texel cotangents. Gradients for
    'textures' + 'materials.diffuse' match jax.grad of the jnp engine on
    identical streams (drive measurement: exact to 2e-4 rel at 64x64)."""
    presets, cp = env
    import sys
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(__file__))
    from test_texture import _quad_scene

    from cuda_path_tracer_ss_tpu.render import inverse

    scene = _quad_scene()
    w = h = 32
    fields = ["textures", "materials.diffuse"]
    target = jnp.zeros((h, w, 3), jnp.float32)
    params = inverse.extract_params(scene, fields)
    gj = jax.grad(inverse.make_loss(scene, cp, target, w, h, 4,
                                    max_bounces=2, engine="jnp"))(
        params, jnp.int32(0))
    gp = jax.grad(inverse.make_loss(scene, cp, target, w, h, 4,
                                    max_bounces=2, engine="pallas",
                                    field_names=fields))(
        params, jnp.int32(0))
    for k in fields:
        np.testing.assert_allclose(
            np.asarray(gp[k]), np.asarray(gj[k]), rtol=5e-4, atol=1e-6,
            err_msg=k)
    assert np.abs(np.asarray(gp["textures"])).max() > 1e-6
    # phase 2: FULL-mode fields on a color-textured scene (the UV-swim
    # chain) — sphere geometry grads through the procedural-uv texture;
    # and GEO-mode triangle-vertex grads through the quad's uv map (the
    # fixed-p metric-solve vertex terms)
    for scene2, f2 in (
            (_quad_scene(sphere=True), ["sph_center", "sph_radius",
                                        "textures"]),
            (scene, ["tri_v0", "tri_v1", "tri_v2", "textures"]),
            # round 5, later still: NORMAL-mapped scenes train on the
            # fast engine — the perturbation pullback (in-kernel
            # jax.vjp over the tangent-frame math) under Mosaic
            (_quad_scene(nmap=True), ["textures", "materials.diffuse",
                                      "pl_pos"]),
            # ... and in geo mode (triangle edges as vjp inputs)
            (_quad_scene(nmap=True), ["tri_v0", "tri_v1", "tri_v2",
                                      "textures"]),
    ):
        p2 = inverse.extract_params(scene2, f2)
        gj2 = jax.grad(inverse.make_loss(scene2, cp, target, w, h, 2,
                                         max_bounces=2, engine="jnp"))(
            p2, jnp.int32(0))
        gp2 = jax.grad(inverse.make_loss(scene2, cp, target, w, h, 2,
                                         max_bounces=2, engine="pallas",
                                         field_names=f2))(p2, jnp.int32(0))
        for k in f2:
            a, b = np.asarray(gj2[k]), np.asarray(gp2[k])
            np.testing.assert_allclose(
                b, a, rtol=1e-3, atol=2e-6 * (np.abs(a).max() + 1e-12),
                err_msg=k)


def test_light_kernel_matches_jnp_on_tpu(env):
    """Round 4: the light-tracing kernel on the real chip vs the jnp
    tracer on the same chip (caustic preset — glass refraction chains)."""
    import numpy as np
    presets, cp = env
    from cuda_path_tracer_ss_tpu.ops.pallas.lightkernel import (
        render_lighttrace_fast)
    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel import pack_scene
    from cuda_path_tracer_ss_tpu.render.lighttrace import render_lighttrace

    scene = presets.caustic()
    jn = np.asarray(render_lighttrace(scene, cp, 32, 32, 8192, 3,
                                      max_bounces=5))
    mk = np.asarray(render_lighttrace_fast(pack_scene(scene), cp, 3,
                                           32, 32, 8192, max_bounces=5))
    d = np.abs(jn - mk)
    assert np.all(np.isfinite(mk))
    assert d.mean() < 2e-5, d.mean()
    assert (d < 5e-5).mean() > 0.99, (d < 5e-5).mean()
