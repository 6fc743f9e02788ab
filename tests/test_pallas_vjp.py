"""The megakernel's hand-derived VJP vs the jnp engine's autodiff.

Shared counter-based RNG means both engines evaluate the SAME estimator on
the SAME streams, so for every field the Pallas VJP supports the gradients
must agree to float tolerance — jax.grad of the jnp engine is an exact
oracle here, not a statistical one. Runs on CPU via interpret mode.

Interpret-mode TRACING is the expensive part (~1 min per engine per scene —
the unrolled primitive sweeps), so each scene's losses/grads are computed
once under jit and shared across assertions.
"""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "tpu",
    reason="interpret-mode VJP tests are for the CPU suite")

FIELDS = ["materials.diffuse", "materials.specular", "materials.emission",
          "materials.absorption", "materials.diff_avg",
          "materials.roughness", "materials.ior", "al_power"]
# fields whose gradients only the FULL (path-adjoint) backward carries
FULL_ONLY = {"materials.roughness", "materials.ior", "materials.spec_exp",
             "pl_pos"}
W = H = 12
SPP = 2
BOUNCES = 4


@functools.lru_cache(maxsize=None)
def _engine_pair(name, grad_mode="full"):
    """(value+grad) for both engines on scene ``name`` — jitted, cached."""
    from cuda_path_tracer_ss_tpu.models import presets
    from cuda_path_tracer_ss_tpu.models.camera import Camera
    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel import pack_scene
    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel_vjp import (
        render_megakernel_diff)
    from cuda_path_tracer_ss_tpu.render import inverse
    from cuda_path_tracer_ss_tpu.render.integrator import camera_arrays, render

    scene = getattr(presets, name)()
    cp = camera_arrays(Camera())
    target = jnp.zeros((H, W, 3), jnp.float32)
    fields = [f for f in FIELDS if f != "al_power" or scene.num_area_lights]
    if grad_mode == "linear":
        fields = [f for f in fields if f not in FULL_ONLY]
    if scene.num_point_lights:
        fields = fields + ["pl_power"]
        if grad_mode == "full":
            fields = fields + ["pl_pos"]
    params = inverse.extract_params(scene, fields)

    def loss_jnp(params, seed):
        s = inverse.merge_params(scene, params)
        img = render(s, cp, W, H, SPP, seed, max_bounces=BOUNCES,
                     live_cutoff=None)
        return jnp.mean((img - target) ** 2)

    def loss_pal(params, seed):
        s = inverse.merge_params(scene, params)
        img = render_megakernel_diff(pack_scene(s), cp, seed, W, H, SPP,
                                     max_bounces=BOUNCES, interpret=True,
                                     grad_mode=grad_mode)
        return jnp.mean((img - target) ** 2)

    vg_jnp = jax.jit(jax.value_and_grad(loss_jnp))
    vg_pal = jax.jit(jax.value_and_grad(loss_pal))
    (v1, g1) = jax.device_get(vg_jnp(params, 5))
    (v2, g2) = jax.device_get(vg_pal(params, 5))
    return fields, float(v1), float(v2), g1, g2


@pytest.mark.parametrize("name", ["cornell", "showcase",
                                  "point_light_spheres"])
@pytest.mark.slow
def test_vjp_matches_jnp_autodiff(name):
    fields, v1, v2, g1, g2 = _engine_pair(name)
    np.testing.assert_allclose(v1, v2, rtol=1e-5)
    for k in fields:
        a, b = np.asarray(g1[k]), np.asarray(g2[k])
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b, a, atol=1e-4 * scale, rtol=1e-3,
                                   err_msg=k)
        if k in ("materials.roughness", "materials.ior"):
            continue  # zero on scenes without that branch (both engines)
        assert np.abs(a).max() > 0, f"no gradient flows to {k}"


@pytest.mark.slow
def test_vjp_full_mode_reaches_direction_sampled_fields():
    """The path adjoint's distinguishing fields actually receive nonzero,
    jnp-matching gradients somewhere: roughness on showcase (Cook-Torrance
    spheres), pl_pos on the point-light scene."""
    fields, _, _, g1, _ = _engine_pair("showcase")
    assert np.abs(np.asarray(g1["materials.roughness"])).max() > 0
    fields_pl, _, _, gp1, gp2 = _engine_pair("point_light_spheres")
    assert "pl_pos" in fields_pl
    assert np.abs(np.asarray(gp1["pl_pos"])).max() > 0


@pytest.mark.slow
def test_vjp_linear_mode_matches_on_its_fields():
    """The leaner grad_mode='linear' backward still agrees on the
    throughput-linear subset."""
    fields, v1, v2, g1, g2 = _engine_pair("cornell", grad_mode="linear")
    np.testing.assert_allclose(v1, v2, rtol=1e-5)
    for k in fields:
        a, b = np.asarray(g1[k]), np.asarray(g2[k])
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b, a, atol=1e-4 * scale, rtol=1e-3,
                                   err_msg=k)


@pytest.mark.slow
def test_vjp_camera_gradients_match_jnp():
    """Full mode: dL/d(cam rotation, position, tan_half_fov) from the eye-ray
    VJP matches the jnp engine; z_near's gradient is structurally ~0 (the
    normalized eye direction is scale-invariant in it)."""
    from cuda_path_tracer_ss_tpu.models import presets
    from cuda_path_tracer_ss_tpu.models.camera import Camera
    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel import pack_scene
    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel_vjp import (
        render_megakernel_diff)
    from cuda_path_tracer_ss_tpu.render.integrator import camera_arrays, render

    scene = presets.cornell()
    cp = camera_arrays(Camera())
    target = jnp.zeros((8, 8, 3), jnp.float32)
    packed = pack_scene(scene)

    def loss_jnp(cp_, seed):
        img = render(scene, cp_, 8, 8, 1, seed, max_bounces=3,
                     live_cutoff=None)
        return jnp.mean((img - target) ** 2)

    def loss_pal(cp_, seed):
        img = render_megakernel_diff(packed, cp_, seed, 8, 8, 1,
                                     max_bounces=3, interpret=True)
        return jnp.mean((img - target) ** 2)

    g1 = jax.device_get(jax.jit(jax.grad(loss_jnp))(cp, 5))
    g2 = jax.device_get(jax.jit(jax.grad(loss_pal))(cp, 5))
    for name, a, b in zip(("rot", "pos", "tan_half"), g1[:3], g2[:3]):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b, a, atol=1e-4 * scale, rtol=1e-3,
                                   err_msg=f"camera {name}")
        assert np.abs(a).max() > 0, f"no gradient flows to camera {name}"


@pytest.mark.slow
def test_vjp_sphere_geometry_gradients_match_jnp():
    """Full mode: dL/d(sphere center, radius) — interior-only like the jnp
    engine (hit/miss detached) — matches jax.grad of the jnp engine."""
    from cuda_path_tracer_ss_tpu.models import presets
    from cuda_path_tracer_ss_tpu.models.camera import Camera
    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel import pack_scene
    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel_vjp import (
        render_megakernel_diff)
    from cuda_path_tracer_ss_tpu.render import inverse
    from cuda_path_tracer_ss_tpu.render.integrator import camera_arrays, render

    scene = presets.cornell()
    cp = camera_arrays(Camera())
    target = jnp.zeros((8, 8, 3), jnp.float32)
    params = inverse.extract_params(scene, ["sph_center", "sph_radius"])

    def loss_jnp(params, seed):
        s = inverse.merge_params(scene, params)
        img = render(s, cp, 8, 8, 2, seed, max_bounces=4, live_cutoff=None)
        return jnp.mean((img - target) ** 2)

    def loss_pal(params, seed):
        s = inverse.merge_params(scene, params)
        img = render_megakernel_diff(pack_scene(s), cp, seed, 8, 8, 2,
                                     max_bounces=4, interpret=True)
        return jnp.mean((img - target) ** 2)

    g1 = jax.device_get(jax.jit(jax.grad(loss_jnp))(params, 5))
    g2 = jax.device_get(jax.jit(jax.grad(loss_pal))(params, 5))
    for k in ("sph_center", "sph_radius"):
        a, b = np.asarray(g1[k]), np.asarray(g2[k])
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b, a, atol=1e-4 * scale, rtol=1e-3,
                                   err_msg=k)
        assert np.abs(a).max() > 0, f"no gradient flows to {k}"


@pytest.mark.slow
def test_vjp_spec_exp_gradient_matches_jnp():
    """Finite-exponent Phong lobes: d/d(spec_exp) through the sampled
    direction matches the jnp engine (mirror materials made glossy)."""
    from cuda_path_tracer_ss_tpu.models import presets
    from cuda_path_tracer_ss_tpu.models.camera import Camera
    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel import pack_scene
    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel_vjp import (
        render_megakernel_diff)
    from cuda_path_tracer_ss_tpu.render import inverse
    from cuda_path_tracer_ss_tpu.render.integrator import camera_arrays, render

    scene = presets.cornell()
    exp0 = inverse.get_field(scene, "materials.spec_exp")
    scene = inverse.with_field(scene, "materials.spec_exp",
                               jnp.where(jnp.isinf(exp0), 40.0, exp0))
    cp = camera_arrays(Camera())
    target = jnp.zeros((8, 8, 3), jnp.float32)
    params = inverse.extract_params(scene, ["materials.spec_exp"])

    def loss_jnp(params, seed):
        s = inverse.merge_params(scene, params)
        img = render(s, cp, 8, 8, 2, seed, max_bounces=3, live_cutoff=None)
        return jnp.mean((img - target) ** 2)

    def loss_pal(params, seed):
        s = inverse.merge_params(scene, params)
        img = render_megakernel_diff(pack_scene(s), cp, seed, 8, 8, 2,
                                     max_bounces=3, interpret=True)
        return jnp.mean((img - target) ** 2)

    g1 = jax.device_get(jax.jit(jax.grad(loss_jnp))(params, 5))
    g2 = jax.device_get(jax.jit(jax.grad(loss_pal))(params, 5))
    a = np.asarray(g1["materials.spec_exp"])
    b = np.asarray(g2["materials.spec_exp"])
    scale = np.abs(a).max() + 1e-12
    assert scale > 1e-12, "no spec_exp gradient in the oracle"
    np.testing.assert_allclose(b, a, atol=1e-4 * scale, rtol=1e-3)


@pytest.mark.slow
def test_vjp_fd_check():
    """The BASELINE north-star bar, on the fused engine: AD vs central
    finite differences on the same streams."""
    from cuda_path_tracer_ss_tpu.models import presets
    from cuda_path_tracer_ss_tpu.models.camera import Camera
    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel import pack_scene
    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel_vjp import (
        render_megakernel_diff)
    from cuda_path_tracer_ss_tpu.render import inverse
    from cuda_path_tracer_ss_tpu.render.integrator import camera_arrays

    scene = presets.cornell_lambert()
    cp = camera_arrays(Camera())
    target = jnp.zeros((H, W, 3), jnp.float32)

    @jax.jit
    def loss(params, seed):
        s = inverse.merge_params(scene, params)
        img = render_megakernel_diff(pack_scene(s), cp, seed, W, H, SPP,
                                     max_bounces=3, interpret=True)
        return jnp.mean((img - target) ** 2)

    params = inverse.extract_params(scene, ["materials.diffuse", "al_power"])
    ad, fd = inverse.directional_fd_check(loss, params, 0, eps=2e-3,
                                          num_directions=2)
    scale = np.maximum(np.abs(fd), np.abs(ad)).max() + 1e-8
    np.testing.assert_allclose(ad, fd, rtol=0.05, atol=0.02 * scale)


def test_unsupported_field_raises():
    from cuda_path_tracer_ss_tpu.render import inverse

    with pytest.raises(ValueError, match="no gradient"):
        # spec_avg only gates the detached branch choice — zero gradient in
        # BOTH engines, but the jnp engine returns the zero silently while
        # the pallas engine refuses up front
        inverse.check_engine_fields("pallas", ["materials.spec_avg"])
    inverse.check_engine_fields("pallas", ["materials.roughness"])
    inverse.check_engine_fields("pallas", ["sph_center", "sph_radius"])
    inverse.check_engine_fields("jnp", ["materials.spec_avg"])  # fine


@pytest.mark.slow
def test_invert_on_pallas_engine_recovers_albedo():
    """End-to-end: inverse rendering trains on the fused engine."""
    from cuda_path_tracer_ss_tpu.models import presets
    from cuda_path_tracer_ss_tpu.models.camera import Camera
    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel import render_fast2
    from cuda_path_tracer_ss_tpu.render import inverse
    from cuda_path_tracer_ss_tpu.render.integrator import camera_arrays

    scene_true = presets.cornell_lambert()
    cp = camera_arrays(Camera())
    target = render_fast2(scene_true, cp, W, H, SPP, 7, max_bounces=3,
                          interpret=True)
    diffuse_true = inverse.get_field(scene_true, "materials.diffuse")
    scene0 = inverse.with_field(scene_true, "materials.diffuse",
                                jnp.clip(diffuse_true + 0.3, 0.05, 1.0))
    _, params, losses = inverse.invert(
        scene0, cp, target, ["materials.diffuse"], W, H, spp=SPP, steps=50,
        lr=0.1, max_bounces=3, seed=7, engine="pallas_interpret")
    assert losses[-1] < 5e-4, losses[::10]


@pytest.mark.slow
def test_vjp_physical_matches_jnp_autodiff():
    """Physical (unbiased MIS) estimator: the replay kernel's in-kernel
    jax.vjp adjoint (direct phase + emission-MIS pdf chain) matches
    jax.grad of the jnp engine's physical mode on identical streams —
    including spec_avg, which carries a REAL gradient here (it scales the
    NEE lobe probabilities), unlike the parity estimator."""
    from cuda_path_tracer_ss_tpu.models import presets
    from cuda_path_tracer_ss_tpu.models.camera import Camera
    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel import pack_scene
    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel_vjp import (
        render_megakernel_diff)
    from cuda_path_tracer_ss_tpu.render import inverse
    from cuda_path_tracer_ss_tpu.render.integrator import camera_arrays, render

    scene = presets.cornell()
    cp = camera_arrays(Camera())
    target = jnp.zeros((H, W, 3), jnp.float32)
    fields = ["materials.diffuse", "materials.specular",
              "materials.emission", "materials.absorption",
              "materials.diff_avg", "materials.spec_avg", "materials.ior",
              "sph_center", "sph_radius"]
    params = inverse.extract_params(scene, fields)

    def loss_jnp(params, seed):
        s = inverse.merge_params(scene, params)
        img = render(s, cp, W, H, SPP, seed, max_bounces=BOUNCES,
                     live_cutoff=None, physical=True)
        return jnp.mean((img - target) ** 2)

    def loss_pal(params, seed):
        s = inverse.merge_params(scene, params)
        img = render_megakernel_diff(pack_scene(s), cp, seed, W, H, SPP,
                                     max_bounces=BOUNCES, interpret=True,
                                     physical=True)
        return jnp.mean((img - target) ** 2)

    v1, g1 = jax.jit(jax.value_and_grad(loss_jnp))(params, 5)
    v2, g2 = jax.jit(jax.value_and_grad(loss_pal))(params, 5)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    g1, g2 = jax.device_get((g1, g2))
    for k in fields:
        a, b = np.asarray(g1[k]), np.asarray(g2[k])
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b, a, atol=1e-4 * scale, rtol=1e-3,
                                   err_msg=k)
    for k in ("materials.emission", "materials.diffuse",
              "materials.spec_avg", "sph_center"):
        assert np.abs(np.asarray(g1[k])).max() > 0, f"no gradient flows to {k}"


@pytest.mark.slow
def test_vjp_triangle_geometry_gradients_match_jnp():
    """grad_mode='geo': triangle vertex AND corner-normal gradients from the
    replay kernel's Moller-Trumbore/barycentric adjoint match jax.grad of
    the jnp engine (interior-only semantics on both, like the sphere
    fields). Closes the last engine field gap (VERDICT r2 next #3).
    Ref: Primitives.h:26-83 (Moller-Trumbore + barycentric normals)."""
    from cuda_path_tracer_ss_tpu.models.scene import MaterialSpec, SceneBuilder
    from cuda_path_tracer_ss_tpu.models.camera import Camera
    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel import pack_scene
    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel_vjp import (
        render_megakernel_diff)
    from cuda_path_tracer_ss_tpu.render import inverse
    from cuda_path_tracer_ss_tpu.render.integrator import camera_arrays, render

    b = SceneBuilder()
    md = b.add_material(MaterialSpec(diffuse=(0.6, 0.4, 0.3), diff_avg=0.8))
    # tilted quad with unequal corner normals so tri_n* gradients flow
    n0, n1 = (0.1, 0.2, 0.97), (-0.15, 0.1, 0.98)
    b.add_triangle((-1.5, -1.2, -4.0), (1.4, -1.0, -4.4), (0.0, 1.3, -3.8),
                   n0, n1, (0.0, 0.0, 1.0), md)
    b.add_triangle((1.4, -1.0, -4.4), (1.8, 1.2, -4.1), (0.0, 1.3, -3.8),
                   n1, (0.05, -0.1, 0.99), (0.0, 0.0, 1.0), md)
    b.add_point_light((0.5, 2.5, -1.0), (60.0, 55.0, 50.0))
    b.background = np.zeros(3, np.float32)
    scene = b.build()
    cp = camera_arrays(Camera())
    target = jnp.zeros((H, W, 3), jnp.float32)
    fields = ["tri_v0", "tri_v1", "tri_v2", "tri_n0", "tri_n1", "tri_n2",
              "materials.diffuse"]
    params = inverse.extract_params(scene, fields)

    def loss_jnp(params, seed):
        s = inverse.merge_params(scene, params)
        img = render(s, cp, W, H, SPP, seed, max_bounces=3,
                     live_cutoff=None)
        return jnp.mean((img - target) ** 2)

    def loss_pal(params, seed):
        s = inverse.merge_params(scene, params)
        img = render_megakernel_diff(pack_scene(s), cp, seed, W, H, SPP,
                                     max_bounces=3, interpret=True,
                                     grad_mode="geo")
        return jnp.mean((img - target) ** 2)

    v1, g1 = jax.jit(jax.value_and_grad(loss_jnp))(params, 5)
    v2, g2 = jax.jit(jax.value_and_grad(loss_pal))(params, 5)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    g1, g2 = jax.device_get((g1, g2))
    for k in fields:
        a, b_ = np.asarray(g1[k]), np.asarray(g2[k])
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b_, a, atol=1e-4 * scale, rtol=1e-3,
                                   err_msg=k)
    for k in ("tri_v0", "tri_v1", "tri_v2", "tri_n0"):
        assert np.abs(np.asarray(g1[k])).max() > 0, f"no gradient flows to {k}"


def test_physical_field_guard():
    from cuda_path_tracer_ss_tpu.render import inverse

    # spec_avg trains on the physical estimator but not the parity one
    inverse.check_engine_fields("pallas", ["materials.spec_avg"],
                                physical=True)
    with pytest.raises(ValueError, match="no gradient"):
        inverse.check_engine_fields("pallas", ["materials.spec_avg"],
                                    physical=False)
    # al_power drops out in physical mode (NEE reads material emission)
    with pytest.raises(ValueError, match="no gradient"):
        inverse.check_engine_fields("pallas", ["al_power"], physical=True)
