"""Distributed tests on a virtual 8-device CPU mesh — SURVEY §4 item 5:
sharded rendering must be bitwise identical to single-device, and replicated
scene-parameter gradients must psum correctly through shard_map."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_path_tracer_ss_tpu.models import presets
from cuda_path_tracer_ss_tpu.models.camera import Camera
from cuda_path_tracer_ss_tpu.parallel import mesh as mesh_lib
from cuda_path_tracer_ss_tpu.parallel import sharding
from cuda_path_tracer_ss_tpu.render import integrator, inverse

W = H = 16
SPP = 4
BOUNCES = 3


@pytest.fixture(scope="module")
def setup():
    scene = presets.cornell()
    cp = integrator.camera_arrays(Camera())
    key = 0  # counter-RNG seed
    single = np.asarray(integrator.render(scene, cp, W, H, SPP, key,
                                          max_bounces=BOUNCES, live_cutoff=None))
    return scene, cp, key, single


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_pixel_sharded_bitwise_identical(setup):
    scene, cp, key, single = setup
    mesh = mesh_lib.make_mesh(8)
    out = sharding.render_pixel_sharded(scene, cp, W, H, SPP, key, mesh,
                                        max_bounces=BOUNCES, live_cutoff=None)
    np.testing.assert_array_equal(np.asarray(out), single)


def test_pixel_sharded_two_devices_identical(setup):
    scene, cp, key, single = setup
    mesh = mesh_lib.make_mesh(2)
    out = sharding.render_pixel_sharded(scene, cp, W, H, SPP, key, mesh,
                                        max_bounces=BOUNCES, live_cutoff=None)
    np.testing.assert_array_equal(np.asarray(out), single)


def test_sample_sharded_matches_single(setup):
    scene, cp, key, single = setup
    mesh = mesh_lib.make_mesh(4)
    out = sharding.render_sample_sharded(scene, cp, W, H, SPP, key, mesh,
                                         max_bounces=BOUNCES, live_cutoff=None)
    # psum reorders the sample-sum reduction -> allclose, not bitwise.
    np.testing.assert_allclose(np.asarray(out), single, rtol=1e-5, atol=1e-6)


def test_sharded_gradients_match_single_device(setup):
    scene, cp, key, single = setup
    mesh = mesh_lib.make_mesh(8)
    target = jnp.zeros((H, W, 3), jnp.float32)
    params = inverse.extract_params(scene, ["materials.diffuse", "al_power"])

    def loss_single(params):
        s = inverse.merge_params(scene, params)
        img = integrator.render(s, cp, W, H, SPP, key,
                                max_bounces=BOUNCES, live_cutoff=None)
        return jnp.mean((img - target) ** 2)

    def loss_sharded(params):
        s = inverse.merge_params(scene, params)
        img = sharding.render_pixel_sharded(s, cp, W, H, SPP, key, mesh,
                                            max_bounces=BOUNCES,
                                            live_cutoff=None)
        return jnp.mean((img - target) ** 2)

    g1 = jax.grad(loss_single)(params)
    g2 = jax.jit(jax.grad(loss_sharded))(params)
    for name in params:
        np.testing.assert_allclose(np.asarray(g1[name]), np.asarray(g2[name]),
                                   rtol=1e-4, atol=1e-7, err_msg=name)


def test_mesh_2d_shapes():
    m = mesh_lib.make_mesh_2d(4, 2)
    assert m.shape[mesh_lib.PIXEL_AXIS] == 4
    assert m.shape[mesh_lib.SAMPLE_AXIS] == 2


def test_indivisible_pixels_raises():
    scene = presets.cornell_empty()
    cp = integrator.camera_arrays(Camera())
    mesh = mesh_lib.make_mesh(8)
    with pytest.raises(ValueError, match="not divisible"):
        sharding.render_pixel_sharded(scene, cp, 9, 9, 1,
                                      0, mesh)


def test_2d_mesh_pixel_and_sample_sharding(setup):
    scene, cp, key, single = setup
    mesh = mesh_lib.make_mesh_2d(n_pixel=4, n_sample=2)
    out = sharding.render_2d_sharded(scene, cp, W, H, SPP, key, mesh,
                                     max_bounces=BOUNCES, live_cutoff=None)
    np.testing.assert_allclose(np.asarray(out), single, rtol=1e-5, atol=1e-6)
