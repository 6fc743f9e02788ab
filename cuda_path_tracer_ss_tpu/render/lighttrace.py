"""Light tracing (adjoint path tracing) — the camera-connection half of
bidirectional path tracing, the reference's last "possibly" feature
(its README.md:35: "possibly bidirectional Path Tracing").

Paths start ON the area lights and walk toward the scene; every vertex
connects to the pinhole camera: a visibility ray plus a splat into the
pixel the vertex projects to. This renders the same integral as the
forward ``--physical`` estimator from the opposite end — the
estimator-agreement test (tests/test_lighttrace.py) is the correctness
bar, exactly like the NEE<->BSDF agreement tests the physical mode uses.
Light tracing complements the forward tracer where eye paths struggle:
caustics (specular chains from the light land on diffuse surfaces as
ordinary connections) and small/occluded lights.

Estimator conventions (same implied-BSDF algebra as the rest of the
framework, ops/bsdf.py "weights as albedos"):

* A light path starts at ``y0`` uniform on a uniformly-picked area light
  (throughput ``n_lights * area * Le``) with a cosine-hemisphere
  direction (two-sided, like the emitter); dividing the cosine by its
  cos/pi density leaves a factor pi.
* Interior vertices scatter with the SAME ``ops/bsdf.scatter`` cascade as
  the forward engines — identical branch probabilities and weights, so a
  light path is statistically a forward path run backwards.
* The camera connection at vertex ``p`` evaluates the implied BSDF in
  FORWARD (eye) orientation — incoming = eye->p — so the reference's
  non-reciprocal quirks (Fresnel-scaled branch probabilities, the
  Cook-Torrance G/nv) are evaluated exactly as the forward estimator
  would see them:

      I[pixel(p)] += beta * f_fwd * cos_cam / r^2 * V(p, eye) * J_img

  where ``J_img = dA_img/dOmega = W*H / (s^2 * aspect * cos^3 theta)``
  converts camera solid angle to image-plane pixel area (the exact
  inverse of the jittered eye-ray parameterization, integrator.py:64-95,
  so both estimators measure the same per-pixel mean).

Scope (documented):

* Camera connections evaluate the diffuse lobe (f = diff_avg * diffuse /
  pi) — specular chains still arrive via connections at their diffuse
  endpoints (that IS the caustic path family). Direct splats from the
  light surface reproduce the emitter image.
* The complementary limitation is fundamental to pure light tracing, not
  an implementation gap: a specular surface SEEN BY THE EYE (a visible
  mirror, glass in view) needs an eye-side subpath — full BDPT's other
  half, which is exactly the forward tracer. The two engines cover
  complementary path families; tests/test_lighttrace.py asserts both the
  agreement on diffuse-visible regions and the documented specular-view
  gap.
* Interior scatter sampling is shared with the forward engine, so scenes
  whose transport uses direction-dependent branch probabilities
  (Fresnel-weighted glass/Phong) carry the forward model's
  non-reciprocity into light-path throughputs — agreement is exact (in
  expectation) for diffuse/mirror/fixed-probability transport and
  approximate elsewhere. QUANTIFIED (round 4,
  tests/test_lighttrace.py::test_nonreciprocal_glass_gap_quantified):
  the dominant term is the reference's weight-1 refraction, which
  preserves radiance through curved interfaces and therefore does not
  conserve energy through a converging lens (the brightness theorem
  trades radiance for etendue); the forward tracer sees the magnified
  solid angle while light paths push emitted power. On the caustic
  preset's arc the ratio lt/fwd measures 1.019 at ior 1.01, 1.32 at
  1.2, 1.36 at 1.5 — not fixable by any per-event throughput factor
  (eta^2 corrections cancel pairwise over enter/exit), vanishing as
  ior -> 1, and independent of Fresnel (1.42 with constant branch
  probabilities). Diffuse-visible regions agree to <2%.
* Interior segments attenuate by Beer-Lambert exactly like the forward
  engine (inside hits, the hit material's absorption — a symmetric
  factor, so it cannot add non-reciprocity; added round 4).

jnp engine; textures supported (the connection reads the same modulated
albedo as ``bounce``)."""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..constants import DEFAULT_MAX_BOUNCES, RAY_BUMP_EPSILON
from ..ops.bsdf import lookup_materials, scatter
from ..ops.intersect import any_hit, nearest_hit, surfel_at
from ..ops.shading import area_light_sample_uniform
from ..ops.vec import Vec3, full_like_vma, match_vma, where as vwhere
from ..utils import rng

INV_PI = 1.0 / jnp.pi


def _camera_frame(cam_params, d: Vec3):
    """Camera-frame components of world direction d (columns of R)."""
    rot = cam_params[0]
    vx = rot[0, 0] * d.x + rot[1, 0] * d.y + rot[2, 0] * d.z
    vy = rot[0, 1] * d.x + rot[1, 1] * d.y + rot[2, 1] * d.z
    vz = rot[0, 2] * d.x + rot[1, 2] * d.y + rot[2, 2] * d.z
    return vx, vy, vz


def camera_splat_weights(cam_params, p: Vec3, width: int, height: int):
    """Everything the pinhole connection needs for points ``p``:
    (pixel_idx, on_screen, d_cam_unit Vec3 eye->p, r2, J_img * cos/r^2).

    ``J_img = dA_img/dOmega`` at the connection direction, derived from
    the eye-ray mapping (integrator.py:64-95): with s = -2 tan(fov/2) and
    image-plane coordinates u = vx/vz, v = vy/vz the pixel area element is
    ``dA_img = (W/|s|)(H/(|s| aspect)) du dv`` and ``dOmega = du dv
    cos^3(theta)``, so J_img = W*H / (s^2 aspect cos^3 theta)."""
    from .silhouette import project_dir
    rot, pos, thf, z_near = cam_params
    eye = Vec3(pos[0], pos[1], pos[2])
    to_p = p - eye.map(lambda a: jnp.broadcast_to(a, p.x.shape))
    r2 = jnp.maximum(to_p.norm2(), 1e-12)
    r = jnp.sqrt(r2)
    d = to_p / r
    px, py, front = project_dir(cam_params, d, width, height)
    on = (front & (px >= 0) & (px < width) & (py >= 0) & (py < height))
    ix = jnp.clip(jnp.floor(px), 0, width - 1).astype(jnp.int32)
    iy = jnp.clip(jnp.floor(py), 0, height - 1).astype(jnp.int32)
    pixel_idx = iy * width + ix
    _, _, vz = _camera_frame(cam_params, d)
    cos_t = jnp.clip(jnp.abs(vz), 1e-4, 1.0)
    s = -2.0 * thf
    aspect = height / width
    j_img = (width * height) / (s * s * aspect * cos_t ** 3)
    return pixel_idx, on, d, r2, r, j_img


def _visible_to_eye(scene, p: Vec3, d_to_eye: Vec3, dist):
    o = p + d_to_eye * RAY_BUMP_EPSILON
    return ~any_hit(o, d_to_eye, dist - 2.0 * RAY_BUMP_EPSILON, scene)


def lighttrace_block(scene, cam_params, width: int, height: int,
                     path_idx, seed,
                     max_bounces: int = DEFAULT_MAX_BOUNCES,
                     sample_idx=0, bidir_nu: float | None = None):
    """UNNORMALIZED splat image ``[width*height, 3]`` for an arbitrary block
    of global light-path indices — the unit of work a device traces in
    sharded light tracing, exactly as ``render_block`` is for eye paths
    (parallel/sharding.py). Streams key on (seed, GLOBAL path index,
    sample_idx, draw), so any tiling of paths over devices produces
    identical per-path contributions; the caller sums blocks (a ``psum``
    over the mesh's path axis) and divides by the total path count."""
    n = path_idx.shape[0]
    L = scene.num_area_lights

    # ---- light emission vertex -------------------------------------------
    u = rng.bounce_rows(seed, path_idx, sample_idx, 0,
                        scene.num_area_lights)
    u0, u1, u2, u3 = u[0], u[1], u[2], u[3]
    li = jnp.minimum((u0 * L).astype(jnp.int32), L - 1)
    # gather the picked light's sample by evaluating each light and masking
    # (L is tiny; mirrors shade's per-light loop)
    point = Vec3.zeros((n,))
    n_l = Vec3.zeros((n,))
    area = jnp.zeros((n,), jnp.float32)
    l_e = Vec3.zeros((n,))
    for k in range(L):
        pk, nk, ak, ek = area_light_sample_uniform(scene, k, u1, u2, u3)
        sel = li == k
        point = vwhere(sel, pk, point)
        n_l = vwhere(sel, nk, n_l)
        area = jnp.where(sel, ak, area)
        l_e = vwhere(sel, ek, l_e)

    # the splat buffer inherits the paths' varying manual axes so the bounce
    # scan carry typechecks inside shard_map (each device holds a full-image
    # partial that the path-axis psum later merges)
    img = match_vma(path_idx, jnp.zeros((width * height, 3), jnp.float32))

    def splat(img, pix, on, contrib: Vec3):
        c = jnp.stack([jnp.where(on, contrib.x, 0.0),
                       jnp.where(on, contrib.y, 0.0),
                       jnp.where(on, contrib.z, 0.0)], -1)
        return img.at[jnp.where(on, pix, 0)].add(
            jnp.where(on[:, None], c, 0.0))

    # ---- direct splat of the emitter surface (what eye rays see as Le) ---
    t_emit = l_e * (float(L) * area)          # 1/pdf of (light, point)
    pix, on, d_c, r2, r, j_img = camera_splat_weights(cam_params, point,
                                                      width, height)
    vis = _visible_to_eye(scene, point, -d_c, r)
    cos_c = jnp.abs(n_l.dot(d_c))             # two-sided emitter
    w_splat = 1.0
    if bidir_nu is not None:
        # vs the forward technique (a camera ray hitting the emitter):
        # p_fwd = C_A = J_img cos / r^2 in area measure at the light point,
        # p_splat = P_L_A = 1/(L * area); counts folded into nu
        c_a0 = j_img * cos_c / r2
        # ratio clamped before squaring (constants.MIS_RATIO_CLAMP: the
        # square overflows to inf and NaNs reverse-mode gradients)
        from ..constants import MIS_RATIO_CLAMP
        r_spl = jnp.minimum(c_a0 * (float(L) * area) / bidir_nu,
                            MIS_RATIO_CLAMP)
        w_splat = 1.0 / (1.0 + r_spl * r_spl)
    img = splat(img, pix, on & vis, t_emit * (w_splat * cos_c / r2 * j_img))

    # ---- leave the light: cosine hemisphere, two-sided -------------------
    from ..ops.sampling import lambert_direction
    side = jnp.where(u0 * L - li.astype(jnp.float32) < 0.5, 1.0, -1.0)
    n_emit = n_l * side                        # random side, prob 1/2 each
    u_dir = rng.bounce_rows(seed, path_idx, sample_idx, 1,
                            scene.num_area_lights)
    d0 = lambert_direction(n_emit, u_dir[0], u_dir[1])
    # pdf factors: (cos/pi) direction, 1/2 side pick -> beta gains pi * 2
    beta = t_emit * (2.0 * jnp.pi)
    origin = point + n_emit * RAY_BUMP_EPSILON

    # bidirectional-MIS carries (zeros/ones when bidir is off; the scan
    # DCEs them). Conventions and recurrences: render/bidir.py.
    cos0 = jnp.abs(n_emit.dot(d0))
    inv_pl_a = float(L) * area                 # 1 / P_L_A per path
    pf_pending = 0.5 * cos0 * INV_PI           # emission solid-angle density
    mis0 = (jnp.zeros_like(area),              # U: chain ratio
            jnp.zeros_like(area),              # r0: pr_0 (complete, area)
            jnp.ones_like(area),               # pr_carry: pr_{n-2}
            jnp.ones_like(area),               # nee_ok gate at x_1 (float)
            pf_pending,                        # fwd model pdf of last scatter
            cos0)                              # prev_cos_out

    state = (origin, d0, beta,
             full_like_vma(origin.x, True, dtype=bool), img, mis0)

    def body(state, b):
        origin, direction, beta, active, img, mis = state
        U, r0, pr_carry, nee_ok, pf_pending, prev_cos_out = mis
        hit = nearest_hit(origin, direction, scene)
        surfel = surfel_at(origin, direction, hit, scene)
        m = lookup_materials(scene.materials, surfel.mat)
        if scene.num_textures:
            from ..ops.texture import apply_maps
            m, surfel = apply_maps(scene, origin, direction, hit, surfel, m)
        act = active & hit.hit

        # Beer-Lambert over interior segments, the forward engine's rule
        # (integrator.py: inside hits attenuate by the hit material's
        # absorption over the segment length; CudaTracer.cu:179-185). The
        # factor is symmetric in the traversal direction, so applying it
        # here keeps the two transport directions consistent on absorbing
        # media (round 4 — previously light paths ignored absorption).
        cos_in = (-direction).dot(surfel.normal)
        t_seg = jnp.where(hit.hit, hit.t, 0.0)
        beer_on = act & (cos_in <= 0.0)
        beta = vwhere(beer_on,
                      beta * Vec3(jnp.exp(-t_seg * m.absorption.x),
                                  jnp.exp(-t_seg * m.absorption.y),
                                  jnp.exp(-t_seg * m.absorption.z)),
                      beta)

        # ---- connect this vertex to the camera (diffuse lobe, forward
        # orientation: f_d = diff_avg * diffuse / pi is direction-free).
        # ONE-SIDED, matching the forward estimator exactly: the eye must
        # see the FRONT face (forward NEE runs only on outside hits,
        # cos_i > 0, and its light cosine clamps at 0 — a back-lit or
        # back-viewed diffuse surface is black in the forward render, so
        # it must stay black here; both gates below reproduce that) ------
        pix, on, d_c, r2, r, j_img = camera_splat_weights(
            cam_params, surfel.point, width, height)
        n_unit = surfel.normal.normalize(eps=1e-20)
        cos_i = (-direction).dot(surfel.normal)
        cos_c = jnp.maximum(-n_unit.dot(d_c), 0.0)   # eye on the front side
        front = (cos_c > 0.0) & (cos_i > 0.0)        # light from outside too
        vis = _visible_to_eye(scene, surfel.point, -d_c, r)
        f_d = m.diffuse * (m.diff_avg * INV_PI)
        w_conn = 1.0
        first = b == 0
        cos_arr = jnp.abs(direction.dot(n_unit))
        t2 = jnp.maximum(jnp.where(hit.hit, hit.t, 1.0) ** 2, 1e-12)
        if bidir_nu is not None:
            # U@n = prod pr_{1..n-2} / (P_L_A pf_0 prod pf_{1..n-1}):
            # complete the pending pf with this arrival's area conversion
            pf_full = jnp.maximum(pf_pending * cos_arr / t2, 1e-20)
            # U@1 = 1/(P_L_A pf_0) = (L area) / pf_0. Clamped per bounce:
            # repeated /pf at the 1e-20 floor would run U to inf, and an
            # inf carry NaNs both the forward value (0 * inf via the
            # nee_ok gate) and every product's VJP — at the ceiling the
            # competing weight is already exactly 0 (MIS_RATIO_CLAMP).
            from ..constants import MIS_RATIO_CLAMP as _RC
            U = jnp.minimum(jnp.where(first, inv_pl_a / pf_full,
                                      U * pr_carry / pf_full), _RC)
            c_a = j_img * cos_c / r2
            prd_sa = m.diff_avg * jnp.maximum((-direction).dot(n_unit),
                                              0.0) * INV_PI
            geo_prev = prev_cos_out / t2
            prd_eff = jnp.where(first, 1.0, prd_sa * geo_prev)
            # P_NEE_A = 1/area = L / (L area) = L / inv_pl_a
            p_nee_a = float(L) / jnp.maximum(inv_pl_a, 1e-20)
            rho_n = (jnp.where(first, 1.0, nee_ok)
                     * c_a * p_nee_a * prd_eff * U)
            r0_eff = jnp.where(first, prd_sa * geo_prev, r0)
            rho_b = c_a * prd_eff * U * r0_eff
            # clamp before squaring (constants.MIS_RATIO_CLAMP rationale)
            from ..constants import MIS_RATIO_CLAMP
            rn = jnp.minimum(rho_n / bidir_nu, MIS_RATIO_CLAMP)
            rb = jnp.minimum(rho_b / bidir_nu, MIS_RATIO_CLAMP)
            w_conn = 1.0 / (1.0 + rn * rn + rb * rb)
        contrib = beta * f_d * (w_conn * cos_c / r2 * j_img)
        img = splat(img, pix, on & vis & act & front, contrib)

        # ---- continue the light path (same scatter cascade as forward) ---
        uu = rng.bounce_rows(seed, path_idx, sample_idx, b + 2,
                             scene.num_area_lights)
        sc = scatter(direction, surfel.point, surfel.normal, m, cos_i,
                     uu[0], uu[1], uu[2])
        if bidir_nu is not None:
            from ..ops.bsdf import chain_model_pdf_taken
            pf_new = chain_model_pdf_taken(direction, surfel.normal, m,
                                           cos_i, sc.direction, sc)
            pr_sa = chain_model_pdf_taken(-sc.direction, surfel.normal, m,
                                          sc.direction.dot(surfel.normal),
                                          -direction, sc)
            pr_full = pr_sa * prev_cos_out / t2
            r0 = jnp.where(first, pr_full, r0)
            pr_carry = jnp.where(first, 1.0, pr_full)
            nee_ok = jnp.where(first,
                               (sc.direction.dot(n_unit) > 0.0)
                               .astype(jnp.float32), nee_ok)
            pf_pending = jnp.where(act, pf_new, pf_pending)
            prev_cos_out = jnp.where(act, jnp.abs(sc.direction.dot(n_unit)),
                                     prev_cos_out)
        mis = (U, r0, pr_carry, nee_ok, pf_pending, prev_cos_out)
        return (sc.origin, sc.direction, beta * sc.weight,
                act & sc.alive, img, mis), None

    state, _ = jax.lax.scan(body, state, jnp.arange(max_bounces))
    return state[4]


@partial(jax.jit, static_argnames=("width", "height", "n_paths",
                                   "max_bounces", "bidir_nu"))
def render_lighttrace(scene, cam_params, width: int, height: int,
                      n_paths: int, seed,
                      max_bounces: int = DEFAULT_MAX_BOUNCES,
                      sample_idx=0, bidir_nu: float | None = None):
    """One batch of ``n_paths`` light paths -> [height, width, 3] image
    estimate (average over batches for more samples; pass distinct
    ``sample_idx`` per batch — the counter RNG keys on (seed, path,
    sample_idx, draw) like the forward engines key on pixels).
    ``bidir_nu``: MIS-weight every splat against the forward techniques
    (render/bidir.py) — pass ``n_paths / spp_forward``."""
    if not scene.num_area_lights:
        raise ValueError("light tracing needs at least one area light")
    path_idx = jnp.arange(n_paths, dtype=jnp.int32)
    img = lighttrace_block(scene, cam_params, width, height, path_idx, seed,
                           max_bounces=max_bounces, sample_idx=sample_idx,
                           bidir_nu=bidir_nu)
    return (img / n_paths).reshape(height, width, 3)
