"""Hand-derived VJP for the Pallas megakernel: the fast engine trains.

The round-1 megakernel was forward-only (VERDICT missing #1). This module
adds ``render_megakernel_diff`` — a ``jax.custom_vjp`` whose backward pass is
a SECOND Pallas kernel that *replays* every path from the shared
counter-based RNG (utils/rng.py: uniforms are pure functions of
(seed, pixel, sample, pair), so replay is exact) and reverse-accumulates
parameter gradients in VMEM.

Behavioral spec: gradients of the reference estimator
(``/root/reference/CudaTracer/CudaTracer.cu:106-206``) under the jnp
engine's autodiff semantics (SURVEY §7 steps 5-6, hard part (e)): discrete
branch / hit decisions detached, continuous throughput factors
differentiated. Per sample path the estimator is

    pixel = sum_b T_mid(b) * direct(b),      T_mid(b) = T_in(b) * beer(b),
    T_in(b+1) = T_mid(b) * w(b)

with direct(b) = emission + NEE (or background on miss), beer the
Beer-Lambert factor and w the sampled branch weight. The backward kernel
checkpoints (T_mid, w, beer, direct, t, material, branch, ct_w) per bounce
in VMEM scratch during replay, then runs the adjoint recurrence

    A_mid(b) = A_after(b) * w(b) + g * direct(b);   A_in(b) = A_mid(b) * beer(b)

accumulating, per material m via masked plane sums:

    d emission[m]  += g * T_mid                      (replay phase)
    d diffuse[m]   += g * T_mid * diff_avg*q_l*power (NEE, replay phase)
                    + A_after * T_mid                (diffuse branch, reverse)
    d specular[m]  += A_after * T_mid * ct_w_or_1    (specular branch, reverse)
    d absorption[m]+= A_mid * T_mid * (-t)           (reverse)
    d diff_avg[m]  += sum_ch g*T_mid*q_l*(power.diffuse) (replay)
    d power_l      += g * T_mid * diffuse * diff_avg*q_l (replay)
    d background   += g * T_mid on miss              (replay)

Those are the *throughput-linear* parameters (``grad_mode="linear"``).

``grad_mode="full"`` (the default) additionally runs a hand-derived **path
adjoint**: the reverse sweep carries d L/d(origin, direction) per lane and
chains it through every stored bounce — the scatter-branch Jacobians
(Lambert/Beckmann/Phong-lobe rotations, Cook-Torrance geometry term, Snell
refraction), the hit chain (p = o + t d, the winning primitive's analytic
dt/do, dt/dd, and the normal's dependence on the hit — sphere
normalize(p-c), triangle barycentric interpolation), the NEE geometric
terms (cos/d^2 partials w.r.t. hit point and normal, stored pre-scaled at
replay time), Beer-Lambert's path-length adjoint, and finally the eye-ray
Jacobian into the camera. This adds gradients for ``materials.roughness``,
``materials.ior``, ``materials.spec_exp``, ``pl_pos`` (point-light
positions), ``sph_center`` / ``sph_radius`` (sphere geometry,
interior-only — hit/miss boundaries are detached exactly as in the jnp
engine), and the ``cam_params`` pytree (rotation, position, tan_half_fov)
— matching the jnp engine's full autodiff semantics on identical streams
(discrete branch / hit / occlusion decisions detached, continuous factors
differentiated).
tests/test_pallas_vjp.py validates every field against jax.grad of the jnp
engine to float tolerance.

Round 5 — TEXTURED scenes train here too. The replay re-simulates the
texture block (shared ``_texture_block``); color-map texel cotangents
scatter in-kernel (one-hot matmuls into per-lane atlas rows, compiled in
only when 'textures' is optimized); the deferred effective-albedo split
routes ``A_alb`` into material rows (x texel), texel rows (x base albedo
x bilinear weight), and — in full/geo/physical modes — the UV-SWIM chain
(analytic d tex/d(u,v) through the triangle dual basis / the sphere's
polynomial-uv normal partials, plus geo-mode's fixed-p vertex terms via
the metric-solve VJP), injected into the shared hit chain. Color-only
textured scenes train every field set the untextured engine supports.
NORMAL-mapped scenes train in full/physical mode too (round 5, later
still): the reverse sweep pulls the total perturbed-normal cotangent back
through the exact tangent-frame math with an in-kernel ``jax.vjp`` (the
perturbation Jacobian), scatters nmap texel cotangents through the
bilinear corners, and chains the nmap fetch's d texel/d(u,v) into the
same uv-swim routing. Geo mode composes too: the tangent frame moves
with the triangle EDGES, so the pullback takes them as vjp inputs and
accumulates (e1, e2) rows. NO jnp-only texture/mode combination
remains. tests/test_texture.py holds the parity and gating suites.
"""
from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...constants import INV_PI, RAY_BUMP_EPSILON
from ...utils import rng
from .megakernel import (LANES, S_COLS, T_COLS, PackedGrid, PackedScene, _physical_direct,
                         _al_light_geom, _al_sample_point, _dot, _lobe_terms,
                         _make_sweep_fns, _normalize3, _physical_lobes,
                         _physical_prev_pdf, _prim_loop, _render_block_sums,
                         _rotate_y_to, _scatter_sample, _texture_block)

# Material-scattered gradient planes, in row order per material:
# diffuse(3) specular(3) absorption(3) emission(3) diff_avg(1)
P_COLS = 13

# Extra per-bounce checkpoint planes for TEXTURED replay (see
# _make_backward_kernel): deferred NEE albedo adjoint (3), texel
# multipliers (3), bilinear corner indices (4) + weights (4)
TEX_PLANES = 14
NMAP_PLANES = 20

# Fields render_megakernel_diff differentiates (see module docstring).
PALLAS_TRAINABLE_FIELDS = frozenset({
    "materials.diffuse", "materials.specular", "materials.emission",
    "materials.absorption", "materials.diff_avg",
    "al_power", "pl_power", "background",
})

DEF_BWD_ROWS = 16  # measured best (scripts/bench_bwd_rows.py: 8/16/32 ->
                   # 24.9/23.4/25.4 ms per grad step at 256^2x16spp x8b); the
                   # per-bounce checkpoint scratch stays comfortably in VMEM

# Extra material gradient columns in FULL mode (path adjoint): roughness,
# ior, spec_exp — parameters whose gradients flow through the sampled
# directions into every later hit.
P_COLS_FULL = 16

# Physical mode adds spec_avg (col 16): it scales the NEE lobe
# probabilities and the continuation density, so it carries a real
# gradient there (in the parity estimator it only gates detached branch
# choices — structurally zero).
P_COLS_PHYS = 17

# Camera gradient rows appended after background in FULL mode:
# 9 rotation entries (row-major), 3 position, 1 tan_half_fov. z_near has a
# structurally zero gradient (the eye direction is normalize(z_near * v)).
CAM_ROWS = 13

PALLAS_TRAINABLE_FIELDS_FULL = PALLAS_TRAINABLE_FIELDS | frozenset({
    "materials.roughness", "materials.ior", "materials.spec_exp", "pl_pos",
    "sph_center", "sph_radius",
})

# Physical mode: al_power drops out (the unbiased NEE reads the light's
# MATERIAL emission, not the legacy AreaLight power), spec_avg comes in.
PALLAS_TRAINABLE_FIELDS_PHYS = (PALLAS_TRAINABLE_FIELDS_FULL
                                | frozenset({"materials.spec_avg"})) - \
    frozenset({"al_power"})

# Textured scenes on the fast engine (round 5): the replay kernel
# re-simulates the texture block and scatters color-map texel cotangents,
# so the throughput-linear set + the texel values themselves train. (On
# normal-mapped scenes the LINEAR backward covers this set MINUS
# 'textures' — nmap texel gradients need the full chain's perturbation
# pullback; make_loss picks the mode accordingly.)
PALLAS_TRAINABLE_FIELDS_TEX = PALLAS_TRAINABLE_FIELDS | frozenset(
    {"textures"})

# Phase 2 (round 5, late): COLOR-ONLY textured scenes also train the full
# path-adjoint set — the UV-swim chain (d tex/d(u,v) through the per-prim
# uv geometry into the shared hit chain) makes roughness/ior/spec_exp,
# sphere geometry, point-light positions and the camera exact again.
# Triangle-vertex fields (grad_mode="geo") stay jnp-only on textured
# scenes: uv ALSO depends on the moving vertices through the barycentric
# weights, a chain the kernel does not carry.
PALLAS_TRAINABLE_FIELDS_TEX_FULL = PALLAS_TRAINABLE_FIELDS_FULL | frozenset(
    {"textures"})

# Triangle geometry fields (grad_mode="geo"): the packed-space cotangents
# (v0, e1, e2, n0, n1, n2 + area-light vertices) flow back through
# pack_scene's autodiff into the scene's absolute vertices — including the
# light triangles' NEE geometry, exactly like the jnp engine.
TRI_FIELDS = frozenset({"tri_v0", "tri_v1", "tri_v2",
                        "tri_n0", "tri_n1", "tri_n2"})
PALLAS_TRAINABLE_FIELDS_GEO = PALLAS_TRAINABLE_FIELDS_FULL | TRI_FIELDS
PALLAS_TRAINABLE_FIELDS_PHYS_GEO = PALLAS_TRAINABLE_FIELDS_PHYS | TRI_FIELDS


def _grad_rows(counts, full=False, physical=False, tri=False,
               tex_counts=(0, 0)):
    """Total gradient-accumulator rows (before tile padding). Textured
    scenes append 3*R texel-cotangent rows — the channel-planed flat
    atlas layout of ``PackedScene.tex_planes`` — which the flush keeps
    PER LANE (every other row is lane-summed on the host)."""
    num_spheres, num_tris, num_mats, num_pls, num_als = counts
    tex_rows = 3 * tex_counts[1] if tex_counts[0] else 0
    al_stride = 3 + (18 if tri else 0)  # power + (geo) 6 vertices
    tri_rows = 18 * num_tris if tri else 0
    if physical:
        return (num_mats * P_COLS_PHYS + 6 * num_pls + al_stride * num_als
                + 3 + CAM_ROWS + 4 * num_spheres + tri_rows + tex_rows)
    if full:
        return (num_mats * P_COLS_FULL + 6 * num_pls + al_stride * num_als
                + 3 + CAM_ROWS + 4 * num_spheres + tri_rows + tex_rows)
    return num_mats * P_COLS + 3 * num_pls + 3 * num_als + 3 + tex_rows


def _cross(ax, ay, az, bx, by, bz):
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _norm3_vjp(vx, vy, vz, gx, gy, gz, eps):
    """VJP of ``_normalize3`` at v with cotangent g; returns (A_v, n, inv)."""
    n2 = vx * vx + vy * vy + vz * vz
    inv = jax.lax.rsqrt(jnp.maximum(n2, eps))
    nx, ny, nz = vx * inv, vy * inv, vz * inv
    # when the eps clamp is live, n = v * const -> no projection term
    proj = (n2 > eps).astype(jnp.float32) * (nx * gx + ny * gy + nz * gz)
    return ((gx - nx * proj) * inv, (gy - ny * proj) * inv,
            (gz - nz * proj) * inv), (nx, ny, nz), inv


def _rot_y_to_vjp(tx, ty, tz, sx, sy, sz, gx, gy, gz):
    """VJP of ``_rotate_y_to(target, sample)``: cotangent g of the rotated
    vector -> (A_target, A_sample). Recomputes the quaternion internally
    (mirrors megakernel._rotate_y_to including the degenerate fallback)."""
    w0 = 1.0 + ty
    rx, rz = tz, -tx
    n2 = w0 * w0 + rx * rx + rz * rz
    degen = n2 < 1e-12
    inv = jax.lax.rsqrt(jnp.where(degen, 1.0, n2))
    w = w0 * inv
    rhx, rhz = rx * inv, rz * inv
    # u = r_hat x s + w*s   (r_hat y component is 0)
    ux = -rhz * sy + w * sx
    uy = rhz * sx - rhx * sz + w * sy
    uz = rhx * sy + w * sz
    # o = s + 2 r_hat x u
    g2x, g2y, g2z = 2.0 * gx, 2.0 * gy, 2.0 * gz
    # A_rhat += u x (2g); A_u = (2g) x r_hat
    arx, ary, arz = _cross(ux, uy, uz, g2x, g2y, g2z)
    aux, auy, auz = _cross(g2x, g2y, g2z, rhx, jnp.zeros_like(rhx), rhz)
    # u = r_hat x s + w s: A_rhat += s x A_u; A_s = A_u x r_hat + w A_u + g
    cx, cy, cz = _cross(sx, sy, sz, aux, auy, auz)
    arx, ary, arz = arx + cx, ary + cy, arz + cz
    ex, ey, ez = _cross(aux, auy, auz, rhx, jnp.zeros_like(rhx), rhz)
    asx = ex + w * aux + gx
    asy = ey + w * auy + gy
    asz = ez + w * auz + gz
    aw = sx * aux + sy * auy + sz * auz
    # w = w0*inv; r_hat = r*inv  (raw r = (tz, 0, -tx), its y adjoint drops)
    aw0 = inv * aw
    arx_r = inv * arx
    arz_r = inv * arz
    ainv = w0 * aw + rx * arx + rz * arz
    an2 = jnp.where(degen, 0.0, -0.5 * inv * inv * inv * ainv)
    aw0 = aw0 + 2.0 * w0 * an2
    arx_r = arx_r + 2.0 * rx * an2
    arz_r = arz_r + 2.0 * rz * an2
    atx = -arz_r
    aty = aw0
    atz = arx_r
    at = (jnp.where(degen, 0.0, atx), jnp.where(degen, 0.0, aty),
          jnp.where(degen, 0.0, atz))
    a_s = (jnp.where(degen, gx, asx), jnp.where(degen, -gy, asy),
           jnp.where(degen, -gz, asz))
    return at, a_s


def _st_planes_for(full, physical, textured, tex_grads, nmk):
    """Per-bounce checkpoint plane count — ONE formula shared by the
    kernel's layout and the caller's scratch allocation."""
    p = 38 if physical else (33 if full else 16)
    if textured:
        p += TEX_PLANES if tex_grads else 6
        if full:
            p += 12
            if nmk:
                p += NMAP_PLANES
    return p


def _make_backward_kernel(counts, width, height, block_rows, max_bounces,
                          gr_pad, grid_meta=None, full=False,
                          physical=False, tri=False, ucols=None,
                          tex_counts=(0, 0), tex_grads=True,
                          tex_nmap=False):
    if physical or tri:
        full = True  # physical/geo adjoints build on the full path adjoint
    num_spheres, num_tris, num_mats, num_pls, num_als = counts
    shape = (block_rows, LANES)
    n_pixels = width * height
    two_pi = 2.0 * math.pi
    ppb = rng.pairs_per_bounce(num_als)
    pcols = P_COLS_PHYS if physical else (P_COLS_FULL if full else P_COLS)
    textured = tex_counts[0] > 0
    tex_grads = tex_grads and textured
    tex_R = tex_counts[1]
    # physical adds per-bounce planes: 33-35 direct-phase A_d, 36 A_t,
    # 37 A_prev_pdf (consumed by the PREVIOUS bounce's pdf chain).
    # Textured scenes append TEX_PLANES more: 0-2 deferred NEE albedo
    # adjoint (pre-texture), 3-5 texel multipliers, 6-9 bilinear corner
    # flat indices, 10-13 corner weights (masked by has-color-map) —
    # the corner planes and the texel scatter only when the TEXELS
    # themselves are trained (tex_grads; the scatter is the expensive
    # part — docs/PERF.md round-5 texel-scatter table). FULL mode adds 12
    # UV-SWIM planes (phase 2): d tex/d u,v per channel (6, masked by
    # has-color-map) + the overlaid per-prim uv-geometry partials (6;
    # triangles: du/dp, dv/dp; spheres: du/dnux, du/dnuz, dv/dnuy).
    # normal-mapped FULL-mode training (round 5, later still): NMAP_PLANES
    # more — 0-2 the RAW (pre-perturbation) normal, 3-5 the nmap texel
    # sample, 6-9 nmap bilinear corner indices, 10-13 corner weights
    # (masked by has-normal-map & act_hit; stored only under tex_grads),
    # 14-16 / 17-19 d texel/d u,v per channel (masked). The reverse sweep
    # pulls the TOTAL perturbed-normal cotangent back through the exact
    # tangent-frame math with jax.vjp (the perturbation Jacobian).
    nmk = textured and full and tex_nmap
    st_planes = 38 if physical else (33 if full else 16)
    st_tex0 = st_planes
    st_uvg0 = st_nm0 = None
    if textured:
        st_planes += TEX_PLANES if tex_grads else 6
        if full:
            st_uvg0 = st_tex0 + (TEX_PLANES if tex_grads else 6)
            st_planes += 12
            if nmk:
                st_nm0 = st_uvg0 + 12
                st_planes += NMAP_PLANES
    assert st_planes == _st_planes_for(full, physical, textured, tex_grads,
                                       nmk)
    pl_stride = 6 if full else 3
    pl_pow_off = 3 if full else 0
    al_stride = 3 + (18 if tri else 0)  # power + (geo) 6 light vertices
    row_pl0 = num_mats * pcols
    row_al0 = row_pl0 + pl_stride * num_pls
    row_bg0 = row_al0 + al_stride * num_als
    row_cam0 = row_bg0 + 3
    row_geo0 = row_cam0 + CAM_ROWS  # 4 rows per sphere: center(3), radius
    row_tri0 = row_geo0 + 4 * num_spheres  # 18 rows/tri: v0 e1 e2 n0 n1 n2
    # texel-cotangent rows go LAST (per-lane atlas layout; _grad_rows)
    gr_tex_counts = tex_counts if tex_grads else (0, 0)
    row_tex0 = _grad_rows(counts, full, physical, tri,
                          gr_tex_counts) - 3 * (tex_R if tex_grads else 0)
    # mf plane index -> material gradient row column (physical vjp routing)
    MF_TO_COL = {0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 6, 7: 7, 8: 8,
                 9: 9, 10: 10, 11: 11, 12: 15, 13: 14, 14: 12, 15: 16,
                 17: 13}

    def kernel(seed_ref, sph_ref, tri_ref, mat_ref, pl_ref, al_ref, bg_ref,
               cam_ref, *rest):
        rest = list(rest)
        if grid_meta is None:
            grid = None
        else:
            gscal_ref = rest.pop(0)
            gidx_ref = rest.pop(0)
            grid = (gscal_ref, gidx_ref, grid_meta)
        if textured:
            texmeta_ref = rest.pop(0)
            triuv_ref = rest.pop(0)
            matids_ref = rest.pop(0)
            tex_ref = rest.pop(0)
        gx_ref, gy_ref, gz_ref, grad_ref, st_ref, acc_ref = rest
        # replay sweeps: IDENTICAL construction to the forward kernel so the
        # backward pass re-walks the same paths hit-for-hit (full mode also
        # tracks the winning prim index for the intersection Jacobians;
        # textured replay needs it for the UV lookup)
        intersect_sweep, occlusion_sweep = _make_sweep_fns(
            counts, shape, sph_ref, tri_ref, grid=grid,
            track_index=full or textured)
        pid = pl.program_id(0)

        row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        pixel = seed_ref[1] + pid * (block_rows * LANES) + row * LANES + lane
        in_image = (pixel < n_pixels) & (pixel >= 0)
        pxi = (pixel % width).astype(jnp.float32)
        pyi = (pixel // width).astype(jnp.float32)

        r00, r01, r02 = cam_ref[0], cam_ref[1], cam_ref[2]
        r10, r11, r12 = cam_ref[3], cam_ref[4], cam_ref[5]
        r20, r21, r22 = cam_ref[6], cam_ref[7], cam_ref[8]
        cam_x, cam_y, cam_z = cam_ref[9], cam_ref[10], cam_ref[11]
        tan_half, z_near = cam_ref[12], cam_ref[13]

        samp0 = seed_ref[2]
        spp_s = seed_ref[3]

        zero = jnp.zeros(shape, jnp.float32)
        one = jnp.ones(shape, jnp.float32)
        gx = jnp.where(in_image, gx_ref[:], 0.0)
        gy = jnp.where(in_image, gy_ref[:], 0.0)
        gz = jnp.where(in_image, gz_ref[:], 0.0)

        # zero the per-block accumulators (scratch persists across grid steps)
        acc_ref[:] = jnp.zeros_like(acc_ref)

        if physical:
            # sentinel slot max_bounces: the reverse sweep's pdf chain reads
            # b+1's stored direction and pp-adjoint; for the last bounce that
            # slot must exist and be zero (no next bounce -> no MIS chain)
            for q in (19, 20, 21, 37):
                st_ref[max_bounces * st_planes + q] = zero

        def draw(sample_t, pair_t):
            return rng.uniform_pair(seed_ref[0], pixel, sample_t, pair_t)

        def eye_ray(s_glob):
            ju, jv = draw(s_glob, rng.PAIR_EYE)
            jx = pxi + ju
            jy = pyi + jv
            s_fov = -2.0 * tan_half
            sx = (jx * (1.0 / width) - 0.5) * s_fov * z_near
            sy = ((jy * (1.0 / height) - 0.5) * s_fov * z_near
                  * (height / width))
            sz = z_near
            dx0 = r00 * sx + r01 * sy + r02 * sz
            dy0 = r10 * sx + r11 * sy + r12 * sz
            dz0 = r20 * sx + r21 * sy + r22 * sz
            return _normalize3(dx0, dy0, dz0)

        # scratch layout: st_ref[b * st_planes + q] for bounce b, quantity q:
        # 0-2 T_mid, 3-5 w_eff, 6-8 beer_eff, 9-11 direct_eff,
        # 12 t*inside_mask, 13 mat id, 14 branch code, 15 ct_w
        # branch code: 0 none, 1 diffuse, 2 spec-CT, 3 spec-gloss, 4 refr
        # full mode adds: 16-18 hit point p, 19-21 incoming dir d,
        # 22-24 surfel normal n (sphere: unit; triangle: unnormalized
        # barycentric — exactly the forward's), 25 t (act_hit), 26 winning
        # prim index (-1 none), 27-29 NEE d/dp partial (pre-scaled by
        # g*T_mid), 30-32 NEE d/dn partial
        def st_store(b, q, v):
            st_ref[b * st_planes + q] = v

        def st_load(b, q):
            return st_ref[b * st_planes + q]

        def acc_add(r, v):
            acc_ref[r] = acc_ref[r] + v

        # ---------------- one replayed bounce -----------------------------
        def replay_bounce(state, s_glob, b):
            if physical:
                (ox, oy, oz, dx, dy, dz, r1x, r1y, r1z, active_f,
                 pp) = state
            else:
                (ox, oy, oz, dx, dy, dz, r1x, r1y, r1z, active_f) = state
                pp = None
            active = active_f > 0.5
            pair0 = 1 + b * ppb

            if full or textured:
                (best_t, nx, ny, nz, mat_f,
                 prim_f) = intersect_sweep(ox, oy, oz, dx, dy, dz)
            else:
                best_t, nx, ny, nz, mat_f = intersect_sweep(ox, oy, oz,
                                                            dx, dy, dz)
            hit = best_t < jnp.inf
            t_safe = jnp.where(hit, best_t, 0.0)
            px, py, pz = ox + dx * t_safe, oy + dy * t_safe, oz + dz * t_safe

            NF = 20
            # uniform-column skip for the replay's material load (same
            # bitwise-identity argument as the forward kernel; the
            # per-material GRADIENT accumulation loops below are untouched
            # — each material row still owns its cotangent slot)
            uc = ucols if (ucols is not None and num_mats >= 1
                           and len(ucols) == NF) else (False,) * NF
            mf = [(zero + mat_ref[0, f]) if uc[f] else zero
                  for f in range(NF)]
            varying = [f for f in range(NF) if not uc[f]]
            for mi in range(num_mats if varying else 0):
                mask = mat_f == float(mi)
                for f in varying:
                    mf[f] = jnp.where(mask, mat_ref[mi, f], mf[f])
            if textured:
                # replay the forward's texture application EXACTLY (shared
                # _texture_block, megakernel.py) — modulated albedo and
                # perturbed normal feed everything downstream, and the aux
                # bundle (texel multipliers + bilinear corners) drives the
                # deferred albedo routing and texel scatter in the reverse
                # sweep below
                raw_nx, raw_ny, raw_nz = nx, ny, nz
                ((mf[0], mf[1], mf[2], nx, ny, nz),
                 (_has_c, tex_mul, tex_cidx, tex_cw, tex_duv,
                  tex_uvg, nm_aux)) = _texture_block(
                    tex_counts, num_spheres, num_tris, shape,
                    texmeta_ref, triuv_ref, matids_ref, tex_ref, tri_ref,
                    ox, oy, oz, dx, dy, dz, prim_f, mat_f, nx, ny, nz, mf,
                    want_aux=True, want_nmap_aux=nmk)
                has_c_f = _has_c.astype(jnp.float32)
            (m_dr, m_dg, m_db, m_sr, m_sg, m_sb, m_ar, m_ag, m_ab,
             m_er, m_eg, m_eb, m_exp, m_ior, m_pd, m_ps, m_prf, m_rough,
             m_pure, m_ct) = mf

            cos_i = -_dot(dx, dy, dz, nx, ny, nz)
            inside = cos_i <= 0.0
            act_hit = active & hit
            outside_nee = act_hit & (~inside)
            # textured: NEE's per-material diffuse routing is deferred to
            # the reverse sweep (the albedo cotangent must be split into
            # material-row and texel-row parts there); nee_partials
            # accumulates the PRE-texture albedo adjoint here instead
            alb_nee = [zero, zero, zero] if textured else None

            # Beer-Lambert BEFORE direct add (CudaTracer.cu:179-189)
            beer_mask = act_hit & inside
            beer_x = jnp.where(beer_mask, jnp.exp(-t_safe * m_ar), 1.0)
            beer_y = jnp.where(beer_mask, jnp.exp(-t_safe * m_ag), 1.0)
            beer_z = jnp.where(beer_mask, jnp.exp(-t_safe * m_ab), 1.0)
            tmx, tmy, tmz = r1x * beer_x, r1y * beer_y, r1z * beer_z

            # g * T_mid — the adjoint of direct(b); every replay-phase
            # parameter partial is linear in it
            gtx, gty, gtz = gx * tmx, gy * tmy, gz * tmz

            if physical:
                # ---- physical direct lighting + its exact adjoint --------
                # Detached quantities first: light sample points and
                # occlusion (the sweeps are while_loops — not vjp-able, and
                # visibility is discrete anyway). Everything continuous is
                # then differentiated IN-KERNEL with jax.vjp over a pure
                # replica of the forward kernel's physical block
                # (megakernel.py) — the cotangent of direct is g*T_mid,
                # fully known at replay time.
                al_geoms = [_al_light_geom([al_ref[i, k] for k in range(23)])
                            for i in range(num_als)]
                al_draws = []
                for i in range(num_als):
                    u1, u2 = draw(s_glob, pair0 + 2 + 2 * i)
                    _u3, upick = draw(s_glob, pair0 + 3 + 2 * i)
                    al_draws.append((u1, u2, upick))
                nux0, nuy0, nuz0 = _normalize3(nx, ny, nz, 1e-12)

                def occ_of(lx, ly, lz):
                    offx, offy, offz = lx - px, ly - py, lz - pz
                    d2 = jnp.maximum(
                        offx * offx + offy * offy + offz * offz, 1e-12)
                    dist = jnp.sqrt(d2)
                    inv_d = 1.0 / dist
                    return occlusion_sweep(
                        px + nux0 * RAY_BUMP_EPSILON,
                        py + nuy0 * RAY_BUMP_EPSILON,
                        pz + nuz0 * RAY_BUMP_EPSILON,
                        offx * inv_d, offy * inv_d, offz * inv_d,
                        dist - 2.0 * RAY_BUMP_EPSILON)

                occ_pl = [occ_of(pl_ref[i, 0] + zero, pl_ref[i, 1] + zero,
                                 pl_ref[i, 2] + zero)
                          for i in range(num_pls)]
                occ_al = []
                for i in range(num_als):
                    (lx, ly, lz), _ = _al_sample_point(al_geoms[i],
                                                       *al_draws[i])
                    occ_al.append(occ_of(lx, ly, lz))

                pl_planes = [pl_ref[i, k] + zero for i in range(num_pls)
                             for k in range(6)]
                al_lmf = [al_ref[i, 22] for i in range(num_als)]
                le_planes = []
                for i in range(num_als):
                    lm = al_lmf[i].astype(jnp.int32)
                    le_planes += [mat_ref[lm, 9] + zero,
                                  mat_ref[lm, 10] + zero,
                                  mat_ref[lm, 11] + zero]
                # geo mode: the light VERTICES become primals, so areas,
                # normals, sample points and the MIS densities all carry
                # exact vertex cotangents (occlusion stays detached)
                alv_planes = ([al_ref[i, k] + zero for i in range(num_als)
                               for k in range(18)] if tri else [])

                def direct_fn(px_, py_, pz_, nx_, ny_, nz_, dx_, dy_, dz_,
                              t_, pp_, *rest):
                    # thin wrapper over the SHARED physical direct math
                    # (megakernel._physical_direct): lobes and light
                    # geometry are rebuilt from the vjp PRIMALS so their
                    # cotangents flow; occlusion and the light draws stay
                    # detached. jax.vjp of this is the gradient spec.
                    mf_ = rest[:20]
                    pl_planes_ = rest[20:20 + 6 * num_pls]
                    les_ = rest[20 + 6 * num_pls:
                                20 + 6 * num_pls + 3 * num_als]
                    if tri:
                        alvs_ = rest[20 + 6 * num_pls + 3 * num_als:]
                        geoms_ = [_al_light_geom(alvs_[18 * i:18 * i + 18])
                                  for i in range(num_als)]
                    else:
                        geoms_ = al_geoms
                    lb = _physical_lobes(dx_, dy_, dz_, nx_, ny_, nz_,
                                         -_dot(dx_, dy_, dz_,
                                               nx_, ny_, nz_), mf_)
                    t_w_ = jnp.where(hit, t_, 1.0)
                    dr, dg, db = _physical_direct(
                        num_spheres, num_pls, num_als,
                        px_, py_, pz_, nx_, ny_, nz_, dx_, dy_, dz_,
                        t_w_, pp_, lb, mf_, pl_planes_, les_, geoms_,
                        al_draws, occ_pl, occ_al, prim_f,
                        [al_ref[i, 21] for i in range(num_als)])
                    ah = act_hit.astype(jnp.float32)
                    return dr * ah, dg * ah, db * ah

                primals = ((px, py, pz, nx, ny, nz, dx, dy, dz,
                            jnp.where(act_hit, best_t, 0.0), pp)
                           + tuple(mf) + tuple(pl_planes)
                           + tuple(le_planes) + tuple(alv_planes))
                (dir_r, dir_g, dir_b), dvjp = jax.vjp(direct_fn, *primals)
                cots = dvjp((gtx, gty, gtz))
                a_p = cots[0:3]
                a_n = cots[3:6]
                a_dd = cots[6:9]
                a_t = cots[9]
                a_pp = cots[10]
                a_mf = cots[11:31]
                for mi in range(num_mats):
                    mm = (mat_f == float(mi)).astype(jnp.float32)
                    for f, col in MF_TO_COL.items():
                        if textured and f in (0, 1, 2):
                            continue  # deferred below (effective albedo)
                        acc_add(mi * pcols + col, a_mf[f] * mm)
                if textured:
                    # the vjp's diffuse cotangents are w.r.t. the
                    # MODULATED albedo (the primals were the post-texture
                    # planes): defer them like the parity NEE does — the
                    # reverse sweep splits A_alb into material rows
                    # (x texel), texel rows (x base albedo x corner
                    # weight) and the UV-swim chain
                    for c in range(3):
                        alb_nee[c] = alb_nee[c] + a_mf[c]
                base_c = 31
                for i in range(num_pls):
                    for k in range(6):
                        acc_add(row_pl0 + pl_stride * i + k,
                                cots[base_c + 6 * i + k])
                base_c += 6 * num_pls
                for i in range(num_als):
                    for mi in range(num_mats):
                        mm = (al_lmf[i] == float(mi)).astype(jnp.float32)
                        for c in range(3):
                            acc_add(mi * pcols + 9 + c,
                                    cots[base_c + 3 * i + c] * mm)
                if tri:
                    base_c += 3 * num_als
                    for i in range(num_als):
                        for k in range(18):
                            acc_add(row_al0 + al_stride * i + 3 + k,
                                    cots[base_c + 18 * i + k])
                nee_ap = list(a_p)
                nee_an = list(a_n)
            if not physical:
                k_nee = INV_PI / (4.0 * math.pi)

                def light_q(lx, ly, lz):
                    """q (= NEE scale / diff_avg / power / diffuse) and, in
                    full mode, its position/normal partials dq/dp, dq/dn
                    (else None). Occlusion and the cos clamp are detached
                    (discrete)."""
                    offx, offy, offz = lx - px, ly - py, lz - pz
                    d2 = jnp.maximum(offx * offx + offy * offy + offz * offz,
                                     1e-12)
                    dist = jnp.sqrt(d2)
                    inv_d = 1.0 / dist
                    wx, wy, wz = offx * inv_d, offy * inv_d, offz * inv_d
                    occ = occlusion_sweep(px + nx * RAY_BUMP_EPSILON,
                                          py + ny * RAY_BUMP_EPSILON,
                                          pz + nz * RAY_BUMP_EPSILON,
                                          wx, wy, wz,
                                          dist - 2.0 * RAY_BUMP_EPSILON)
                    cl_raw = _dot(nx, ny, nz, wx, wy, wz)
                    cos_l = jnp.maximum(0.0, cl_raw)
                    q = jnp.where(occ, 0.0, cos_l) * k_nee / d2
                    if not full:
                        return q, None, None
                    # q = K * (n.w_hat) / dist^2 (visible, unclamped region):
                    # dq/dp = K/dist^3 (3 cl w_hat - n); dq/dn = K/dist^2 w_hat
                    act = jnp.where(occ | (cl_raw <= 0.0), 0.0, 1.0)
                    c3 = act * k_nee * inv_d / d2
                    dqp = (c3 * (3.0 * cl_raw * wx - nx),
                           c3 * (3.0 * cl_raw * wy - ny),
                           c3 * (3.0 * cl_raw * wz - nz))
                    c2 = act * k_nee / d2
                    dqn = (c2 * wx, c2 * wy, c2 * wz)
                    return q, dqp, dqn

                dir_r, dir_g, dir_b = m_er, m_eg, m_eb
                # emission partial: direct includes emission unconditionally
                for mi in range(num_mats):
                    mmask = (mat_f == float(mi)) & act_hit
                    mm = mmask.astype(jnp.float32)
                    acc_add(mi * pcols + 9, gtx * mm)
                    acc_add(mi * pcols + 10, gty * mm)
                    acc_add(mi * pcols + 11, gtz * mm)

                # full mode: per-bounce NEE position/normal adjoints, summed
                # over lights; stored at planes 27-32 and consumed by the
                # reverse sweep's intersection chain. d direct/dp has the
                # known multiplier g*T_mid at replay time, so these are
                # exact here.
                nee_ap = [zero, zero, zero]
                nee_an = [zero, zero, zero]

                def nee_partials(q, dqp, dqn, pwx, pwy, pwz, power_row):
                    """Accumulate NEE partials for one light with q-factor
                    ``q`` and power (pwx,pwy,pwz); power grads go to rows
                    ``power_row..+2``. Returns (direct contribution, A_q)
                    where A_q is dL/dq for this light (full mode; else
                    None)."""
                    s = m_pd * q
                    cr, cg, cb = (pwx * m_dr * s, pwy * m_dg * s,
                                  pwz * m_db * s)
                    o = outside_nee.astype(jnp.float32)
                    # d power_l += g*T_mid (.) diffuse * diff_avg*q
                    acc_add(power_row + 0, gtx * m_dr * s * o)
                    acc_add(power_row + 1, gty * m_dg * s * o)
                    acc_add(power_row + 2, gtz * m_db * s * o)
                    gsum = (gtx * pwx * m_dr + gty * pwy * m_dg
                            + gtz * pwz * m_db)
                    dav = gsum * q * o
                    if textured:
                        # defer: A_alb (cotangent of the EFFECTIVE albedo
                        # m_d * tex) accumulates here; the reverse sweep
                        # splits it into material rows (x tex) and texel
                        # rows (x base diffuse x corner weight)
                        alb_nee[0] = alb_nee[0] + gtx * pwx * m_pd * q * o
                        alb_nee[1] = alb_nee[1] + gty * pwy * m_pd * q * o
                        alb_nee[2] = alb_nee[2] + gtz * pwz * m_pd * q * o
                    for mi in range(num_mats):
                        mm = ((mat_f == float(mi)) & outside_nee).astype(
                            jnp.float32)
                        if not textured:
                            # d diffuse[m] += g*T_mid * diff_avg*q*power
                            acc_add(mi * pcols + 0, gtx * pwx * m_pd * q * mm)
                            acc_add(mi * pcols + 1, gty * pwy * m_pd * q * mm)
                            acc_add(mi * pcols + 2, gtz * pwz * m_pd * q * mm)
                        # d diff_avg[m] += sum_ch g*T*q*(power.diffuse)
                        acc_add(mi * pcols + 12, dav * mm)
                    if not full:
                        return (cr, cg, cb), None
                    aq = gsum * m_pd * o
                    for c in range(3):
                        nee_ap[c] = nee_ap[c] + aq * dqp[c]
                        nee_an[c] = nee_an[c] + aq * dqn[c]
                    return (cr, cg, cb), aq

                for i in range(num_pls):
                    q, dqp, dqn = light_q(pl_ref[i, 0] + zero,
                                          pl_ref[i, 1] + zero,
                                          pl_ref[i, 2] + zero)
                    (cr, cg, cb), aq = nee_partials(
                        q, dqp, dqn, pl_ref[i, 3], pl_ref[i, 4], pl_ref[i, 5],
                        row_pl0 + pl_stride * i + pl_pow_off)
                    if full:
                        # dq/d(light pos) = -dq/dp (q depends on l - p only;
                        # occlusion is detached)
                        for c in range(3):
                            acc_add(row_pl0 + pl_stride * i + c, -aq * dqp[c])
                    dir_r += jnp.where(inside, 0.0, cr)
                    dir_g += jnp.where(inside, 0.0, cg)
                    dir_b += jnp.where(inside, 0.0, cb)
                for i in range(num_als):
                    u1, u2 = draw(s_glob, pair0 + 2 + 2 * i)
                    u3, upick = draw(s_glob, pair0 + 3 + 2 * i)
                    inv_tot = 1.0 / jnp.maximum(u1 + u2 + u3, 1e-12)
                    w0, w1, w2 = u1 * inv_tot, u2 * inv_tot, u3 * inv_tot
                    first = upick > 0.5
                    a = [al_ref[i, k] for k in range(9)]
                    bpts = [al_ref[i, 9 + k] for k in range(9)]
                    lx = jnp.where(first, a[0] * w0 + a[3] * w1 + a[6] * w2,
                                   bpts[0] * w0 + bpts[3] * w1 + bpts[6] * w2)
                    ly = jnp.where(first, a[1] * w0 + a[4] * w1 + a[7] * w2,
                                   bpts[1] * w0 + bpts[4] * w1 + bpts[7] * w2)
                    lz = jnp.where(first, a[2] * w0 + a[5] * w1 + a[8] * w2,
                                   bpts[2] * w0 + bpts[5] * w1 + bpts[8] * w2)
                    q, dqp, dqn = light_q(lx, ly, lz)
                    (cr, cg, cb), aq = nee_partials(
                        q, dqp, dqn, al_ref[i, 18], al_ref[i, 19],
                        al_ref[i, 20], row_al0 + al_stride * i)
                    if tri:
                        # light-vertex adjoint: l is barycentric-linear in
                        # the 6 packed vertices (weights/pick detached);
                        # dq/dl = -dq/dp (q depends on l - p only)
                        f_f = first.astype(jnp.float32)
                        ws = (w0, w1, w2)
                        for c in range(3):
                            alc = -aq * dqp[c]
                            for k in range(3):
                                base = row_al0 + al_stride * i + 3
                                acc_add(base + 3 * k + c,
                                        alc * ws[k] * f_f)
                                acc_add(base + 9 + 3 * k + c,
                                        alc * ws[k] * (1.0 - f_f))
                    dir_r += jnp.where(inside, 0.0, cr)
                    dir_g += jnp.where(inside, 0.0, cg)
                    dir_b += jnp.where(inside, 0.0, cb)

            # miss: direct_eff = background; also its parameter partial
            miss = active & (~hit)
            mi_f = miss.astype(jnp.float32)
            acc_add(row_bg0 + 0, gtx * mi_f)
            acc_add(row_bg0 + 1, gty * mi_f)
            acc_add(row_bg0 + 2, gtz * mi_f)
            de_r = jnp.where(act_hit, dir_r, jnp.where(miss, bg_ref[0] + zero,
                                                       0.0))
            de_g = jnp.where(act_hit, dir_g, jnp.where(miss, bg_ref[1] + zero,
                                                       0.0))
            de_b = jnp.where(act_hit, dir_b, jnp.where(miss, bg_ref[2] + zero,
                                                       0.0))

            # ---- scatter: the SAME _scatter_sample the forward kernel
            # runs, so the replay is op-for-op identical by construction --
            u_branch, u_a = draw(s_glob, pair0)
            u_b, _unused = draw(s_glob, pair0 + 1)
            (new_ox, new_oy, new_oz, new_dx, new_dy, new_dz, wr, wg, wb,
             alive, take_diff, take_spec, take_refr, tir, ct,
             ct_w) = _scatter_sample(dx, dy, dz, nx, ny, nz, px, py, pz,
                                     cos_i, u_branch, u_a, u_b, mf)

            # ---- checkpoint this bounce ----------------------------------
            code = jnp.where(
                act_hit,
                jnp.where(take_diff, 1.0,
                          jnp.where(take_spec, jnp.where(ct, 2.0, 3.0),
                                    jnp.where(take_refr, 4.0, 0.0))),
                0.0)
            w_eff_x = jnp.where(act_hit, wr, 1.0)
            w_eff_y = jnp.where(act_hit, wg, 1.0)
            w_eff_z = jnp.where(act_hit, wb, 1.0)
            st_store(b, 0, tmx)
            st_store(b, 1, tmy)
            st_store(b, 2, tmz)
            st_store(b, 3, w_eff_x)
            st_store(b, 4, w_eff_y)
            st_store(b, 5, w_eff_z)
            st_store(b, 6, beer_x)
            st_store(b, 7, beer_y)
            st_store(b, 8, beer_z)
            st_store(b, 9, de_r)
            st_store(b, 10, de_g)
            st_store(b, 11, de_b)
            st_store(b, 12, jnp.where(beer_mask, t_safe, 0.0))
            st_store(b, 13, mat_f)
            st_store(b, 14, code)
            st_store(b, 15, ct_w)
            if full:
                st_store(b, 16, px)
                st_store(b, 17, py)
                st_store(b, 18, pz)
                st_store(b, 19, dx)
                st_store(b, 20, dy)
                st_store(b, 21, dz)
                st_store(b, 22, nx)
                st_store(b, 23, ny)
                st_store(b, 24, nz)
                st_store(b, 25, jnp.where(act_hit, t_safe, 0.0))
                st_store(b, 26, jnp.where(act_hit, prim_f, -1.0))
                for c in range(3):
                    st_store(b, 27 + c, nee_ap[c])
                    st_store(b, 30 + c, nee_an[c])
            if physical:
                for c in range(3):
                    st_store(b, 33 + c, a_dd[c])
                st_store(b, 36, a_t)
                st_store(b, 37, a_pp)
            if textured:
                ah_f = act_hit.astype(jnp.float32)
                for c in range(3):
                    st_store(b, st_tex0 + c, alb_nee[c])
                    st_store(b, st_tex0 + 3 + c, tex_mul[c])
                if tex_grads:
                    for k in range(4):
                        st_store(b, st_tex0 + 6 + k,
                                 tex_cidx[k].astype(jnp.float32))
                        # weights pre-masked: only active hits on materials
                        # WITH a color map scatter texel cotangents
                        st_store(b, st_tex0 + 10 + k,
                                 tex_cw[k] * has_c_f * ah_f)
                if full:
                    # UV-swim planes (phase 2): texture-space derivatives
                    # (masked to color-mapped active hits) + the per-prim
                    # uv-geometry partials
                    for c in range(3):
                        st_store(b, st_uvg0 + c,
                                 tex_duv[0][c] * has_c_f * ah_f)
                        st_store(b, st_uvg0 + 3 + c,
                                 tex_duv[1][c] * has_c_f * ah_f)
                    for k in range(6):
                        st_store(b, st_uvg0 + 6 + k, tex_uvg[k] * ah_f)
                if nmk:
                    # normal-map planes: raw normal + the nmap fetch's
                    # adjoint bundle (see the layout comment above)
                    has_n_f = nm_aux[0].astype(jnp.float32) * ah_f
                    st_store(b, st_nm0 + 0, raw_nx)
                    st_store(b, st_nm0 + 1, raw_ny)
                    st_store(b, st_nm0 + 2, raw_nz)
                    for c in range(3):
                        st_store(b, st_nm0 + 3 + c, nm_aux[1][c])
                        st_store(b, st_nm0 + 14 + c,
                                 nm_aux[4][0][c] * has_n_f)
                        st_store(b, st_nm0 + 17 + c,
                                 nm_aux[4][1][c] * has_n_f)
                    if tex_grads:
                        for k in range(4):
                            st_store(b, st_nm0 + 6 + k,
                                     nm_aux[2][k].astype(jnp.float32))
                            st_store(b, st_nm0 + 10 + k,
                                     nm_aux[3][k] * has_n_f)

            # ---- advance the path ----------------------------------------
            nxt = (
                jnp.where(act_hit, new_ox, ox),
                jnp.where(act_hit, new_oy, oy),
                jnp.where(act_hit, new_oz, oz),
                jnp.where(act_hit, new_dx, dx),
                jnp.where(act_hit, new_dy, dy),
                jnp.where(act_hit, new_dz, dz),
                jnp.where(act_hit, tmx * wr, tmx),
                jnp.where(act_hit, tmy * wg, tmy),
                jnp.where(act_hit, tmz * wb, tmz),
                (act_hit & alive).astype(jnp.float32),
            )
            if physical:
                lb_f = _physical_lobes(dx, dy, dz, nx, ny, nz, cos_i, mf)
                pdf_new = _physical_prev_pdf(
                    lb_f, dx, dy, dz, new_dx, new_dy, new_dz,
                    take_diff, take_spec & (~ct), take_spec & ct)
                pp_next = jnp.where(act_hit,
                                    jnp.where(~inside, pdf_new, 0.0), pp)
                nxt = nxt + (pp_next,)
            return nxt

        def gather_cols(idx_f, count, ref, cols, offset=0, stride=None):
            """Masked gather of ``ref[i, c]`` planes for lanes whose
            ``idx_f`` equals ``i + offset`` (same pattern as the material
            gather in the replay phase). ``stride`` reads row-major from a
            FLATTENED 1-D table instead (the primitive tables — see the
            SMEM-padding note in megakernel._make_sweep_fns)."""
            accs = tuple(zero for _ in cols)

            def gbody(i, accs):
                fi = jnp.asarray(i).astype(jnp.float32) + float(offset)
                mask = idx_f == fi
                if stride is None:
                    vals = tuple(ref[i, c] for c in cols)
                else:
                    vals = tuple(ref[i * stride + c] for c in cols)
                return tuple(jnp.where(mask, v, a)
                             for v, a in zip(vals, accs))

            return _prim_loop(count, gbody, accs)

        def _scatter_chain(b, s_glob, mat_f, code, is_diff, is_ct, is_gloss,
                           dwx, dwy, dwz, ao_in, ad_in, sgn):
            """Adjoint of the scatter step: consumes the carried cotangents
            of this bounce's OUTPUT (origin, direction) plus the weight
            cotangent dw = A_after * T_mid, re-deriving the forward's exact
            branch math from the stored (d, n) and replayed uniforms.
            Returns (A_p, A_n, A_d) — the cotangents flowing into the hit
            point, surfel normal and INCOMING direction — and accumulates
            the roughness / ior / spec_exp gradient rows."""
            aopx, aopy, aopz = ao_in
            adpx, adpy, adpz = ad_in
            dx = st_load(b, 19)
            dy = st_load(b, 20)
            dz = st_load(b, 21)
            nx = st_load(b, 22)
            ny = st_load(b, 23)
            nz = st_load(b, 24)
            is_refr = jnp.abs(code - 4.0) < 0.5
            scat = code > 0.5
            eps = RAY_BUMP_EPSILON

            (m_sr, m_sg, m_sb, m_exp, m_ior, m_rough) = gather_cols(
                mat_f, num_mats, mat_ref, (3, 4, 5, 12, 13, 17))

            pair0 = 1 + b * ppb
            _u_branch, u_a = draw(s_glob, pair0)
            u_b, _unused = draw(s_glob, pair0 + 1)

            cos_i = -_dot(dx, dy, dz, nx, ny, nz)
            cos_pos = jnp.abs(cos_i)
            s_ci = sgn(cos_i)
            theta = u_a * two_pi
            cth, sth = jnp.cos(theta), jnp.sin(theta)

            # ---- diffuse: d' = rot(n, cap), o' = p + eps n ----------------
            yy = jnp.sqrt(u_b)
            rr = jnp.sqrt(jnp.maximum(1.0 - yy * yy, 0.0))
            atD, _sD = _rot_y_to_vjp(nx, ny, nz, rr * cth, yy, rr * sth,
                                     adpx, adpy, adpz)
            anD = (atD[0] + eps * aopx, atD[1] + eps * aopy,
                   atD[2] + eps * aopz)

            # ---- Cook-Torrance --------------------------------------------
            u_ac = jnp.minimum(u_a, 1.0 - 1e-7)
            l1p = jnp.log1p(-u_ac)
            btan = -(m_rough * m_rough) * l1p
            binv = jax.lax.rsqrt(1.0 + btan * btan)
            bphi = u_b * two_pi
            cbp, sbp = jnp.cos(bphi), jnp.sin(bphi)
            sb_ = btan * binv
            sbx, sby, sbz = sb_ * cbp, binv, sb_ * sbp
            mx, my, mz = _rotate_y_to(nx, ny, nz, sbx, sby, sbz)
            cmu = _dot(dx, dy, dz, mx, my, mz)
            cos_m = jnp.abs(cmu)
            s_cm = sgn(cmu)
            ctx = dx + 2.0 * cos_m * mx
            cty = dy + 2.0 * cos_m * my
            ctz = dz + 2.0 * cos_m * mz
            vhx_, vhy_, vhz_ = ctx - dx, cty - dy, ctz - dz
            hn2 = vhx_ * vhx_ + vhy_ * vhy_ + vhz_ * vhz_
            hinv = jax.lax.rsqrt(jnp.maximum(hn2, 1e-12))
            hx, hy, hz = vhx_ * hinv, vhy_ * hinv, vhz_ * hinv
            nh_u = _dot(nx, ny, nz, hx, hy, hz)
            nl_u = _dot(nx, ny, nz, ctx, cty, ctz)
            vh_u = _dot(dx, dy, dz, hx, hy, hz)
            nh, nl = jnp.abs(nh_u), jnp.abs(nl_u)
            vh = jnp.maximum(jnp.abs(vh_u), 1e-12)
            nv = jnp.maximum(cos_pos, 1e-6)
            a1 = 2.0 * nh * nl / vh
            b1 = 2.0 * nh * nv / vh
            inner = jnp.minimum(1.0, a1)
            geom = jnp.minimum(inner, b1)
            # weight cotangent: w = spec * ct_w, ct_w = geom/nv
            act_w = dwx * m_sr + dwy * m_sg + dwz * m_sb
            ageom = act_w / nv
            anv = -act_w * geom / (nv * nv)
            mask_b1 = (b1 < inner).astype(jnp.float32)
            mask_a1 = ((a1 < 1.0) & (b1 >= inner)).astype(jnp.float32)
            aa1 = ageom * mask_a1
            ab1 = ageom * mask_b1
            anh = (2.0 * nl / vh) * aa1 + (2.0 * nv / vh) * ab1
            anl = (2.0 * nh / vh) * aa1
            anv = anv + (2.0 * nh / vh) * ab1
            avh = (-a1 / vh) * aa1 + (-b1 / vh) * ab1
            vh_live = (jnp.abs(vh_u) > 1e-12).astype(jnp.float32)
            s_nh, s_nl, s_vh = sgn(nh_u), sgn(nl_u), sgn(vh_u)
            anCx = s_nh * hx * anh + s_nl * ctx * anl
            anCy = s_nh * hy * anh + s_nl * cty * anl
            anCz = s_nh * hz * anh + s_nl * ctz * anl
            ahx = s_nh * nx * anh + s_vh * dx * avh * vh_live
            ahy = s_nh * ny * anh + s_vh * dy * avh * vh_live
            ahz = s_nh * nz * anh + s_vh * dz * avh * vh_live
            adCx = s_vh * hx * avh * vh_live
            adCy = s_vh * hy * avh * vh_live
            adCz = s_vh * hz * avh * vh_live
            # total d'(ct) adjoint: carried + nl term, then h's normalize
            adtx = adpx + s_nl * nx * anl
            adty = adpy + s_nl * ny * anl
            adtz = adpz + s_nl * nz * anl
            (avhv, _, _) = _norm3_vjp(vhx_, vhy_, vhz_, ahx, ahy, ahz, 1e-12)
            adtx, adty, adtz = adtx + avhv[0], adty + avhv[1], adtz + avhv[2]
            adCx, adCy, adCz = adCx - avhv[0], adCy - avhv[1], adCz - avhv[2]
            # o' = p + eps m
            amx, amy, amz = eps * aopx, eps * aopy, eps * aopz
            # d' = d + 2 cos_m m
            adCx, adCy, adCz = adCx + adtx, adCy + adty, adCz + adtz
            amx = amx + 2.0 * cos_m * adtx
            amy = amy + 2.0 * cos_m * adty
            amz = amz + 2.0 * cos_m * adtz
            acos_m = 2.0 * _dot(mx, my, mz, adtx, adty, adtz)
            adCx = adCx + s_cm * mx * acos_m
            adCy = adCy + s_cm * my * acos_m
            adCz = adCz + s_cm * mz * acos_m
            amx = amx + s_cm * dx * acos_m
            amy = amy + s_cm * dy * acos_m
            amz = amz + s_cm * dz * acos_m
            atC, asbv = _rot_y_to_vjp(nx, ny, nz, sbx, sby, sbz,
                                      amx, amy, amz)
            anCx, anCy, anCz = anCx + atC[0], anCy + atC[1], anCz + atC[2]
            asb_ = cbp * asbv[0] + sbp * asbv[2]
            b3 = binv * binv * binv
            abtan = b3 * asb_ - btan * b3 * asbv[1]
            arough = abtan * (-2.0 * m_rough * l1p)
            aciC = s_ci * anv * (cos_pos > 1e-6).astype(jnp.float32)
            adCx, adCy, adCz = (adCx - nx * aciC, adCy - ny * aciC,
                                adCz - nz * aciC)
            anCx, anCy, anCz = (anCx - dx * aciC, anCy - dy * aciC,
                                anCz - dz * aciC)

            # ---- gloss / mirror (Phong lobe about the quirk reflection) ---
            mrx = dx + 2.0 * cos_pos * nx
            mry = dy + 2.0 * cos_pos * ny
            mrz = dz + 2.0 * cos_pos * nz
            fin = jnp.isfinite(m_exp)
            pexp = 1.0 / (jnp.where(fin, m_exp, 0.0) + 1.0)
            s_cl = jnp.clip(u_b, 1e-12, 1.0)
            lg = jnp.log(s_cl)
            ph_y = jnp.where(fin, jnp.exp(pexp * lg), 1.0)
            ph_r2 = jnp.maximum(1.0 - ph_y * ph_y, 0.0)
            ph_r = jnp.sqrt(ph_r2)
            atG, aspv = _rot_y_to_vjp(mrx, mry, mrz, ph_r * cth, ph_y,
                                      ph_r * sth, adpx, adpy, adpz)
            amrx = jnp.where(fin, atG[0], adpx)
            amry = jnp.where(fin, atG[1], adpy)
            amrz = jnp.where(fin, atG[2], adpz)
            aph_r = cth * aspv[0] + sth * aspv[2]
            aph_y = aspv[1] + aph_r * (-ph_y / jnp.maximum(ph_r, 1e-6)) * (
                (ph_r2 > 0.0).astype(jnp.float32))
            aexp = -pexp * pexp * (ph_y * lg * aph_y)
            adGx, adGy, adGz = amrx, amry, amrz
            anGx = 2.0 * cos_pos * amrx + eps * aopx
            anGy = 2.0 * cos_pos * amry + eps * aopy
            anGz = 2.0 * cos_pos * amrz + eps * aopz
            acpG = 2.0 * _dot(nx, ny, nz, amrx, amry, amrz)
            aciG = s_ci * acpG
            adGx, adGy, adGz = (adGx - nx * aciG, adGy - ny * aciG,
                                adGz - nz * aciG)
            anGx, anGy, anGz = (anGx - dx * aciG, anGy - dy * aciG,
                                anGz - dz * aciG)

            # ---- refraction ------------------------------------------------
            outside = cos_i > 0.0
            n1 = jnp.where(outside, 1.0, m_ior)
            n2_ = jnp.where(outside, m_ior, 1.0)
            n_ratio = n1 / jnp.maximum(n2_, 1e-12)
            sin_t2 = n_ratio * n_ratio * (1.0 - cos_pos * cos_pos)
            tir = sin_t2 > 1.0
            cos_t = jnp.sqrt(jnp.where(tir, 1.0,
                                       jnp.maximum(1.0 - sin_t2, 0.0)))
            rf0x = n_ratio * dx + (n_ratio * cos_pos - cos_t) * nx
            rf0y = n_ratio * dy + (n_ratio * cos_pos - cos_t) * ny
            rf0z = n_ratio * dz + (n_ratio * cos_pos - cos_t) * nz
            # o' = p + eps d'
            adrx = adpx + eps * aopx
            adry = adpy + eps * aopy
            adrz = adpz + eps * aopz
            (arf, _, _) = _norm3_vjp(rf0x, rf0y, rf0z, adrx, adry, adrz,
                                     1e-12)
            adRx, adRy, adRz = n_ratio * arf[0], n_ratio * arf[1], (
                n_ratio * arf[2])
            coef_n = n_ratio * cos_pos - cos_t
            anRx, anRy, anRz = coef_n * arf[0], coef_n * arf[1], (
                coef_n * arf[2])
            n_dot_arf = _dot(nx, ny, nz, arf[0], arf[1], arf[2])
            anrat = _dot(dx, dy, dz, arf[0], arf[1], arf[2]) + (
                cos_pos * n_dot_arf)
            acpR = n_ratio * n_dot_arf
            acost = -n_dot_arf
            asin2 = jnp.where(tir, 0.0,
                              -acost / (2.0 * jnp.maximum(cos_t, 1e-6)))
            anrat = anrat + 2.0 * n_ratio * (1.0 - cos_pos * cos_pos) * asin2
            acpR = acpR - 2.0 * n_ratio * n_ratio * cos_pos * asin2
            aior = anrat * jnp.where(
                outside, -1.0 / jnp.maximum(m_ior * m_ior, 1e-12), 1.0)
            aciR = s_ci * acpR
            adRx, adRy, adRz = (adRx - nx * aciR, adRy - ny * aciR,
                                adRz - nz * aciR)
            anRx, anRy, anRz = (anRx - dx * aciR, anRy - dy * aciR,
                                anRz - dz * aciR)

            # ---- combine by the replayed branch, route parameter rows -----
            def pick(vD, vC, vG, vR):
                return jnp.where(
                    is_diff, vD,
                    jnp.where(is_ct, vC,
                              jnp.where(is_gloss, vG,
                                        jnp.where(is_refr, vR, 0.0))))

            ap = (jnp.where(scat, aopx, 0.0), jnp.where(scat, aopy, 0.0),
                  jnp.where(scat, aopz, 0.0))
            an = (pick(anD[0], anCx, anGx, anRx),
                  pick(anD[1], anCy, anGy, anRy),
                  pick(anD[2], anCz, anGz, anRz))
            ade = (pick(0.0, adCx, adGx, adRx),
                   pick(0.0, adCy, adGy, adRy),
                   pick(0.0, adCz, adGz, adRz))
            gl_fin = is_gloss & fin
            for mi in range(num_mats):
                mmask = mat_f == float(mi)
                acc_add(mi * pcols + 13,
                        jnp.where(mmask & is_ct, arough, 0.0))
                acc_add(mi * pcols + 14,
                        jnp.where(mmask & is_refr, aior, 0.0))
                acc_add(mi * pcols + 15,
                        jnp.where(mmask & gl_fin, aexp, 0.0))
            return ap, an, ade

        def _hit_chain(b, mat_f, amid, tm, t_in, ap, an, ade, co, cd, sgn,
                       at_extra=None):
            """Adjoint of the hit: normal -> (point | barycentrics), point ->
            (origin, direction, t), t -> (origin, direction) via the winning
            primitive's analytic intersection Jacobian, plus the Beer factor's
            t adjoint. ``at_extra`` (physical mode) is the direct phase's
            stored dL/dt — the emission-MIS weight depends on the hit
            distance through p_l_hit = t^2/(A cos). Returns the cotangent of
            this bounce's INPUT ray; lanes without an active hit pass the
            carry through."""
            ax_, ay_, az_ = amid
            tmx, tmy, tmz = tm
            px = st_load(b, 16)
            py = st_load(b, 17)
            pz = st_load(b, 18)
            dx = st_load(b, 19)
            dy = st_load(b, 20)
            dz = st_load(b, 21)
            # normal-mapped: planes 22-24 hold the PERTURBED normal (the
            # scatter/NEE consumers' value); the geometric chains below
            # need the RAW one, and the NEE normal partials were already
            # folded into ``an`` by the perturbation pullback
            if nmk:
                nx = st_load(b, st_nm0 + 0)
                ny = st_load(b, st_nm0 + 1)
                nz = st_load(b, st_nm0 + 2)
            else:
                nx = st_load(b, 22)
                ny = st_load(b, 23)
                nz = st_load(b, 24)
            t_hit = st_load(b, 25)
            prim_f = st_load(b, 26)
            act_hit = prim_f > -0.5

            apx = ap[0] + st_load(b, 27)
            apy = ap[1] + st_load(b, 28)
            apz = ap[2] + st_load(b, 29)
            anx = an[0] + (0.0 if nmk else st_load(b, 30))
            any_ = an[1] + (0.0 if nmk else st_load(b, 31))
            anz = an[2] + (0.0 if nmk else st_load(b, 32))

            # Beer-Lambert's t adjoint: dL/dt = sum_c A_mid_c T_mid_c (-a_c)
            (m_ar, m_ag, m_ab) = gather_cols(mat_f, num_mats, mat_ref,
                                             (6, 7, 8))
            tb = (t_in > 0.0).astype(jnp.float32)
            at = -(ax_ * tmx * m_ar + ay_ * tmy * m_ag
                   + az_ * tmz * m_ab) * tb
            if at_extra is not None:
                at = at + at_extra

            is_sph = act_hit & (prim_f < float(num_spheres))

            # sphere: n = normalize(p - c) -> A_n feeds A_p (and -A_c)
            (scx, scy, scz, s_r) = gather_cols(prim_f, num_spheres, sph_ref,
                                               (0, 1, 2, 3), stride=S_COLS)
            gvx, gvy, gvz = px - scx, py - scy, pz - scz
            invg = jax.lax.rsqrt(jnp.maximum(
                gvx * gvx + gvy * gvy + gvz * gvz, 1e-18))
            ndot = nx * anx + ny * any_ + nz * anz
            apnx = (anx - nx * ndot) * invg
            apny = (any_ - ny * ndot) * invg
            apnz = (anz - nz * ndot) * invg
            apx = apx + jnp.where(is_sph, apnx, 0.0)
            apy = apy + jnp.where(is_sph, apny, 0.0)
            apz = apz + jnp.where(is_sph, apnz, 0.0)

            # triangle: unnormalized n = n0 + w1 (n1-n0) + w2 (n2-n0)
            (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,
             n0x, n0y, n0z, n1x, n1y, n1z, n2x, n2y, n2z) = gather_cols(
                prim_f, num_tris, tri_ref, tuple(range(18)),
                offset=num_spheres, stride=T_COLS)
            d10x, d10y, d10z = n1x - n0x, n1y - n0y, n1z - n0z
            d20x, d20y, d20z = n2x - n0x, n2y - n0y, n2z - n0z
            aw1 = anx * d10x + any_ * d10y + anz * d10z
            aw2 = anx * d20x + any_ * d20y + anz * d20z

            # p = o + t d
            at = at + apx * dx + apy * dy + apz * dz
            adx_p = t_hit * apx
            ady_p = t_hit * apy
            adz_p = t_hit * apz

            # sphere t chain: dt/do = -g/(d.g), dt/dd = -t g/(d.g)
            denom = _dot(dx, dy, dz, gvx, gvy, gvz)
            dsafe = sgn(denom) * jnp.maximum(jnp.abs(denom), 1e-9)
            coef = -at / dsafe
            aox_s, aoy_s, aoz_s = coef * gvx, coef * gvy, coef * gvz
            adx_s = t_hit * coef * gvx
            ady_s = t_hit * coef * gvy
            adz_s = t_hit * coef * gvz

            # sphere geometry rows: dt/dc = +g/(d.g) (translation inverse of
            # dt/do), dt/dr = r/(d.g); the normal's c-dependence is the
            # negative of its p-dependence
            acx = jnp.where(is_sph, -apnx - coef * gvx, 0.0)
            acy = jnp.where(is_sph, -apny - coef * gvy, 0.0)
            acz = jnp.where(is_sph, -apnz - coef * gvz, 0.0)
            ar_ = jnp.where(is_sph, at * s_r / dsafe, 0.0)
            for si in range(num_spheres):
                mm = (prim_f == float(si)).astype(jnp.float32)
                acc_add(row_geo0 + 4 * si + 0, acx * mm)
                acc_add(row_geo0 + 4 * si + 1, acy * mm)
                acc_add(row_geo0 + 4 * si + 2, acz * mm)
                acc_add(row_geo0 + 4 * si + 3, ar_ * mm)

            # triangle t/w chain (Moller-Trumbore rewritten on triple
            # products: t = s.(e1 x e2)/det, w1 = s.(d x e2)/det,
            # w2 = s.(e1 x d)/det, det = -d.(e1 x e2), s = o - v0)
            sx_ = (px - t_hit * dx) - v0x
            sy_ = (py - t_hit * dy) - v0y
            sz_ = (pz - t_hit * dz) - v0z
            Ax, Ay, Az = _cross(e1x, e1y, e1z, e2x, e2y, e2z)
            det = -(dx * Ax + dy * Ay + dz * Az)
            idet = 1.0 / (sgn(det) * jnp.maximum(jnp.abs(det), 1e-9))
            qx, qy, qz = _cross(dx, dy, dz, e2x, e2y, e2z)
            rvx, rvy, rvz = _cross(sx_, sy_, sz_, e1x, e1y, e1z)
            w1 = (sx_ * qx + sy_ * qy + sz_ * qz) * idet
            w2 = (dx * rvx + dy * rvy + dz * rvz) * idet
            e1dx, e1dy, e1dz = _cross(e1x, e1y, e1z, dx, dy, dz)
            e2sx, e2sy, e2sz = _cross(e2x, e2y, e2z, sx_, sy_, sz_)
            aox_t = (at * Ax + aw1 * qx + aw2 * e1dx) * idet
            aoy_t = (at * Ay + aw1 * qy + aw2 * e1dy) * idet
            aoz_t = (at * Az + aw1 * qz + aw2 * e1dz) * idet
            adx_t = (at * t_hit * Ax + aw1 * (e2sx + w1 * Ax)
                     + aw2 * (rvx + w2 * Ax)) * idet
            ady_t = (at * t_hit * Ay + aw1 * (e2sy + w1 * Ay)
                     + aw2 * (rvy + w2 * Ay)) * idet
            adz_t = (at * t_hit * Az + aw1 * (e2sz + w1 * Az)
                     + aw2 * (rvz + w2 * Az)) * idet

            if tri and num_tris:
                # ---- triangle PARAMETER rows (grad_mode="geo") ----------
                # Adjoints w.r.t. the packed (v0, e1, e2) and the corner
                # normals, interior-only (the hit pick stays detached).
                # A = e1 x e2 reaches t through numerator AND det; q = d x
                # e2 reaches w1; r = s x e1 reaches w2; s's own adjoint is
                # the origin chain already computed above, so
                # a_v0 = -(a_s) exactly.
                is_tri = act_hit & (~is_sph)
                kw = aw1 * w1 + aw2 * w2
                pvx, pvy, pvz = px - v0x, py - v0y, pz - v0z
                aAx = idet * (at * pvx + kw * dx)
                aAy = idet * (at * pvy + kw * dy)
                aAz = idet * (at * pvz + kw * dz)
                # a_e1 = e2 x a_A + (aw2*idet) d x s;  a_e2 = a_A x e1 +
                # (aw1*idet) s x d
                c1x, c1y, c1z = _cross(e2x, e2y, e2z, aAx, aAy, aAz)
                c2x, c2y, c2z = _cross(aAx, aAy, aAz, e1x, e1y, e1z)
                dsx, dsy, dsz = _cross(dx, dy, dz, sx_, sy_, sz_)
                ae1x = c1x + aw2 * idet * dsx
                ae1y = c1y + aw2 * idet * dsy
                ae1z = c1z + aw2 * idet * dsz
                ae2x = c2x - aw1 * idet * dsx
                ae2y = c2y - aw1 * idet * dsy
                ae2z = c2z - aw1 * idet * dsz
                w0b = 1.0 - w1 - w2
                tz_ = jnp.zeros_like(at)
                vals = [jnp.where(is_tri, v, tz_) for v in (
                    -aox_t, -aoy_t, -aoz_t,
                    ae1x, ae1y, ae1z, ae2x, ae2y, ae2z,
                    anx * w0b, any_ * w0b, anz * w0b,
                    anx * w1, any_ * w1, anz * w1,
                    anx * w2, any_ * w2, anz * w2)]
                for ti in range(num_tris):
                    mm = (prim_f == float(num_spheres + ti)).astype(
                        jnp.float32)
                    for k in range(18):
                        acc_add(row_tri0 + 18 * ti + k, vals[k] * mm)

            nao = (jnp.where(act_hit,
                             apx + jnp.where(is_sph, aox_s, aox_t), co[0]),
                   jnp.where(act_hit,
                             apy + jnp.where(is_sph, aoy_s, aoy_t), co[1]),
                   jnp.where(act_hit,
                             apz + jnp.where(is_sph, aoz_s, aoz_t), co[2]))
            nad = (jnp.where(act_hit, ade[0] + adx_p
                             + jnp.where(is_sph, adx_s, adx_t), cd[0]),
                   jnp.where(act_hit, ade[1] + ady_p
                             + jnp.where(is_sph, ady_s, ady_t), cd[1]),
                   jnp.where(act_hit, ade[2] + adz_p
                             + jnp.where(is_sph, adz_s, adz_t), cd[2]))
            return nao[0], nao[1], nao[2], nad[0], nad[1], nad[2]

        # ---------------- reverse sweep over one sample's bounces ----------
        def reverse_bounces(s_glob):
            """Adjoint recurrence over the stored bounces. Returns the final
            (A_origin, A_direction) — the cotangent of the sample's eye ray
            (zero unless ``full``)."""

            def sgn(x):
                return jnp.where(x >= 0.0, 1.0, -1.0)

            def body(carry):
                (b, ax, ay, az, aox, aoy, aoz, adx, ady, adz) = carry
                tmx, tmy, tmz = st_load(b, 0), st_load(b, 1), st_load(b, 2)
                wx, wy, wz = st_load(b, 3), st_load(b, 4), st_load(b, 5)
                bx, by, bz = st_load(b, 6), st_load(b, 7), st_load(b, 8)
                der, deg, deb = st_load(b, 9), st_load(b, 10), st_load(b, 11)
                t_in = st_load(b, 12)
                mat_f = st_load(b, 13)
                code = st_load(b, 14)
                ct_w = st_load(b, 15)

                # scatter factor: d w = A_after * T_mid, routed by branch
                dwx, dwy, dwz = ax * tmx, ay * tmy, az * tmz
                is_diff = jnp.abs(code - 1.0) < 0.5
                is_ct = jnp.abs(code - 2.0) < 0.5
                is_gloss = jnp.abs(code - 3.0) < 0.5
                spec_scale = jnp.where(is_ct, ct_w,
                                       jnp.where(is_gloss, 1.0, 0.0))
                if textured:
                    # combined EFFECTIVE-albedo cotangent: deferred NEE part
                    # (replay phase) + the diffuse branch weight's
                    # w = (m_d * tex)
                    df_f = is_diff.astype(jnp.float32)
                    a_alb = (st_load(b, st_tex0 + 0) + dwx * df_f,
                             st_load(b, st_tex0 + 1) + dwy * df_f,
                             st_load(b, st_tex0 + 2) + dwz * df_f)
                    tex_m = (st_load(b, st_tex0 + 3),
                             st_load(b, st_tex0 + 4),
                             st_load(b, st_tex0 + 5))
                for mi in range(num_mats):
                    mm = (mat_f == float(mi)).astype(jnp.float32)
                    if textured:
                        # d diffuse[m] = A_alb * tex (tex == 1 where the
                        # material has no color map)
                        acc_add(mi * pcols + 0, a_alb[0] * tex_m[0] * mm)
                        acc_add(mi * pcols + 1, a_alb[1] * tex_m[1] * mm)
                        acc_add(mi * pcols + 2, a_alb[2] * tex_m[2] * mm)
                    else:
                        df = mm * is_diff.astype(jnp.float32)
                        acc_add(mi * pcols + 0, dwx * df)
                        acc_add(mi * pcols + 1, dwy * df)
                        acc_add(mi * pcols + 2, dwz * df)
                    sf = mm * spec_scale
                    acc_add(mi * pcols + 3, dwx * sf)
                    acc_add(mi * pcols + 4, dwy * sf)
                    acc_add(mi * pcols + 5, dwz * sf)
                def scatter_texels(b, plane0, tvals):
                    """Scatter per-lane per-channel texel cotangents
                    ``tvals`` through the 4 bilinear corners stored at
                    ``plane0`` (+0-3 flat indices, +4-7 pre-masked
                    weights) into the channel-planed atlas rows — the
                    one-hot matmul reduction."""
                    cio = jax.lax.broadcasted_iota(
                        jnp.int32, (block_rows, LANES, LANES), 2)
                    ones_l = jnp.ones((1, block_rows * LANES), jnp.float32)
                    sub0 = jax.lax.broadcasted_iota(
                        jnp.int32, shape, 0) == 0
                    for k in range(4):
                        idx = st_load(b, plane0 + k).astype(jnp.int32)
                        wk = st_load(b, plane0 + 4 + k)
                        irow = jax.lax.shift_right_logical(
                            idx, LANES.bit_length() - 1)
                        icol = idx & (LANES - 1)
                        oh = (icol[:, :, None] == cio).astype(jnp.float32)
                        for c in range(3):
                            vc = tvals[c] * wk
                            for r in range(tex_R):
                                vr = jnp.where(irow == r, vc, 0.0)
                                d3 = (oh * vr[:, :, None]).reshape(
                                    block_rows * LANES, LANES)
                                vec = jax.lax.dot(
                                    ones_l, d3,
                                    precision=jax.lax.Precision.HIGHEST)
                                acc_add(row_tex0 + c * tex_R + r,
                                        jnp.where(sub0,
                                                  jnp.broadcast_to(
                                                      vec, shape), 0.0))

                if tex_grads:
                    # d texel[corner] = sum_ch-wise A_alb * base diffuse,
                    # scattered through the bilinear corners into the
                    # channel-planed atlas rows (corner weights were
                    # pre-masked by has-color-map & act_hit)
                    m_d0 = gather_cols(mat_f, num_mats, mat_ref, (0, 1, 2))
                    scatter_texels(b, st_tex0 + 6,
                                   [a_alb[c] * m_d0[c] for c in range(3)])

                if physical:
                    # pdf chain: bounce b's scatter produced prev_pdf for
                    # bounce b+1, whose emission-MIS adjoint was stored at
                    # replay time (plane 37 of slot b+1; the sentinel slot
                    # max_bounces is zeroed). Differentiate the continuation
                    # density w.r.t. this bounce's (d, n, new_d, materials)
                    # with jax.vjp over the same helper the forward runs.
                    app = st_load(b + 1, 37)
                    ndx_ = st_load(b + 1, 19)
                    ndy_ = st_load(b + 1, 20)
                    ndz_ = st_load(b + 1, 21)
                    pdx = st_load(b, 19)
                    pdy = st_load(b, 20)
                    pdz = st_load(b, 21)
                    pnx = st_load(b, 22)
                    pny = st_load(b, 23)
                    pnz = st_load(b, 24)
                    act_hit_b = st_load(b, 26) > -0.5
                    cosi_b = -_dot(pdx, pdy, pdz, pnx, pny, pnz)
                    # pp(b+1) = where(act_hit & outside, pdf_new, 0): the
                    # masked-away side carries no adjoint
                    app = app * jnp.where(act_hit_b & (cosi_b > 0.0),
                                          1.0, 0.0)
                    mf20 = gather_cols(mat_f, num_mats, mat_ref,
                                       tuple(range(20)))

                    def pdf_fn(dx_, dy_, dz_, nx_, ny_, nz_,
                               ndxx, ndyy, ndzz, *mf_):
                        lb_ = _physical_lobes(
                            dx_, dy_, dz_, nx_, ny_, nz_,
                            -_dot(dx_, dy_, dz_, nx_, ny_, nz_), mf_)
                        return _physical_prev_pdf(
                            lb_, dx_, dy_, dz_, ndxx, ndyy, ndzz,
                            is_diff, is_gloss, is_ct)

                    _pv, pvjp = jax.vjp(pdf_fn, pdx, pdy, pdz,
                                        pnx, pny, pnz, ndx_, ndy_, ndz_,
                                        *mf20)
                    pcots = pvjp(app)
                    # new_d is this bounce's OUTPUT direction — same slot
                    # the carried direction cotangent addresses
                    adx = adx + pcots[6]
                    ady = ady + pcots[7]
                    adz = adz + pcots[8]
                    pdf_ad = pcots[0:3]
                    pdf_an = pcots[3:6]
                    pmf = pcots[9:29]
                    for mi in range(num_mats):
                        mm = (mat_f == float(mi)).astype(jnp.float32)
                        for f, col in MF_TO_COL.items():
                            acc_add(mi * pcols + col, pmf[f] * mm)

                if full:
                    ap, an, ade = _scatter_chain(
                        b, s_glob, mat_f, code, is_diff, is_ct, is_gloss,
                        dwx, dwy, dwz, (aox, aoy, aoz), (adx, ady, adz), sgn)
                if physical:
                    # direct-phase d/t adjoints (the physical NEE's lobes
                    # depend on the incoming direction; the emission MIS on
                    # t) + the pdf chain's (d, n) contributions
                    ade = (ade[0] + st_load(b, 33) + pdf_ad[0],
                           ade[1] + st_load(b, 34) + pdf_ad[1],
                           ade[2] + st_load(b, 35) + pdf_ad[2])
                    an = (an[0] + pdf_an[0], an[1] + pdf_an[1],
                          an[2] + pdf_an[2])
                nm_texA = None
                if nmk:
                    # ---- PERTURBATION PULLBACK (round 5, later still) --
                    # Every A_n contribution so far (scatter chain,
                    # physical pdf chain, stored NEE partials) is a
                    # cotangent of the PERTURBED normal — the one the
                    # forward used for cos_i / NEE / scatter. Pull the
                    # TOTAL back through the exact tangent-frame math of
                    # _texture_block (megakernel.py) with jax.vjp: raw
                    # normal in, nmap texel sample in, perturbed normal
                    # out. The raw-normal cotangent feeds the hit chain;
                    # the texel cotangent feeds the nmap corner scatter
                    # and (via d texel/d u,v) the uv-swim chain.
                    an = (an[0] + st_load(b, 30),
                          an[1] + st_load(b, 31),
                          an[2] + st_load(b, 32))
                    prim_nm = st_load(b, 26)
                    act_nm = prim_nm > -0.5
                    m_nm = jnp.full(shape, -1.0, jnp.float32)
                    for mi in range(num_mats):
                        m_nm = jnp.where(mat_f == float(mi),
                                         matids_ref[mi * 2 + 1], m_nm)
                    sel_n = act_nm & (m_nm >= 0.0)
                    rnx = st_load(b, st_nm0 + 0)
                    rny = st_load(b, st_nm0 + 1)
                    rnz = st_load(b, st_nm0 + 2)
                    tv0 = st_load(b, st_nm0 + 3)
                    tv1 = st_load(b, st_nm0 + 4)
                    tv2 = st_load(b, st_nm0 + 5)
                    is_tri_nm = prim_nm > (num_spheres - 0.5)
                    if num_tris:
                        (te1x, te1y, te1z, te2x, te2y,
                         te2z) = gather_cols(prim_nm, num_tris, tri_ref,
                                             (3, 4, 5, 6, 7, 8),
                                             offset=num_spheres,
                                             stride=T_COLS)
                        (tu0u, tu0v, tu1u, tu1v, tu2u,
                         tu2v) = gather_cols(prim_nm, num_tris, triuv_ref,
                                             tuple(range(6)),
                                             offset=num_spheres, stride=6)
                        _te1 = (te1x, te1y, te1z)
                        _te2 = (te2x, te2y, te2z)

                    def _perturb(nx_, ny_, nz_, t0, t1, t2,
                                 te1x=None, te1y=None, te1z=None,
                                 te2x=None, te2y=None, te2z=None):
                        # formula-for-formula replica of _texture_block's
                        # frame math on the RAW normal (megakernel.py):
                        # jax.vjp of this IS the perturbation Jacobian
                        # jnp autodiff differentiates. In geo (tri) mode
                        # the triangle EDGES are vjp inputs too — the
                        # tangent frame moves with the vertices.
                        if te1x is None and num_tris:
                            te1x, te1y, te1z = _te1
                            te2x, te2y, te2z = _te2
                        n2_ = nx_ * nx_ + ny_ * ny_ + nz_ * nz_
                        inv_ = jax.lax.rsqrt(jnp.maximum(n2_, 1e-20))
                        nux = nx_ * inv_
                        nuy = ny_ * inv_
                        nuz = nz_ * inv_
                        st2 = nuz * nuz + nux * nux
                        st_deg = st2 < 1e-12
                        st_inv = jax.lax.rsqrt(jnp.maximum(st2, 1e-20))
                        tgx = jnp.where(st_deg, 1.0, -nuz * st_inv)
                        tgy = jnp.zeros_like(nx_)
                        tgz = jnp.where(st_deg, 0.0, nux * st_inv)
                        if num_tris:
                            du1 = tu1u - tu0u
                            dv1 = tu1v - tu0v
                            du2 = tu2u - tu0u
                            dv2 = tu2v - tu0v
                            det = du1 * dv2 - du2 * dv1
                            det_bad = jnp.abs(det) < 1e-12
                            inv_det = jnp.where(
                                det_bad, 0.0,
                                1.0 / jnp.where(det_bad, 1.0, det))
                            ttx = (te1x * dv2 - te2x * dv1) * inv_det
                            tty = (te1y * dv2 - te2y * dv1) * inv_det
                            ttz = (te1z * dv2 - te2z * dv1) * inv_det
                            tt2 = ttx * ttx + tty * tty + ttz * ttz
                            degen = det_bad | (tt2 < 1e-16)
                            e1inv = jax.lax.rsqrt(jnp.maximum(
                                te1x * te1x + te1y * te1y + te1z * te1z,
                                1e-20))
                            ttx = jnp.where(degen, te1x * e1inv, ttx)
                            tty = jnp.where(degen, te1y * e1inv, tty)
                            ttz = jnp.where(degen, te1z * e1inv, ttz)
                            tgx = jnp.where(is_tri_nm, ttx, tgx)
                            tgy = jnp.where(is_tri_nm, tty, tgy)
                            tgz = jnp.where(is_tri_nm, ttz, tgz)
                        tdn = tgx * nux + tgy * nuy + tgz * nuz
                        pox = tgx - nux * tdn
                        poy = tgy - nuy * tdn
                        poz = tgz - nuz * tdn
                        po_inv = jax.lax.rsqrt(jnp.maximum(
                            pox * pox + poy * poy + poz * poz, 1e-20))
                        pox = pox * po_inv
                        poy = poy * po_inv
                        poz = poz * po_inv
                        bx_ = nuy * poz - nuz * poy
                        by_ = nuz * pox - nux * poz
                        bz_ = nux * poy - nuy * pox
                        tnx = t0 * 2.0 - 1.0
                        tny = t1 * 2.0 - 1.0
                        tnz = jnp.maximum(t2 * 2.0 - 1.0, 1e-3)
                        ppx = pox * tnx + bx_ * tny + nux * tnz
                        ppy = poy * tnx + by_ * tny + nuy * tnz
                        ppz = poz * tnx + bz_ * tny + nuz * tnz
                        pp_inv = jax.lax.rsqrt(jnp.maximum(
                            ppx * ppx + ppy * ppy + ppz * ppz, 1e-20))
                        n_len = jnp.sqrt(jnp.maximum(n2_, 1e-20))
                        s_ = pp_inv * n_len
                        return ppx * s_, ppy * s_, ppz * s_

                    an_in = tuple(jnp.where(sel_n, a, 0.0) for a in an)
                    if tri and num_tris:
                        # geo mode: the tangent frame moves with the
                        # triangle EDGES — take their cotangents too and
                        # accumulate into the per-triangle (e1, e2) rows
                        _pn, nvjp = jax.vjp(_perturb, rnx, rny, rnz,
                                            tv0, tv1, tv2,
                                            te1x, te1y, te1z,
                                            te2x, te2y, te2z)
                        ncots = nvjp(an_in)
                        tri_nm_f = is_tri_nm.astype(jnp.float32)
                        for ti_ in range(num_tris):
                            mm_ = (prim_nm == float(num_spheres + ti_)
                                   ).astype(jnp.float32) * tri_nm_f
                            for k_ in range(6):
                                acc_add(row_tri0 + 18 * ti_ + 3 + k_,
                                        ncots[6 + k_] * mm_)
                    else:
                        _pn, nvjp = jax.vjp(_perturb, rnx, rny, rnz,
                                            tv0, tv1, tv2)
                        ncots = nvjp(an_in)
                    an = tuple(jnp.where(sel_n, c, a)
                               for c, a in zip(ncots[0:3], an))
                    nm_texA = ncots[3:6]
                    if tex_grads:
                        # nmap texel cotangents through the bilinear
                        # corners (weights pre-masked by has-nmap &
                        # act_hit); nm_texA is zero off sel_n by VJP
                        # linearity
                        scatter_texels(b, st_nm0 + 6, list(nm_texA))
                if full and textured:
                    # UV-SWIM (round 5 phase 2): the effective albedo's
                    # texture factor moves with the hit — chain the
                    # deferred albedo cotangent through d tex/d(u,v) and
                    # the per-prim uv geometry, then hand the extra hit-
                    # point / raw-normal cotangents to the SAME hit chain
                    # every other interior term uses. Triangles: uv is
                    # affine in p (dual-basis planes); spheres: uv is a
                    # function of the unit normal (polynomial-exact
                    # partials), pulled back through the normalize VJP.
                    m_d0u = gather_cols(mat_f, num_mats, mat_ref, (0, 1, 2))
                    a_u = sum(a_alb[c] * m_d0u[c]
                              * st_load(b, st_uvg0 + c) for c in range(3))
                    a_v = sum(a_alb[c] * m_d0u[c]
                              * st_load(b, st_uvg0 + 3 + c)
                              for c in range(3))
                    if nmk:
                        # the nmap texels ALSO swim with uv: the texel
                        # cotangent from the perturbation pullback chains
                        # through the nmap fetch's d texel/d(u,v) into
                        # the same uv-geometry routing below
                        a_u = a_u + sum(nm_texA[c]
                                        * st_load(b, st_nm0 + 14 + c)
                                        for c in range(3))
                        a_v = a_v + sum(nm_texA[c]
                                        * st_load(b, st_nm0 + 17 + c)
                                        for c in range(3))
                    g = [st_load(b, st_uvg0 + 6 + k) for k in range(6)]
                    prim_b = st_load(b, 26)
                    tri_f = (prim_b > (num_spheres - 0.5)).astype(
                        jnp.float32)
                    # triangle: A_p += A_u du/dp + A_v dv/dp
                    ap = (ap[0] + tri_f * (a_u * g[0] + a_v * g[3]),
                          ap[1] + tri_f * (a_u * g[1] + a_v * g[4]),
                          ap[2] + tri_f * (a_u * g[2] + a_v * g[5]))
                    # sphere: A_n_unit = (A_u du/dnux, A_v dv/dnuy,
                    # A_u du/dnuz) -> raw-normal cotangent via the same
                    # eps-clamped normalize the texture block applies
                    sph_f = 1.0 - tri_f
                    # normal-mapped: planes 22-24 are the PERTURBED
                    # normal; the sphere uv sits on the RAW one
                    _rb = st_nm0 if nmk else 22
                    (anr, _n_, _i_) = _norm3_vjp(
                        st_load(b, _rb + 0), st_load(b, _rb + 1),
                        st_load(b, _rb + 2),
                        a_u * g[0] * sph_f, a_v * g[2] * sph_f,
                        a_u * g[1] * sph_f, 1e-20)
                    an = (an[0] + sph_f * anr[0], an[1] + sph_f * anr[1],
                          an[2] + sph_f * anr[2])
                    if tri and num_tris:
                        # geo mode (round 5, late): uv ALSO moves with the
                        # triangle VERTICES at a fixed hit point — the
                        # metric-solve VJP of the plane barycentrics
                        # (a,b) = M^-1 [e1.q, e2.q], q = p - v0. The
                        # p-chain above already carries d uv/d p into the
                        # hit chain's t-vertex terms, so this is exactly
                        # the remaining fixed-p partial (matching jnp's
                        # Moller-Trumbore vertex chain in total).
                        (v0x_, v0y_, v0z_, e1x_, e1y_, e1z_,
                         e2x_, e2y_, e2z_) = gather_cols(
                            prim_b, num_tris, tri_ref, tuple(range(9)),
                            offset=num_spheres, stride=T_COLS)
                        (u0u_, u0v_, u1u_, u1v_, u2u_, u2v_) = gather_cols(
                            prim_b, num_tris, triuv_ref, tuple(range(6)),
                            offset=num_spheres, stride=6)
                        du1_ = u1u_ - u0u_
                        dv1_ = u1v_ - u0v_
                        du2_ = u2u_ - u0u_
                        dv2_ = u2v_ - u0v_
                        qx = st_load(b, 16) - v0x_
                        qy = st_load(b, 17) - v0y_
                        qz = st_load(b, 18) - v0z_
                        d11 = e1x_ * e1x_ + e1y_ * e1y_ + e1z_ * e1z_
                        d22 = e2x_ * e2x_ + e2y_ * e2y_ + e2z_ * e2z_
                        d12 = e1x_ * e2x_ + e1y_ * e2y_ + e1z_ * e2z_
                        detm = d11 * d22 - d12 * d12
                        m_bad = jnp.abs(detm) < 1e-18
                        inv_m = jnp.where(m_bad, 0.0,
                                          1.0 / jnp.where(m_bad, 1.0,
                                                          detm))
                        s1 = e1x_ * qx + e1y_ * qy + e1z_ * qz
                        s2 = e2x_ * qx + e2y_ * qy + e2z_ * qz
                        ba_ = (d22 * s1 - d12 * s2) * inv_m
                        bb_ = (d11 * s2 - d12 * s1) * inv_m
                        A_a = (a_u * du1_ + a_v * dv1_) * tri_f
                        A_b = (a_u * du2_ + a_v * dv2_) * tri_f
                        # solve VJP (M symmetric): A_s = M^-1 A_ab,
                        # A_M = -A_s x^T
                        A_s1 = (d22 * A_a - d12 * A_b) * inv_m
                        A_s2 = (d11 * A_b - d12 * A_a) * inv_m
                        A_d11 = -A_s1 * ba_
                        A_d12 = -(A_s1 * bb_ + A_s2 * ba_)
                        A_d22 = -A_s2 * bb_
                        A_e1x = (A_s1 * qx + 2.0 * A_d11 * e1x_
                                 + A_d12 * e2x_)
                        A_e1y = (A_s1 * qy + 2.0 * A_d11 * e1y_
                                 + A_d12 * e2y_)
                        A_e1z = (A_s1 * qz + 2.0 * A_d11 * e1z_
                                 + A_d12 * e2z_)
                        A_e2x = (A_s2 * qx + 2.0 * A_d22 * e2x_
                                 + A_d12 * e1x_)
                        A_e2y = (A_s2 * qy + 2.0 * A_d22 * e2y_
                                 + A_d12 * e1y_)
                        A_e2z = (A_s2 * qz + 2.0 * A_d22 * e2z_
                                 + A_d12 * e1z_)
                        A_v0x = -(A_s1 * e1x_ + A_s2 * e2x_)
                        A_v0y = -(A_s1 * e1y_ + A_s2 * e2y_)
                        A_v0z = -(A_s1 * e1z_ + A_s2 * e2z_)
                        for j in range(num_tris):
                            mk_j = (prim_b == float(num_spheres + j)
                                    ).astype(jnp.float32)
                            base_j = row_tri0 + 18 * j
                            acc_add(base_j + 0, A_v0x * mk_j)
                            acc_add(base_j + 1, A_v0y * mk_j)
                            acc_add(base_j + 2, A_v0z * mk_j)
                            acc_add(base_j + 3, A_e1x * mk_j)
                            acc_add(base_j + 4, A_e1y * mk_j)
                            acc_add(base_j + 5, A_e1z * mk_j)
                            acc_add(base_j + 6, A_e2x * mk_j)
                            acc_add(base_j + 7, A_e2y * mk_j)
                            acc_add(base_j + 8, A_e2z * mk_j)

                # through the multiply, then this bounce's direct add
                ax = ax * wx + gx * der
                ay = ay * wy + gy * deg
                az = az * wz + gz * deb

                # Beer-Lambert: d absorption = A_mid * T_mid * (-t)
                for mi in range(num_mats):
                    mm = (mat_f == float(mi)).astype(jnp.float32)
                    acc_add(mi * pcols + 6, ax * tmx * (-t_in) * mm)
                    acc_add(mi * pcols + 7, ay * tmy * (-t_in) * mm)
                    acc_add(mi * pcols + 8, az * tmz * (-t_in) * mm)

                if full:
                    aox, aoy, aoz, adx, ady, adz = _hit_chain(
                        b, mat_f, (ax, ay, az), (tmx, tmy, tmz), t_in,
                        ap, an, ade, (aox, aoy, aoz), (adx, ady, adz), sgn,
                        at_extra=st_load(b, 36) if physical else None)

                ax, ay, az = ax * bx, ay * by, az * bz
                return (b - 1, ax, ay, az, aox, aoy, aoz, adx, ady, adz)

            def cond(carry):
                return carry[0] >= 0

            out = jax.lax.while_loop(
                cond, body,
                (jnp.int32(max_bounces - 1), zero, zero, zero,
                 zero, zero, zero, zero, zero, zero))
            return out[4], out[5], out[6], out[7], out[8], out[9]

        # ---------------- sample loop --------------------------------------
        def sample_body(s, _):
            s_glob = samp0 + s
            s_arr = s_glob + jnp.zeros(shape, jnp.int32)
            dx, dy, dz = eye_ray(s_arr)
            state = (cam_x + zero, cam_y + zero, cam_z + zero, dx, dy, dz,
                     one, one, one, in_image.astype(jnp.float32))
            if physical:
                state = state + (zero,)  # prev_pdf: camera rays carry 0

            def rb_body(carry):
                b, st = carry
                st = replay_bounce(st, s_arr, b)
                return b + 1, st

            jax.lax.while_loop(lambda c: c[0] < max_bounces, rb_body,
                               (jnp.int32(0), state))
            aox, aoy, aoz, adx, ady, adz = reverse_bounces(s_arr)

            if full:
                # eye-ray VJP -> camera rows: d0 = normalize(M u + 0), with
                # u the camera-space pixel vector (recomputed from the same
                # jitter draw); o0 = cam position.
                ju, jv = draw(s_arr, rng.PAIR_EYE)
                jx = pxi + ju
                jy = pyi + jv
                s_fov = -2.0 * tan_half
                sx_ = (jx * (1.0 / width) - 0.5) * s_fov * z_near
                sy_ = ((jy * (1.0 / height) - 0.5) * s_fov * z_near
                       * (height / width))
                sz_ = z_near + zero
                vx = r00 * sx_ + r01 * sy_ + r02 * sz_
                vy = r10 * sx_ + r11 * sy_ + r12 * sz_
                vz = r20 * sx_ + r21 * sy_ + r22 * sz_
                av, _n0, _i0 = _norm3_vjp(vx, vy, vz, adx, ady, adz, 1e-20)
                avx, avy, avz = av
                acc_add(row_cam0 + 0, avx * sx_)
                acc_add(row_cam0 + 1, avx * sy_)
                acc_add(row_cam0 + 2, avx * sz_)
                acc_add(row_cam0 + 3, avy * sx_)
                acc_add(row_cam0 + 4, avy * sy_)
                acc_add(row_cam0 + 5, avy * sz_)
                acc_add(row_cam0 + 6, avz * sx_)
                acc_add(row_cam0 + 7, avz * sy_)
                acc_add(row_cam0 + 8, avz * sz_)
                acc_add(row_cam0 + 9, aox)
                acc_add(row_cam0 + 10, aoy)
                acc_add(row_cam0 + 11, aoz)
                # sx_, sy_ are both proportional to tan_half; sz_ is not
                aux = r00 * avx + r10 * avy + r20 * avz
                auy = r01 * avx + r11 * avy + r21 * avz
                acc_add(row_cam0 + 12, (aux * sx_ + auy * sy_) / tan_half)
            return _

        jax.lax.while_loop(
            lambda c: c[0] < spp_s,
            lambda c: (c[0] + 1, sample_body(c[0], c[1])),
            (jnp.int32(0), jnp.int32(0)))

        # ---------------- flush accumulators to the output -----------------
        # row-reduce each (rows, LANES) plane to (1, LANES); the host sums
        # lanes. Sequential TPU grid => read-modify-write is safe.
        gr = _grad_rows(counts, full, physical, tri, gr_tex_counts)
        partial = jnp.concatenate(
            [jnp.sum(acc_ref[r], axis=0, keepdims=True) for r in range(gr)]
            + [jnp.zeros((gr_pad - gr, LANES), jnp.float32)], axis=0)

        @pl.when(pid == 0)
        def _():
            grad_ref[:] = partial

        @pl.when(pid != 0)
        def _():
            grad_ref[:] = grad_ref[:] + partial

    return kernel


def _backward_grads(packed, cam_params, seed, width, height, spp,
                    max_bounces, block_rows, g_img, sample_offset,
                    interpret=False, packed_grid=None, full=False,
                    pixel_offset=0, n_local=None, physical=False,
                    tri=False, tex_grads=True):
    """Run the backward kernel; returns (PackedScene cotangent, cam_params
    cotangent). The camera cotangent is zeros unless ``full``.

    ``pixel_offset``/``n_local`` select a flat pixel tile (a device's share
    under pixel sharding); ``g_img`` then has ``n_local`` rows. Default:
    the whole image."""
    if physical or tri:
        full = True  # physical/geo adjoints build on the full path adjoint
    counts = packed.counts
    num_mats = counts[2]
    num_pls, num_als = counts[3], counts[4]
    tex_counts = getattr(packed, "tex_counts", (0, 0))
    textured = tex_counts[0] > 0
    tex_grads = tex_grads and textured
    pcols = P_COLS_PHYS if physical else (P_COLS_FULL if full else P_COLS)
    pl_stride = 6 if full else 3
    al_stride = 3 + (18 if tri else 0)
    gr = _grad_rows(counts, full, physical, tri,
                    tex_counts if tex_grads else (0, 0))
    gr_pad = ((gr + 7) // 8) * 8

    block = block_rows * LANES
    n = width * height if n_local is None else n_local
    rows = ((n + block - 1) // block) * block // LANES
    grid = rows // block_rows

    rot, pos, tan_half, z_near = cam_params
    cam = jnp.concatenate([
        jnp.asarray(rot, jnp.float32).reshape(-1),
        jnp.asarray(pos, jnp.float32).reshape(-1),
        jnp.asarray(tan_half, jnp.float32).reshape(1),
        jnp.asarray(z_near, jnp.float32).reshape(1),
        jnp.zeros((1,), jnp.float32),
    ])
    seed_arr = jnp.stack([
        jnp.asarray(seed, jnp.int32).reshape(()),
        jnp.asarray(pixel_offset, jnp.int32).reshape(()),
        jnp.asarray(sample_offset, jnp.int32).reshape(()),
        jnp.asarray(spp, jnp.int32).reshape(()),
        jnp.asarray(max_bounces, jnp.int32).reshape(()),
    ])

    # per-sample cotangent: forward returned the MEAN over spp
    g = (g_img.reshape(-1, 3) / spp).astype(jnp.float32)
    pad = rows * LANES - n
    g = jnp.concatenate([g, jnp.zeros((pad, 3), jnp.float32)], 0)
    gx = g[:, 0].reshape(rows, LANES)
    gy = g[:, 1].reshape(rows, LANES)
    gz = g[:, 2].reshape(rows, LANES)

    gmeta = packed_grid.meta if packed_grid is not None else None
    tex_nmap = bool(getattr(packed, "tex_nmap", False))
    kernel = _make_backward_kernel(counts, width, height, block_rows,
                                   max_bounces, gr_pad, grid_meta=gmeta,
                                   full=full, physical=physical, tri=tri,
                                   ucols=getattr(packed, "ucols", None),
                                   tex_counts=tex_counts,
                                   tex_grads=tex_grads,
                                   tex_nmap=tex_nmap)
    scalar_args = [seed_arr, packed.spheres.reshape(-1),
                   packed.triangles.reshape(-1),
                   packed.materials, packed.point_lights, packed.area_lights,
                   packed.background, cam]
    if packed_grid is not None:
        scalar_args += [packed_grid.scal, packed_grid.idx]
    vec_args = []
    tex_specs = []
    if textured:
        # same plumbing as the forward kernel (_render_block_sums): small
        # tables ride SMEM prefetch; the texel planes are a VMEM vector
        # input
        scalar_args += [packed.tex_meta.reshape(-1),
                        packed.tex_triuv.reshape(-1),
                        packed.tex_matids.reshape(-1)]
        vec_args = [packed.tex_planes]
        tex_specs = [pl.BlockSpec(packed.tex_planes.shape,
                                  lambda i, *_: (0, 0),
                                  memory_space=pltpu.VMEM)]
    in_block = pl.BlockSpec((block_rows, LANES), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    out_block = pl.BlockSpec((gr_pad, LANES), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM)
    eff_full = full or physical or tri
    st_planes = _st_planes_for(eff_full, physical, textured, tex_grads,
                               textured and eff_full and tex_nmap)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalar_args),
        grid=(grid,),
        in_specs=tex_specs + [in_block] * 3,
        out_specs=[out_block],
        scratch_shapes=[
            # physical: +1 sentinel bounce slot (zeroed; see the kernel)
            pltpu.VMEM(((max_bounces + (1 if physical else 0)) * st_planes,
                        block_rows, LANES), jnp.float32),
            pltpu.VMEM((gr, block_rows, LANES), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((gr_pad, LANES), jnp.float32)],
        interpret=interpret,
    )(*scalar_args, *vec_args, gx, gy, gz)[0]

    rowsum = out.sum(-1)  # [gr_pad]
    m13 = rowsum[:num_mats * pcols].reshape(num_mats, pcols)
    d_mats = jnp.zeros_like(packed.materials)
    d_mats = d_mats.at[:, 0:3].set(m13[:, 0:3])     # diffuse
    d_mats = d_mats.at[:, 3:6].set(m13[:, 3:6])     # specular
    d_mats = d_mats.at[:, 6:9].set(m13[:, 6:9])     # absorption
    d_mats = d_mats.at[:, 9:12].set(m13[:, 9:12])   # emission
    d_mats = d_mats.at[:, 14].set(m13[:, 12])       # diff_avg
    if full:
        d_mats = d_mats.at[:, 17].set(m13[:, 13])   # roughness
        d_mats = d_mats.at[:, 13].set(m13[:, 14])   # ior
        d_mats = d_mats.at[:, 12].set(m13[:, 15])   # spec_exp
    if physical:
        d_mats = d_mats.at[:, 15].set(m13[:, 16])   # spec_avg

    row_pl0 = num_mats * pcols
    row_al0 = row_pl0 + pl_stride * num_pls
    row_bg0 = row_al0 + al_stride * num_als
    d_pls = jnp.zeros_like(packed.point_lights)
    if num_pls:
        pl_block = rowsum[row_pl0:row_al0].reshape(num_pls, pl_stride)
        if full:
            d_pls = d_pls.at[:num_pls, 0:3].set(pl_block[:, 0:3])  # position
            d_pls = d_pls.at[:num_pls, 3:6].set(pl_block[:, 3:6])  # power
        else:
            d_pls = d_pls.at[:num_pls, 3:6].set(pl_block)
    d_als = jnp.zeros_like(packed.area_lights)
    if num_als:
        al_block = rowsum[row_al0:row_bg0].reshape(num_als, al_stride)
        d_als = d_als.at[:num_als, 18:21].set(al_block[:, 0:3])
        if tri:
            # the 6 light vertices (cols 0-17); pack_scene's gather routes
            # them back into the owning triangles' absolute vertices
            d_als = d_als.at[:num_als, 0:18].set(al_block[:, 3:21])
    d_bg = rowsum[row_bg0:row_bg0 + 3]

    d_sph = jnp.zeros_like(packed.spheres)
    num_spheres = counts[0]
    num_tris = counts[1]
    if full and num_spheres:
        row_geo0 = row_bg0 + 3 + CAM_ROWS
        geo = rowsum[row_geo0:row_geo0 + 4 * num_spheres].reshape(
            num_spheres, 4)
        d_sph = d_sph.at[:num_spheres, 0:4].set(geo)  # center(3) + radius
    d_tri = jnp.zeros_like(packed.triangles)
    if tri and num_tris:
        row_tri0 = row_bg0 + 3 + CAM_ROWS + 4 * num_spheres
        tg = rowsum[row_tri0:row_tri0 + 18 * num_tris].reshape(num_tris, 18)
        d_tri = d_tri.at[:num_tris, 0:18].set(tg)  # v0 e1 e2 n0 n1 n2
    # textured: the last 3*R rows are the texel cotangent in tex_planes'
    # exact [3*R, LANES] channel-planed layout — per LANE (never
    # lane-summed); pack_scene's autodiff transposes them back into
    # scene.textures. The small tex tables get zero cotangents (UV /
    # meta gradients are jnp-engine territory; check_engine_fields gates).
    d_texp = d_texm = d_texu = d_texi = None
    if textured:
        if tex_grads:
            row_tex0 = gr - 3 * tex_counts[1]
            d_texp = out[row_tex0:gr, :]
        else:
            # texels not trained this loss (make_loss's field set): the
            # scatter was compiled out, so the cotangent is zero by
            # construction — check_engine_fields guards the field set
            d_texp = jnp.zeros_like(packed.tex_planes)
        d_texm = jnp.zeros_like(packed.tex_meta)
        d_texu = jnp.zeros_like(packed.tex_triuv)
        d_texi = jnp.zeros_like(packed.tex_matids)
    # cotangent container must carry the PRIMAL's static aux (feat gating
    # flags, tex counts) — a default-aux PackedScene is a different pytree
    d_packed = PackedScene(d_sph, d_tri,
                           d_mats, d_pls, d_als, d_bg, counts,
                           tex_planes=d_texp, tex_meta=d_texm,
                           tex_triuv=d_texu, tex_matids=d_texi,
                           tex_counts=tex_counts,
                           feat=getattr(packed, "feat",
                                        (True, True, True)),
                           ucols=getattr(packed, "ucols", None),
                           tex_nmap=getattr(packed, "tex_nmap", False))
    rot, pos, tan_half, z_near = cam_params
    if full:
        cam_rows = rowsum[row_bg0 + 3:row_bg0 + 3 + CAM_ROWS]
        d_cam = (cam_rows[0:9].reshape(jnp.shape(rot)).astype(jnp.float32),
                 cam_rows[9:12].reshape(jnp.shape(pos)).astype(jnp.float32),
                 cam_rows[12].reshape(jnp.shape(tan_half)).astype(
                     jnp.float32),
                 jnp.zeros(jnp.shape(z_near), jnp.float32))
    else:
        d_cam = jax.tree_util.tree_map(
            lambda x: jnp.zeros_like(jnp.asarray(x, jnp.float32)),
            cam_params)
    return d_packed, d_cam


@functools.lru_cache(maxsize=None)
def _diff_renderer(width, height, spp, max_bounces, block_rows, bwd_rows,
                   interpret, full, physical=False, tri=False,
                   tex_grads=True):
    """The whole-image differentiable renderer is the tile renderer at
    offset 0 covering all pixels, reshaped — ONE custom_vjp implementation
    serves both the single-device and the sharded path."""
    tile_f = _diff_tile_renderer(width, height, spp, max_bounces, block_rows,
                                 bwd_rows, interpret, full,
                                 per_dev=width * height, physical=physical,
                                 tri=tri, tex_grads=tex_grads)

    def f(packed, cam_params, seed, sample_offset, packed_grid):
        img = tile_f(packed, cam_params, seed, sample_offset,
                     jnp.int32(0), packed_grid)
        return img.reshape(height, width, 3)

    return f


@functools.lru_cache(maxsize=None)
def _diff_tile_renderer(width, height, spp, max_bounces, block_rows,
                        bwd_rows, interpret, full, per_dev, physical=False,
                        tri=False, tex_grads=True):
    """Like ``_diff_renderer`` but renders a flat pixel TILE
    [pixel_offset, pixel_offset + per_dev) and returns [per_dev, 3] mean
    radiance — the per-device unit of sharded differentiable rendering.
    Rows past the end of the image are zero."""
    @jax.custom_vjp
    def f(packed, cam_params, seed, sample_offset, pixel_offset,
          packed_grid):
        sx, sy, sz = _render_block_sums(
            packed, cam_params, seed, width, height, spp, max_bounces,
            block_rows, pixel_offset, per_dev, sample_offset, 0.0,
            interpret=interpret, packed_grid=packed_grid,
            physical=physical)
        return jnp.stack([sx.reshape(-1)[:per_dev],
                          sy.reshape(-1)[:per_dev],
                          sz.reshape(-1)[:per_dev]], -1) / spp

    def fwd(packed, cam_params, seed, sample_offset, pixel_offset,
            packed_grid):
        return f(packed, cam_params, seed, sample_offset, pixel_offset,
                 packed_grid), (packed, cam_params, seed, sample_offset,
                                pixel_offset, packed_grid)

    def bwd(res, g):
        packed, cam_params, seed, sample_offset, pixel_offset, \
            packed_grid = res
        d_packed, d_cam = _backward_grads(
            packed, cam_params, seed, width, height, spp, max_bounces,
            bwd_rows, g, sample_offset, interpret=interpret,
            packed_grid=packed_grid, full=full,
            pixel_offset=pixel_offset, n_local=per_dev, physical=physical,
            tri=tri, tex_grads=tex_grads)
        f0 = np.zeros((), jax.dtypes.float0)
        d_grid = jax.tree_util.tree_map(
            lambda x: (np.zeros(jnp.shape(x), jax.dtypes.float0)
                       if jnp.issubdtype(jnp.asarray(x).dtype, jnp.integer)
                       else jnp.zeros_like(x)), packed_grid)
        return d_packed, d_cam, f0, f0, f0, d_grid

    f.defvjp(fwd, bwd)
    return f


def render_megakernel_diff_sharded(packed: PackedScene, cam_params, seed,
                                   width: int, height: int, spp: int, mesh,
                                   max_bounces: int = 8,
                                   block_rows: int = 16,
                                   bwd_rows: int = DEF_BWD_ROWS,
                                   sample_offset=0,
                                   interpret: bool = False,
                                   packed_grid: PackedGrid | None = None,
                                   grad_mode: str = "full",
                                   physical: bool = False) -> jax.Array:
    """Pixel-sharded DIFFERENTIABLE megakernel render over a device mesh —
    multi-chip training on the fused engine. Each device runs the forward
    kernel AND the replay-VJP backward kernel on its own pixel tile; the
    cotangents of the replicated inputs (scene parameters, camera) are
    all-reduced by the shard_map transpose, exactly like the jnp engine's
    ``render_pixel_sharded`` gradients. Streams are keyed on global pixel
    indices, so images and gradients match single-device up to float
    op-order noise (same estimator, same RNG; XLA fuses the surrounding ops
    differently per device count)."""
    from jax.sharding import PartitionSpec as P

    from ...parallel.mesh import PIXEL_AXIS

    if grad_mode not in ("full", "linear", "geo"):
        raise ValueError(f"grad_mode must be 'full', 'linear' or 'geo', "
                         f"got {grad_mode!r}")
    n = width * height
    n_dev = mesh.shape[PIXEL_AXIS]
    block = block_rows * LANES
    # ceil-divide before block rounding (same rule as
    # render_megakernel_sharded): flooring under-covers the image when
    # n % n_dev != 0 lands on a block boundary
    per_dev = (((n + n_dev - 1) // n_dev + block - 1) // block) * block
    if per_dev * (n_dev - 1) >= n:
        raise ValueError("too many devices for this image at this block size")
    tile_f = _diff_tile_renderer(width, height, spp, max_bounces, block_rows,
                                 bwd_rows, interpret,
                                 grad_mode != "linear" or physical,
                                 per_dev, physical=physical,
                                 tri=grad_mode == "geo")

    def tile_fn(packed, cam_params, seed, sample_offset, packed_grid):
        dev = jax.lax.axis_index(PIXEL_AXIS)
        return tile_f(packed, cam_params, seed, sample_offset,
                      dev * per_dev, packed_grid)

    out = jax.shard_map(
        tile_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()), out_specs=P(PIXEL_AXIS),
        check_vma=False,
    )(packed, cam_params, jnp.asarray(seed, jnp.int32),
      jnp.asarray(sample_offset, jnp.int32), packed_grid)
    return out[:n].reshape(height, width, 3)


def render_megakernel_diff(packed: PackedScene, cam_params, seed,
                           width: int, height: int, spp: int,
                           max_bounces: int = 8,
                           block_rows: int = 16,
                           bwd_rows: int = DEF_BWD_ROWS,
                           sample_offset=0,
                           interpret: bool = False,
                           packed_grid: PackedGrid | None = None,
                           grad_mode: str = "full",
                           physical: bool = False,
                           tex_grads: bool = True) -> jax.Array:
    """Differentiable megakernel render — mean radiance [H, W, 3] whose VJP
    runs the replay/reverse Pallas kernel (see module docstring for exactly
    which parameters receive gradients). Unlike ``render_megakernel``,
    ``max_bounces`` here is a STATIC kernel parameter (it sizes the
    per-bounce checkpoint scratch). ``packed_grid`` accelerates BOTH the
    forward render and the backward replay with the uniform grid.

    ``grad_mode="full"`` (default) runs the path-adjoint backward kernel:
    gradients ALSO flow through the sampled directions and hit chain —
    roughness / ior / spec_exp, point-light positions, and the camera
    (rotation, position, tan_half_fov) receive cotangents, matching the jnp
    engine's autodiff on identical streams. ``grad_mode="linear"`` restricts
    to the throughput-linear fields (PALLAS_TRAINABLE_FIELDS) with a leaner
    backward pass.

    ``physical=True`` renders AND differentiates the unbiased MIS estimator
    (megakernel.py physical mode): the replay kernel re-runs the physical
    direct phase and takes its exact adjoint with ``jax.vjp`` in-kernel,
    plus the emission-MIS pdf chain across bounces. Implies the full path
    adjoint; trainable set = PALLAS_TRAINABLE_FIELDS_PHYS.

    ``grad_mode="geo"`` extends the full path adjoint with TRIANGLE
    geometry rows: packed-space cotangents for (v0, e1, e2), the corner
    normals, and the area-light vertex table — interior-only like the jnp
    engine (Primitives.h:26-83 Möller–Trumbore + barycentric normals).
    Costs 18 accumulator rows per triangle; meant for small-to-moderate
    meshes (lower ``bwd_rows`` if VMEM overflows). Composes with
    ``physical=True``."""
    if grad_mode not in ("full", "linear", "geo"):
        raise ValueError(f"grad_mode must be 'full', 'linear' or 'geo', "
                         f"got {grad_mode!r}")
    # round 5: the backward kernel REPLAYS the texture block (shared
    # _texture_block) and scatters color-map texel cotangents, so textured
    # scenes train on the fast engine — 'linear' always, phase 2 adds
    # 'full'/physical/geo for COLOR-ONLY scenes (the UV-swim + vertex
    # chains), and the final phase adds NORMAL maps in EVERY mode: the
    # reverse sweep pulls the perturbed-normal cotangent back through the
    # exact tangent-frame math (jax.vjp in-kernel, with the triangle edges
    # as inputs in geo mode) and scatters nmap texel cotangents. No
    # jnp-only texture combination remains.
    return _diff_renderer(width, height, spp, max_bounces, block_rows,
                          bwd_rows, interpret,
                          grad_mode != "linear" or physical,
                          physical=physical, tri=grad_mode == "geo",
                          tex_grads=tex_grads)(
        packed, cam_params, jnp.asarray(seed, jnp.int32),
        jnp.asarray(sample_offset, jnp.int32), packed_grid)
