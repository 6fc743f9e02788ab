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

Exactly these parameters receive gradients. Parameters whose jnp-engine
gradients flow through *reparameterized sample directions* — roughness,
ior, spec_exp — and geometry/camera are NOT differentiated by this engine
(their cotangents are zero); use the jnp engine for those. For the supported
set the two engines' gradients agree to float tolerance on identical streams
(tests/test_pallas_vjp.py validates against jax.grad of the jnp engine).
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
from .megakernel import (LANES, PackedGrid, PackedScene,
                         _dot, _make_sweep_fns, _normalize3,
                         _render_block_sums, _rotate_y_to)

# Material-scattered gradient planes, in row order per material:
# diffuse(3) specular(3) absorption(3) emission(3) diff_avg(1)
P_COLS = 13

# Fields render_megakernel_diff differentiates (see module docstring).
PALLAS_TRAINABLE_FIELDS = frozenset({
    "materials.diffuse", "materials.specular", "materials.emission",
    "materials.absorption", "materials.diff_avg",
    "al_power", "pl_power", "background",
})

DEF_BWD_ROWS = 16  # measured best (scripts/bench_bwd_rows.py: 8/16/32 ->
                   # 24.9/23.4/25.4 ms per grad step at 256^2x16spp x8b); the
                   # per-bounce checkpoint scratch stays comfortably in VMEM


def _grad_rows(counts):
    """Total gradient-accumulator rows (before tile padding)."""
    _, _, num_mats, num_pls, num_als = counts
    return num_mats * P_COLS + 3 * num_pls + 3 * num_als + 3


def _make_backward_kernel(counts, width, height, block_rows, max_bounces,
                          gr_pad, grid_meta=None):
    num_spheres, num_tris, num_mats, num_pls, num_als = counts
    shape = (block_rows, LANES)
    n_pixels = width * height
    two_pi = 2.0 * math.pi
    ppb = rng.pairs_per_bounce(num_als)
    row_pl0 = num_mats * P_COLS
    row_al0 = row_pl0 + 3 * num_pls
    row_bg0 = row_al0 + 3 * num_als

    def kernel(seed_ref, sph_ref, tri_ref, mat_ref, pl_ref, al_ref, bg_ref,
               cam_ref, *rest):
        if grid_meta is None:
            grid = None
        else:
            gscal_ref, gidx_ref = rest[:2]
            rest = rest[2:]
            grid = (gscal_ref, gidx_ref, grid_meta)
        gx_ref, gy_ref, gz_ref, grad_ref, st_ref, acc_ref = rest
        # replay sweeps: IDENTICAL construction to the forward kernel so the
        # backward pass re-walks the same paths hit-for-hit
        intersect_sweep, occlusion_sweep = _make_sweep_fns(
            counts, shape, sph_ref, tri_ref, grid=grid)
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

        # scratch layout: st_ref[b * 16 + q] for bounce b, quantity q:
        # 0-2 T_mid, 3-5 w_eff, 6-8 beer_eff, 9-11 direct_eff,
        # 12 t*inside_mask, 13 mat id, 14 branch code, 15 ct_w
        # branch code: 0 none, 1 diffuse, 2 spec-CT, 3 spec-gloss, 4 refr
        def st_store(b, q, v):
            st_ref[b * 16 + q] = v

        def st_load(b, q):
            return st_ref[b * 16 + q]

        def acc_add(r, v):
            acc_ref[r] = acc_ref[r] + v

        # ---------------- one replayed bounce -----------------------------
        def replay_bounce(state, s_glob, b):
            (ox, oy, oz, dx, dy, dz, r1x, r1y, r1z, active_f) = state
            active = active_f > 0.5
            pair0 = 1 + b * ppb

            best_t, nx, ny, nz, mat_f = intersect_sweep(ox, oy, oz,
                                                        dx, dy, dz)
            hit = best_t < jnp.inf
            t_safe = jnp.where(hit, best_t, 0.0)
            px, py, pz = ox + dx * t_safe, oy + dy * t_safe, oz + dz * t_safe

            NF = 20
            mf = [zero for _ in range(NF)]
            for mi in range(num_mats):
                mask = mat_f == float(mi)
                for f in range(NF):
                    mf[f] = jnp.where(mask, mat_ref[mi, f], mf[f])
            (m_dr, m_dg, m_db, m_sr, m_sg, m_sb, m_ar, m_ag, m_ab,
             m_er, m_eg, m_eb, m_exp, m_ior, m_pd, m_ps, m_prf, m_rough,
             m_pure, m_ct) = mf

            cos_i = -_dot(dx, dy, dz, nx, ny, nz)
            inside = cos_i <= 0.0
            act_hit = active & hit
            outside_nee = act_hit & (~inside)

            # Beer-Lambert BEFORE direct add (CudaTracer.cu:179-189)
            beer_mask = act_hit & inside
            beer_x = jnp.where(beer_mask, jnp.exp(-t_safe * m_ar), 1.0)
            beer_y = jnp.where(beer_mask, jnp.exp(-t_safe * m_ag), 1.0)
            beer_z = jnp.where(beer_mask, jnp.exp(-t_safe * m_ab), 1.0)
            tmx, tmy, tmz = r1x * beer_x, r1y * beer_y, r1z * beer_z

            # g * T_mid — the adjoint of direct(b); every replay-phase
            # parameter partial is linear in it
            gtx, gty, gtz = gx * tmx, gy * tmy, gz * tmz

            def light_q(lx, ly, lz):
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
                cos_l = jnp.maximum(0.0, _dot(nx, ny, nz, wx, wy, wz))
                # q = scale / diff_avg: NEE_l = diff_avg * q * power*diffuse
                return (jnp.where(occ, 0.0, cos_l) * INV_PI
                        / (4.0 * math.pi) / d2)

            dir_r, dir_g, dir_b = m_er, m_eg, m_eb
            # emission partial: direct includes emission unconditionally
            for mi in range(num_mats):
                mmask = (mat_f == float(mi)) & act_hit
                mm = mmask.astype(jnp.float32)
                acc_add(mi * P_COLS + 9, gtx * mm)
                acc_add(mi * P_COLS + 10, gty * mm)
                acc_add(mi * P_COLS + 11, gtz * mm)

            def nee_partials(q, pwx, pwy, pwz, power_row):
                """Accumulate NEE partials for one light with q-factor ``q``
                and power (pwx,pwy,pwz); power grads go to rows
                ``power_row..+2``. Returns the light's direct contribution."""
                s = m_pd * q
                cr, cg, cb = pwx * m_dr * s, pwy * m_dg * s, pwz * m_db * s
                o = outside_nee.astype(jnp.float32)
                # d power_l += g*T_mid (.) diffuse * diff_avg*q
                acc_add(power_row + 0, gtx * m_dr * s * o)
                acc_add(power_row + 1, gty * m_dg * s * o)
                acc_add(power_row + 2, gtz * m_db * s * o)
                dd_scale = q * o
                dav = (gtx * pwx * m_dr + gty * pwy * m_dg
                       + gtz * pwz * m_db) * dd_scale
                for mi in range(num_mats):
                    mm = ((mat_f == float(mi)) & outside_nee).astype(
                        jnp.float32)
                    # d diffuse[m] += g*T_mid * diff_avg*q*power
                    acc_add(mi * P_COLS + 0, gtx * pwx * m_pd * q * mm)
                    acc_add(mi * P_COLS + 1, gty * pwy * m_pd * q * mm)
                    acc_add(mi * P_COLS + 2, gtz * pwz * m_pd * q * mm)
                    # d diff_avg[m] += sum_ch g*T*q*(power.diffuse)
                    acc_add(mi * P_COLS + 12, dav * mm)
                return cr, cg, cb

            for i in range(num_pls):
                q = light_q(pl_ref[i, 0] + zero, pl_ref[i, 1] + zero,
                            pl_ref[i, 2] + zero)
                cr, cg, cb = nee_partials(q, pl_ref[i, 3], pl_ref[i, 4],
                                          pl_ref[i, 5], row_pl0 + 3 * i)
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
                q = light_q(lx, ly, lz)
                cr, cg, cb = nee_partials(q, al_ref[i, 18], al_ref[i, 19],
                                          al_ref[i, 20], row_al0 + 3 * i)
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

            # ---- scatter (identical to forward) ---------------------------
            u_branch, u_a = draw(s_glob, pair0)
            u_b, _unused = draw(s_glob, pair0 + 1)

            outside = cos_i > 0.0
            n1 = jnp.where(outside, 1.0, m_ior)
            n2 = jnp.where(outside, m_ior, 1.0)
            cos_pos = jnp.abs(cos_i)
            n_ratio = n1 / jnp.maximum(n2, 1e-12)
            sin_t2 = n_ratio * n_ratio * (1.0 - cos_pos * cos_pos)
            tir = sin_t2 > 1.0
            cos_t = jnp.sqrt(jnp.where(tir, 1.0,
                                       jnp.maximum(1.0 - sin_t2, 0.0)))
            rs = ((n1 * cos_pos - n2 * cos_t)
                  / jnp.maximum(n1 * cos_pos + n2 * cos_t, 1e-12))
            rp = ((n2 * cos_pos - n1 * cos_t)
                  / jnp.maximum(n2 * cos_pos + n1 * cos_t, 1e-12))
            fres = jnp.where(tir, 1.0, (rs * rs + rp * rp) * 0.5)

            pure = m_pure > 0.5
            ct = m_ct > 0.5
            p_diff = m_pd
            p_spec = m_ps * jnp.where(pure, 1.0, fres)
            p_refr = m_prf * (1.0 - fres)
            take_diff = u_branch < p_diff
            take_spec = (~take_diff) & (u_branch < p_diff + p_spec)
            take_refr = ((~take_diff) & (~take_spec)
                         & (u_branch < p_diff + p_spec + p_refr))

            theta = u_a * two_pi
            yy = jnp.sqrt(u_b)
            rr = jnp.sqrt(jnp.maximum(1.0 - yy * yy, 0.0))
            ddx, ddy, ddz = _rotate_y_to(nx, ny, nz, rr * jnp.cos(theta), yy,
                                         rr * jnp.sin(theta))

            u_ac = jnp.minimum(u_a, 1.0 - 1e-7)
            btan = -(m_rough * m_rough) * jnp.log1p(-u_ac)
            binv = jax.lax.rsqrt(1.0 + btan * btan)
            bphi = u_b * two_pi
            sb, cb2 = btan * binv, binv
            mx, my, mz = _rotate_y_to(nx, ny, nz, sb * jnp.cos(bphi), cb2,
                                      sb * jnp.sin(bphi))
            cos_m = jnp.abs(_dot(dx, dy, dz, mx, my, mz))
            ctx = dx + 2.0 * cos_m * mx
            cty = dy + 2.0 * cos_m * my
            ctz = dz + 2.0 * cos_m * mz
            hx, hy, hz = _normalize3(ctx - dx, cty - dy, ctz - dz, 1e-12)
            nh = jnp.abs(_dot(nx, ny, nz, hx, hy, hz))
            nl = jnp.abs(_dot(nx, ny, nz, ctx, cty, ctz))
            vh = jnp.maximum(jnp.abs(_dot(dx, dy, dz, hx, hy, hz)), 1e-12)
            nv = jnp.maximum(jnp.abs(cos_i), 1e-6)
            geom = jnp.minimum(jnp.minimum(1.0, 2.0 * nh * nl / vh),
                               2.0 * nh * nv / vh)
            ct_w = geom / nv

            # reference quirk: reflect with +|cosI| (CudaTracer.cu:238/484)
            mrx = dx + 2.0 * cos_pos * nx
            mry = dy + 2.0 * cos_pos * ny
            mrz = dz + 2.0 * cos_pos * nz
            fin = jnp.isfinite(m_exp)
            pexp = 1.0 / (jnp.where(fin, m_exp, 0.0) + 1.0)
            s_cl = jnp.clip(u_b, 1e-12, 1.0)
            ph_y = jnp.where(fin, jnp.exp(pexp * jnp.log(s_cl)), 1.0)
            ph_r = jnp.sqrt(jnp.maximum(1.0 - ph_y * ph_y, 0.0))
            phx, phy_, phz = _rotate_y_to(mrx, mry, mrz,
                                          ph_r * jnp.cos(theta),
                                          ph_y, ph_r * jnp.sin(theta))
            gsx = jnp.where(fin, phx, mrx)
            gsy = jnp.where(fin, phy_, mry)
            gsz = jnp.where(fin, phz, mrz)

            spx = jnp.where(ct, ctx, gsx)
            spy = jnp.where(ct, cty, gsy)
            spz = jnp.where(ct, ctz, gsz)
            sp_ox = jnp.where(ct, px + mx * RAY_BUMP_EPSILON,
                              px + nx * RAY_BUMP_EPSILON)
            sp_oy = jnp.where(ct, py + my * RAY_BUMP_EPSILON,
                              py + ny * RAY_BUMP_EPSILON)
            sp_oz = jnp.where(ct, pz + mz * RAY_BUMP_EPSILON,
                              pz + nz * RAY_BUMP_EPSILON)
            spw = jnp.where(ct, ct_w, 1.0)

            rfx0 = n_ratio * dx + (n_ratio * cos_pos - cos_t) * nx
            rfy0 = n_ratio * dy + (n_ratio * cos_pos - cos_t) * ny
            rfz0 = n_ratio * dz + (n_ratio * cos_pos - cos_t) * nz
            rfx, rfy, rfz = _normalize3(rfx0, rfy0, rfz0, 1e-12)

            new_dx = jnp.where(take_diff, ddx, jnp.where(take_spec, spx, rfx))
            new_dy = jnp.where(take_diff, ddy, jnp.where(take_spec, spy, rfy))
            new_dz = jnp.where(take_diff, ddz, jnp.where(take_spec, spz, rfz))
            new_ox = jnp.where(take_diff, px + nx * RAY_BUMP_EPSILON,
                               jnp.where(take_spec, sp_ox,
                                         px + rfx * RAY_BUMP_EPSILON))
            new_oy = jnp.where(take_diff, py + ny * RAY_BUMP_EPSILON,
                               jnp.where(take_spec, sp_oy,
                                         py + rfy * RAY_BUMP_EPSILON))
            new_oz = jnp.where(take_diff, pz + nz * RAY_BUMP_EPSILON,
                               jnp.where(take_spec, sp_oz,
                                         pz + rfz * RAY_BUMP_EPSILON))
            wr = jnp.where(take_diff, m_dr,
                           jnp.where(take_spec, m_sr * spw,
                                     jnp.where(take_refr, 1.0, 0.0)))
            wg = jnp.where(take_diff, m_dg,
                           jnp.where(take_spec, m_sg * spw,
                                     jnp.where(take_refr, 1.0, 0.0)))
            wb = jnp.where(take_diff, m_db,
                           jnp.where(take_spec, m_sb * spw,
                                     jnp.where(take_refr, 1.0, 0.0)))
            alive = take_diff | take_spec | (take_refr & (~tir))

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
            return nxt

        # ---------------- reverse sweep over one sample's bounces ----------
        def reverse_bounces():
            def body(carry):
                b, ax, ay, az = carry
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
                for mi in range(num_mats):
                    mm = (mat_f == float(mi)).astype(jnp.float32)
                    df = mm * is_diff.astype(jnp.float32)
                    acc_add(mi * P_COLS + 0, dwx * df)
                    acc_add(mi * P_COLS + 1, dwy * df)
                    acc_add(mi * P_COLS + 2, dwz * df)
                    sf = mm * spec_scale
                    acc_add(mi * P_COLS + 3, dwx * sf)
                    acc_add(mi * P_COLS + 4, dwy * sf)
                    acc_add(mi * P_COLS + 5, dwz * sf)

                # through the multiply, then this bounce's direct add
                ax = ax * wx + gx * der
                ay = ay * wy + gy * deg
                az = az * wz + gz * deb

                # Beer-Lambert: d absorption = A_mid * T_mid * (-t)
                for mi in range(num_mats):
                    mm = (mat_f == float(mi)).astype(jnp.float32)
                    acc_add(mi * P_COLS + 6, ax * tmx * (-t_in) * mm)
                    acc_add(mi * P_COLS + 7, ay * tmy * (-t_in) * mm)
                    acc_add(mi * P_COLS + 8, az * tmz * (-t_in) * mm)
                ax, ay, az = ax * bx, ay * by, az * bz
                return b - 1, ax, ay, az

            def cond(carry):
                return carry[0] >= 0

            jax.lax.while_loop(cond, body,
                               (jnp.int32(max_bounces - 1), zero, zero, zero))

        # ---------------- sample loop --------------------------------------
        def sample_body(s, _):
            s_glob = samp0 + s
            dx, dy, dz = eye_ray(s_glob + jnp.zeros(shape, jnp.int32))
            state = (cam_x + zero, cam_y + zero, cam_z + zero, dx, dy, dz,
                     one, one, one, in_image.astype(jnp.float32))

            def rb_body(carry):
                b, st = carry
                st = replay_bounce(st, s_glob + jnp.zeros(shape, jnp.int32),
                                   b)
                return b + 1, st

            jax.lax.while_loop(lambda c: c[0] < max_bounces, rb_body,
                               (jnp.int32(0), state))
            reverse_bounces()
            return _

        jax.lax.while_loop(
            lambda c: c[0] < spp_s,
            lambda c: (c[0] + 1, sample_body(c[0], c[1])),
            (jnp.int32(0), jnp.int32(0)))

        # ---------------- flush accumulators to the output -----------------
        # row-reduce each (rows, LANES) plane to (1, LANES); the host sums
        # lanes. Sequential TPU grid => read-modify-write is safe.
        gr = _grad_rows(counts)
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
                    interpret=False, packed_grid=None):
    """Run the backward kernel; returns the PackedScene cotangent."""
    counts = packed.counts
    num_mats = counts[2]
    num_pls, num_als = counts[3], counts[4]
    gr = _grad_rows(counts)
    gr_pad = ((gr + 7) // 8) * 8

    block = block_rows * LANES
    n = width * height
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
        jnp.asarray(0, jnp.int32).reshape(()),
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
    kernel = _make_backward_kernel(counts, width, height, block_rows,
                                   max_bounces, gr_pad, grid_meta=gmeta)
    scalar_args = [seed_arr, packed.spheres, packed.triangles,
                   packed.materials, packed.point_lights, packed.area_lights,
                   packed.background, cam]
    if packed_grid is not None:
        scalar_args += [packed_grid.scal, packed_grid.idx]
    in_block = pl.BlockSpec((block_rows, LANES), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    out_block = pl.BlockSpec((gr_pad, LANES), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalar_args),
        grid=(grid,),
        in_specs=[in_block] * 3,
        out_specs=[out_block],
        scratch_shapes=[
            pltpu.VMEM((max_bounces * 16, block_rows, LANES), jnp.float32),
            pltpu.VMEM((gr, block_rows, LANES), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((gr_pad, LANES), jnp.float32)],
        interpret=interpret,
    )(*scalar_args, gx, gy, gz)[0]

    rowsum = out.sum(-1)  # [gr_pad]
    m13 = rowsum[:num_mats * P_COLS].reshape(num_mats, P_COLS)
    d_mats = jnp.zeros_like(packed.materials)
    d_mats = d_mats.at[:, 0:3].set(m13[:, 0:3])     # diffuse
    d_mats = d_mats.at[:, 3:6].set(m13[:, 3:6])     # specular
    d_mats = d_mats.at[:, 6:9].set(m13[:, 6:9])     # absorption
    d_mats = d_mats.at[:, 9:12].set(m13[:, 9:12])   # emission
    d_mats = d_mats.at[:, 14].set(m13[:, 12])       # diff_avg

    row_pl0 = num_mats * P_COLS
    row_al0 = row_pl0 + 3 * num_pls
    row_bg0 = row_al0 + 3 * num_als
    d_pls = jnp.zeros_like(packed.point_lights)
    if num_pls:
        d_pls = d_pls.at[:num_pls, 3:6].set(
            rowsum[row_pl0:row_al0].reshape(num_pls, 3))
    d_als = jnp.zeros_like(packed.area_lights)
    if num_als:
        d_als = d_als.at[:num_als, 18:21].set(
            rowsum[row_al0:row_bg0].reshape(num_als, 3))
    d_bg = rowsum[row_bg0:row_bg0 + 3]

    return PackedScene(jnp.zeros_like(packed.spheres),
                       jnp.zeros_like(packed.triangles),
                       d_mats, d_pls, d_als, d_bg, counts)


@functools.lru_cache(maxsize=None)
def _diff_renderer(width, height, spp, max_bounces, block_rows, bwd_rows,
                   interpret):
    @jax.custom_vjp
    def f(packed, cam_params, seed, sample_offset, packed_grid):
        n = width * height
        sx, sy, sz = _render_block_sums(
            packed, cam_params, seed, width, height, spp,
            max_bounces, block_rows, 0, n, sample_offset,
            0.0, interpret=interpret, packed_grid=packed_grid)
        img = jnp.stack([sx.reshape(-1)[:n], sy.reshape(-1)[:n],
                         sz.reshape(-1)[:n]], -1) / spp
        return img.reshape(height, width, 3)

    def fwd(packed, cam_params, seed, sample_offset, packed_grid):
        return f(packed, cam_params, seed, sample_offset, packed_grid), (
            packed, cam_params, seed, sample_offset, packed_grid)

    def bwd(res, g):
        packed, cam_params, seed, sample_offset, packed_grid = res
        d_packed = _backward_grads(packed, cam_params, seed, width, height,
                                   spp, max_bounces, bwd_rows, g,
                                   sample_offset, interpret=interpret,
                                   packed_grid=packed_grid)
        d_cam = jax.tree_util.tree_map(
            lambda x: jnp.zeros_like(jnp.asarray(x, jnp.float32)), cam_params)
        f0 = np.zeros((), jax.dtypes.float0)
        # the grid's cell lists are discrete structure: zero cotangent
        d_grid = jax.tree_util.tree_map(
            lambda x: (np.zeros(jnp.shape(x), jax.dtypes.float0)
                       if jnp.issubdtype(jnp.asarray(x).dtype, jnp.integer)
                       else jnp.zeros_like(x)), packed_grid)
        return d_packed, d_cam, f0, f0, d_grid

    f.defvjp(fwd, bwd)
    return f


def render_megakernel_diff(packed: PackedScene, cam_params, seed,
                           width: int, height: int, spp: int,
                           max_bounces: int = 8,
                           block_rows: int = 16,
                           bwd_rows: int = DEF_BWD_ROWS,
                           sample_offset=0,
                           interpret: bool = False,
                           packed_grid: PackedGrid | None = None) -> jax.Array:
    """Differentiable megakernel render — mean radiance [H, W, 3] whose VJP
    runs the replay/reverse Pallas kernel (see module docstring for exactly
    which parameters receive gradients). Unlike ``render_megakernel``,
    ``max_bounces`` here is a STATIC kernel parameter (it sizes the
    per-bounce checkpoint scratch). ``packed_grid`` accelerates BOTH the
    forward render and the backward replay with the uniform grid."""
    return _diff_renderer(width, height, spp, max_bounces, block_rows,
                          bwd_rows, interpret)(
        packed, cam_params, jnp.asarray(seed, jnp.int32),
        jnp.asarray(sample_offset, jnp.int32), packed_grid)
