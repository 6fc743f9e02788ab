"""Fused Pallas TPU bounce kernel — the performance path.

The TPU-native replacement for the reference's ``pathTraceKernel`` megakernel
(``CudaTracer/CudaTracer.cu:106-206``): one kernel performs intersection
sweep + next-event estimation + BSDF scatter for a tile of rays, entirely in
VMEM/registers. Design points:

* Ray state is 13 SoA planes reshaped to ``(rows, 128)`` lanes; the grid
  walks row-blocks. Each plane is read from HBM once and written once per
  bounce — the XLA path re-materializes intermediates many times over.
* The scene (primitives, materials, lights) is packed into small 2-D f32
  bundles placed in SMEM via scalar prefetch; primitive/material loops are
  fully unrolled Python loops over *scalar* reads — zero gathers, pure VPU.
* RNG is the hardware PRNG (``pltpu.prng_seed``/``prng_random_bits``) seeded
  per (seed, bounce, block): counter-stable for a fixed configuration, so a
  render is reproducible; streams differ from the jnp threefry path, which
  remains the layout-invariant differentiable reference.
* Branch selection, NEE quirks, Beer-Lambert and tie semantics match the
  jnp estimator op-for-op (same formulas; validated statistically in
  tests/test_pallas.py).

Forward-only: gradients use the jnp path.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...constants import RAY_BUMP_EPSILON

INV_PI = 0.31830988618
LANES = 128
DEF_ROWS = 32  # rows per block -> 32*128 = 4096 rays/block

# ---------------------------------------------------------------------------
# Scene packing (host side): everything the kernel reads as SMEM scalars.
# ---------------------------------------------------------------------------


class PackedScene:
    """Kernel-side scene bundles. A custom pytree: the arrays are leaves,
    ``counts`` (S, T, M, Lp, La) is static aux data so the kernel's unrolled
    loops specialize on it under jit. Empty bundles are padded to one zero
    row (Mosaic rejects 0-row SMEM operands); the dummy row is never read.

    Arrays: spheres [S,5] = cx cy cz r mat; triangles [T,13] = v0 v1 v2 n mat
    (uniform face normal); materials [M,22] = diff spec absorb emit specExp
    ior diffAvg specAvg refrAvg rough pureRefl ct; point_lights [Lp,6];
    area_lights [La,21] = two triangles' vertices + power; background [3].
    """

    __slots__ = ("spheres", "triangles", "materials", "point_lights",
                 "area_lights", "background", "counts")

    def __init__(self, spheres, triangles, materials, point_lights,
                 area_lights, background, counts):
        self.spheres = spheres
        self.triangles = triangles
        self.materials = materials
        self.point_lights = point_lights
        self.area_lights = area_lights
        self.background = background
        self.counts = tuple(counts)


def _packed_flatten(ps):
    return ((ps.spheres, ps.triangles, ps.materials, ps.point_lights,
             ps.area_lights, ps.background), ps.counts)


def _packed_unflatten(counts, leaves):
    return PackedScene(*leaves, counts)


jax.tree_util.register_pytree_node(PackedScene, _packed_flatten,
                                   _packed_unflatten)


def pack_scene(scene) -> PackedScene:
    """Flatten the SoA scene into the kernel's SMEM bundles. Triangle normals
    are uniform per face in every preset (rect-built, Scene.cpp:63-96), so a
    single normal per triangle is packed; barycentric normal interpolation is
    the jnp path's job for scenes that need it."""
    def v3(v):
        return jnp.stack([v.x, v.y, v.z], -1)

    spheres = jnp.concatenate([
        v3(scene.sph_center),
        scene.sph_radius[:, None],
        scene.sph_mat[:, None].astype(jnp.float32),
    ], -1)

    tris = jnp.concatenate([
        v3(scene.tri_v0), v3(scene.tri_v1), v3(scene.tri_v2),
        v3(scene.tri_n0),
        scene.tri_mat[:, None].astype(jnp.float32),
    ], -1)

    m = scene.materials
    mats = jnp.concatenate([
        v3(m.diffuse), v3(m.specular), v3(m.absorption), v3(m.emission),
        m.spec_exp[:, None], m.ior[:, None],
        m.diff_avg[:, None], m.spec_avg[:, None], m.refr_avg[:, None],
        m.roughness[:, None],
        ((m.flags & 0x01) != 0).astype(jnp.float32)[:, None],
        ((m.flags & 0x03) != 0).astype(jnp.float32)[:, None],
    ], -1)

    if scene.num_point_lights:
        pls = jnp.concatenate([v3(scene.pl_pos), v3(scene.pl_power)], -1)
    else:
        pls = jnp.zeros((1, 6), jnp.float32)

    if scene.num_area_lights:
        t0 = scene.al_tri0
        t1 = scene.al_tri0 + 1
        gather = lambda v, i: jnp.stack([v.x[i], v.y[i], v.z[i]], -1)
        als = jnp.concatenate([
            gather(scene.tri_v0, t0), gather(scene.tri_v1, t0), gather(scene.tri_v2, t0),
            gather(scene.tri_v0, t1), gather(scene.tri_v1, t1), gather(scene.tri_v2, t1),
            v3(scene.al_power),
        ], -1)
    else:
        als = jnp.zeros((1, 21), jnp.float32)

    def pad1(a):
        return a if a.shape[0] else jnp.zeros((1, a.shape[1]), a.dtype)

    counts = (scene.num_spheres, scene.num_triangles,
              scene.materials.flags.shape[0], scene.num_point_lights,
              scene.num_area_lights)
    bg = jnp.stack([scene.background.x, scene.background.y, scene.background.z])
    return PackedScene(pad1(spheres), pad1(tris), pad1(mats), pls, als,
                       bg.astype(jnp.float32), counts)


# ---------------------------------------------------------------------------
# In-kernel helpers (operate on (R, 128) tiles and python-scalar scene reads)
# ---------------------------------------------------------------------------


def _uniform(shape):
    # 24 mantissa-bit uniform in [0, 1). Mask (not shift) the low 24 bits on
    # the int32 domain: an arithmetic >> would smear the sign bit into
    # negative "uniforms", and Mosaic has no uint32->f32 cast.
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    return (bits & 0x00FFFFFF).astype(jnp.float32) * (1.0 / 16777216.0)


def _dot(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _normalize3(x, y, z, eps=1e-20):
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, eps))
    return x * inv, y * inv, z * inv


def _rotate_y_to(tx, ty, tz, sx, sy, sz):
    """rotate +Y onto target t, applied to sample s (CudaTracer.cu:579-585)."""
    w = 1.0 + ty
    rx, ry, rz = tz, jnp.zeros_like(tz), -tx
    n2 = w * w + rx * rx + rz * rz
    degen = n2 < 1e-12
    inv = jax.lax.rsqrt(jnp.where(degen, 1.0, n2))
    w, rx, rz = w * inv, rx * inv, rz * inv
    # t = r x s + w*s
    t_x = ry * sz - rz * sy + w * sx
    t_y = rz * sx - rx * sz + w * sy
    t_z = rx * sy - ry * sx + w * sz
    ox = sx + 2.0 * (ry * t_z - rz * t_y)
    oy = sy + 2.0 * (rz * t_x - rx * t_z)
    oz = sz + 2.0 * (rx * t_y - ry * t_x)
    return (jnp.where(degen, sx, ox), jnp.where(degen, -sy, oy),
            jnp.where(degen, -sz, oz))


def _sphere_t(ox, oy, oz, dx, dy, dz, cx, cy, cz, r):
    vx, vy, vz = ox - cx, oy - cy, oz - cz
    b = 2.0 * _dot(dx, dy, dz, vx, vy, vz)
    c = vx * vx + vy * vy + vz * vz - r * r
    disc = b * b - 4.0 * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-b - sq) * 0.5
    t1 = (-b + sq) * 0.5
    t = jnp.where(t0 < 0.0, t1, t0)
    return t, (disc >= 0.0) & (t >= 0.0)


def _triangle_t(ox, oy, oz, dx, dy, dz, v0, v1, v2):
    e1 = (v1[0] - v0[0], v1[1] - v0[1], v1[2] - v0[2])
    e2 = (v2[0] - v0[0], v2[1] - v0[1], v2[2] - v0[2])
    qx = dy * e2[2] - dz * e2[1]
    qy = dz * e2[0] - dx * e2[2]
    qz = dx * e2[1] - dy * e2[0]
    det = e1[0] * qx + e1[1] * qy + e1[2] * qz
    degen = jnp.abs(det) <= 1e-7
    inv = 1.0 / jnp.where(degen, 1.0, det)
    sx, sy, sz = ox - v0[0], oy - v0[1], oz - v0[2]
    rx = sy * e1[2] - sz * e1[1]
    ry = sz * e1[0] - sx * e1[2]
    rz = sx * e1[1] - sy * e1[0]
    t = (e2[0] * rx + e2[1] * ry + e2[2] * rz) * inv
    w1 = (sx * qx + sy * qy + sz * qz) * inv
    w2 = (dx * rx + dy * ry + dz * rz) * inv
    w0 = 1.0 - w1 - w2
    valid = (~degen) & (t > 0.0) & (w0 >= 0.0) & (w1 >= 0.0) & (w2 >= 0.0)
    return t, valid


def _make_kernel(num_spheres, num_tris, num_mats, num_pls, num_als, last_bounce):
    """Build the bounce kernel for a fixed scene topology."""

    def kernel(seed_ref, sph_ref, tri_ref, mat_ref, pl_ref, al_ref, bg_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               r0x_ref, r0y_ref, r0z_ref, r1x_ref, r1y_ref, r1z_ref, act_ref,
               oox_ref, ooy_ref, ooz_ref, odx_ref, ody_ref, odz_ref,
               or0x_ref, or0y_ref, or0z_ref, or1x_ref, or1y_ref, or1z_ref,
               oact_ref):
        pid = pl.program_id(0)
        # hardware PRNG takes at most 2 seed words: mix (bounce, block) into one
        pltpu.prng_seed(seed_ref[0], seed_ref[1] * 65599 + pid)

        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        r1x, r1y, r1z = r1x_ref[:], r1y_ref[:], r1z_ref[:]
        active = act_ref[:] > 0.5

        shape = ox.shape
        inf = jnp.float32(jnp.inf)

        # ---- nearest hit sweep: carry t, normal, mat ---------------------
        best_t = jnp.full(shape, inf, jnp.float32)
        nx = jnp.zeros(shape, jnp.float32)
        ny = jnp.zeros(shape, jnp.float32)
        nz = jnp.zeros(shape, jnp.float32)
        mat_f = jnp.zeros(shape, jnp.float32)

        for i in range(num_spheres):
            cx, cy, cz = sph_ref[i, 0], sph_ref[i, 1], sph_ref[i, 2]
            r, mid = sph_ref[i, 3], sph_ref[i, 4]
            t, valid = _sphere_t(ox, oy, oz, dx, dy, dz, cx, cy, cz, r)
            closer = valid & (t <= best_t)
            inv_r = 1.0 / r
            px, py, pz = ox + dx * t, oy + dy * t, oz + dz * t
            snx, sny, snz = _normalize3(px - cx, py - cy, pz - cz)
            best_t = jnp.where(closer, t, best_t)
            nx = jnp.where(closer, snx, nx)
            ny = jnp.where(closer, sny, ny)
            nz = jnp.where(closer, snz, nz)
            mat_f = jnp.where(closer, mid, mat_f)

        for i in range(num_tris):
            v0 = (tri_ref[i, 0], tri_ref[i, 1], tri_ref[i, 2])
            v1 = (tri_ref[i, 3], tri_ref[i, 4], tri_ref[i, 5])
            v2 = (tri_ref[i, 6], tri_ref[i, 7], tri_ref[i, 8])
            t, valid = _triangle_t(ox, oy, oz, dx, dy, dz, v0, v1, v2)
            closer = valid & (t <= best_t)
            best_t = jnp.where(closer, t, best_t)
            nx = jnp.where(closer, tri_ref[i, 9], nx)
            ny = jnp.where(closer, tri_ref[i, 10], ny)
            nz = jnp.where(closer, tri_ref[i, 11], nz)
            mat_f = jnp.where(closer, tri_ref[i, 12], mat_f)

        hit = best_t < inf
        t_safe = jnp.where(hit, best_t, 0.0)
        px, py, pz = ox + dx * t_safe, oy + dy * t_safe, oz + dz * t_safe

        # ---- material select chain (no gathers) --------------------------
        NF = 22
        mfields = [jnp.zeros(shape, jnp.float32) for _ in range(NF)]
        for mi in range(num_mats):
            mask = mat_f == float(mi)
            for f in range(NF):
                mfields[f] = jnp.where(mask, mat_ref[mi, f], mfields[f])
        (m_dr, m_dg, m_db, m_sr, m_sg, m_sb, m_ar, m_ag, m_ab,
         m_er, m_eg, m_eb, m_exp, m_ior, m_pd, m_ps, m_prf, m_rough,
         m_pure, m_ct) = (mfields[0], mfields[1], mfields[2], mfields[3],
                          mfields[4], mfields[5], mfields[6], mfields[7],
                          mfields[8], mfields[9], mfields[10], mfields[11],
                          mfields[12], mfields[13], mfields[14], mfields[15],
                          mfields[16], mfields[17], mfields[18], mfields[19])

        cos_i = -_dot(dx, dy, dz, nx, ny, nz)
        inside = cos_i <= 0.0

        # ---- NEE ---------------------------------------------------------
        def light_contribution(lx, ly, lz, pwx, pwy, pwz):
            offx, offy, offz = lx - px, ly - py, lz - pz
            d2 = jnp.maximum(offx * offx + offy * offy + offz * offz, 1e-12)
            dist = jnp.sqrt(d2)
            inv_d = 1.0 / dist
            wx, wy, wz = offx * inv_d, offy * inv_d, offz * inv_d
            sox = px + nx * RAY_BUMP_EPSILON
            soy = py + ny * RAY_BUMP_EPSILON
            soz = pz + nz * RAY_BUMP_EPSILON
            max_d = dist - 2.0 * RAY_BUMP_EPSILON
            occ = jnp.zeros(shape, bool)
            for i in range(num_spheres):
                t, valid = _sphere_t(sox, soy, soz, wx, wy, wz,
                                     sph_ref[i, 0], sph_ref[i, 1],
                                     sph_ref[i, 2], sph_ref[i, 3])
                occ = occ | (valid & (t <= max_d))
            for i in range(num_tris):
                t, valid = _triangle_t(
                    sox, soy, soz, wx, wy, wz,
                    (tri_ref[i, 0], tri_ref[i, 1], tri_ref[i, 2]),
                    (tri_ref[i, 3], tri_ref[i, 4], tri_ref[i, 5]),
                    (tri_ref[i, 6], tri_ref[i, 7], tri_ref[i, 8]))
                occ = occ | (valid & (t <= max_d))
            cos_l = jnp.maximum(0.0, _dot(nx, ny, nz, wx, wy, wz))
            scale = jnp.where(occ, 0.0, cos_l) * m_pd * INV_PI / (4.0 * math.pi) / d2
            return pwx * m_dr * scale, pwy * m_dg * scale, pwz * m_db * scale

        dir_r = m_er + jnp.zeros(shape, jnp.float32)
        dir_g = m_eg + jnp.zeros(shape, jnp.float32)
        dir_b = m_eb + jnp.zeros(shape, jnp.float32)

        for i in range(num_pls):
            cr, cg, cb = light_contribution(
                pl_ref[i, 0] + jnp.zeros(shape, jnp.float32),
                pl_ref[i, 1] + jnp.zeros(shape, jnp.float32),
                pl_ref[i, 2] + jnp.zeros(shape, jnp.float32),
                pl_ref[i, 3], pl_ref[i, 4], pl_ref[i, 5])
            dir_r += jnp.where(inside, 0.0, cr)
            dir_g += jnp.where(inside, 0.0, cg)
            dir_b += jnp.where(inside, 0.0, cb)

        for i in range(num_als):
            u1 = _uniform(shape)
            u2 = _uniform(shape)
            u3 = _uniform(shape)
            upick = _uniform(shape)
            inv_tot = 1.0 / jnp.maximum(u1 + u2 + u3, 1e-12)
            w0, w1, w2 = u1 * inv_tot, u2 * inv_tot, u3 * inv_tot
            first = upick > 0.5
            lx = ly = lz = None
            # triangle a: cols 0..8, triangle b: cols 9..17
            ax0 = [al_ref[i, k] for k in range(9)]
            bx0 = [al_ref[i, 9 + k] for k in range(9)]
            lx = jnp.where(first,
                           ax0[0] * w0 + ax0[3] * w1 + ax0[6] * w2,
                           bx0[0] * w0 + bx0[3] * w1 + bx0[6] * w2)
            ly = jnp.where(first,
                           ax0[1] * w0 + ax0[4] * w1 + ax0[7] * w2,
                           bx0[1] * w0 + bx0[4] * w1 + bx0[7] * w2)
            lz = jnp.where(first,
                           ax0[2] * w0 + ax0[5] * w1 + ax0[8] * w2,
                           bx0[2] * w0 + bx0[5] * w1 + bx0[8] * w2)
            cr, cg, cb = light_contribution(lx, ly, lz,
                                            al_ref[i, 18], al_ref[i, 19],
                                            al_ref[i, 20])
            dir_r += jnp.where(inside, 0.0, cr)
            dir_g += jnp.where(inside, 0.0, cg)
            dir_b += jnp.where(inside, 0.0, cb)

        # ---- Beer-Lambert on throughput ----------------------------------
        act_hit = active & hit
        beer_mask = act_hit & inside
        r1x = jnp.where(beer_mask, r1x * jnp.exp(-t_safe * m_ar), r1x)
        r1y = jnp.where(beer_mask, r1y * jnp.exp(-t_safe * m_ag), r1y)
        r1z = jnp.where(beer_mask, r1z * jnp.exp(-t_safe * m_ab), r1z)

        # ---- radiance accumulation ---------------------------------------
        r0x = r0x_ref[:] + jnp.where(act_hit, r1x * dir_r, 0.0)
        r0y = r0y_ref[:] + jnp.where(act_hit, r1y * dir_g, 0.0)
        r0z = r0z_ref[:] + jnp.where(act_hit, r1z * dir_b, 0.0)
        miss = active & (~hit)
        r0x += jnp.where(miss, bg_ref[0] * r1x, 0.0)
        r0y += jnp.where(miss, bg_ref[1] * r1y, 0.0)
        r0z += jnp.where(miss, bg_ref[2] * r1z, 0.0)

        new_active = act_hit

        if not last_bounce:
            # ---- scatter -------------------------------------------------
            u_branch = _uniform(shape)
            u_a = _uniform(shape)
            u_b = _uniform(shape)

            outside = cos_i > 0.0
            n1 = jnp.where(outside, 1.0, m_ior)
            n2 = jnp.where(outside, m_ior, 1.0)
            cos_pos = jnp.abs(cos_i)
            n_ratio = n1 / jnp.maximum(n2, 1e-12)
            sin_t2 = n_ratio * n_ratio * (1.0 - cos_pos * cos_pos)
            tir = sin_t2 > 1.0
            cos_t = jnp.sqrt(jnp.where(tir, 1.0, jnp.maximum(1.0 - sin_t2, 0.0)))
            rs = (n1 * cos_pos - n2 * cos_t) / jnp.maximum(n1 * cos_pos + n2 * cos_t, 1e-12)
            rp = (n2 * cos_pos - n1 * cos_t) / jnp.maximum(n2 * cos_pos + n1 * cos_t, 1e-12)
            fres = jnp.where(tir, 1.0, (rs * rs + rp * rp) * 0.5)

            pure = m_pure > 0.5
            ct = m_ct > 0.5
            p_diff = m_pd
            p_spec = m_ps * jnp.where(pure, 1.0, fres)
            p_refr = m_prf * (1.0 - fres)
            take_diff = u_branch < p_diff
            take_spec = (~take_diff) & (u_branch < p_diff + p_spec)
            take_refr = (~take_diff) & (~take_spec) & (u_branch < p_diff + p_spec + p_refr)

            two_pi = 2.0 * math.pi
            # diffuse: cosine hemisphere about n
            theta = u_a * two_pi
            yy = jnp.sqrt(u_b)
            rr = jnp.sqrt(jnp.maximum(1.0 - yy * yy, 0.0))
            ddx, ddy, ddz = _rotate_y_to(nx, ny, nz,
                                         rr * jnp.cos(theta), yy, rr * jnp.sin(theta))

            # Cook-Torrance: Beckmann microfacet normal
            u_ac = jnp.minimum(u_a, 1.0 - 1e-7)
            # theta = atan(x) with x = -m^2 ln(1-u) >= 0; we need only
            # sin/cos(theta) = (x, 1)/sqrt(1+x^2) (atan has no TPU lowering)
            btan = -(m_rough * m_rough) * jnp.log1p(-u_ac)
            binv = jax.lax.rsqrt(1.0 + btan * btan)
            bphi = u_b * two_pi
            sb, cb2 = btan * binv, binv
            mx, my, mz = _rotate_y_to(nx, ny, nz,
                                      sb * jnp.cos(bphi), cb2, sb * jnp.sin(bphi))
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

            # mirror / phong
            mrx = dx + 2.0 * cos_i * nx
            mry = dy + 2.0 * cos_i * ny
            mrz = dz + 2.0 * cos_i * nz
            fin = jnp.isfinite(m_exp)
            pexp = 1.0 / (jnp.where(fin, m_exp, 0.0) + 1.0)
            s_cl = jnp.clip(u_b, 1e-12, 1.0)
            ph_y = jnp.where(fin, jnp.exp(pexp * jnp.log(s_cl)), 1.0)
            ph_r = jnp.sqrt(jnp.maximum(1.0 - ph_y * ph_y, 0.0))
            phx, phy_, phz = _rotate_y_to(mrx, mry, mrz,
                                          ph_r * jnp.cos(theta), ph_y,
                                          ph_r * jnp.sin(theta))
            gsx = jnp.where(fin, phx, mrx)
            gsy = jnp.where(fin, phy_, mry)
            gsz = jnp.where(fin, phz, mrz)

            spx = jnp.where(ct, ctx, gsx)
            spy = jnp.where(ct, cty, gsy)
            spz = jnp.where(ct, ctz, gsz)
            sp_ox = jnp.where(ct, px + mx * RAY_BUMP_EPSILON, px + nx * RAY_BUMP_EPSILON)
            sp_oy = jnp.where(ct, py + my * RAY_BUMP_EPSILON, py + ny * RAY_BUMP_EPSILON)
            sp_oz = jnp.where(ct, pz + mz * RAY_BUMP_EPSILON, pz + nz * RAY_BUMP_EPSILON)
            spw = jnp.where(ct, ct_w, 1.0)

            # refraction
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

            ox = jnp.where(act_hit, new_ox, ox)
            oy = jnp.where(act_hit, new_oy, oy)
            oz = jnp.where(act_hit, new_oz, oz)
            dx = jnp.where(act_hit, new_dx, dx)
            dy = jnp.where(act_hit, new_dy, dy)
            dz = jnp.where(act_hit, new_dz, dz)
            r1x = jnp.where(act_hit, r1x * wr, r1x)
            r1y = jnp.where(act_hit, r1y * wg, r1y)
            r1z = jnp.where(act_hit, r1z * wb, r1z)
            new_active = act_hit & alive

        oox_ref[:] = ox
        ooy_ref[:] = oy
        ooz_ref[:] = oz
        odx_ref[:] = dx
        ody_ref[:] = dy
        odz_ref[:] = dz
        or0x_ref[:] = r0x
        or0y_ref[:] = r0y
        or0z_ref[:] = r0z
        or1x_ref[:] = r1x
        or1y_ref[:] = r1y
        or1z_ref[:] = r1z
        oact_ref[:] = new_active.astype(jnp.float32)

    return kernel


@functools.partial(jax.jit, static_argnames=("last_bounce", "block_rows"))
def bounce_pallas(packed: PackedScene, state, seed_pair,
                  last_bounce: bool = False, block_rows: int = DEF_ROWS):
    """One fused bounce over the whole wavefront.

    ``state``: tuple of 13 arrays of shape [R, 128] (ox oy oz dx dy dz r0xyz
    r1xyz active_f32). ``seed_pair``: int32[2] (seed, bounce) for the
    hardware PRNG. Returns the updated 13-tuple.
    """
    rows = state[0].shape[0]
    assert rows % block_rows == 0, (rows, block_rows)
    grid = rows // block_rows

    S, T, M, Lp, La = packed.counts
    kernel = _make_kernel(S, T, M, Lp, La, last_bounce)

    # index_map receives (grid indices, *scalar-prefetch refs)
    block = pl.BlockSpec((block_rows, LANES), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(grid,),
        in_specs=[block] * 13,
        out_specs=[block] * 13,
    )
    out_shape = [jax.ShapeDtypeStruct((rows, LANES), jnp.float32)] * 13

    return tuple(pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases={7 + i: i for i in range(13)},
    )(seed_pair, packed.spheres, packed.triangles, packed.materials,
      packed.point_lights, packed.area_lights, packed.background, *state))
