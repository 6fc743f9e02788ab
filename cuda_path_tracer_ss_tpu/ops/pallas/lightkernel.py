"""Light tracing on the fused Pallas engine.

The jnp light tracer (render/lighttrace.py) walks paths FROM the lights
and splats camera connections; until round 4 it was the one renderer with
no megakernel, so caustic/bidirectional workloads ran at jnp speed. The
scatter-add splat is the blocker on block-SIMD hardware — Mosaic has no
per-lane scatter — so this kernel SPLITS the work at exactly that point:

* IN-KERNEL (the expensive part): every lane traces one light path per
  launch — emission sample, the per-bounce scene sweeps (the same
  ``_make_sweep_fns`` the forward megakernel uses), the camera-connection
  visibility sweep, the shared ``_scatter_sample`` cascade — and writes
  one SPLAT RECORD per path vertex: (pixel index, weighted rgb) planes,
  one row-block per bounce plus the emitter-surface record.
* OUTSIDE (cheap): one XLA ``.at[pix].add`` scatter-adds the records into
  the image — identical math to the jnp tracer's splat. Per-path
  contributions are IDENTICAL (same counter streams keyed on global path
  index, same formulas; parity asserted in tests/test_lighttrace.py).

Bidirectional MIS weights (render/bidir.py's U / r0 / pr-carry
recurrences) are pure lane math and run in-kernel under ``bidir_nu``,
mirroring ``lighttrace_block`` term for term.

Scope: untextured scenes with area lights (textured light tracing stays
jnp — the launcher gates loudly); forward rendering only (light-path
training runs the jnp engine's autodiff).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...constants import DEFAULT_MAX_BOUNCES, RAY_BUMP_EPSILON
from ...utils import rng
from .megakernel import (LANES, PackedScene, _al_light_geom,
                         _al_sample_point, _chain_model_taken, _dot,
                         _make_sweep_fns, _normalize3, _rotate_y_to,
                         _scatter_sample)

INV_PI = 1.0 / math.pi


def _make_light_kernel(counts, width, height, block_rows, max_bounces,
                       feat=(True, True, True), bidir=False, ucols=None):
    num_spheres, num_tris, num_mats, num_pls, num_als = counts
    shape = (block_rows, LANES)
    two_pi = 2.0 * math.pi
    L = num_als
    NF = 20

    def kernel(seed_ref, sph_ref, tri_ref, mat_ref, pl_ref, al_ref,
               cam_ref, pix_ref, cr_ref, cg_ref, cb_ref):
        intersect_sweep, occlusion_sweep = _make_sweep_fns(
            counts, shape, sph_ref, tri_ref)
        pid = pl.program_id(0)
        row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        # global path index: seed_ref[1] is this launch's path offset
        path = seed_ref[1] + pid * (block_rows * LANES) + row * LANES + lane
        in_range = path < seed_ref[3]
        sample_idx = seed_ref[2]
        bidir_nu = cam_ref[15]

        r00, r01, r02 = cam_ref[0], cam_ref[1], cam_ref[2]
        r10, r11, r12 = cam_ref[3], cam_ref[4], cam_ref[5]
        r20, r21, r22 = cam_ref[6], cam_ref[7], cam_ref[8]
        cam_x, cam_y, cam_z = cam_ref[9], cam_ref[10], cam_ref[11]
        tan_half, z_near = cam_ref[12], cam_ref[13]

        def pair(p):
            return rng.uniform_pair(seed_ref[0], path, sample_idx, p)

        def splat_weights(px_, py_, pz_):
            """camera_splat_weights (lighttrace.py) on planes."""
            tox = px_ - cam_x
            toy = py_ - cam_y
            toz = pz_ - cam_z
            r2 = jnp.maximum(tox * tox + toy * toy + toz * toz, 1e-12)
            r = jnp.sqrt(r2)
            inv_r = 1.0 / r
            dx_, dy_, dz_ = tox * inv_r, toy * inv_r, toz * inv_r
            vx = r00 * dx_ + r10 * dy_ + r20 * dz_
            vy = r01 * dx_ + r11 * dy_ + r21 * dz_
            vz = r02 * dx_ + r12 * dy_ + r22 * dz_
            s = -2.0 * tan_half
            aspect = height / width
            safe_vz = jnp.where(jnp.abs(vz) < 1e-12, 1e-12, vz)
            px_img = (vx / (safe_vz * s) + 0.5) * width
            py_img = (vy / (safe_vz * s * aspect) + 0.5) * height
            front = vz * jnp.sign(z_near) > 1e-7
            on = (front & (px_img >= 0) & (px_img < width)
                  & (py_img >= 0) & (py_img < height))
            ix = jnp.clip(jnp.floor(px_img), 0,
                          width - 1).astype(jnp.int32)
            iy = jnp.clip(jnp.floor(py_img), 0,
                          height - 1).astype(jnp.int32)
            pixel = iy * width + ix
            cos_t = jnp.clip(jnp.abs(vz), 1e-4, 1.0)
            j_img = (width * height) / (s * s * aspect * cos_t ** 3)
            return pixel, on, (dx_, dy_, dz_), r2, r, j_img

        def visible_to_eye(px_, py_, pz_, ex, ey, ez, dist):
            return ~occlusion_sweep(px_ + ex * RAY_BUMP_EPSILON,
                                    py_ + ey * RAY_BUMP_EPSILON,
                                    pz_ + ez * RAY_BUMP_EPSILON,
                                    ex, ey, ez,
                                    dist - 2.0 * RAY_BUMP_EPSILON)

        # ---- light emission vertex: exactly lighttrace_block's draws ----
        # bounce_rows(b=0) rows 0..3 = pair(1).a/.b, pair(2).a, pair(3).a
        u0, u1 = pair(1)
        u2, _ = pair(2)
        u3, _ = pair(3)
        li = jnp.minimum((u0 * L).astype(jnp.int32), L - 1)
        geoms = [_al_light_geom([al_ref[i, k] for k in range(23)])
                 for i in range(L)]
        zero = jnp.zeros(shape, jnp.float32)
        ptx = pty = ptz = zero
        nlx = nly = nlz = zero
        area = zero
        ler = leg = leb = zero
        for k in range(L):
            (pk_x, pk_y, pk_z), (nk_x, nk_y, nk_z) = _al_sample_point(
                geoms[k], u1, u2, u3)
            sel = li == k
            ptx = jnp.where(sel, pk_x, ptx)
            pty = jnp.where(sel, pk_y, pty)
            ptz = jnp.where(sel, pk_z, ptz)
            nlx = jnp.where(sel, nk_x, nlx)
            nly = jnp.where(sel, nk_y, nly)
            nlz = jnp.where(sel, nk_z, nlz)
            area = jnp.where(sel, geoms[k]["total"] + zero, area)
            lm = al_ref[k, 22].astype(jnp.int32)
            ler = jnp.where(sel, mat_ref[lm, 9] + zero, ler)
            leg = jnp.where(sel, mat_ref[lm, 10] + zero, leg)
            leb = jnp.where(sel, mat_ref[lm, 11] + zero, leb)

        t_emit_r = ler * (float(L) * area)
        t_emit_g = leg * (float(L) * area)
        t_emit_b = leb * (float(L) * area)

        # ---- record 0: emitter-surface splat ----------------------------
        pix0, on0, (ex0, ey0, ez0), r2_0, r_0, j0 = splat_weights(
            ptx, pty, ptz)
        vis0 = visible_to_eye(ptx, pty, ptz, -ex0, -ey0, -ez0, r_0)
        cos_c0 = jnp.abs(_dot(nlx, nly, nlz, ex0, ey0, ez0))
        w_splat = 1.0
        if bidir:
            c_a0 = j0 * cos_c0 / r2_0
            w_splat = 1.0 / (1.0 + (c_a0 * (float(L) * area)
                                    / bidir_nu) ** 2)
        ok0 = on0 & vis0 & in_range
        s0 = jnp.where(ok0, w_splat * cos_c0 / r2_0 * j0, 0.0)
        pix_ref[0] = jnp.where(ok0, pix0, 0)
        cr_ref[0] = t_emit_r * s0
        cg_ref[0] = t_emit_g * s0
        cb_ref[0] = t_emit_b * s0

        # ---- leave the light (cosine hemisphere, two-sided) -------------
        side = jnp.where(u0 * L - li.astype(jnp.float32) < 0.5, 1.0, -1.0)
        nex, ney, nez = nlx * side, nly * side, nlz * side
        d1a, d1b = pair(rng.pair_base(1, L))
        theta = d1a * two_pi
        yy = jnp.sqrt(d1b)
        rr = jnp.sqrt(jnp.maximum(1.0 - yy * yy, 0.0))
        dx, dy, dz = _rotate_y_to(nex, ney, nez, rr * jnp.cos(theta), yy,
                                  rr * jnp.sin(theta))
        beta_r = t_emit_r * two_pi
        beta_g = t_emit_g * two_pi
        beta_b = t_emit_b * two_pi
        ox = ptx + nex * RAY_BUMP_EPSILON
        oy = pty + ney * RAY_BUMP_EPSILON
        oz = ptz + nez * RAY_BUMP_EPSILON
        active = in_range

        # bidir-MIS carries (lighttrace_block's mis0)
        cos0 = jnp.abs(_dot(nex, ney, nez, dx, dy, dz))
        inv_pl_a = float(L) * area
        U = zero
        r0c = zero
        pr_carry = jnp.ones(shape, jnp.float32)
        nee_ok = jnp.ones(shape, jnp.float32)
        pf_pending = 0.5 * cos0 * INV_PI
        prev_cos_out = cos0

        feat_k = feat
        for b in range(max_bounces):
            best_t, nx, ny, nz, mat_f = intersect_sweep(ox, oy, oz,
                                                        dx, dy, dz)
            hit = best_t < jnp.inf
            t_safe = jnp.where(hit, best_t, 0.0)
            px = ox + dx * t_safe
            py = oy + dy * t_safe
            pz = oz + dz * t_safe
            # uniform-column skip — same trick (and same bitwise-identity
            # argument) as the forward megakernel's material load
            uc = ucols if (ucols is not None and num_mats >= 1
                           and len(ucols) == NF) else (False,) * NF
            mf = [(jnp.zeros(shape, jnp.float32) + mat_ref[0, f])
                  if uc[f] else jnp.zeros(shape, jnp.float32)
                  for f in range(NF)]
            varying = [f for f in range(NF) if not uc[f]]
            for mi in range(num_mats if varying else 0):
                mask = mat_f == float(mi)
                for f in varying:
                    mf[f] = jnp.where(mask, mat_ref[mi, f], mf[f])
            act = active & hit

            # Beer-Lambert over interior segments (jnp tracer parity)
            cos_i = -_dot(dx, dy, dz, nx, ny, nz)
            beer_on = act & (cos_i <= 0.0)
            beta_r = jnp.where(beer_on,
                               beta_r * jnp.exp(-t_safe * mf[6]), beta_r)
            beta_g = jnp.where(beer_on,
                               beta_g * jnp.exp(-t_safe * mf[7]), beta_g)
            beta_b = jnp.where(beer_on,
                               beta_b * jnp.exp(-t_safe * mf[8]), beta_b)

            # ---- camera connection (diffuse lobe, front-gated) ----------
            pixb, onb, (ecx, ecy, ecz), r2b, rb, jb = splat_weights(
                px, py, pz)
            nux, nuy, nuz = _normalize3(nx, ny, nz, 1e-20)
            cos_c = jnp.maximum(-_dot(nux, nuy, nuz, ecx, ecy, ecz), 0.0)
            front = (cos_c > 0.0) & (cos_i > 0.0)
            visb = visible_to_eye(px, py, pz, -ecx, -ecy, -ecz, rb)
            f_scale = mf[14] * INV_PI
            w_conn = 1.0
            first = b == 0
            cos_arr = jnp.abs(_dot(dx, dy, dz, nux, nuy, nuz))
            t2 = jnp.maximum(jnp.where(hit, best_t, 1.0) ** 2, 1e-12)
            if bidir:
                pf_full = jnp.maximum(pf_pending * cos_arr / t2, 1e-20)
                U = jnp.where(first, inv_pl_a / pf_full,
                              U * pr_carry / pf_full)
                c_a = jb * cos_c / r2b
                prd_sa = mf[14] * jnp.maximum(
                    -_dot(dx, dy, dz, nux, nuy, nuz), 0.0) * INV_PI
                geo_prev = prev_cos_out / t2
                prd_eff = jnp.where(first, 1.0, prd_sa * geo_prev)
                p_nee_a = float(L) / jnp.maximum(inv_pl_a, 1e-20)
                rho_n = (jnp.where(first, 1.0, nee_ok)
                         * c_a * p_nee_a * prd_eff * U)
                r0_eff = jnp.where(first, prd_sa * geo_prev, r0c)
                rho_b = c_a * prd_eff * U * r0_eff
                w_conn = 1.0 / (1.0 + (rho_n / bidir_nu) ** 2
                                + (rho_b / bidir_nu) ** 2)
            okb = onb & visb & act & front
            sb_ = jnp.where(okb, w_conn * cos_c / r2b * jb, 0.0)
            pix_ref[b + 1] = jnp.where(okb, pixb, 0)
            cr_ref[b + 1] = beta_r * mf[0] * f_scale * sb_
            cg_ref[b + 1] = beta_g * mf[1] * f_scale * sb_
            cb_ref[b + 1] = beta_b * mf[2] * f_scale * sb_

            # ---- continue the path (shared cascade; bounce_rows(b+2)) ---
            base = rng.pair_base(b + 2, L)
            u_branch, u_a = pair(base)
            u_b, _un = pair(base + 1)
            (n_ox, n_oy, n_oz, n_dx, n_dy, n_dz, wr, wg, wb,
             alive, take_diff, take_spec, take_refr, _tir, ct_m, _cw) = \
                _scatter_sample(dx, dy, dz, nx, ny, nz, px, py, pz, cos_i,
                                u_branch, u_a, u_b, mf, feat=feat_k)
            if bidir:
                pf_new = _chain_model_taken(
                    dx, dy, dz, nx, ny, nz, cos_i, n_dx, n_dy, n_dz,
                    mf, take_diff, take_spec, take_refr, ct_m, feat_k)
                cos_rev = _dot(n_dx, n_dy, n_dz, nx, ny, nz)
                pr_sa = _chain_model_taken(
                    -n_dx, -n_dy, -n_dz, nx, ny, nz, cos_rev,
                    -dx, -dy, -dz, mf, take_diff, take_spec, take_refr,
                    ct_m, feat_k)
                pr_full = pr_sa * prev_cos_out / t2
                r0c = jnp.where(first, pr_full, r0c)
                pr_carry = jnp.where(first, jnp.ones_like(pr_full),
                                     pr_full)
                nee_ok = jnp.where(
                    first,
                    (_dot(n_dx, n_dy, n_dz, nux, nuy, nuz) > 0.0)
                    .astype(jnp.float32), nee_ok)
                pf_pending = jnp.where(act, pf_new, pf_pending)
                prev_cos_out = jnp.where(
                    act, jnp.abs(_dot(n_dx, n_dy, n_dz, nux, nuy, nuz)),
                    prev_cos_out)
            ox, oy, oz = n_ox, n_oy, n_oz
            dx, dy, dz = n_dx, n_dy, n_dz
            beta_r = beta_r * wr
            beta_g = beta_g * wg
            beta_b = beta_b * wb
            active = act & alive

    return kernel


def _light_records(packed, cam_params, seed, width, height, n_paths,
                   max_bounces, block_rows, path_offset, n_local,
                   sample_idx, bidir_nu, interpret=False):
    """Launch the kernel over ``n_local`` paths starting at global index
    ``path_offset``; returns (pix, r, g, b) of [B+1, rows, LANES]."""
    block = block_rows * LANES
    rows = ((n_local + block - 1) // block) * block // LANES
    grid = rows // block_rows
    B1 = max_bounces + 1

    rot, pos, tan_half, z_near = cam_params
    cam = jnp.concatenate([
        jnp.asarray(rot, jnp.float32).reshape(-1),
        jnp.asarray(pos, jnp.float32).reshape(-1),
        jnp.asarray(tan_half, jnp.float32).reshape(1),
        jnp.asarray(z_near, jnp.float32).reshape(1),
        jnp.zeros((1,), jnp.float32),      # slot parity with render cam
        jnp.asarray(0.0 if bidir_nu is None else bidir_nu,
                    jnp.float32).reshape(1),
    ])
    seed_arr = jnp.stack([
        jnp.asarray(seed, jnp.int32).reshape(()),
        jnp.asarray(path_offset, jnp.int32).reshape(()),
        jnp.asarray(sample_idx, jnp.int32).reshape(()),
        jnp.asarray(n_paths, jnp.int32).reshape(()),
    ])
    kernel = _make_light_kernel(packed.counts, width, height, block_rows,
                                max_bounces,
                                feat=getattr(packed, "feat",
                                             (True, True, True)),
                                bidir=bidir_nu is not None,
                                ucols=getattr(packed, "ucols", None))
    scalar_args = [seed_arr, packed.spheres.reshape(-1),
                   packed.triangles.reshape(-1), packed.materials,
                   packed.point_lights, packed.area_lights, cam]
    out_block = pl.BlockSpec((B1, block_rows, LANES),
                             lambda i, *_: (0, i, 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalar_args),
        grid=(grid,),
        in_specs=[],
        out_specs=[out_block] * 4,
    )
    out_shape = [jax.ShapeDtypeStruct((B1, rows, LANES), jnp.int32),
                 jax.ShapeDtypeStruct((B1, rows, LANES), jnp.float32),
                 jax.ShapeDtypeStruct((B1, rows, LANES), jnp.float32),
                 jax.ShapeDtypeStruct((B1, rows, LANES), jnp.float32)]
    return pl.pallas_call(kernel, grid_spec=grid_spec,
                          out_shape=out_shape,
                          interpret=interpret)(*scalar_args)


@functools.partial(jax.jit, static_argnames=(
    "width", "height", "n_paths", "max_bounces", "block_rows",
    "interpret", "bidir_nu"))
def render_lighttrace_fast(packed: PackedScene, cam_params, seed,
                           width: int, height: int, n_paths: int,
                           max_bounces: int = DEFAULT_MAX_BOUNCES,
                           block_rows: int = 32,
                           sample_idx=0,
                           interpret: bool = False,
                           bidir_nu: float | None = None) -> jax.Array:
    """Light tracing on the fused engine -> [height, width, 3] image
    estimate (divide-by-n_paths normalized, like render_lighttrace).
    Per-path contributions identical to the jnp tracer; the image matches
    up to scatter-add ordering."""
    if packed.counts[4] == 0:
        raise ValueError("light tracing needs at least one area light")
    if packed.tex_counts[0]:
        raise ValueError("textured light tracing runs on engine='jnp' "
                         "(the light kernel has no texture block)")
    pix, r, g, b = _light_records(packed, cam_params, seed, width, height,
                                  n_paths, max_bounces, block_rows, 0,
                                  n_paths, sample_idx, bidir_nu,
                                  interpret=interpret)
    img = jnp.zeros((width * height, 3), jnp.float32)
    rgb = jnp.stack([r.reshape(-1), g.reshape(-1), b.reshape(-1)], -1)
    img = img.at[pix.reshape(-1)].add(rgb)
    return (img / n_paths).reshape(height, width, 3)


def render_lighttrace_fast_sharded(packed: PackedScene, cam_params, seed,
                                   width: int, height: int, n_paths: int,
                                   mesh,
                                   max_bounces: int = DEFAULT_MAX_BOUNCES,
                                   block_rows: int = 32,
                                   sample_idx=0,
                                   interpret: bool = False,
                                   bidir_nu: float | None = None
                                   ) -> jax.Array:
    """Light tracing ON THE FUSED KERNEL, sharded over ``mesh``'s
    ``PATH_AXIS`` (round 5, VERDICT r4 ask #8): each device runs the
    kernel over a disjoint block of GLOBAL path indices, scatter-adds its
    own full-image partial, and one psum merges the splats — the same
    collective layout as the jnp ``render_lighttrace_sharded``, with the
    in-kernel tracer doing the per-device work. Streams key on global
    path indices, so per-path contributions match single-device
    ``render_lighttrace_fast`` exactly; only the splat summation order
    differs (tests/test_sharding.py asserts tight allclose)."""
    from jax.sharding import PartitionSpec as P

    from ...parallel.mesh import PATH_AXIS

    if packed.counts[4] == 0:
        raise ValueError("light tracing needs at least one area light")
    if packed.tex_counts[0]:
        raise ValueError("textured light tracing runs on engine='jnp' "
                         "(the light kernel has no texture block)")
    if PATH_AXIS not in mesh.shape:
        raise ValueError(
            f"render_lighttrace_fast_sharded needs a mesh with a "
            f"{PATH_AXIS!r} axis; got axes {tuple(mesh.shape)}")
    n_dev = mesh.shape[PATH_AXIS]
    if n_paths % n_dev:
        raise ValueError(f"n_paths={n_paths} not divisible by "
                         f"{n_dev} devices")
    per_dev = n_paths // n_dev

    def shard_fn(packed, cam_params, seed):
        dev = jax.lax.axis_index(PATH_AXIS)
        pix, r, g, b = _light_records(
            packed, cam_params, seed, width, height, n_paths, max_bounces,
            block_rows, dev * per_dev, per_dev, sample_idx, bidir_nu,
            interpret=interpret)
        img = jnp.zeros((width * height, 3), jnp.float32)
        rgb = jnp.stack([r.reshape(-1), g.reshape(-1), b.reshape(-1)], -1)
        img = img.at[pix.reshape(-1)].add(rgb)
        return jax.lax.psum(img, PATH_AXIS) / n_paths

    out = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=(P(), P(), P()), out_specs=P(),
        check_vma=False,
    )(packed, cam_params, jnp.asarray(seed, jnp.int32))
    return out.reshape(height, width, 3)
