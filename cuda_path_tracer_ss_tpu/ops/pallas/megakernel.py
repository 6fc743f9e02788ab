"""Whole-render Pallas megakernel: eye rays + all samples + all bounces in
ONE kernel launch.

The reference needs ~32 kernel launches per frame (SURVEY §3.2); the first
fused-bounce Pallas port still needed spp x bounces launches and drowned in
per-launch overhead. This kernel inverts the loop nest the TPU-native way:
the grid walks ray blocks; each block generates its pixels' eye rays
in-register, runs the full bounce while-loop (early-exiting when its rays
die), accumulates all spp samples, and writes three radiance-sum planes to
HBM once. Scene and camera live in SMEM; there are no tensor inputs at all.

Per-block early exit replaces the reference's global 128-live-ray cutoff
(``CudaTracer.cu:622``): a block stops when *its* rays are all dead — a
slightly stronger condition, evaluated with zero host involvement.

RNG: counter-based Threefry-2x32 on (seed, pixel, sample, pair) — the SAME
streams the jnp estimator consumes (utils/rng.py), drawn per call site from
each lane's own (sample, bounce) counters. The two engines therefore agree
per pixel (up to float op-order noise), any device mesh renders bitwise the
same image as one chip, and the backward pass can replay any path exactly.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...constants import INV_PI, RAY_BUMP_EPSILON
from ...utils import rng

LANES = 128
# primitive-table row widths (the kernels consume these tables FLATTENED
# to 1-D SMEM arrays — see the note in _make_sweep_fns)
S_COLS = 5
T_COLS = 19
# Rows per block -> 4096 rays. Swept on-chip at 800^2 Cornell 64spp:
# 8 -> 221, 16 -> 283, 32 -> 296, 64 -> 197 M rays/s sustained. Bigger
# blocks amortize per-grid-step overhead until the VMEM working set spills
# (the 13-plane carry is 32*128*4B*13 = 2 MiB at 32 rows).
DEF_ROWS = 32

# Sweeps unroll fully below this primitive count (zero loop overhead, the
# scene folds into the instruction stream); above it they become dynamic
# while_loops with SMEM scalar reads so compile time and code size stay
# bounded for large scenes. while_loop, not fori_loop: Mosaic legalizes
# scf.while but not scf.for for these tile carries (see _prim_loop).
UNROLL_LIMIT = 48

NUM_SCALARS = 8  # seed, spheres, tris, mats, pls, als, bg, camera


class PackedScene:
    """Kernel-side scene bundles. A custom pytree: the arrays are leaves,
    ``counts`` (S, T, M, Lp, La) is static aux data so the kernel's unrolled
    loops specialize on it under jit. Empty bundles are padded to one zero
    row (Mosaic rejects 0-row SMEM operands); the dummy row is never read.

    Arrays: spheres [S,5] = cx cy cz r mat; triangles [T,19] = v0 e1 e2
    n0 n1 n2 mat (e1 = v1-v0, e2 = v2-v0 precomputed — the sweep would
    otherwise re-derive them per ray per bounce; per-corner normals are
    barycentrically interpolated exactly as Primitives.h:71-73);
    materials [M,20] = diff spec
    absorb emit specExp ior diffAvg specAvg refrAvg rough pureRefl ct;
    point_lights [Lp,6]; area_lights [La,23] = two triangles' vertices +
    power + owning-triangle index + light material index (the last two
    feed the physical estimator's emission-MIS lookups); background [3].
    """

    __slots__ = ("spheres", "triangles", "materials", "point_lights",
                 "area_lights", "background", "counts", "tex_planes",
                 "tex_meta", "tex_triuv", "tex_matids", "tex_counts",
                 "feat", "ucols", "tex_nmap")

    def __init__(self, spheres, triangles, materials, point_lights,
                 area_lights, background, counts, tex_planes=None,
                 tex_meta=None, tex_triuv=None, tex_matids=None,
                 tex_counts=(0, 0), feat=(True, True, True), ucols=None,
                 tex_nmap=False):
        self.spheres = spheres
        self.triangles = triangles
        self.materials = materials
        self.point_lights = point_lights
        self.area_lights = area_lights
        self.background = background
        self.counts = tuple(counts)
        # texture bundle (round 4; None/(0,0) = untextured). Side-car
        # tables so the shared S_COLS/T_COLS/NF layouts stay untouched:
        # tex_planes [3*R, LANES] channel-planed flat texel rows for the
        # chunked dynamic_gather; tex_meta [K, 3] per-texture (base, h, w);
        # tex_triuv [T, 6] per-corner UVs; tex_matids [M, 2] color/normal
        # map ids (-1 = none). tex_counts = (K, R) is static.
        self.tex_planes = tex_planes
        self.tex_meta = tex_meta
        self.tex_triuv = tex_triuv
        self.tex_matids = tex_matids
        self.tex_counts = tuple(tex_counts)
        # static material-feature flags (has_ct, has_finite_exp, has_refr):
        # pack_scene inspects the CONCRETE material table and the kernel
        # statically skips sampler blocks no material can take — bitwise
        # identical output (the skipped branches' masks are all-false).
        # Traced tables (training) conservatively keep every branch.
        self.feat = tuple(feat)
        # static per-column uniformity of the material table (ROADMAP 1b):
        # ucols[f] == True means every material shares column f's value, so
        # the kernel loads it with ONE broadcast of mat_ref[0, f] instead
        # of an M-way select chain. Bitwise identical: miss lanes carry
        # mat_f == 0.0 (the sweep's init) and so already read material 0.
        # None = traced table / unknown — keep the full select chain.
        self.ucols = tuple(ucols) if ucols is not None else None
        # static: does any material carry a NORMAL map? (round 5 phase 2:
        # the full-mode textured path adjoint handles COLOR-map UV-swim
        # but not the normal-perturbation Jacobian — entry points gate on
        # this flag; nmap_id is never trainable, so it is always concrete)
        self.tex_nmap = bool(tex_nmap)


def _packed_flatten(ps):
    return ((ps.spheres, ps.triangles, ps.materials, ps.point_lights,
             ps.area_lights, ps.background, ps.tex_planes, ps.tex_meta,
             ps.tex_triuv, ps.tex_matids),
            (ps.counts, ps.tex_counts, ps.feat, ps.ucols, ps.tex_nmap))


def _packed_unflatten(aux, leaves):
    counts, tex_counts, feat, ucols, tex_nmap = aux
    return PackedScene(*leaves[:6], counts, tex_planes=leaves[6],
                       tex_meta=leaves[7], tex_triuv=leaves[8],
                       tex_matids=leaves[9], tex_counts=tex_counts,
                       feat=feat, ucols=ucols, tex_nmap=tex_nmap)


jax.tree_util.register_pytree_node(PackedScene, _packed_flatten,
                                   _packed_unflatten)


def pack_scene(scene) -> PackedScene:
    """Flatten the SoA scene into the kernel's SMEM bundles. Textured
    scenes additionally pack the texture atlas into flat 128-texel rows
    per channel (``tex_planes``) for the kernel's chunked per-lane
    ``dynamic_gather`` fetches (round 4 — the round-3 "cannot do per-lane
    gathers" blocker fell to Mosaic's lane-dim ``take_along_axis``)."""
    def v3(v):
        return jnp.stack([v.x, v.y, v.z], -1)

    spheres = jnp.concatenate([
        v3(scene.sph_center),
        scene.sph_radius[:, None],
        scene.sph_mat[:, None].astype(jnp.float32),
    ], -1)

    v0 = v3(scene.tri_v0)
    tris = jnp.concatenate([
        v0, v3(scene.tri_v1) - v0, v3(scene.tri_v2) - v0,
        v3(scene.tri_n0), v3(scene.tri_n1), v3(scene.tri_n2),
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

    tex_planes = None
    tex_meta = None
    tex_triuv = None
    tex_matids = None
    tex_counts = (0, 0)
    if getattr(scene, "num_textures", 0):
        import numpy as np
        K = scene.num_textures
        # STATIC metadata: read through NumPy — under a jit trace, jnp
        # indexing would stage ops and hand back tracers, but the sizes
        # must stay concrete (they shape the kernel). tex_hw is never
        # trainable, so the concrete read is always valid.
        hw_np = np.asarray(scene.tex_hw)
        hw = jnp.asarray(hw_np)
        flats = []
        bases = []
        off = 0
        for k in range(K):
            h = int(hw_np[k, 0])
            w = int(hw_np[k, 1])
            bases.append(off)
            flats.append(scene.textures[k, :h, :w, :].reshape(h * w, 3))
            off += h * w
        flat = jnp.concatenate(flats, 0)                      # [total, 3]
        R = (off + LANES - 1) // LANES
        pad = R * LANES - off
        flat = jnp.concatenate(
            [flat, jnp.zeros((pad, 3), jnp.float32)], 0)
        # channel c occupies rows [c*R, (c+1)*R)
        tex_planes = jnp.concatenate(
            [flat[:, c].reshape(R, LANES) for c in range(3)], 0)
        tex_meta = jnp.stack([
            jnp.asarray(bases, jnp.float32),
            hw[:, 0].astype(jnp.float32),
            hw[:, 1].astype(jnp.float32),
        ], -1)                                                # [K, 3]
        tex_triuv = jnp.concatenate(
            [scene.tri_uv0, scene.tri_uv1, scene.tri_uv2], -1)
        if not tex_triuv.shape[0]:
            tex_triuv = jnp.zeros((1, 6), jnp.float32)
        tex_matids = jnp.stack(
            [m.tex_id.astype(jnp.float32),
             m.nmap_id.astype(jnp.float32)], -1)
        tex_counts = (K, R)

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
            # cols 21-22: owning triangle index + light material index —
            # the physical estimator's emission-MIS and L_e lookups need
            # them (integrator.py bounce / ops/shading.py shade_physical)
            t0[:, None].astype(jnp.float32),
            scene.tri_mat[t0][:, None].astype(jnp.float32),
        ], -1)
    else:
        als = jnp.zeros((1, 23), jnp.float32)

    def pad1(a):
        return a if a.shape[0] else jnp.zeros((1, a.shape[1]), a.dtype)

    counts = (scene.num_spheres, scene.num_triangles,
              scene.materials.flags.shape[0], scene.num_point_lights,
              scene.num_area_lights)
    try:
        import numpy as _np
        flags_c = _np.asarray(m.flags)
        exp_c = _np.asarray(m.spec_exp)
        refr_c = _np.asarray(m.refr_avg)
        feat = (bool(((flags_c & 0x03) != 0).any()),
                bool((_np.isfinite(exp_c) & (_np.asarray(m.spec_avg) > 0)
                      ).any()),
                bool((refr_c > 0).any()))
        # per-column uniformity (ROADMAP 1b): columns every material
        # shares become a single kernel broadcast. NaN-safe equality via
        # bit views (spec_exp is +inf for non-glossy mats; plain == is
        # fine for inf but bit-compare is exact for every value).
        mats_c = _np.asarray(mats)
        if mats_c.shape[0] >= 1:
            bits = mats_c.view(_np.uint32)
            ucols = tuple(bool((bits[:, f] == bits[0, f]).all())
                          for f in range(mats_c.shape[1]))
        else:
            ucols = None
    except Exception:
        feat = (True, True, True)  # traced material table: keep everything
        ucols = None

    bg = jnp.stack([scene.background.x, scene.background.y, scene.background.z])
    tex_nmap = False
    if tex_counts[0]:
        import numpy as _np
        # nmap_id is integer scene structure, never trained -> concrete
        tex_nmap = bool(_np.any(_np.asarray(m.nmap_id) >= 0))
    return PackedScene(pad1(spheres), pad1(tris), pad1(mats), pls, als,
                       bg.astype(jnp.float32), counts,
                       tex_planes=tex_planes, tex_meta=tex_meta,
                       tex_triuv=tex_triuv, tex_matids=tex_matids,
                       tex_counts=tex_counts, feat=feat, ucols=ucols,
                       tex_nmap=tex_nmap)


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


def _prim_loop(count, body, carry, unroll=8):
    """Unrolled below UNROLL_LIMIT; a dynamic while_loop with SMEM scalar
    reads above (Mosaic legalizes scf.while but (currently) not scf.for for
    these tile carries). The dynamic loop processes ``unroll`` primitives
    per iteration (+ a static remainder tail): at 10k primitives the
    per-iteration scalar bookkeeping dominates the sweep, and 8x unrolling
    lets Mosaic pipeline the SMEM loads against the vector tests."""
    if count <= UNROLL_LIMIT:
        for i in range(count):
            carry = body(i, carry)
        return carry

    main = count - count % unroll

    def wcond(c):
        return c[0] < main

    def wbody(c):
        i, cur = c
        for k in range(unroll):
            cur = body(i + k, cur)
        return (i + unroll, cur)

    carry = jax.lax.while_loop(wcond, wbody, (jnp.int32(0), carry))[1]
    for i in range(main, count):
        carry = body(jnp.int32(i), carry)
    return carry


class PackedGrid:
    """Kernel-side uniform grid (ops/grid.py) bundles, CSR layout: ``scal``
    is origin(3) + cell_size(3) + 2 spare f32 scalars; ``idx`` is one int32
    SMEM array ``[2*(C+1) + Ns + Nt]`` holding the sphere cell-start table,
    the triangle cell-start table, then both id streams concatenated (the
    start tables already point into the right stream offsets). CSR, not
    dense-padded: SMEM is ~1 MiB, and a dense [C, K_worst] table scales with
    the WORST cell's occupancy times the cell count (1.4 MB on
    stress(1000)), while CSR scales with total occupancy (~100 KB there).
    ``idx`` layout: [sc_sph_start (SC+1), sc_tri_start (SC+1), supercell
    sphere ids, supercell triangle ids, global sphere ids, global
    triangle ids] — start tables hold absolute offsets into ``idx``.
    ``meta`` = (rx, ry, rz, F, sc_off, gs_off, n_gs, gt_off, n_gt):
    resolution, supercell factor (F^3 cells per box), the start-table
    offset, and the global (always-tested) lists — primitives spanning
    more than GLOBAL_SPAN_CELLS cells (the Cornell walls) would put a
    copy of themselves in nearly every box, making every box non-empty
    and the whole structure useless for decoherent rays, so they are
    swept linearly instead."""

    __slots__ = ("scal", "idx", "meta")

    def __init__(self, scal, idx, meta):
        self.scal = scal
        self.idx = idx
        self.meta = tuple(meta)


jax.tree_util.register_pytree_node(
    PackedGrid,
    lambda g: ((g.scal, g.idx), g.meta),
    lambda meta, leaves: PackedGrid(*leaves, meta),
)


SUPERCELL_F = 4  # cells per supercell axis: SC count = ceil(res/F)^3
GLOBAL_SPAN_CELLS = 16  # prims spanning more cells go to the global list


def pack_grid(grid) -> PackedGrid:
    """ops/grid.UniformGrid (dense-padded, for the jnp engine's gathers) ->
    the kernel's CSR SMEM bundle, plus a host-precomputed SUPERCELL level:
    one occupancy flag per F^3-cell box, appended after the id streams.
    The kernel's sweep gates whole boxes on one slab test + flag before
    descending to the per-cell tests — at 16^3 cells the flat sweep pays
    4096 slab/cond steps per bounce, the two-level one ~64 + 64 per
    VISITED box (docs/PERF.md)."""
    import numpy as np
    scal = jnp.concatenate([
        jnp.asarray(grid.origin, jnp.float32),
        jnp.asarray(grid.cell_size, jnp.float32),
        jnp.zeros((2,), jnp.float32),
    ])
    sph_list = np.asarray(grid.sph_list)
    tri_list = np.asarray(grid.tri_list)

    rx, ry, rz = grid.res
    F = SUPERCELL_F
    scx, scy, scz = (rx + F - 1) // F, (ry + F - 1) // F, (rz + F - 1) // F
    SC = scx * scy * scz
    # Split WIDE primitives (the Cornell walls: one triangle can span 100+
    # cells) into a small always-tested global list — kept in the boxes
    # they would make every box non-empty and decoherent rays would
    # re-test them per visited box.
    sph_span = np.bincount(sph_list[sph_list >= 0],
                           minlength=max(1, int(sph_list.max() + 1) if sph_list.size else 1))
    tri_span = np.bincount(tri_list[tri_list >= 0],
                           minlength=max(1, int(tri_list.max() + 1) if tri_list.size else 1))
    glob_sph = np.nonzero(sph_span > GLOBAL_SPAN_CELLS)[0].astype(np.int64)
    glob_tri = np.nonzero(tri_span > GLOBAL_SPAN_CELLS)[0].astype(np.int64)
    gs, gt = set(glob_sph.tolist()), set(glob_tri.tolist())

    # Supercell-level UNION lists: each F^3-cell box's primitive ids,
    # deduped (a primitive spanning several cells of one box appears once).
    # Rationale (docs/PERF.md): per-CELL lax.cond gating measured 3-12x
    # SLOWER than the linear sweep — thousands of cond/carry merges per
    # sweep drown the culling. At box granularity the worst case
    # (decoherent rays visit every box) degenerates to ~the linear sweep
    # (union lists sum to ~1.05x N at SUPERCELL_F=4), while coherent
    # blocks skip most boxes outright.
    sph3 = sph_list.reshape(rz, ry, rx, -1)
    tri3 = tri_list.reshape(rz, ry, rx, -1)
    sc_sph, sc_tri = [], []
    for bz in range(scz):
        for by in range(scy):
            for bx in range(scx):
                s = sph3[bz * F:(bz + 1) * F, by * F:(by + 1) * F,
                         bx * F:(bx + 1) * F].reshape(-1)
                t = tri3[bz * F:(bz + 1) * F, by * F:(by + 1) * F,
                         bx * F:(bx + 1) * F].reshape(-1)
                s = np.unique(s[s >= 0])
                t = np.unique(t[t >= 0])
                sc_sph.append(np.asarray([i for i in s if i not in gs],
                                         np.int64))
                sc_tri.append(np.asarray([i for i in t if i not in gt],
                                         np.int64))
    sc_off = 0
    sc_sph_cnt = np.asarray([len(l) for l in sc_sph], np.int64)
    sc_tri_cnt = np.asarray([len(l) for l in sc_tri], np.int64)
    sc_sph_start = (2 * (SC + 1)
                    + np.concatenate([[0], np.cumsum(sc_sph_cnt)]))
    sc_tri_start = (sc_sph_start[-1]
                    + np.concatenate([[0], np.cumsum(sc_tri_cnt)]))
    gs_off = int(sc_tri_start[-1])
    gt_off = gs_off + len(glob_sph)
    idx = np.concatenate(
        [sc_sph_start, sc_tri_start] + sc_sph + sc_tri
        + [glob_sph, glob_tri]).astype(np.int32)
    return PackedGrid(scal, jnp.asarray(idx),
                      (rx, ry, rz, F, sc_off,
                       gs_off, len(glob_sph), gt_off, len(glob_tri)))


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


def _triangle_t(ox, oy, oz, dx, dy, dz, v0, e1, e2):
    """Moller-Trumbore with precomputed edges e1 = v1-v0, e2 = v2-v0."""
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
    return t, w1, w2, valid


def _scatter_sample(dx, dy, dz, nx, ny, nz, px, py, pz, cos_i,
                    u_branch, u_a, u_b, m, feat=(True, True, True)):
    """The branch-cascade scatter step (CudaTracer.cu:208-318), SHARED by
    the forward megakernel and the VJP's replay kernel so the backward pass
    re-walks every path op-for-op — a forward change here retunes both
    kernels together instead of silently desynchronizing the gradients.

    ``m`` is the 20-tuple of per-lane material planes in pack_scene column
    order. Returns (new origin, new direction, weight, alive, branch masks
    take_diff/take_spec/take_refr, tir, ct mask, ct_w).

    ``feat = (has_ct, has_finite_exp, has_refr)`` statically skips sampler
    blocks no material in the scene can reach (transcendental thinning,
    round 4): the Beckmann microfacet draw when nothing carries the CT
    flags, the Phong pow when every specular is a delta mirror, the
    refraction math when nothing refracts. Output is bitwise identical —
    the skipped branches' select masks are all-false by construction —
    so forward renders with a gated pack and replay VJPs with the
    conservative default still agree exactly."""
    (m_dr, m_dg, m_db, m_sr, m_sg, m_sb, _m_ar, _m_ag, _m_ab,
     _m_er, _m_eg, _m_eb, m_exp, m_ior, m_pd, m_ps, m_prf, m_rough,
     m_pure, m_ct) = m
    has_ct, has_fin_exp, has_refr = feat
    two_pi = 2.0 * math.pi

    outside = cos_i > 0.0
    n1 = jnp.where(outside, 1.0, m_ior)
    n2 = jnp.where(outside, m_ior, 1.0)
    cos_pos = jnp.abs(cos_i)
    n_ratio = n1 / jnp.maximum(n2, 1e-12)
    sin_t2 = n_ratio * n_ratio * (1.0 - cos_pos * cos_pos)
    tir = sin_t2 > 1.0
    cos_t = jnp.sqrt(jnp.where(tir, 1.0, jnp.maximum(1.0 - sin_t2, 0.0)))
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

    # reference quirk: reflRay receives the cosine already flipped
    # positive (CudaTracer.cu:238/484), so inside hits reflect with
    # +|cosI| (unnormalized, outward-bent) — see ops/bsdf.py
    mrx = dx + 2.0 * cos_pos * nx
    mry = dy + 2.0 * cos_pos * ny
    mrz = dz + 2.0 * cos_pos * nz
    if has_fin_exp:
        fin = jnp.isfinite(m_exp)
        pexp = 1.0 / (jnp.where(fin, m_exp, 0.0) + 1.0)
        s_cl = jnp.clip(u_b, 1e-12, 1.0)
        ph_y = jnp.where(fin, jnp.exp(pexp * jnp.log(s_cl)), 1.0)
        ph_r = jnp.sqrt(jnp.maximum(1.0 - ph_y * ph_y, 0.0))
        phx, phy_, phz = _rotate_y_to(mrx, mry, mrz, ph_r * jnp.cos(theta),
                                      ph_y, ph_r * jnp.sin(theta))
        gsx = jnp.where(fin, phx, mrx)
        gsy = jnp.where(fin, phy_, mry)
        gsz = jnp.where(fin, phz, mrz)
    else:
        gsx, gsy, gsz = mrx, mry, mrz

    if has_ct:
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
    else:
        ct_w = jnp.ones_like(cos_i)
        spx, spy, spz = gsx, gsy, gsz
        sp_ox = px + nx * RAY_BUMP_EPSILON
        sp_oy = py + ny * RAY_BUMP_EPSILON
        sp_oz = pz + nz * RAY_BUMP_EPSILON
        spw = 1.0

    if has_refr:
        rfx0 = n_ratio * dx + (n_ratio * cos_pos - cos_t) * nx
        rfy0 = n_ratio * dy + (n_ratio * cos_pos - cos_t) * ny
        rfz0 = n_ratio * dz + (n_ratio * cos_pos - cos_t) * nz
        rfx, rfy, rfz = _normalize3(rfx0, rfy0, rfz0, 1e-12)
    else:
        rfx, rfy, rfz = mrx, mry, mrz  # unreachable (take_refr all-false)

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

    return (new_ox, new_oy, new_oz, new_dx, new_dy, new_dz, wr, wg, wb,
            alive, take_diff, take_spec, take_refr, tir, ct, ct_w)


# ---------------------------------------------------------------------------
# Physical (unbiased MIS) estimator math — lane-plane ports of
# ops/shading.shade_physical + the integrator's per-lobe MIS bookkeeping
# (render/integrator.py bounce, physical=True). Shared by the forward
# megakernel and the VJP's replay kernel; the backward pass differentiates
# these with jax.vjp inside the kernel body (pure elementwise jnp), so the
# formulas here ARE the gradient spec. The estimator replaces the
# reference's quirky NEE (CudaTracer.cu:345-455) with correct-measure
# uniform-area light sampling + power-heuristic MIS.
# ---------------------------------------------------------------------------

def _phong_pdf_p(ax, ay, az, exponent, wx, wy, wz):
    """ops/sampling.phong_pdf on planes: (n+1)/(2pi) cos^n about the unit
    lobe axis; infinite exponent = delta (density 0)."""
    cos_a = _dot(wx, wy, wz, ax, ay, az)
    finite = jnp.isfinite(exponent)
    e = jnp.where(finite, exponent, 1.0)
    safe = jnp.maximum(cos_a, 1e-12)
    pdf = (e + 1.0) / (2.0 * math.pi) * jnp.exp(e * jnp.log(safe))
    return jnp.where(finite & (cos_a > 0.0), pdf, 0.0)


def _beckmann_pdf_p(ax, ay, az, roughness, mx, my, mz):
    """ops/sampling.beckmann_pdf on planes (the sampler's exact density,
    NOT the textbook NDF — see that docstring)."""
    cos_t = _dot(mx, my, mz, ax, ay, az)
    r2 = roughness * roughness
    valid = (cos_t > 0.0) & (roughness > 0.0)
    cos_safe = jnp.maximum(cos_t, 1e-12)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 1e-12))
    tan_t = sin_t / cos_safe
    r2_safe = jnp.maximum(r2, 1e-12)
    pdf = (jnp.exp(-tan_t / r2_safe) * (1.0 + tan_t * tan_t)
           / (2.0 * math.pi * r2_safe * sin_t))
    return jnp.where(valid, pdf, 0.0)


def _lobe_axis(tx, ty, tz):
    """ops/sampling.phong_lobe_axis on planes: the image of +Y under
    rotate_y_to(target) — the true unit lobe axis even for unnormalized
    targets (raw surfel normals / quirk mirror directions)."""
    zero = jnp.zeros_like(tx)
    return _rotate_y_to(tx, ty, tz, zero, jnp.ones_like(tx), zero)


def _physical_lobes(dx, dy, dz, nx, ny, nz, cos_i, m):
    """Per-surfel lobe description the physical NEE and the continuation
    density share (integrator.py bounce: GlossLobe / CTLobe construction).
    Returns a dict of planes."""
    (m_dr, m_dg, m_db, m_sr, m_sg, m_sb, _a, _b, _c, _d, _e, _f,
     m_exp, m_ior, m_pd, m_ps, _m_prf, m_rough, m_pure, m_ct) = m
    nux, nuy, nuz = _normalize3(nx, ny, nz, 1e-12)
    outside = cos_i > 0.0
    n1 = jnp.where(outside, 1.0, m_ior)
    n2 = jnp.where(outside, m_ior, 1.0)
    cos_pos = jnp.abs(cos_i)
    n_ratio = n1 / jnp.maximum(n2, 1e-12)
    sin_t2 = n_ratio * n_ratio * (1.0 - cos_pos * cos_pos)
    cos_t = jnp.sqrt(jnp.where(sin_t2 < 1.0,
                               jnp.maximum(1.0 - sin_t2, 0.0), 1.0))
    rs = ((n1 * cos_pos - n2 * cos_t)
          / jnp.maximum(n1 * cos_pos + n2 * cos_t, 1e-12))
    rp = ((n2 * cos_pos - n1 * cos_t)
          / jnp.maximum(n2 * cos_pos + n1 * cos_t, 1e-12))
    fres = jnp.where(sin_t2 > 1.0, 1.0, (rs * rs + rp * rp) * 0.5)
    pure = m_pure > 0.5
    ct = m_ct > 0.5
    p_spec = m_ps * jnp.where(pure, 1.0, fres)
    # Phong glossy lobe about the quirk mirror direction (raw normal)
    mrx = dx + 2.0 * cos_pos * nx
    mry = dy + 2.0 * cos_pos * ny
    mrz = dz + 2.0 * cos_pos * nz
    gax, gay, gaz = _lobe_axis(mrx, mry, mrz)
    prob_g = jnp.where(ct, 0.0, p_spec)
    # Cook-Torrance/Beckmann lobe about the raw surfel normal
    cax, cay, caz = _lobe_axis(nx, ny, nz)
    prob_ct = jnp.where(ct & (m_rough > 0.0), p_spec, 0.0)
    nv = jnp.maximum(jnp.abs(cos_i), 1e-6)
    return dict(n_unit=(nux, nuy, nuz), gloss_axis=(gax, gay, gaz),
                prob_g=prob_g, ct_axis=(cax, cay, caz), prob_ct=prob_ct,
                nv=nv, spec=(m_sr, m_sg, m_sb), diffuse=(m_dr, m_dg, m_db),
                diff_avg=m_pd, exponent=m_exp, roughness=m_rough)


def _lobe_terms(lb, dx, dy, dz, nx, ny, nz, wx, wy, wz,
                feat=(True, True, True)):
    """(f_cos scalars per lobe, densities) toward direction w — the planes
    version of shade_physical's lobe_terms + ct_lobe_terms. Returns
    (s_d, s_g, p_g, s_ct, p_ct, cos_s): contribution = diffuse*s_d +
    spec*(s_g + s_ct) where s_g = p_g (weights-as-albedos convention).
    ``feat`` statically zeroes lobes no material carries (the masks are
    all-false anyway — bitwise identical, see _scatter_sample)."""
    nux, nuy, nuz = lb["n_unit"]
    cos_s = jnp.maximum(0.0, _dot(nux, nuy, nuz, wx, wy, wz))
    s_d = lb["diff_avg"] * INV_PI * cos_s
    if feat[1]:
        gax, gay, gaz = lb["gloss_axis"]
        p_g = lb["prob_g"] * _phong_pdf_p(gax, gay, gaz, lb["exponent"],
                                          wx, wy, wz)
    else:
        p_g = jnp.zeros_like(cos_s)
    if feat[0]:
        # Cook-Torrance reflection branch: h = normalize(w - d)
        hx, hy, hz = _normalize3(wx - dx, wy - dy, wz - dz, 1e-12)
        dh = jnp.maximum(jnp.abs(_dot(dx, dy, dz, hx, hy, hz)), 1e-12)
        cax, cay, caz = lb["ct_axis"]
        p_dir = _beckmann_pdf_p(cax, cay, caz, lb["roughness"],
                                hx, hy, hz) / (4.0 * dh)
        p_ct = lb["prob_ct"] * p_dir
        nh = jnp.abs(_dot(nx, ny, nz, hx, hy, hz))
        nl = jnp.abs(_dot(nx, ny, nz, wx, wy, wz))
        geom = jnp.minimum(jnp.minimum(1.0, 2.0 * nh * nl / dh),
                           2.0 * nh * lb["nv"] / dh)
        s_ct = geom / lb["nv"] * p_ct
    else:
        p_ct = jnp.zeros_like(cos_s)
        s_ct = jnp.zeros_like(cos_s)
    return s_d, p_g, s_ct, p_ct, cos_s


def _al_light_geom(al_vals):
    """Static per-light geometry scalars from one area-light row (23
    values): triangle areas, unit geometric normals, total area — matching
    ops/shading._tri_area_normal exactly."""
    a = al_vals
    def tri_geom(v0, v1, v2):
        e1 = (v1[0] - v0[0], v1[1] - v0[1], v1[2] - v0[2])
        e2 = (v2[0] - v0[0], v2[1] - v0[1], v2[2] - v0[2])
        rx = e1[1] * e2[2] - e1[2] * e2[1]
        ry = e1[2] * e2[0] - e1[0] * e2[2]
        rz = e1[0] * e2[1] - e1[1] * e2[0]
        n2 = rx * rx + ry * ry + rz * rz
        area = 0.5 * jnp.sqrt(jnp.maximum(n2, 1e-12))
        inv = jax.lax.rsqrt(jnp.maximum(n2, 1e-12))
        return area, (rx * inv, ry * inv, rz * inv)
    v = [(a[3 * k], a[3 * k + 1], a[3 * k + 2]) for k in range(6)]
    area0, n0 = tri_geom(v[0], v[1], v[2])
    area1, n1 = tri_geom(v[3], v[4], v[5])
    return dict(v=v, area0=area0, area1=area1, total=area0 + area1,
                n0=n0, n1=n1)


def _al_sample_point(geom, u1, u2, upick):
    """Uniform-area point on the light (area-proportional triangle pick,
    sqrt-reparameterized barycentrics — shading.area_light_sample_uniform).
    Returns (point planes, unit geometric normal planes of the picked
    triangle)."""
    first = upick < (geom["area0"] / geom["total"])
    su = jnp.sqrt(jnp.clip(u1, 0.0, 1.0))
    w0 = 1.0 - su
    w1 = su * (1.0 - u2)
    w2 = su * u2
    v = geom["v"]
    lx = jnp.where(first, v[0][0] * w0 + v[1][0] * w1 + v[2][0] * w2,
                   v[3][0] * w0 + v[4][0] * w1 + v[5][0] * w2)
    ly = jnp.where(first, v[0][1] * w0 + v[1][1] * w1 + v[2][1] * w2,
                   v[3][1] * w0 + v[4][1] * w1 + v[5][1] * w2)
    lz = jnp.where(first, v[0][2] * w0 + v[1][2] * w1 + v[2][2] * w2,
                   v[3][2] * w0 + v[4][2] * w1 + v[5][2] * w2)
    n0, n1 = geom["n0"], geom["n1"]
    nlx = jnp.where(first, n0[0] + jnp.zeros_like(lx), n1[0])
    nly = jnp.where(first, n0[1] + jnp.zeros_like(lx), n1[1])
    nlz = jnp.where(first, n0[2] + jnp.zeros_like(lx), n1[2])
    return (lx, ly, lz), (nlx, nly, nlz)


def _chain_model_lobes(dx, dy, dz, nx, ny, nz, cos_i, wx, wy, wz, mf,
                       feat=(True, True, True)):
    """Planes port of ops/bsdf.chain_model_pdfs: per-label CHAIN-MODEL
    solid-angle densities (p_diff, p_gloss, p_ct, p_refr) of scattering
    d -> w, delta lobes reporting their branch probability — the pdf-model
    convention of render/bidir.py. The jnp integrator and light tracer
    evaluate the same function at the same (in, out) pairs; this is the
    kernel-side mirror, so the fused engines' MIS weights sum to 1 with
    the jnp engines' to float tolerance."""
    (_dr, _dg, _db, _sr, _sg, _sb, _aa, _ab, _ac, _e0, _e1, _e2,
     m_exp, m_ior, m_pd, m_ps, m_prf, m_rough, m_pure, m_ct) = mf
    outside = cos_i > 0.0
    n1 = jnp.where(outside, 1.0, m_ior)
    n2 = jnp.where(outside, m_ior, 1.0)
    cos_pos = jnp.abs(cos_i)
    n_ratio = n1 / jnp.maximum(n2, 1e-12)
    sin_t2 = n_ratio * n_ratio * (1.0 - cos_pos * cos_pos)
    cos_t = jnp.sqrt(jnp.where(sin_t2 < 1.0,
                               jnp.maximum(1.0 - sin_t2, 0.0), 1.0))
    rs = ((n1 * cos_pos - n2 * cos_t)
          / jnp.maximum(n1 * cos_pos + n2 * cos_t, 1e-12))
    rp = ((n2 * cos_pos - n1 * cos_t)
          / jnp.maximum(n2 * cos_pos + n1 * cos_t, 1e-12))
    fres = jnp.where(sin_t2 > 1.0, 1.0, (rs * rs + rp * rp) * 0.5)
    pure = m_pure > 0.5
    ct = m_ct > 0.5
    p_spec = m_ps * jnp.where(pure, 1.0, fres)

    nux, nuy, nuz = _normalize3(nx, ny, nz, 1e-12)
    cos_w = jnp.maximum(0.0, _dot(wx, wy, wz, nux, nuy, nuz))
    p_diff = m_pd * cos_w * INV_PI

    if feat[1]:
        mrx = dx + 2.0 * cos_pos * nx
        mry = dy + 2.0 * cos_pos * ny
        mrz = dz + 2.0 * cos_pos * nz
        gax, gay, gaz = _lobe_axis(mrx, mry, mrz)
        fin = jnp.isfinite(m_exp)
        p_gloss_cont = _phong_pdf_p(gax, gay, gaz, m_exp, wx, wy, wz)
        p_gloss = jnp.where(ct, 0.0,
                            jnp.where(fin, p_spec * p_gloss_cont, p_spec))
    else:
        p_gloss = jnp.where(ct, 0.0, p_spec)   # all-delta mirrors
    if feat[0]:
        hx, hy, hz = _normalize3(wx - dx, wy - dy, wz - dz, 1e-12)
        dm = _dot(dx, dy, dz, hx, hy, hz)
        cax, cay, caz = _lobe_axis(nx, ny, nz)
        p_ct_cont = (_beckmann_pdf_p(cax, cay, caz, m_rough, hx, hy, hz)
                     / (4.0 * jnp.maximum(jnp.abs(dm), 1e-12)))
        p_ct = jnp.where(ct, jnp.where((m_rough > 0.0) & (dm < 0.0),
                                       p_spec * p_ct_cont, p_spec), 0.0)
    else:
        p_ct = jnp.where(ct, p_spec, 0.0)      # quirk/delta stand-in
    p_refr = m_prf * (1.0 - fres)
    return p_diff, p_gloss, p_ct, p_refr


def _chain_model_taken(dx, dy, dz, nx, ny, nz, cos_i, wx, wy, wz, mf,
                       take_diff, take_spec, take_refr, ct_m, feat):
    """Chain-model density of the TAKEN branch (ops/bsdf.
    chain_model_pdf_taken on planes)."""
    p_diff, p_gloss, p_ct, p_refr = _chain_model_lobes(
        dx, dy, dz, nx, ny, nz, cos_i, wx, wy, wz, mf, feat)
    p_sp = jnp.where(ct_m, p_ct, p_gloss)
    return jnp.where(take_diff, p_diff,
                     jnp.where(take_spec, p_sp,
                               jnp.where(take_refr, p_refr, 0.0)))


def _physical_prev_pdf(lb, dx, dy, dz, ndx, ndy, ndz,
                       take_diff, gloss_br, ct_br,
                       feat=(True, True, True)):
    """Effective solid-angle density of the scatter continuation — the
    quantity MIS weighs emission hits against (integrator.py bounce,
    prev_pdf update). Branch masks are detached inputs. ``feat`` skips
    lobes no material carries (bitwise identical; see _scatter_sample)."""
    nux, nuy, nuz = lb["n_unit"]
    cos_new = jnp.maximum(0.0, _dot(ndx, ndy, ndz, nux, nuy, nuz))
    pdf_diff = lb["diff_avg"] * cos_new * INV_PI
    if feat[1]:
        gax, gay, gaz = lb["gloss_axis"]
        pdf_gloss = lb["prob_g"] * _phong_pdf_p(gax, gay, gaz,
                                                lb["exponent"],
                                                ndx, ndy, ndz)
    else:
        pdf_gloss = 0.0
    if feat[0]:
        hx, hy, hz = _normalize3(ndx - dx, ndy - dy, ndz - dz, 1e-12)
        dm = _dot(dx, dy, dz, hx, hy, hz)
        cax, cay, caz = lb["ct_axis"]
        pdf_ct = jnp.where(
            dm < 0.0,
            lb["prob_ct"] * _beckmann_pdf_p(cax, cay, caz, lb["roughness"],
                                            hx, hy, hz)
            / (4.0 * jnp.maximum(jnp.abs(dm), 1e-12)),
            0.0)
    else:
        pdf_ct = 0.0
    return jnp.where(take_diff, pdf_diff,
                     jnp.where(gloss_br, pdf_gloss,
                               jnp.where(ct_br, pdf_ct, 0.0)))


def _physical_direct(num_spheres, num_pls, num_als,
                     px, py, pz, nx, ny, nz, dx, dy, dz, t_w, pp,
                     lb, mf, pl_planes, le_planes, geoms, al_draws,
                     occ_pl, occ_al, prim_f, al_t0f,
                     feat=(True, True, True), bd=None):
    """Physical-mode direct radiance at the hit — the emission-MIS weight
    plus per-lobe NEE over point and area lights — as PURE elementwise
    math. The occlusion booleans (``occ_pl``/``occ_al``) and the
    area-light draws arrive as detached inputs, so this ONE function is
    both the forward megakernel's physical block (called with the
    in-kernel sweep results) and the replay kernel's differentiated
    ``direct_fn`` body (jax.vjp of this IS the gradient spec) — the two
    cannot desynchronize. Same role as the shared ``_scatter_sample``.

    Inputs: surfel planes + ray direction, ``t_w`` the hit distance (1.0
    on miss), ``pp`` the carried prev_pdf, ``lb`` the ``_physical_lobes``
    of (d, n, mf) (built by the caller so the replay can build it from
    primals), ``mf`` the 20 material planes, ``pl_planes`` 6 planes per
    point light, ``le_planes`` 3 emission planes per area light,
    ``geoms`` the ``_al_light_geom`` dicts (from primal vertex planes in
    geo mode), ``al_draws`` (u1, u2, upick) per light, ``al_t0f`` each
    light's first-triangle index as an f32 scalar. Returns
    (dir_r, dir_g, dir_b) — NOT masked by hit/activity (callers mask)."""
    zero = jnp.zeros_like(px)
    cos_i = -_dot(dx, dy, dz, nx, ny, nz)
    inside = cos_i <= 0.0
    nux, nuy, nuz = lb["n_unit"]

    # emission MIS weight for BSDF-sampled hits on a light
    # (integrator.py bounce: complementary to the NEE weight)
    a_hit = zero
    cgx = zero
    cgy = zero
    cgz = zero
    for i in range(num_als):
        g = geoms[i]
        t0f = al_t0f[i] + float(num_spheres)
        is0 = prim_f == t0f
        is1 = prim_f == t0f + 1.0
        a_hit = jnp.where(is0 | is1, g["total"], a_hit)
        cgx = jnp.where(is0, g["n0"][0], jnp.where(is1, g["n1"][0], cgx))
        cgy = jnp.where(is0, g["n0"][1], jnp.where(is1, g["n1"][1], cgy))
        cgz = jnp.where(is0, g["n0"][2], jnp.where(is1, g["n1"][2], cgz))
    cos_l_hit = jnp.abs(_dot(dx, dy, dz, cgx, cgy, cgz))
    p_l_hit = (t_w * t_w) / jnp.maximum(a_hit * cos_l_hit, 1e-12)
    if bd is None:
        w_emit = jnp.where(
            (pp > 0.0) & (a_hit > 0.0),
            (pp * pp) / jnp.maximum(pp * pp + p_l_hit * p_l_hit, 1e-20),
            1.0)
    else:
        # bidir 3-way weight (integrator.py bounce): BSDF-hit vs NEE vs
        # the light tracer's camera connection / emitter splat
        n_l = float(len(geoms)) if geoms else 1.0
        r_nee = jnp.where(pp > 0.0,
                          p_l_hit / jnp.maximum(pp, 1e-20), 0.0)
        inv_pl_a = 1.0 / jnp.maximum(n_l * a_hit, 1e-20)
        l_emit_hit = (0.5 * cos_l_hit * INV_PI * bd["pco"] / bd["t2"])
        rho = (bd["nu"] * inv_pl_a
               * jnp.where(bd["is_primary"], 1.0, l_emit_hit) * bd["T"])
        w_emit = jnp.where(
            a_hit > 0.0,
            1.0 / (1.0 + r_nee * r_nee + rho * rho), 1.0)

    dir_r = mf[9] * w_emit
    dir_g = mf[10] * w_emit
    dir_b = mf[11] * w_emit
    m_dr_, m_dg_, m_db_ = lb["diffuse"]
    m_sr_, m_sg_, m_sb_ = lb["spec"]

    for i in range(num_pls):
        lx, ly, lz = (pl_planes[6 * i + 0], pl_planes[6 * i + 1],
                      pl_planes[6 * i + 2])
        offx, offy, offz = lx - px, ly - py, lz - pz
        d2 = jnp.maximum(offx * offx + offy * offy + offz * offz, 1e-12)
        inv_d = 1.0 / jnp.sqrt(d2)
        wx, wy, wz = offx * inv_d, offy * inv_d, offz * inv_d
        s_d, p_g, s_ct, _p_ct, _cs = _lobe_terms(
            lb, dx, dy, dz, nx, ny, nz, wx, wy, wz, feat=feat)
        vis = jnp.where(occ_pl[i], 0.0, 1.0)
        irr = vis / (4.0 * math.pi * d2)
        cr = (pl_planes[6 * i + 3] * irr
              * (m_dr_ * s_d + m_sr_ * (p_g + s_ct)))
        cg = (pl_planes[6 * i + 4] * irr
              * (m_dg_ * s_d + m_sg_ * (p_g + s_ct)))
        cb = (pl_planes[6 * i + 5] * irr
              * (m_db_ * s_d + m_sb_ * (p_g + s_ct)))
        dir_r += jnp.where(inside, 0.0, cr)
        dir_g += jnp.where(inside, 0.0, cg)
        dir_b += jnp.where(inside, 0.0, cb)

    for i in range(num_als):
        g = geoms[i]
        (lx, ly, lz), (nlx, nly, nlz) = _al_sample_point(g, *al_draws[i])
        offx, offy, offz = lx - px, ly - py, lz - pz
        d2 = jnp.maximum(offx * offx + offy * offy + offz * offz, 1e-12)
        inv_d = 1.0 / jnp.sqrt(d2)
        wx, wy, wz = offx * inv_d, offy * inv_d, offz * inv_d
        s_d, p_g, s_ct, p_ct, cos_s = _lobe_terms(
            lb, dx, dy, dz, nx, ny, nz, wx, wy, wz, feat=feat)
        cos_l = jnp.abs(_dot(nlx, nly, nlz, wx, wy, wz))
        geo = jnp.where(occ_al[i], 0.0, cos_l * g["total"] / d2)
        p_l = d2 / jnp.maximum(g["total"] * cos_l, 1e-12)
        p_b = lb["diff_avg"] * cos_s * INV_PI
        if bd is None:
            r_lt_d = r_lt_g = r_lt_ct = 0.0
        else:
            # nu * p_LT / p_NEE for this labeled path (ops/shading.py
            # shade_physical's bidir branch on planes)
            nux_, nuy_, nuz_ = lb["n_unit"]
            l_emit = (0.5 * cos_l * INV_PI
                      * jnp.abs(_dot(nux_, nuy_, nuz_, wx, wy, wz)) / d2)
            cos_rev = _dot(wx, wy, wz, nx, ny, nz)
            lam_d, lam_g, lam_ct, _lr = _chain_model_lobes(
                -wx, -wy, -wz, nx, ny, nz, cos_rev, -dx, -dy, -dz, mf,
                bd["feat"])
            geo_prev = bd["pco"] / jnp.maximum(bd["t2"], 1e-12)
            n_l2 = float(len(geoms)) if geoms else 1.0
            base = (bd["nu"] / n_l2) * bd["T"] * l_emit
            r_lt_d = base * jnp.where(bd["is_primary"], 1.0,
                                      lam_d * geo_prev)
            r_lt_g = jnp.where(bd["is_primary"], 0.0,
                               base * lam_g * geo_prev)
            r_lt_ct = jnp.where(bd["is_primary"], 0.0,
                                base * lam_ct * geo_prev)
        w_d = (p_l * p_l) / jnp.maximum(
            p_l * p_l + p_b * p_b + (r_lt_d * p_l) ** 2, 1e-12)
        w_g = (p_l * p_l) / jnp.maximum(
            p_l * p_l + p_g * p_g + (r_lt_g * p_l) ** 2, 1e-12)
        w_ct = (p_l * p_l) / jnp.maximum(
            p_l * p_l + p_ct * p_ct + (r_lt_ct * p_l) ** 2, 1e-12)
        ler, leg, leb = (le_planes[3 * i + 0], le_planes[3 * i + 1],
                         le_planes[3 * i + 2])
        cr = ler * (m_dr_ * s_d * geo * w_d
                    + m_sr_ * (p_g * geo * w_g + s_ct * geo * w_ct))
        cg = leg * (m_dg_ * s_d * geo * w_d
                    + m_sg_ * (p_g * geo * w_g + s_ct * geo * w_ct))
        cb = leb * (m_db_ * s_d * geo * w_d
                    + m_sb_ * (p_g * geo * w_g + s_ct * geo * w_ct))
        dir_r += jnp.where(inside, 0.0, cr)
        dir_g += jnp.where(inside, 0.0, cg)
        dir_b += jnp.where(inside, 0.0, cb)

    return dir_r, dir_g, dir_b


def _make_sweep_fns(counts, shape, sph_ref, tri_ref, grid=None,
                    track_index=False):
    """Build the two scene sweeps every bounce runs, shared by the forward
    and the VJP (replay) kernels so both engines of the fast path agree
    hit-for-hit.

    ``grid=None``: linear sweeps — every primitive tested for every lane.

    ``grid=(gscal_ref, gidx_ref, meta)``: uniform-grid culled sweeps
    (ops/grid.py built the lists; pack_grid flattened them to CSR). The
    kernel walks every CELL; a per-lane slab test against the cell box
    (clipped by each lane's current best-t / shadow distance) feeds a
    block-wide ``any`` predicate, and a ``lax.cond`` skips the cell's
    primitive list when no live lane can be affected. Within a visited cell
    the j-loop runs over the cell's exact CSR range, so cost tracks ACTUAL
    occupancy, not a padded width. Tests are idempotent
    (duplicated prims across cells resolve by the same tie rule as the jnp
    engine: strictly closer wins, equal-t goes to the larger primitive
    index), so results match the linear sweeps exactly. Work saved is
    block-coherence-dependent — see docs/PERF.md.

    ``track_index=True`` makes ``intersect_sweep`` also return the winning
    primitive index as f32 (spheres ``0..S``, triangles ``S..S+T``, miss
    ``-1``) — the backward replay keys its intersection-Jacobian gathers on
    it. The winner selection itself is unchanged."""
    num_spheres, num_tris = counts[0], counts[1]

    def zero():
        return jnp.zeros(shape, jnp.float32)

    # ---- shared primitive tests (read prim ``i`` from SMEM, test all lanes)
    # The tables arrive FLATTENED to 1-D (row-major, S_COLS/T_COLS wide):
    # Mosaic pads each row of a 2-D scalar-prefetch operand to a full
    # 128-lane stride (512 B), which blows the ~1 MiB SMEM budget at
    # ~2k primitives; 1-D scalar arrays store compactly (10k spheres =
    # 200 KB), which is what makes stress_dense(10000) compile at all.
    def sph_test(i, ox, oy, oz, dx, dy, dz):
        base = i * S_COLS
        cx, cy, cz = sph_ref[base + 0], sph_ref[base + 1], sph_ref[base + 2]
        r = sph_ref[base + 3]
        t, valid = _sphere_t(ox, oy, oz, dx, dy, dz, cx, cy, cz, r)
        return t, valid, (cx, cy, cz)

    def tri_test(i, ox, oy, oz, dx, dy, dz):
        base = i * T_COLS
        return _triangle_t(
            ox, oy, oz, dx, dy, dz,
            (tri_ref[base + 0], tri_ref[base + 1], tri_ref[base + 2]),
            (tri_ref[base + 3], tri_ref[base + 4], tri_ref[base + 5]),
            (tri_ref[base + 6], tri_ref[base + 7], tri_ref[base + 8]))

    def sph_nearest_update(i, carry, ox, oy, oz, dx, dy, dz, tie=None,
                           idx_val=None, ok=None):
        best_t, nx, ny, nz, mat_f = carry[:5]
        t, valid, (cx, cy, cz) = sph_test(i, ox, oy, oz, dx, dy, dz)
        if ok is not None:      # masked lane in an unrolled ragged list loop
            valid = valid & ok
        if tie is None:
            closer = valid & (t <= best_t)
        else:
            best_i = carry[5]
            idx_f = tie
            closer = valid & ((t < best_t)
                              | ((t == best_t) & (idx_f >= best_i)))
        px, py, pz = ox + dx * t, oy + dy * t, oz + dz * t
        snx, sny, snz = _normalize3(px - cx, py - cy, pz - cz)
        out = (jnp.where(closer, t, best_t),
               jnp.where(closer, snx, nx),
               jnp.where(closer, sny, ny),
               jnp.where(closer, snz, nz),
               jnp.where(closer, sph_ref[i * S_COLS + 4], mat_f))
        if tie is not None:
            return out + (jnp.where(closer, idx_f, carry[5]),)
        if idx_val is not None:
            return out + (jnp.where(closer, idx_val, carry[5]),)
        return out

    def tri_nearest_update(i, carry, ox, oy, oz, dx, dy, dz, tie=None,
                           idx_val=None, ok=None):
        best_t, nx, ny, nz, mat_f = carry[:5]
        t, w1, w2, valid = tri_test(i, ox, oy, oz, dx, dy, dz)
        if ok is not None:
            valid = valid & ok
        if tie is None:
            closer = valid & (t <= best_t)
        else:
            best_i = carry[5]
            idx_f = tie
            closer = valid & ((t < best_t)
                              | ((t == best_t) & (idx_f >= best_i)))
        # barycentric normal interpolation, unnormalized — exactly
        # Primitives.h:71-73 (and the jnp engine's surfel_at)
        w0 = 1.0 - w1 - w2
        tb = i * T_COLS
        tnx = tri_ref[tb + 9] * w0 + tri_ref[tb + 12] * w1 + tri_ref[tb + 15] * w2
        tny = tri_ref[tb + 10] * w0 + tri_ref[tb + 13] * w1 + tri_ref[tb + 16] * w2
        tnz = tri_ref[tb + 11] * w0 + tri_ref[tb + 14] * w1 + tri_ref[tb + 17] * w2
        out = (jnp.where(closer, t, best_t),
               jnp.where(closer, tnx, nx),
               jnp.where(closer, tny, ny),
               jnp.where(closer, tnz, nz),
               jnp.where(closer, tri_ref[i * T_COLS + 18], mat_f))
        if tie is not None:
            return out + (jnp.where(closer, idx_f, carry[5]),)
        if idx_val is not None:
            return out + (jnp.where(closer, idx_val, carry[5]),)
        return out

    def _idx_f(i, offset=0):
        return jnp.asarray(i, jnp.int32).astype(jnp.float32) + float(offset)

    if grid is None:
        def intersect_sweep(ox, oy, oz, dx, dy, dz):
            carry = (jnp.full(shape, jnp.inf, jnp.float32), zero(), zero(),
                     zero(), zero())
            if track_index:
                carry = carry + (jnp.full(shape, -1.0, jnp.float32),)
            carry = _prim_loop(
                num_spheres,
                lambda i, c: sph_nearest_update(
                    i, c, ox, oy, oz, dx, dy, dz,
                    idx_val=_idx_f(i) if track_index else None),
                carry)
            carry = _prim_loop(
                num_tris,
                lambda i, c: tri_nearest_update(
                    i, c, ox, oy, oz, dx, dy, dz,
                    idx_val=_idx_f(i, num_spheres) if track_index else None),
                carry)
            return carry

        def occlusion_sweep(sox, soy, soz, wx, wy, wz, max_d):
            # carry as f32 0/1 — Mosaic does not legalize bool tile carries
            # in scf.while (same constraint as the bounce loop's active mask)
            def sph_body(i, occ_f):
                t, valid, _ = sph_test(i, sox, soy, soz, wx, wy, wz)
                return jnp.maximum(
                    occ_f, (valid & (t <= max_d)).astype(jnp.float32))

            def tri_body(i, occ_f):
                t, _, _, valid = tri_test(i, sox, soy, soz, wx, wy, wz)
                return jnp.maximum(
                    occ_f, (valid & (t <= max_d)).astype(jnp.float32))

            occ_f = _prim_loop(num_spheres, sph_body, zero())
            occ_f = _prim_loop(num_tris, tri_body, occ_f)
            return occ_f > 0.5

        return intersect_sweep, occlusion_sweep

    # ------------------------- grid-culled sweeps -------------------------
    # SUPERCELL union lists (pack_grid): the kernel gates each F^3-cell box
    # on ONE per-lane slab test + block-any + lax.cond, then sweeps the
    # box's deduped primitive list with the same tie rule as the linear
    # sweep (equal-t -> larger index wins; visit order is therefore
    # irrelevant and results are bit-identical). Cost model, measured in
    # docs/PERF.md: per-CELL cond gating (rounds 2-3) lost 3-12x to the
    # linear sweep — thousands of cond/carry merges per sweep — while box
    # granularity bounds the worst (fully decoherent) case at ~the linear
    # sweep (union lists total ~1.05x N at F=4) and lets coherent blocks
    # skip most boxes.
    gscal_ref, gidx_ref, meta = grid
    if len(meta) != 9:
        raise ValueError("packed grid meta must be (rx, ry, rz, F, sc_off, "
                         "gs_off, n_gs, gt_off, n_gt) — re-pack with "
                         "pack_grid()")
    rx, ry, rz, F, sc_off, gs_off, n_gs, gt_off, n_gt = meta
    scx, scy, scz = (rx + F - 1) // F, (ry + F - 1) // F, (rz + F - 1) // F
    SC = scx * scy * scz

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                               jnp.where(d < 0.0, -1e-12, 1e-12), d)

    def supercell_slab(bx, by, bz, ox, oy, oz, ivx, ivy, ivz, t_limit):
        """Per-lane [entry <= exit] overlap of the ray segment [0, t_limit]
        with supercell (bx, by, bz)'s box (clipped to the grid bounds on
        the high side). Scalar bounds; vector test."""
        fx = jnp.asarray(bx * F, jnp.float32)
        fy = jnp.asarray(by * F, jnp.float32)
        fz = jnp.asarray(bz * F, jnp.float32)
        hx = jnp.minimum(fx + F, float(rx))
        hy = jnp.minimum(fy + F, float(ry))
        hz = jnp.minimum(fz + F, float(rz))
        lox = gscal_ref[0] + fx * gscal_ref[3]
        loy = gscal_ref[1] + fy * gscal_ref[4]
        loz = gscal_ref[2] + fz * gscal_ref[5]
        hix = gscal_ref[0] + hx * gscal_ref[3]
        hiy = gscal_ref[1] + hy * gscal_ref[4]
        hiz = gscal_ref[2] + hz * gscal_ref[5]
        t0x = (lox - ox) * ivx
        t1x = (hix - ox) * ivx
        t0y = (loy - oy) * ivy
        t1y = (hiy - oy) * ivy
        t0z = (loz - oz) * ivz
        t1z = (hiz - oz) * ivz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.maximum(jnp.minimum(t0z, t1z), 0.0))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.maximum(t0z, t1z))
        return (tn <= tf) & (tn <= t_limit)

    def _sc_ranges(bi):
        """CSR ranges of supercell ``bi``: sphere [s0, s1) and triangle
        [t0, t1) offsets into ``gidx_ref``'s id streams (absolute)."""
        s0 = gidx_ref[sc_off + bi]
        s1 = gidx_ref[sc_off + bi + 1]
        t0 = gidx_ref[sc_off + (SC + 1) + bi]
        t1 = gidx_ref[sc_off + (SC + 1) + bi + 1]
        return s0, s1, t0, t1

    LIST_UNROLL = 8

    def _list_loop(start, end, body, carry):
        """j-loop over one id stream range in ``gidx_ref``, processing
        LIST_UNROLL ids per while iteration (same rationale as _prim_loop's
        unroll: per-iteration scalar bookkeeping dominates otherwise).
        Ragged tails read a clamped position and pass ``ok=False`` so the
        masked update is a no-op — ``body(id, carry, ok)``."""
        def wcond(c):
            return c[0] < end

        def wbody(c):
            j, cur = c
            for k in range(LIST_UNROLL):
                ok = (j + k) < end
                jj = jnp.where(ok, j + k, end - 1)
                cur = body(gidx_ref[jj], cur, ok)
            return (j + LIST_UNROLL, cur)

        return jax.lax.while_loop(wcond, wbody,
                                  (jnp.asarray(start, jnp.int32), carry))[1]

    def _sc_decode(bi):
        bi_i = jnp.asarray(bi, jnp.int32)
        bz = bi_i // (scx * scy)
        rem = bi_i - bz * (scx * scy)
        return rem - (rem // scx) * scx, rem // scx, bz

    def intersect_sweep(ox, oy, oz, dx, dy, dz):
        ivx, ivy, ivz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

        def sc_body(bi, carry):
            bx, by, bz = _sc_decode(bi)
            s0, s1, t0, t1 = _sc_ranges(bi)
            pred = supercell_slab(bx, by, bz, ox, oy, oz, ivx, ivy, ivz,
                                  carry[0])
            hit_any = (jnp.max(pred.astype(jnp.float32)) > 0.0) & (
                (s1 > s0) | (t1 > t0))

            def visit(c):
                def sph_j(sid, c2, ok):
                    return sph_nearest_update(sid, c2, ox, oy, oz,
                                              dx, dy, dz,
                                              tie=sid.astype(jnp.float32),
                                              ok=ok)

                def tri_j(tid, c2, ok):
                    return tri_nearest_update(
                        tid, c2, ox, oy, oz, dx, dy, dz,
                        tie=tid.astype(jnp.float32) + float(num_spheres),
                        ok=ok)

                c = _list_loop(s0, s1, sph_j, c)
                c = _list_loop(t0, t1, tri_j, c)
                return c

            return jax.lax.cond(hit_any, visit, lambda c: c, carry)

        carry = (jnp.full(shape, jnp.inf, jnp.float32), zero(), zero(),
                 zero(), zero(), jnp.full(shape, -1.0, jnp.float32))
        # global (wide-span) primitives first — typically the handful of
        # wall triangles, so this unrolls fully
        carry = _prim_loop(
            n_gs, lambda i, c: sph_nearest_update(
                gidx_ref[gs_off + i], c, ox, oy, oz, dx, dy, dz,
                tie=gidx_ref[gs_off + i].astype(jnp.float32)), carry)
        carry = _prim_loop(
            n_gt, lambda i, c: tri_nearest_update(
                gidx_ref[gt_off + i], c, ox, oy, oz, dx, dy, dz,
                tie=gidx_ref[gt_off + i].astype(jnp.float32)
                + float(num_spheres)), carry)
        carry = _prim_loop(SC, sc_body, carry, unroll=1)
        return carry[:6] if track_index else carry[:5]

    def occlusion_sweep(sox, soy, soz, wx, wy, wz, max_d):
        ivx, ivy, ivz = safe_inv(wx), safe_inv(wy), safe_inv(wz)

        def sc_body(bi, occ_f):
            bx, by, bz = _sc_decode(bi)
            s0, s1, t0, t1 = _sc_ranges(bi)
            # lanes already occluded no longer gate the predicate
            limit = jnp.where(occ_f > 0.5, -1.0, max_d)
            pred = supercell_slab(bx, by, bz, sox, soy, soz,
                                  ivx, ivy, ivz, limit)
            hit_any = (jnp.max(pred.astype(jnp.float32)) > 0.0) & (
                (s1 > s0) | (t1 > t0))

            def visit(o):
                def sph_j(sid, o2, ok):
                    t, valid, _ = sph_test(sid, sox, soy, soz, wx, wy, wz)
                    return jnp.maximum(
                        o2, (ok & valid & (t <= max_d)).astype(jnp.float32))

                def tri_j(tid, o2, ok):
                    t, _, _, valid = tri_test(tid, sox, soy, soz, wx, wy, wz)
                    return jnp.maximum(
                        o2, (ok & valid & (t <= max_d)).astype(jnp.float32))

                o = _list_loop(s0, s1, sph_j, o)
                o = _list_loop(t0, t1, tri_j, o)
                return o

            return jax.lax.cond(hit_any, visit, lambda o: o, occ_f)

        def glob_sph(i, o):
            t, valid, _ = sph_test(gidx_ref[gs_off + i],
                                   sox, soy, soz, wx, wy, wz)
            return jnp.maximum(o, (valid & (t <= max_d)).astype(jnp.float32))

        def glob_tri(i, o):
            t, _, _, valid = tri_test(gidx_ref[gt_off + i],
                                      sox, soy, soz, wx, wy, wz)
            return jnp.maximum(o, (valid & (t <= max_d)).astype(jnp.float32))

        occ_f = _prim_loop(n_gs, glob_sph, zero())
        occ_f = _prim_loop(n_gt, glob_tri, occ_f)
        occ_f = _prim_loop(SC, sc_body, occ_f, unroll=1)
        return occ_f > 0.5

    return intersect_sweep, occlusion_sweep



def _texture_block(tex_counts, num_spheres, num_tris, shape,
                   texmeta_ref, triuv_ref, matids_ref, tex_ref, tri_ref,
                   ox, oy, oz, dx, dy, dz, prim_f, mat_f, nx, ny, nz, mf,
                   want_aux=False, want_nmap_aux=False):
    """Color/normal mapping at the hit — ops/texture.py::apply_maps
    mirrored formula-for-formula (same polynomial atan2/asin, same
    normalize/eps conventions), so the textured megakernel matches the jnp
    engine per pixel (tests/test_texture.py round-4 parity tests).

    The per-lane texel fetch is the round-3 blocker, solved: the flat
    atlas lives in VMEM as 128-texel rows per channel, and each bilinear
    corner gathers with ``take_along_axis`` on the lane dim (Mosaic
    ``dynamic_gather``) under an R-chunk row select — 12*R vector ops per
    corner where R = ceil(total_texels / 128). Small tables (per-texture
    meta, per-triangle UVs, per-material map ids) ride SMEM and are
    selected with the same uniform loops as materials.

    Returns (new diffuse r/g/b, new normal x/y/z); with ``want_aux=True``
    (the replay-VJP backward kernel) additionally returns the COLOR
    fetch's adjoint bundle: ``(has_c, (tex_r, tex_g, tex_b), corner_idx
    [4 planes], corner_w [4 planes])`` — the texel multipliers (1.0 where
    no color map) plus the bilinear corners' flat atlas indices and
    weights, which the backward kernel scatters texel cotangents
    through (megakernel_vjp.py)."""
    from ..texture import asinf, atan2f

    K, R = tex_counts
    two_pi = 2.0 * math.pi
    n2 = nx * nx + ny * ny + nz * nz
    inv_nl = jax.lax.rsqrt(jnp.maximum(n2, 1e-20))
    nux, nuy, nuz = nx * inv_nl, ny * inv_nl, nz * inv_nl
    is_tri = prim_f > (num_spheres - 0.5)

    # ---- sphere UV + tangent (procedural; ops/texture.py::sphere_uv) ----
    u = 0.5 + atan2f(nuz, nux) / two_pi
    v = 0.5 + asinf(nuy) / math.pi
    if want_aux:
        # UV-swim partials w.r.t. the UNIT normal (round 5 phase 2) —
        # via jax.vjp over the SAME polynomial atan2f/asinf the forward
        # (and the jnp engine) evaluates, so the backward kernel's chain
        # is the exact derivative jnp autodiff computes, not the ideal
        # transcendental's
        ones_sh = jnp.ones(shape, jnp.float32)
        _, at_vjp = jax.vjp(lambda a_, b_: atan2f(a_, b_), nuz, nux)
        du_nuz, du_nux = at_vjp(ones_sh / two_pi)
        _, as_vjp = jax.vjp(asinf, nuy)
        (dv_nuy,) = as_vjp(ones_sh / math.pi)
    st2 = nuz * nuz + nux * nux
    st_deg = st2 < 1e-12
    st_inv = jax.lax.rsqrt(jnp.maximum(st2, 1e-20))
    tgx = jnp.where(st_deg, 1.0, -nuz * st_inv)
    tgy = jnp.zeros(shape, jnp.float32)
    tgz = jnp.where(st_deg, 0.0, nux * st_inv)

    # ---- triangle UV + UV-aligned tangent (per-tri select, then one
    # uniform Moller-Trumbore barycentric recompute) ----
    if num_tris:
        z = jnp.zeros(shape, jnp.float32)
        v0x = v0y = v0z = e1x = e1y = e1z = e2x = e2y = e2z = z
        u0u = u0v = u1u = u1v = u2u = u2v = z
        for j in range(num_tris):
            mk = is_tri & (prim_f == float(num_spheres + j))
            tb = j * T_COLS
            sel = lambda cur, val: jnp.where(mk, val, cur)
            v0x = sel(v0x, tri_ref[tb + 0])
            v0y = sel(v0y, tri_ref[tb + 1])
            v0z = sel(v0z, tri_ref[tb + 2])
            e1x = sel(e1x, tri_ref[tb + 3])
            e1y = sel(e1y, tri_ref[tb + 4])
            e1z = sel(e1z, tri_ref[tb + 5])
            e2x = sel(e2x, tri_ref[tb + 6])
            e2y = sel(e2y, tri_ref[tb + 7])
            e2z = sel(e2z, tri_ref[tb + 8])
            u0u = sel(u0u, triuv_ref[j * 6 + 0])
            u0v = sel(u0v, triuv_ref[j * 6 + 1])
            u1u = sel(u1u, triuv_ref[j * 6 + 2])
            u1v = sel(u1v, triuv_ref[j * 6 + 3])
            u2u = sel(u2u, triuv_ref[j * 6 + 4])
            u2v = sel(u2v, triuv_ref[j * 6 + 5])
        _, w1, w2, _ = _triangle_t(ox, oy, oz, dx, dy, dz,
                                   (v0x, v0y, v0z), (e1x, e1y, e1z),
                                   (e2x, e2y, e2z))
        w0 = 1.0 - (w1 + w2)
        tu = u0u * w0 + u1u * w1 + u2u * w2
        tv = u0v * w0 + u1v * w1 + u2v * w2
        u = jnp.where(is_tri, tu, u)
        v = jnp.where(is_tri, tv, v)
        du1 = u1u - u0u
        dv1 = u1v - u0v
        du2 = u2u - u0u
        dv2 = u2v - u0v
        det = du1 * dv2 - du2 * dv1
        det_bad = jnp.abs(det) < 1e-12
        inv_det = jnp.where(det_bad, 0.0,
                            1.0 / jnp.where(det_bad, 1.0, det))
        ttx = (e1x * dv2 - e2x * dv1) * inv_det
        tty = (e1y * dv2 - e2y * dv1) * inv_det
        ttz = (e1z * dv2 - e2z * dv1) * inv_det
        tt2 = ttx * ttx + tty * tty + ttz * ttz
        degen = det_bad | (tt2 < 1e-16)
        e1inv = jax.lax.rsqrt(
            jnp.maximum(e1x * e1x + e1y * e1y + e1z * e1z, 1e-20))
        ttx = jnp.where(degen, e1x * e1inv, ttx)
        tty = jnp.where(degen, e1y * e1inv, tty)
        ttz = jnp.where(degen, e1z * e1inv, ttz)
        tgx = jnp.where(is_tri, ttx, tgx)
        tgy = jnp.where(is_tri, tty, tgy)
        tgz = jnp.where(is_tri, ttz, tgz)
        if want_aux:
            # UV-swim partials w.r.t. the HIT POINT (round 5 phase 2):
            # on a fixed triangle, uv is affine in p — uv(p) = uv0 +
            # a(p) du1 + b(p) du2 with (a, b) the plane barycentrics,
            # whose gradients are the metric-inverse dual basis of
            # (e1, e2). Identical to jnp's chain through the
            # Moller-Trumbore barycentrics (they ARE the plane
            # barycentrics of the hit point).
            d11 = e1x * e1x + e1y * e1y + e1z * e1z
            d22 = e2x * e2x + e2y * e2y + e2z * e2z
            d12 = e1x * e2x + e1y * e2y + e1z * e2z
            detm = d11 * d22 - d12 * d12
            m_bad = jnp.abs(detm) < 1e-18
            inv_m = jnp.where(m_bad, 0.0, 1.0 / jnp.where(m_bad, 1.0, detm))
            # grad a = (d22 e1 - d12 e2)/detM ; grad b = (d11 e2 - d12 e1)/detM
            gax = (d22 * e1x - d12 * e2x) * inv_m
            gay = (d22 * e1y - d12 * e2y) * inv_m
            gaz = (d22 * e1z - d12 * e2z) * inv_m
            gbx = (d11 * e2x - d12 * e1x) * inv_m
            gby = (d11 * e2y - d12 * e1y) * inv_m
            gbz = (d11 * e2z - d12 * e1z) * inv_m
            tri_gux = du1 * gax + du2 * gbx
            tri_guy = du1 * gay + du2 * gby
            tri_guz = du1 * gaz + du2 * gbz
            tri_gvx = dv1 * gax + dv2 * gbx
            tri_gvy = dv1 * gay + dv2 * gby
            tri_gvz = dv1 * gaz + dv2 * gbz

    # ---- per-material map ids ----
    m_tex = jnp.full(shape, -1.0, jnp.float32)
    m_nmap = jnp.full(shape, -1.0, jnp.float32)
    num_mats = matids_ref.shape[0] // 2
    for mi in range(num_mats):
        mk = mat_f == float(mi)
        m_tex = jnp.where(mk, matids_ref[mi * 2 + 0], m_tex)
        m_nmap = jnp.where(mk, matids_ref[mi * 2 + 1], m_nmap)

    # ---- bilinear atlas fetch (sample_bilinear's exact arithmetic) ----
    def sample(tid_f, aux=False):
        zb = jnp.zeros(shape, jnp.float32)
        base = zb
        th = jnp.ones(shape, jnp.float32)
        tw = jnp.ones(shape, jnp.float32)
        kc = jnp.clip(tid_f, 0.0, float(K - 1))
        for k in range(K):
            mk = kc == float(k)
            base = jnp.where(mk, texmeta_ref[k * 3 + 0], base)
            th = jnp.where(mk, texmeta_ref[k * 3 + 1], th)
            tw = jnp.where(mk, texmeta_ref[k * 3 + 2], tw)
        uu = (u - jnp.floor(u)) * tw - 0.5
        vv = (1.0 - (v - jnp.floor(v))) * th - 0.5
        x0 = jnp.floor(uu)
        y0 = jnp.floor(vv)
        fx = uu - x0
        fy = vv - y0
        base_i = base.astype(jnp.int32)
        th_i = th.astype(jnp.int32)
        tw_i = tw.astype(jnp.int32)

        def texel(xi, yi):
            x = jnp.mod(xi.astype(jnp.int32), tw_i)
            y = jnp.mod(yi.astype(jnp.int32), th_i)
            idx = base_i + y * tw_i + x
            row = jax.lax.shift_right_logical(
                idx, LANES.bit_length() - 1)            # // LANES
            col = idx & (LANES - 1)
            outs = []
            for c in range(3):
                acc = zb
                for r in range(R):
                    tiled = jnp.broadcast_to(tex_ref[c * R + r, :][None, :],
                                             shape)
                    g = jnp.take_along_axis(tiled, col, axis=-1)
                    acc = jnp.where(row == r, g, acc)
                outs.append(acc)
            return outs, idx

        c00, i00 = texel(x0, y0)
        c10, i10 = texel(x0 + 1, y0)
        c01, i01 = texel(x0, y0 + 1)
        c11, i11 = texel(x0 + 1, y0 + 1)
        w00 = (1 - fx) * (1 - fy)
        w10 = fx * (1 - fy)
        w01 = (1 - fx) * fy
        w11 = fx * fy
        vals = [c00[c] * w00 + c10[c] * w10 + c01[c] * w01 + c11[c] * w11
                for c in range(3)]
        if not aux:
            return vals
        # analytic texture-space derivatives for the UV-swim adjoint
        # (round 5 phase 2): d vals/d u = (d vals/d fx) * tw and
        # d vals/d v = -(d vals/d fy) * th — floor()/mod() detach exactly
        # as jnp autodiff detaches them, so this matches jax.grad of
        # sample_bilinear in u, v
        d_du = [((c10[c] - c00[c]) * (1 - fy)
                 + (c11[c] - c01[c]) * fy) * tw for c in range(3)]
        d_dv = [-((c01[c] - c00[c]) * (1 - fx)
                  + (c11[c] - c10[c]) * fx) * th for c in range(3)]
        return vals, ((i00, i10, i01, i11), (w00, w10, w01, w11),
                      (d_du, d_dv))

    if want_aux:
        (ar, ag, ab), (c_idx, c_w, (tex_du, tex_dv)) = sample(m_tex,
                                                              aux=True)
    else:
        ar, ag, ab = sample(m_tex)
    has_c = m_tex >= 0.0
    new_dr = mf[0] * jnp.where(has_c, ar, 1.0)
    new_dg = mf[1] * jnp.where(has_c, ag, 1.0)
    new_db = mf[2] * jnp.where(has_c, ab, 1.0)

    if want_aux and want_nmap_aux:
        # round 5, late: the replay-VJP backward kernel also needs the
        # NORMAL-map fetch's adjoint bundle (corner indices/weights for
        # the nmap texel scatter + d texel/d(u,v) for the uv-swim chain
        # through the perturbed normal) — megakernel_vjp's perturbation
        # pullback consumes it
        (tr_, tg_, tb_), (n_cidx, n_cw, (n_du, n_dv)) = sample(m_nmap,
                                                               aux=True)
    else:
        tr_, tg_, tb_ = sample(m_nmap)
    # tangent frame orthonormalized against the unit shading normal
    tdn = tgx * nux + tgy * nuy + tgz * nuz
    pox = tgx - nux * tdn
    poy = tgy - nuy * tdn
    poz = tgz - nuz * tdn
    po_inv = jax.lax.rsqrt(
        jnp.maximum(pox * pox + poy * poy + poz * poz, 1e-20))
    pox, poy, poz = pox * po_inv, poy * po_inv, poz * po_inv
    bx_ = nuy * poz - nuz * poy
    by_ = nuz * pox - nux * poz
    bz_ = nux * poy - nuy * pox
    tnx = tr_ * 2.0 - 1.0
    tny = tg_ * 2.0 - 1.0
    tnz = jnp.maximum(tb_ * 2.0 - 1.0, 1e-3)
    ppx = pox * tnx + bx_ * tny + nux * tnz
    ppy = poy * tnx + by_ * tny + nuy * tnz
    ppz = poz * tnx + bz_ * tny + nuz * tnz
    pp_inv = jax.lax.rsqrt(
        jnp.maximum(ppx * ppx + ppy * ppy + ppz * ppz, 1e-20))
    n_len = jnp.sqrt(jnp.maximum(n2, 1e-20))
    s_ = pp_inv * n_len
    has_n = m_nmap >= 0.0
    new_nx = jnp.where(has_n, ppx * s_, nx)
    new_ny = jnp.where(has_n, ppy * s_, ny)
    new_nz = jnp.where(has_n, ppz * s_, nz)
    if want_aux:
        tex_r = jnp.where(has_c, ar, 1.0)
        tex_g = jnp.where(has_c, ag, 1.0)
        tex_b = jnp.where(has_c, ab, 1.0)
        # UV-swim geometry planes, overlaid by primitive class (the
        # reverse sweep re-derives is_tri from the stored prim index):
        # triangles carry (du/dp, dv/dp); spheres carry the unit-normal
        # partials (du/dnux, du/dnuz, dv/dnuy) in the first three slots.
        zz = jnp.zeros(shape, jnp.float32)
        if num_tris:
            uvg = (jnp.where(is_tri, tri_gux, du_nux),
                   jnp.where(is_tri, tri_guy, du_nuz),
                   jnp.where(is_tri, tri_guz, dv_nuy),
                   jnp.where(is_tri, tri_gvx, 0.0),
                   jnp.where(is_tri, tri_gvy, 0.0),
                   jnp.where(is_tri, tri_gvz, 0.0))
        else:
            uvg = (du_nux, du_nuz, dv_nuy, zz, zz, zz)
        nm_aux = None
        if want_nmap_aux:
            nm_aux = (has_n, (tr_, tg_, tb_), n_cidx, n_cw, (n_du, n_dv))
        aux = (has_c, (tex_r, tex_g, tex_b), c_idx, c_w,
               (tex_du, tex_dv), uvg, nm_aux)
        return (new_dr, new_dg, new_db, new_nx, new_ny, new_nz), aux
    return new_dr, new_dg, new_db, new_nx, new_ny, new_nz


def _make_render_kernel(counts, width, height, block_rows, grid_meta=None,
                        physical=False, tex_counts=(0, 0),
                        feat=(True, True, True), state_bf16=False,
                        bidir=False, ucols=None):
    if bidir and not physical:
        raise ValueError("bidir mode runs on the physical estimator")
    num_spheres, num_tris, num_mats, num_pls, num_als = counts
    shape = (block_rows, LANES)
    n_pixels = width * height
    two_pi = 2.0 * math.pi
    textured = tex_counts[0] > 0
    # opt-in bf16 radiance/throughput carry (docs/PERF.md round-4
    # measurement): radiance0/radiance1 planes store bf16 across bounces,
    # all arithmetic stays f32 (geometry must: t-precision loses hits in
    # bf16). Breaks bit-parity with the jnp engine by design.
    sdt = jnp.bfloat16 if state_bf16 else jnp.float32

    def dn(x):
        return x.astype(sdt) if state_bf16 else x

    def up(x):
        return x.astype(jnp.float32) if state_bf16 else x

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
        sx_ref, sy_ref, sz_ref = rest
        intersect_sweep, occlusion_sweep = _make_sweep_fns(
            counts, shape, sph_ref, tri_ref, grid=grid,
            track_index=physical or textured)
        pid = pl.program_id(0)

        row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        # seed_ref[1] is a flat pixel offset: a device mesh gives each chip a
        # disjoint pixel range while reusing one kernel build
        pixel = seed_ref[1] + pid * (block_rows * LANES) + row * LANES + lane
        in_image = (pixel < n_pixels) & (pixel >= 0)
        pxi = (pixel % width).astype(jnp.float32)
        pyi = (pixel // width).astype(jnp.float32)

        r00, r01, r02 = cam_ref[0], cam_ref[1], cam_ref[2]
        r10, r11, r12 = cam_ref[3], cam_ref[4], cam_ref[5]
        r20, r21, r22 = cam_ref[6], cam_ref[7], cam_ref[8]
        cam_x, cam_y, cam_z = cam_ref[9], cam_ref[10], cam_ref[11]
        tan_half, z_near = cam_ref[12], cam_ref[13]
        # cam_ref[14]: per-sample radiance clamp (<=0 disables). The
        # reference clamps every sample to [0,1] before accumulating
        # (writeToPixelsKernel, CudaTracer.cu:72) — that is its implicit
        # firefly suppression; expose it as a knob.
        clamp_v = cam_ref[14]
        nu_b = cam_ref[15] if bidir else None

        acc_x = jnp.zeros(shape, jnp.float32)
        acc_y = jnp.zeros(shape, jnp.float32)
        acc_z = jnp.zeros(shape, jnp.float32)

        # Counter-based uniforms (utils/rng.py): key (seed, pixel), counter
        # (global sample, pair). Identical streams to the jnp engine; every
        # lane draws from its OWN (sample, bounce) counters, so the
        # persistent regeneration loop below needs no RNG state at all.
        ppb = rng.pairs_per_bounce(num_als)

        def draw(sample_t, pair_t):
            return rng.uniform_pair(seed_ref[0], pixel, sample_t, pair_t)

        def bounce(state, s_glob, b_cur):
            if bidir:
                (ox, oy, oz, dx, dy, dz, r0x, r0y, r0z, r1x, r1y, r1z,
                 active_f, prev_pdf, lt_S, pf_model, pco, j_img) = state
            elif physical:
                (ox, oy, oz, dx, dy, dz, r0x, r0y, r0z, r1x, r1y, r1z,
                 active_f, prev_pdf) = state
            else:
                (ox, oy, oz, dx, dy, dz, r0x, r0y, r0z, r1x, r1y, r1z,
                 active_f) = state
                prev_pdf = None
            r0x, r0y, r0z = up(r0x), up(r0y), up(r0z)
            r1x, r1y, r1z = up(r1x), up(r1y), up(r1z)
            active = active_f > 0.5
            pair0 = 1 + b_cur * ppb  # rng.pair_base, per-lane bounce counter

            if physical or textured:
                (best_t, nx, ny, nz, mat_f,
                 prim_f) = intersect_sweep(ox, oy, oz, dx, dy, dz)
            else:
                best_t, nx, ny, nz, mat_f = intersect_sweep(ox, oy, oz,
                                                            dx, dy, dz)
            hit = best_t < jnp.inf
            t_safe = jnp.where(hit, best_t, 0.0)
            px, py, pz = ox + dx * t_safe, oy + dy * t_safe, oz + dz * t_safe

            NF = 20  # == pack_scene's material column count
            # uniform-column skip (ROADMAP 1b): columns shared by every
            # material load as ONE broadcast; only the varying columns pay
            # the M-way select chain. Bitwise identical — miss lanes have
            # mat_f == 0.0 (sweep init) so they already read material 0.
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
            if textured:
                # color map modulates the diffuse albedo, normal map
                # perturbs the shading normal BEFORE cos_i / NEE / scatter,
                # exactly where the jnp engine applies them (integrator.py
                # bounce -> ops/texture.py apply_maps)
                (mf[0], mf[1], mf[2], nx, ny, nz) = _texture_block(
                    tex_counts, num_spheres, num_tris, shape,
                    texmeta_ref, triuv_ref, matids_ref, tex_ref, tri_ref,
                    ox, oy, oz, dx, dy, dz, prim_f, mat_f, nx, ny, nz, mf)
            (m_dr, m_dg, m_db, m_sr, m_sg, m_sb, m_ar, m_ag, m_ab,
             m_er, m_eg, m_eb, m_exp, m_ior, m_pd, m_ps, m_prf, m_rough,
             m_pure, m_ct) = (mf[0], mf[1], mf[2], mf[3], mf[4], mf[5],
                              mf[6], mf[7], mf[8], mf[9], mf[10], mf[11],
                              mf[12], mf[13], mf[14], mf[15], mf[16],
                              mf[17], mf[18], mf[19])

            cos_i = -_dot(dx, dy, dz, nx, ny, nz)
            inside = cos_i <= 0.0

            if physical:
                lb = _physical_lobes(dx, dy, dz, nx, ny, nz, cos_i, mf)
                nux, nuy, nuz = lb["n_unit"]
                al_geoms = [_al_light_geom([al_ref[i, k] for k in range(23)])
                            for i in range(num_als)]
                al_draws = []
                for i in range(num_als):
                    u1, u2 = draw(s_glob, pair0 + 2 + 2 * i)
                    _u3, upick = draw(s_glob, pair0 + 3 + 2 * i)
                    al_draws.append((u1, u2, upick))

                # occlusion sweeps hoisted out of the direct math so the
                # rest is ONE pure function shared verbatim with the replay
                # kernel's jax.vjp (megakernel_vjp.py) — see
                # _physical_direct
                def occ_of(lx, ly, lz):
                    offx, offy, offz = lx - px, ly - py, lz - pz
                    d2 = jnp.maximum(
                        offx * offx + offy * offy + offz * offz, 1e-12)
                    dist = jnp.sqrt(d2)
                    inv_d = 1.0 / dist
                    return occlusion_sweep(px + nux * RAY_BUMP_EPSILON,
                                           py + nuy * RAY_BUMP_EPSILON,
                                           pz + nuz * RAY_BUMP_EPSILON,
                                           offx * inv_d, offy * inv_d,
                                           offz * inv_d,
                                           dist - 2.0 * RAY_BUMP_EPSILON)

                zeros_p = jnp.zeros(shape, jnp.float32)
                occ_pl = [occ_of(pl_ref[i, 0] + zeros_p,
                                 pl_ref[i, 1] + zeros_p,
                                 pl_ref[i, 2] + zeros_p)
                          for i in range(num_pls)]
                occ_al = []
                for i in range(num_als):
                    (lx, ly, lz), _ = _al_sample_point(al_geoms[i],
                                                       *al_draws[i])
                    occ_al.append(occ_of(lx, ly, lz))
                pl_planes = [pl_ref[i, k] for i in range(num_pls)
                             for k in range(6)]
                le_planes = []
                for i in range(num_als):
                    lm = al_ref[i, 22].astype(jnp.int32)
                    le_planes += [mat_ref[lm, 9], mat_ref[lm, 10],
                                  mat_ref[lm, 11]]
                t_w = jnp.where(hit, best_t, 1.0)
                bd = None
                if bidir:
                    # bidirectional-MIS chain ratio T (render/bidir.py /
                    # integrator.py bounce): nu-free p_LT-prefix over
                    # p_eye-prefix of the path up to this vertex
                    nux_b, nuy_b, nuz_b = lb["n_unit"]
                    cos_arr = jnp.abs(_dot(dx, dy, dz, nux_b, nuy_b,
                                           nuz_b))
                    t2_arr = jnp.maximum(t_w * t_w, 1e-12)
                    is_primary = b_cur == 0
                    c_a = j_img * cos_arr / t2_arr
                    e_prev = pf_model * cos_arr / t2_arr
                    T_bd = jnp.where(is_primary,
                                     1.0 / jnp.maximum(c_a, 1e-20),
                                     lt_S / jnp.maximum(e_prev, 1e-20))
                    bd = dict(nu=nu_b, T=T_bd, pco=pco, t2=t2_arr,
                              is_primary=is_primary, feat=feat)
                dir_r, dir_g, dir_b = _physical_direct(
                    num_spheres, num_pls, num_als,
                    px, py, pz, nx, ny, nz, dx, dy, dz, t_w, prev_pdf,
                    lb, mf, pl_planes, le_planes, al_geoms, al_draws,
                    occ_pl, occ_al, prim_f,
                    [al_ref[i, 21] for i in range(num_als)], feat=feat,
                    bd=bd)
            else:
                def light_contribution(lx, ly, lz, pwx, pwy, pwz):
                    offx, offy, offz = lx - px, ly - py, lz - pz
                    d2 = jnp.maximum(offx * offx + offy * offy + offz * offz, 1e-12)
                    dist = jnp.sqrt(d2)
                    inv_d = 1.0 / dist
                    wx, wy, wz = offx * inv_d, offy * inv_d, offz * inv_d
                    occ = occlusion_sweep(px + nx * RAY_BUMP_EPSILON,
                                          py + ny * RAY_BUMP_EPSILON,
                                          pz + nz * RAY_BUMP_EPSILON,
                                          wx, wy, wz,
                                          dist - 2.0 * RAY_BUMP_EPSILON)
                    cos_l = jnp.maximum(0.0, _dot(nx, ny, nz, wx, wy, wz))
                    scale = (jnp.where(occ, 0.0, cos_l) * m_pd * INV_PI
                             / (4.0 * math.pi) / d2)
                    return pwx * m_dr * scale, pwy * m_dg * scale, pwz * m_db * scale

                dir_r = m_er
                dir_g = m_eg
                dir_b = m_eb
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
                    u1, u2 = draw(s_glob, pair0 + 2 + 2 * i)
                    u3, upick = draw(s_glob, pair0 + 3 + 2 * i)
                    inv_tot = 1.0 / jnp.maximum(u1 + u2 + u3, 1e-12)
                    w0, w1, w2 = u1 * inv_tot, u2 * inv_tot, u3 * inv_tot
                    first = upick > 0.5
                    a = [al_ref[i, k] for k in range(9)]
                    b = [al_ref[i, 9 + k] for k in range(9)]
                    lx = jnp.where(first, a[0] * w0 + a[3] * w1 + a[6] * w2,
                                   b[0] * w0 + b[3] * w1 + b[6] * w2)
                    ly = jnp.where(first, a[1] * w0 + a[4] * w1 + a[7] * w2,
                                   b[1] * w0 + b[4] * w1 + b[7] * w2)
                    lz = jnp.where(first, a[2] * w0 + a[5] * w1 + a[8] * w2,
                                   b[2] * w0 + b[5] * w1 + b[8] * w2)
                    cr, cg, cb = light_contribution(lx, ly, lz, al_ref[i, 18],
                                                    al_ref[i, 19], al_ref[i, 20])
                    dir_r += jnp.where(inside, 0.0, cr)
                    dir_g += jnp.where(inside, 0.0, cg)
                    dir_b += jnp.where(inside, 0.0, cb)

            act_hit = active & hit
            beer_mask = act_hit & inside
            r1x = jnp.where(beer_mask, r1x * jnp.exp(-t_safe * m_ar), r1x)
            r1y = jnp.where(beer_mask, r1y * jnp.exp(-t_safe * m_ag), r1y)
            r1z = jnp.where(beer_mask, r1z * jnp.exp(-t_safe * m_ab), r1z)

            r0x = r0x + jnp.where(act_hit, r1x * dir_r, 0.0)
            r0y = r0y + jnp.where(act_hit, r1y * dir_g, 0.0)
            r0z = r0z + jnp.where(act_hit, r1z * dir_b, 0.0)
            miss = active & (~hit)
            r0x += jnp.where(miss, bg_ref[0] * r1x, 0.0)
            r0y += jnp.where(miss, bg_ref[1] * r1y, 0.0)
            r0z += jnp.where(miss, bg_ref[2] * r1z, 0.0)

            # ---- scatter (shared with the VJP's replay kernel) -----------
            u_branch, u_a = draw(s_glob, pair0)
            u_b, _unused = draw(s_glob, pair0 + 1)
            (new_ox, new_oy, new_oz, new_dx, new_dy, new_dz, wr, wg, wb,
             alive, take_diff, take_spec, _tr, _tir, ct_m, _ctw) = \
                _scatter_sample(dx, dy, dz, nx, ny, nz, px, py, pz, cos_i,
                                u_branch, u_a, u_b, mf, feat=feat)

            if physical:
                pdf_new = _physical_prev_pdf(
                    lb, dx, dy, dz, new_dx, new_dy, new_dz,
                    take_diff, take_spec & (~ct_m), take_spec & ct_m,
                    feat=feat)
                prev_pdf = jnp.where(act_hit,
                                     jnp.where(~inside, pdf_new, 0.0),
                                     prev_pdf)
            if bidir:
                # chain-model densities of the taken branch, both
                # directions — same helper at the same (in, out) pairs as
                # the jnp integrator / light tracer (weights sum to 1)
                pdf_fwd_m = _chain_model_taken(
                    dx, dy, dz, nx, ny, nz, cos_i,
                    new_dx, new_dy, new_dz, mf,
                    take_diff, take_spec, _tr, ct_m, feat)
                cos_rev = _dot(new_dx, new_dy, new_dz, nx, ny, nz)
                pdf_rev_m = _chain_model_taken(
                    -new_dx, -new_dy, -new_dz, nx, ny, nz, cos_rev,
                    -dx, -dy, -dz, mf,
                    take_diff, take_spec, _tr, ct_m, feat)
                lam_full = pdf_rev_m * pco / t2_arr
                s_new = jnp.where(
                    is_primary,
                    jnp.where(take_diff & (cos_i > 0.0), 1.0, 0.0)
                    / jnp.maximum(c_a, 1e-20),
                    T_bd * lam_full)
                lt_S = jnp.where(act_hit, s_new, lt_S)
                pf_model = jnp.where(act_hit, pdf_fwd_m, pf_model)
                nux_b, nuy_b, nuz_b = lb["n_unit"]
                pco = jnp.where(
                    act_hit,
                    jnp.abs(_dot(new_dx, new_dy, new_dz,
                                 nux_b, nuy_b, nuz_b)), pco)

            ox = jnp.where(act_hit, new_ox, ox)
            oy = jnp.where(act_hit, new_oy, oy)
            oz = jnp.where(act_hit, new_oz, oz)
            dx = jnp.where(act_hit, new_dx, dx)
            dy = jnp.where(act_hit, new_dy, dy)
            dz = jnp.where(act_hit, new_dz, dz)
            r1x = jnp.where(act_hit, r1x * wr, r1x)
            r1y = jnp.where(act_hit, r1y * wg, r1y)
            r1z = jnp.where(act_hit, r1z * wb, r1z)
            active = act_hit & alive

            out = (ox, oy, oz, dx, dy, dz, dn(r0x), dn(r0y), dn(r0z),
                   dn(r1x), dn(r1y), dn(r1z), active.astype(jnp.float32))
            if physical:
                out = out + (prev_pdf,)
            if bidir:
                out = out + (lt_S, pf_model, pco, j_img)
            return out

        def eye_ray(s_glob):
            """Fresh jittered eye ray for every lane's pixel
            (computeEyeRay, CudaTracer.cu:321-343); draws the jitter pair.
            Returns (dx, dy, dz, j_img) — j_img is the camera importance
            dA_img/dOmega (integrator.eye_j_img; only consumed in bidir
            mode, DCE'd otherwise)."""
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
            s_len = jnp.sqrt(jnp.maximum(sx * sx + sy * sy + sz * sz,
                                         1e-20))
            cos_t = jnp.clip(jnp.abs(sz) / s_len, 1e-4, 1.0)
            aspect = height / width
            jI = ((width * height)
                  / (s_fov * s_fov * aspect * cos_t ** 3))
            ndx, ndy, ndz = _normalize3(dx0, dy0, dz0)
            return ndx, ndy, ndz, jI

        # -- persistent path regeneration --------------------------------
        # Each lane traces its pixel's spp samples back-to-back: the moment a
        # path terminates (absorbed, missed, or hit the bounce cap) the lane
        # immediately starts the next sample's eye ray. Lanes never idle
        # until their own sample budget is spent — the wavefront equivalent
        # of a persistent-threads scheduler, and the final form of the
        # reference's stream compaction: no dead lanes to compact away.
        # seed_ref[2] is the global sample offset: progressive passes and
        # sample-sharded meshes continue the SAME per-pixel streams.
        samp0 = seed_ref[2]
        spp_s = seed_ref[3]
        max_b = seed_ref[4]
        zero = jnp.zeros(shape, jnp.float32)
        one = jnp.ones(shape, jnp.float32)

        dx, dy, dz, j0_img = eye_ray(samp0 + jnp.zeros(shape, jnp.int32))
        zero_s, one_s = dn(zero), dn(one)
        state = (cam_x + zero, cam_y + zero, cam_z + zero, dx, dy, dz,
                 zero_s, zero_s, zero_s, one_s, one_s, one_s,
                 in_image.astype(jnp.float32))
        if physical:
            state = state + (zero,)  # prev_pdf: camera rays carry 0
        if bidir:
            # lt_chain 0, pf_model 0, prev_cos_out 1, j_img per ray
            state = state + (zero, zero, one, j0_img)
        # sample index per lane; out-of-image lanes start "done"
        s_idx = jnp.where(in_image, 0, spp_s)
        b_cnt = jnp.zeros(shape, jnp.int32)

        def cond(carry):
            s_idx, b_cnt, acc_x, acc_y, acc_z, st = carry
            return jnp.min(s_idx) < spp_s

        def body(carry):
            s_idx, b_cnt, acc_x, acc_y, acc_z, st = carry
            was_active = st[12] > 0.5
            st = bounce(st, samp0 + s_idx, b_cnt)
            now_active = st[12] > 0.5
            b_cnt = jnp.where(was_active, b_cnt + 1, b_cnt)
            # path end: died this bounce, or still alive at the bounce cap
            # (capped paths keep their radiance, no background term —
            # matching the reference's maxIterations exit)
            ended = (was_active & (~now_active)) | (now_active & (b_cnt >= max_b))
            do_clamp = clamp_v > 0.0
            cx_ = jnp.where(do_clamp, jnp.minimum(up(st[6]), clamp_v),
                            up(st[6]))
            cy_ = jnp.where(do_clamp, jnp.minimum(up(st[7]), clamp_v),
                            up(st[7]))
            cz_ = jnp.where(do_clamp, jnp.minimum(up(st[8]), clamp_v),
                            up(st[8]))
            acc_x = acc_x + jnp.where(ended, cx_, 0.0)
            acc_y = acc_y + jnp.where(ended, cy_, 0.0)
            acc_z = acc_z + jnp.where(ended, cz_, 0.0)
            s_idx = jnp.where(ended, s_idx + 1, s_idx)
            regen = ended & (s_idx < spp_s)

            ndx, ndy, ndz, nj_img = eye_ray(samp0 + s_idx)
            sel = lambda a, b: jnp.where(regen, a, b)
            st_new = (sel(cam_x + zero, st[0]), sel(cam_y + zero, st[1]),
                      sel(cam_z + zero, st[2]),
                      sel(ndx, st[3]), sel(ndy, st[4]), sel(ndz, st[5]),
                      sel(zero_s, st[6]), sel(zero_s, st[7]),
                      sel(zero_s, st[8]),
                      sel(one_s, st[9]), sel(one_s, st[10]),
                      sel(one_s, st[11]),
                      jnp.where(regen, 1.0,
                                jnp.where(ended, 0.0, st[12])))
            if physical:
                st_new = st_new + (sel(zero, st[13]),)
            if bidir:
                st_new = st_new + (sel(zero, st[14]), sel(zero, st[15]),
                                   sel(one, st[16]), sel(nj_img, st[17]))
            b_cnt = jnp.where(regen, 0, b_cnt)
            return s_idx, b_cnt, acc_x, acc_y, acc_z, st_new

        _, _, acc_x, acc_y, acc_z, _ = jax.lax.while_loop(
            cond, body, (s_idx, b_cnt, acc_x, acc_y, acc_z, state))

        sx_ref[:] = acc_x
        sy_ref[:] = acc_y
        sz_ref[:] = acc_z

    return kernel


def _render_block_sums(packed, cam_params, seed, width, height, spp,
                       max_bounces, block_rows, pixel_offset, n_local,
                       sample_offset, sample_clamp=0.0, interpret=False,
                       packed_grid=None, physical=False, state_bf16=False,
                       bidir_nu=None):
    """Radiance SUMS over spp for ``n_local`` pixels starting at flat index
    ``pixel_offset``; returns 3 planes of [rows, LANES]. ``sample_offset``
    selects the global sample range [offset, offset+spp) of each pixel's
    counter stream — progressive passes and sample-sharded meshes continue
    the exact streams a monolithic render would use."""
    block = block_rows * LANES
    rows = ((n_local + block - 1) // block) * block // LANES
    grid = rows // block_rows

    rot, pos, tan_half, z_near = cam_params
    cam = jnp.concatenate([
        jnp.asarray(rot, jnp.float32).reshape(-1),
        jnp.asarray(pos, jnp.float32).reshape(-1),
        jnp.asarray(tan_half, jnp.float32).reshape(1),
        jnp.asarray(z_near, jnp.float32).reshape(1),
        jnp.asarray(sample_clamp, jnp.float32).reshape(1),
        jnp.asarray(0.0 if bidir_nu is None else bidir_nu,
                    jnp.float32).reshape(1),
    ])
    seed_arr = jnp.stack([
        jnp.asarray(seed, jnp.int32).reshape(()),
        jnp.asarray(pixel_offset, jnp.int32).reshape(()),
        jnp.asarray(sample_offset, jnp.int32).reshape(()),
        jnp.asarray(spp, jnp.int32).reshape(()),
        jnp.asarray(max_bounces, jnp.int32).reshape(()),
    ])

    gmeta = packed_grid.meta if packed_grid is not None else None
    kernel = _make_render_kernel(packed.counts, width, height, block_rows,
                                 grid_meta=gmeta, physical=physical,
                                 tex_counts=packed.tex_counts,
                                 feat=getattr(packed, "feat",
                                              (True, True, True)),
                                 state_bf16=state_bf16,
                                 bidir=bidir_nu is not None,
                                 ucols=getattr(packed, "ucols", None))
    scalar_args = [seed_arr, packed.spheres.reshape(-1),
                   packed.triangles.reshape(-1),
                   packed.materials, packed.point_lights, packed.area_lights,
                   packed.background, cam]
    if packed_grid is not None:
        scalar_args += [packed_grid.scal, packed_grid.idx]
    textured = packed.tex_counts[0] > 0
    vec_args = []
    in_specs = []
    if textured:
        # small tables ride SMEM with the other scalars; the texel planes
        # are a VECTOR input (the chunked dynamic_gather reads them as
        # 128-lane rows), whole-array resident in VMEM
        # 1-D flattened: 2-D SMEM operands pad every row to a 512B lane
        # stride (the same blow-up the primitive tables avoid, see the
        # sweep docstring) — [T,6] UVs would cost ~0.5 MiB at 1k tris
        scalar_args += [packed.tex_meta.reshape(-1),
                        packed.tex_triuv.reshape(-1),
                        packed.tex_matids.reshape(-1)]
        vec_args = [packed.tex_planes]
        in_specs = [pl.BlockSpec(packed.tex_planes.shape,
                                 lambda i, *_: (0, 0),
                                 memory_space=pltpu.VMEM)]
    out_block = pl.BlockSpec((block_rows, LANES), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalar_args),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=[out_block] * 3,
    )
    out_shape = [jax.ShapeDtypeStruct((rows, LANES), jnp.float32)] * 3

    sx, sy, sz = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(*scalar_args, *vec_args)
    return sx, sy, sz


@functools.partial(jax.jit, static_argnames=("width", "height", "block_rows",
                                             "interpret", "physical",
                                             "state_bf16", "bidir_nu"))
def render_megakernel(packed: PackedScene, cam_params, seed,
                      width: int, height: int, spp: int,
                      max_bounces: int = 15,
                      block_rows: int = DEF_ROWS,
                      sample_clamp: float = 0.0,
                      sample_offset=0,
                      interpret: bool = False,
                      packed_grid: PackedGrid | None = None,
                      physical: bool = False,
                      state_bf16: bool = False,
                      bidir_nu: float | None = None) -> jax.Array:
    """Full render in one kernel launch; returns mean radiance [H, W, 3].
    ``sample_clamp > 0`` clamps every sample's radiance to that value before
    accumulation (the reference's per-frame [0,1] clamp; firefly control).
    ``interpret=True`` runs the kernel in Pallas interpret mode — slow, but
    it executes on CPU, which is how golden/parity tests cover this engine
    without a TPU. ``packed_grid`` switches the scene sweeps to the
    uniform-grid culled variant (``pack_grid(build_grid(scene))``) — same
    image, less work per ray on large scenes."""
    n = width * height
    sx, sy, sz = _render_block_sums(packed, cam_params, seed, width, height,
                                    spp, max_bounces, block_rows, 0, n,
                                    sample_offset, sample_clamp,
                                    interpret=interpret,
                                    packed_grid=packed_grid,
                                    physical=physical,
                                    state_bf16=state_bf16,
                                    bidir_nu=bidir_nu)
    img = jnp.stack([sx.reshape(-1)[:n], sy.reshape(-1)[:n],
                     sz.reshape(-1)[:n]], -1) / spp
    return img.reshape(height, width, 3)


def render_megakernel_sharded(packed: PackedScene, cam_params, seed,
                              width: int, height: int, spp: int, mesh,
                              max_bounces: int = 15,
                              block_rows: int = DEF_ROWS,
                              physical: bool = False,
                              bidir_nu: float | None = None,
                              interpret: bool = False,
                              sample_offset=0) -> jax.Array:
    """Pixel-sharded megakernel over a device mesh: each chip renders a
    disjoint tile; no collectives in the forward pass (the DP layout of
    parallel/sharding.py, on the fused kernel). Streams are keyed on global
    pixel indices, so the sharded image is bitwise identical to 1-device.
    ``physical`` / ``bidir_nu`` select the unbiased estimator and its
    bidirectional MIS carries (round 5: the fused bidir forward half
    shards through here)."""
    from jax.sharding import PartitionSpec as P

    from ...parallel.mesh import PIXEL_AXIS

    n = width * height
    n_dev = mesh.shape[PIXEL_AXIS]
    block = block_rows * LANES
    # ceil-divide pixels across devices BEFORE rounding up to the block
    # size: flooring would under-cover the image whenever n % n_dev != 0
    # lands exactly on a block boundary
    per_dev = (((n + n_dev - 1) // n_dev + block - 1) // block) * block
    if per_dev * (n_dev - 1) >= n:
        raise ValueError("too many devices for this image at this block size")

    def tile_fn(packed, cam_params, seed):
        dev = jax.lax.axis_index(PIXEL_AXIS)
        offset = dev * per_dev
        sx, sy, sz = _render_block_sums(
            packed, cam_params, seed, width, height, spp, max_bounces,
            block_rows, offset, per_dev, sample_offset, physical=physical,
            bidir_nu=bidir_nu, interpret=interpret)
        return jnp.stack([sx.reshape(-1), sy.reshape(-1), sz.reshape(-1)], -1)

    # check_vma=False: pallas_call's out_shape structs carry no vma metadata,
    # which the vma checker (correctly) refuses; the body has no collectives,
    # so the unchecked mode is safe here.
    out = jax.shard_map(
        tile_fn, mesh=mesh, in_specs=(P(), P(), P()), out_specs=P(PIXEL_AXIS),
        check_vma=False,
    )(packed, cam_params, jnp.asarray(seed, jnp.int32))
    # Device d rendered global pixels [d*per_dev, (d+1)*per_dev), so `out`
    # is already in global pixel order; rows past n are dead padding lanes.
    return (out.reshape(-1, 3)[:n] / spp).reshape(height, width, 3)


def render_fast2(scene, cam_params, width, height, spp, seed,
                 max_bounces: int = 15, block_rows: int = DEF_ROWS,
                 sample_offset=0, interpret: bool = False, grid=None,
                 physical: bool = False):
    """Convenience wrapper: pack + launch. ``grid`` is an
    ``ops/grid.UniformGrid`` (or already-packed ``PackedGrid``) switching the
    scene sweeps to the grid-culled variant. ``physical=True`` runs the
    unbiased MIS estimator (same streams + formulas as the jnp engine's
    physical mode — per-pixel parity)."""
    packed = pack_scene(scene)
    if grid is not None and not isinstance(grid, PackedGrid):
        grid = pack_grid(grid)
    return render_megakernel(packed, cam_params, seed, width, height, spp,
                             max_bounces=max_bounces, block_rows=block_rows,
                             sample_offset=sample_offset, interpret=interpret,
                             packed_grid=grid, physical=physical)
