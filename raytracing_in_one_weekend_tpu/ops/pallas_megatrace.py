"""Pallas TPU megakernel: the FULL path-trace bounce loop in VMEM.

Reference: SampleBatchJob (Runtime/Jobs/SampleBatchJob.cs:166-401) — the
reference's Burst megakernel runs the whole bounce loop per pixel with all
state in registers.  This kernel is its true TPU equivalent: per ray tile,
the entire depth loop (sphere intersection -> material scatter -> sky
termination -> throughput/radiance fold -> AOV capture) runs with every
state row resident in VMEM.  HBM traffic per ray is ~7 input floats and
~12 output floats for the WHOLE path — versus the wavefront jnp path which
round-trips ~25 state floats per ray per bounce plus fusion boundaries.

Scope (gated by renderer dispatch): sphere/rect/box scenes with constant
textures, gradient/none sky, convex-hull probabilistic volumes,
unit-shutter sphere motion blur, and meshes up to TRI_MAX triangles
(chunked dense Möller–Trumbore sweep) — the book-cover, Cornell, volume,
motion AND mesh classes (measured at 512x512: cover 53, Cornell 130,
volume_test 65, cornell_volumes 118, cover_motion 41, mesh_showcase 24
MRays/s).  Procedural textures, cubemaps and TRI_MAX+ meshes fall back
to the wavefront integrator; images agree statistically, not bitwise
(in-kernel PRNG differs from threefry).  Deviations: the initial medium
(camera inside a volume) is resolved once for the shared camera origin
(camera_containment_row); motion requires the default (0,1) time range
(SceneFlags.motion_unit_time).

Math parity, per row (all formulas match the jnp library, cited there):
  * quadratic intersection         ops/geometry.sphere_hit_all
  * one-hot record fetch on MXU    ops/pallas_sphere._kernel_full
  * standard/dielectric scatter    core/materials.scatter
  * cosine-hemisphere / sphere     core/sampling.py
  * Smith masking, alpha poly      core/microfacet.py
  * gradient sky                   core/environment.sample_sky
  * emission/attenuation fold      render/integrator._bounce_once

RNG: pltpu.prng_random_bits seeded per (tile, sample-key) — the kernel
analog of the reference's per-pixel RandomSource (RandomSource.cs:15-151),
white-noise flavor.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30

FORCE_INTERPRET = False  # test hook: monkeypatched True (with
# pallas_sphere.use_pallas) so CPU suites can drive the RENDERER's fused
# dispatch glue through interpret-mode kernels.  Read at trace time —
# set it before the first jitted call of a session.
RAY_TILE = 1024
SPHERE_PAD = 128
SPH_BLOCK = 256  # sphere rows per cond-skipped sweep chunk (big scenes; 128 measured a wash)
SPH_CULL_MIN = 1024  # sphere count above which the blocked sweep engages
# (at 480 cover-scene spheres per-block culling measured SLOWER — the
# dense sweep stays the book-scale path; see the NOTE in _bounce_step)
PAD_CENTER = 1e17
REC_COLS = 24  # 0-10 material | 11 material id | 12-14 center | 15 1/r | 16-18 move offset
OUT_ROWS = 16
SELF_EPS = 1e-3  # Ray.OffsetTowards epsilon (Ray.cs:19)
PLASTIC_IOR = 1.5
METAL_IOR = 1.1
TWO_PI = 6.283185307179586
INV_2_24 = 1.0 / 16777216.0


def scene_eligible(
    scene, allow_rect_box: bool = False, allow_volumes: bool = False,
    allow_motion: bool = False, allow_triangles: bool = False,
    allow_textures: bool = False, allow_cubemap: bool = False,
) -> bool:
    """Static check: can this scene run in the fused megakernel?
    (gradient/none sky; procedural textures, motion, triangles,
    rects/boxes and convex volumes only where the caller's kernel supports
    them — the batch kernel does, the plain wavefront megatrace doesn't).
    Everything else uses the wavefront integrator."""
    tri_count = scene.triangles.vert0.shape[0]
    if allow_textures:
        tex_ok = not scene.flags.has_procedural_textures or (
            scene.flags.procedural_albedo_only
            and (
                scene.textures.atlas is None
                or (
                    scene.textures.atlas.shape[0]
                    * scene.textures.atlas.shape[1] <= IMG_AH_MAX
                    and scene.textures.atlas.shape[2] <= IMG_W_MAX
                )
            )
        )
    else:
        tex_ok = not scene.flags.has_procedural_textures
    sky_ok = scene.flags.sky in (0, 1)
    if allow_cubemap and scene.flags.sky == 2:
        cm = scene.environment.cubemap
        sky_ok = cm is not None and (
            cm.shape[0] * cm.shape[1] <= IMG_AH_MAX
            and cm.shape[2] <= IMG_W_MAX
        )
    ok = (
        tex_ok
        and sky_ok
        and (
            scene.spheres.center.shape[0]
            + scene.rects.rot.shape[0]
            + scene.boxes.rot.shape[0]
            + tri_count
        ) > 0
    )
    if allow_triangles:
        # up to TRI_MAX the tables are VMEM-resident; beyond that they
        # stream per-block from HBM (pack_tri_stream_tables) up to
        # TRI_STREAM_MAX; volume-material triangles already trip
        # has_nonconvex_volumes below.
        ok = ok and tri_count <= TRI_STREAM_MAX
    else:
        ok = ok and tri_count == 0
    if allow_volumes:
        ok = ok and not scene.flags.has_nonconvex_volumes
    else:
        ok = ok and not scene.flags.has_volumes
    if allow_motion:
        ok = ok and scene.flags.motion_unit_time
    else:
        ok = ok and not scene.flags.has_motion
    if not allow_rect_box:
        ok = ok and (
            scene.spheres.center.shape[0] > 0
            and scene.rects.rot.shape[0] == 0
            and scene.boxes.rot.shape[0] == 0
        )
    return ok


TRI_PAD = 128
TRI_BLOCK = 192  # triangle rows per unrolled MT chunk: Möller–Trumbore
# keeps ~8 (TRI_BLOCK, RAY_TILE) f32 temporaries live, so chunking bounds
# the peak well under the 16MB scoped-vmem limit (256 rows measured OOM
# by 932KB at RAY_TILE=1024)
TRI_MAX = 4096  # beyond this the tables leave VMEM residence ...
TRI_STREAM_MAX = 262144  # ... and stream per-block from HBM instead:
# the kernel slab-tests each 192-row block (AABBs in SMEM) and DMAs only
# the blocks an active lane can hit into a VMEM scratch before the
# Möller–Trumbore sweep.  A second SMEM level (TRI_SUP-block union
# AABBs) keeps the per-iteration slab cost O(blocks near the ray), so
# the bound is set by the SMEM AABB rows (8 f32 per block + per super,
# ~44KB at the cap), not by VMEM or the flat slab sweep.
TRI_SUP = 16  # blocks per super-block cull entry (3072 triangles)
TRI_REC_ROWS = 32  # triangle record rows (materials + normals + uvs)
TRI_SLOT = 3  # triangles packed per 128-col streamed row: the fused
# row only uses 9 geo + 32 record = 41 cols, but Mosaic requires HBM DMA
# slices with 128-multiple minor dims — packing 3 x 42-col slots per row
# cuts the streamed transfer volume 3x (the sweep is BANDWIDTH-bound:
# super-granularity DMA and per-block double-buffering both measured
# slower, see BENCHMARKS.md dead ends)
TRI_SLOT_COLS = 42  # col stride of one packed slot (9 geo + 32 rec + 1)
TRI_ROWS = TRI_BLOCK // TRI_SLOT  # streamed rows per block (64)
TRI_STREAM_REC_BASE = 9  # record cols start here WITHIN a packed slot
TEX_ROWS = 16  # per-material texture record rows (pack_texture_tables)
MAT_PAD = 128
IMG_AH_MAX = 1024  # atlas rows (images * height) the plane dot can hold
IMG_W_MAX = 512


def _bits_to_unit_floats(bits_u32):
    """uint32 -> U[0,1) with 24 mantissa bits.  Mosaic can't cast
    uint32->f32; route through int32 (safe: >>8 keeps values < 2^24)."""
    low24 = pltpu.bitcast(bits_u32 >> jnp.uint32(8), jnp.int32)
    return low24.astype(jnp.float32) * INV_2_24


def _uniforms_hw(shape):
    """U[0,1) rows from the TPU hardware PRNG."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return _bits_to_unit_floats(bits)


def _lowbias32(x):
    """lowbias32 integer hash (public-domain constants), uint32 in/out."""
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> jnp.uint32(15))
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> jnp.uint32(16))
    return x


def _uniforms_hash(shape, seed, salt, lane_row):
    """Counter-based U[0,1): hash of (seed, global lane, stream, salt).

    Stateless/portable — used in interpret mode (no hw PRNG on CPU) and as
    a reproducible fallback; quality is plenty for MC path tracing.
    lane_row: (1, T) float row of global lane ids (rays row 7)."""
    streams = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lanes = lane_row.astype(jnp.int32)  # (1, T), broadcasts over streams
    x = seed + lanes * jnp.int32(9781) + streams * jnp.int32(6271) + salt
    bits = _lowbias32(pltpu.bitcast(x, jnp.uint32))
    return _bits_to_unit_floats(bits)


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _quat_rotate(qx, qy, qz, qw, vx, vy, vz):
    """Rotate (vx,vy,vz) by quaternion rows (math3.quat_rotate:
    t = 2 q_v x v; v' = v + w t + q_v x t), any broadcastable shapes."""
    tx = 2.0 * (qy * vz - qz * vy)
    ty = 2.0 * (qz * vx - qx * vz)
    tz = 2.0 * (qx * vy - qy * vx)
    return (
        vx + qw * tx + (qy * tz - qz * ty),
        vy + qw * ty + (qz * tx - qx * tz),
        vz + qw * tz + (qx * ty - qy * tx),
    )


def _atan2(y, x):
    """Branchless atan2 from mul/add/div/select only — Mosaic has no
    atan2 lowering (NotImplementedError on TC kernels).  Cephes atanf
    minimax core on [0, tan(pi/8)] after octant reduction; max abs
    error ~1e-6 rad, plenty for texture UVs."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    t = jnp.minimum(ax, ay) / jnp.maximum(jnp.maximum(ax, ay), 1e-30)
    # t > tan(pi/8): atan(t) = pi/4 + atan((t-1)/(t+1)) keeps the
    # polynomial argument inside its designed range.
    hi = t > 0.41421356
    z = jnp.where(hi, (t - 1.0) / (t + 1.0), t)
    z2 = z * z
    p = ((((8.05374449538e-2 * z2 - 1.38776856032e-1) * z2
           + 1.99777106478e-1) * z2 - 3.33329491539e-1) * z2 * z + z)
    r = jnp.where(hi, p + 0.25 * jnp.pi, p)
    r = jnp.where(ay > ax, 0.5 * jnp.pi - r, r)
    r = jnp.where(x < 0.0, jnp.pi - r, r)
    return jnp.where(y < 0.0, -r, r)


def _acos(c):
    """acos(c) = atan2(sqrt(1-c^2), c); caller clips c to [-1, 1]."""
    s = jnp.sqrt(jnp.maximum(1.0 - c * c, 0.0))
    return _atan2(s, c)


def _normalize3(x, y, z, eps=1e-12):
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, eps))
    return x * inv, y * inv, z * inv


def _basis(nx, ny, nz):
    """Branchless Duff et al. orthonormal basis (math3.orthonormal_basis)."""
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    tx, ty, tz = 1.0 + sign * nx * nx * a, sign * b, -sign * nx
    bx, by, bz = b, sign + ny * ny * a, -ny
    return (tx, ty, tz), (bx, by, bz)


def _cosine_hemisphere(u, v, nx, ny, nz):
    """sampling.cosine_hemisphere on rows."""
    r = jnp.sqrt(u)
    th = v * TWO_PI
    x = r * jnp.cos(th)
    z = r * jnp.sin(th)
    y = jnp.sqrt(jnp.maximum(1.0 - u, 0.0))
    (tx, ty, tz), (bx, by, bz) = _basis(nx, ny, nz)
    return (
        x * tx + y * nx + z * bx,
        x * ty + y * ny + z * by,
        x * tz + y * nz + z * bz,
    )


def _unit_sphere(u, v):
    z = u * 2.0 - 1.0
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    th = v * TWO_PI
    return jnp.cos(th) * r, jnp.sin(th) * r, z


def _schlick(cosine, ior):
    r0 = (1.0 - ior) / (1.0 + ior)
    r0 = r0 * r0
    m = jnp.maximum(1.0 - cosine, 0.0)
    return r0 + (1.0 - r0) * m * m * m * m * m


def _roughness_to_alpha(roughness):
    roughness = jnp.maximum(roughness, 1e-3)
    x = jnp.log(roughness)
    return (
        1.62142
        + 0.819955 * x
        + 0.1734 * x * x
        + 0.0171201 * x * x * x
        + 0.000640711 * x * x * x * x
    )


def _smith_masking(cos_theta, roughness):
    """microfacet.smith_masking_shadowing given cos(w, n).

    Degenerate lanes see constant division inputs: the floored
    denominator alone keeps the primal finite, but its -num/den^2
    transpose overflows f32 to inf and poisons reverse-mode through the
    replay's differentiable refl_chance (see microfacet.smith_lambda)."""
    sq_cos = cos_theta * cos_theta
    sq_sin = jnp.maximum(0.0, 1.0 - sq_cos)
    degenerate = sq_cos < 1e-12
    safe = jnp.where(degenerate, 1.0, sq_cos)
    sq_tan = jnp.where(degenerate, 0.0, sq_sin) / safe
    alpha = _roughness_to_alpha(roughness)
    lam = (-1.0 + jnp.sqrt(1.0 + alpha * alpha * sq_tan)) / 2.0
    lam = jnp.where(degenerate, 0.0, lam)
    return 1.0 / (1.0 + lam)


def _bounce_step(
    depth, carry, u, consts, *, t_min: float, has_dielectrics: bool,
    sky_on: bool, has_volumes: bool = False, has_motion: bool = False,
    want_winner: bool = False, cos_tsd=None, cos_all: bool = False,
    vol_dir=None,  # ((1,T),)*3 flavored ~unit directions for the
    #   isotropic volume scatter (the STBN unitvec3 set,
    #   RandomSource.cs:113-128); normalized here, every bounce
):
    """One path-tracing bounce over a (1, T) lane tile.

    Shared by the wavefront kernel (_kernel) and the fused sample-batch
    kernel (_batch_kernel).  carry is the 23-row path state; u is an
    (8, T) block of U[0,1) uniforms; consts is
    ((cx, cy, cz, csmr2, sph_rec_ref), rect|None, box|None, sky_b, sky_t)
    with rect = (geo_ref (R,16), rec_ref (24,R)) and box likewise — all
    VMEM-resident.  cos_tsd, when given, is a ((1,T),)*3 tangent-space
    cosine-hemisphere direction (the STBN unitvec3_cosine set,
    RandomSource.cs:63-89) replacing the Lambert draw on FIRST-bounce
    lanes (depth < 0.5 — a lane's first bounce happens in its regen
    iteration, so the per-sample fetch is current exactly there)."""
    sph_c, rect_c, box_c, tri_c, tex_c, cube_c, sky_b, sky_t = consts
    cx, cy, cz, c_sq_minus_r2, rec_ref, sph_mov = sph_c[:6]
    sph_blocks = sph_c[6] if len(sph_c) > 6 else None
    s = cx.shape[0]

    (ox, oy, oz, dx, dy, dz, thx, thy, thz, rx, ry, rz,
     active, valid, anx, any_, anz, aax, aay, aaz,
     got, events, rays_cast,
     in_id, in_den, in_ar, in_ag, in_ab, in_er, in_eg, in_eb,
     ptime) = carry
    zero = jnp.zeros_like(ox)
    t_cols = ox.shape[1]

    ua, ub, uc, ud = u[0:1], u[1:2], u[2:3], u[3:4]
    u_choice, u_choice2 = u[4:5], u[5:6]

    # ---- intersect all spheres (ops/pallas_sphere._kernel_full_body) --
    a = dx * dx + dy * dy + dz * dz
    o_dot_d = ox * dx + oy * dy + oz * dz
    o_sq = ox * ox + oy * oy + oz * oz
    # Broadcast (S,1)x(1,T) products: K=3 contractions are useless on the
    # 128-deep MXU (measured 1.5x SLOWER via dot_general); the VPU form
    # fuses into the quadratic chain.
    # Per-block AABB culling (the TRI_BLOCK trick, 128-sphere blocks with
    # radius-inflated strip AABBs in sph col 7) was tried here and
    # measured SLOWER on the cover scene (54 -> 47 MRays/s): the tile-wide
    # skip predicate almost never fires — cover's grid strips all cross
    # the camera frustum, the r=1000 ground sphere pins its block, and a
    # sphere quadratic is ~3x cheaper than the Möller–Trumbore row that
    # makes the skip pay for triangles.  Keep the dense sweep.
    inv_a = 1.0 / a

    def _sphere_rows(st, en):
        """Quadratic sweep of sphere rows st:en -> (t_entry (B, T),
        far exit (B, T) | None)."""
        cxb, cyb, czb = cx[st:en], cy[st:en], cz[st:en]
        cmb = c_sq_minus_r2[st:en]
        if has_motion:
            # TransformAtTime with the unit shutter range: w == rayTime
            # (Entity.cs:124-127; gated by SceneFlags.motion_unit_time)
            mx, my, mz = sph_mov
            cx_t = cxb + mx[st:en] * ptime  # (B, T)
            cy_t = cyb + my[st:en] * ptime
            cz_t = czb + mz[st:en] * ptime
            d_dot_c = dx * cx_t + dy * cy_t + dz * cz_t
            o_dot_c = ox * cx_t + oy * cy_t + oz * cz_t
            c_t_sq = cx_t * cx_t + cy_t * cy_t + cz_t * cz_t
            b = o_dot_d - d_dot_c
            # sph col 3 holds -r^2 in motion mode (|c_t|^2 ray-dependent)
            c = (o_sq - 2.0 * o_dot_c) + c_t_sq + cmb
        else:
            d_dot_c = dx * cxb + dy * cyb + dz * czb  # (B, T)
            o_dot_c = ox * cxb + oy * cyb + oz * czb
            b = o_dot_d - d_dot_c
            c = (o_sq - 2.0 * o_dot_c) + cmb
        disc = b * b - a * c
        has_root = disc > 0.0
        sq = jnp.sqrt(jnp.where(has_root, disc, 0.0))
        t_near = (-b - sq) * inv_a
        t_far = (-b + sq) * inv_a
        near_ok = has_root & (t_near > t_min)
        far_ok = has_root & (t_far > t_min)
        t_entry = jnp.where(
            near_ok, t_near, jnp.where(far_ok, t_far, BIG)
        )
        t_exit_rows = (
            jnp.where(far_ok, t_far, BIG) if has_volumes else None
        )
        return t_entry, t_exit_rows

    if sph_blocks is None:
        # ---- dense sweep: every sphere row at once (the fast path for
        # book-scale scenes; per-block culling measured SLOWER at 480
        # spheres — see the NOTE above) --------------------------------
        t_entry, t_exit_rows = _sphere_rows(0, s)
        best_t = jnp.min(t_entry, axis=0, keepdims=True)  # (1, T)
        best_idx = jnp.argmin(t_entry, axis=0, keepdims=True).astype(
            jnp.int32
        )
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (s, t_cols), 0)
        one_hot = (row_ids == best_idx).astype(jnp.float32)
        rec = jax.lax.dot_general(
            rec_ref[:, :], one_hot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (REC, T)
        if has_volumes:
            # winner exit root for the convex volume walk (sphere far
            # root; FindHits exit injection, SampleBatchJob.cs:462-470)
            t_exit = jnp.sum(one_hot * t_exit_rows, axis=0, keepdims=True)
            t_exit = jnp.where(best_t < BIG, t_exit, BIG)
    else:
        # ---- blocked sweep for BIG sphere scenes (thousands of rows):
        # Morton-ordered SPH_BLOCK chunks, each lax.cond-skipped when no
        # ACTIVE lane's ray can beat its best hit inside the block's
        # motion-swept AABB (sph_blocks SMEM row, pack_sphere_blocks) —
        # the same cull/skip shape as the VMEM-triangle path, replacing
        # the reference's per-ray BVH walk (SampleBatchJob.cs:403-448)
        # with a tile-grained hierarchy that keeps TPU lanes lockstep.
        def _inv_sd(dc):
            safe = jnp.where(
                jnp.abs(dc) < 1e-12,
                jnp.where(dc >= 0.0, 1e-12, -1e-12),
                dc,
            )
            return 1.0 / safe

        sivx, sivy, sivz = _inv_sd(dx), _inv_sd(dy), _inv_sd(dz)

        def _sph_block(st, en):
            t_entry, t_exit_rows = _sphere_rows(st, en)
            blk_best = jnp.min(t_entry, axis=0, keepdims=True)
            blk_idx = jnp.argmin(t_entry, axis=0, keepdims=True).astype(
                jnp.int32
            )
            rows = jax.lax.broadcasted_iota(
                jnp.int32, (en - st, t_cols), 0
            )
            hot = (rows == blk_idx).astype(jnp.float32)
            blk_rec = jax.lax.dot_general(
                rec_ref[:, st:en], hot,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            blk_gidx = jnp.float32(st) + blk_idx.astype(jnp.float32)
            if has_volumes:
                blk_exit = jnp.sum(hot * t_exit_rows, axis=0,
                                   keepdims=True)
            else:
                blk_exit = zero
            return blk_best, blk_rec, blk_gidx, blk_exit

        def _sph_skip(_):
            return (
                jnp.full((1, t_cols), BIG, jnp.float32),
                jnp.zeros((rec_ref.shape[0], t_cols), jnp.float32),
                zero,
                zero,
            )

        best_t = jnp.full((1, t_cols), BIG, jnp.float32)
        best_idx_f = zero
        rec = jnp.zeros((rec_ref.shape[0], t_cols), jnp.float32)
        t_exit = jnp.full((1, t_cols), BIG, jnp.float32)
        for st in range(0, s, SPH_BLOCK):
            en = min(st + SPH_BLOCK, s)
            base = (st // SPH_BLOCK) * 8
            bx0 = (sph_blocks[0, base + 0] - ox) * sivx
            by0 = (sph_blocks[0, base + 1] - oy) * sivy
            bz0 = (sph_blocks[0, base + 2] - oz) * sivz
            bx1 = (sph_blocks[0, base + 3] - ox) * sivx
            by1 = (sph_blocks[0, base + 4] - oy) * sivy
            bz1 = (sph_blocks[0, base + 5] - oz) * sivz
            b_near = jnp.maximum(
                jnp.minimum(bx0, bx1),
                jnp.maximum(
                    jnp.minimum(by0, by1), jnp.minimum(bz0, bz1)
                ),
            )
            b_far = jnp.minimum(
                jnp.maximum(bx0, bx1),
                jnp.minimum(
                    jnp.maximum(by0, by1), jnp.maximum(bz0, bz1)
                ),
            )
            lane_may = (
                (b_far >= jnp.maximum(b_near, t_min))
                & (b_near < best_t)
            ).astype(jnp.float32)
            blk_pred = jnp.max(
                jnp.where(active > 0.0, lane_may, 0.0)
            ) > 0.0
            blk_best, blk_rec, blk_gidx, blk_exit = jax.lax.cond(
                blk_pred,
                lambda _, st=st, en=en: _sph_block(st, en),
                _sph_skip,
                0,
            )
            wins = blk_best < best_t
            best_t = jnp.where(wins, blk_best, best_t)
            best_idx_f = jnp.where(wins, blk_gidx, best_idx_f)
            rec = jnp.where(wins, blk_rec, rec)
            if has_volumes:
                t_exit = jnp.where(wins, blk_exit, t_exit)
        best_idx = best_idx_f.astype(jnp.int32)
        if has_volumes:
            t_exit = jnp.where(best_t < BIG, t_exit, BIG)

    mat = rec[0:11, :]  # winner material rows (pack_materials layout)
    mat_id = rec[11:12, :]  # winner material index (volume bookkeeping)

    # ---- rects (HitTests.cs:62-78 one-sided local-XY rect) --------------
    if rect_c is not None:
        rgeo, rrec_ref = rect_c
        qx, qy, qz, qw = (rgeo[:, 0:1], rgeo[:, 1:2],
                          rgeo[:, 2:3], rgeo[:, 3:4])
        rpx, rpy, rpz = rgeo[:, 4:5], rgeo[:, 5:6], rgeo[:, 6:7]
        fx_, fy_ = rgeo[:, 7:8], rgeo[:, 8:9]
        tx_, ty_ = rgeo[:, 9:10], rgeo[:, 10:11]
        olx, oly, olz = _quat_rotate(
            -qx, -qy, -qz, qw, ox - rpx, oy - rpy, oz - rpz
        )  # (R, T)
        dlx, dly, dlz = _quat_rotate(-qx, -qy, -qz, qw, dx, dy, dz)
        safe_dz = jnp.where(dlz == 0.0, 1.0, dlz)
        tr = -olz / safe_dz
        hx_ = olx + tr * dlx
        hy_ = oly + tr * dly
        ok_r = (
            (dlz < 0.0) & (tr > t_min)
            & (hx_ >= fx_) & (hx_ <= tx_)
            & (hy_ >= fy_) & (hy_ <= ty_)
        )
        t_rect = jnp.where(ok_r, tr, BIG)
        r_best = jnp.min(t_rect, axis=0, keepdims=True)
        r_idx = jnp.argmin(t_rect, axis=0, keepdims=True).astype(jnp.int32)
        r_rows = jax.lax.broadcasted_iota(
            jnp.int32, (t_rect.shape[0], t_cols), 0
        )
        r_one_hot = (r_rows == r_idx).astype(jnp.float32)
        rrec = jax.lax.dot_general(
            rrec_ref[:, :], r_one_hot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (24, T): 0-10 material, 11-13 world normal
        rect_wins = r_best < best_t
        best_t = jnp.where(rect_wins, r_best, best_t)
        mat = jnp.where(rect_wins, rrec[0:11, :], mat)
        mat_id = jnp.where(rect_wins, rrec[14:15, :], mat_id)
        if has_volumes:
            t_exit = jnp.where(rect_wins, BIG, t_exit)  # rects: no interior

    # ---- boxes (HitTests.cs:81-113 Majercik) ------------------------------
    if box_c is not None:
        bgeo, brec_ref = box_c
        bqx, bqy, bqz, bqw = (bgeo[:, 0:1], bgeo[:, 1:2],
                              bgeo[:, 2:3], bgeo[:, 3:4])
        bpx, bpy, bpz = bgeo[:, 4:5], bgeo[:, 5:6], bgeo[:, 6:7]
        ex_, ey_, ez_ = bgeo[:, 7:8], bgeo[:, 8:9], bgeo[:, 9:10]
        boX, boY, boZ = _quat_rotate(
            -bqx, -bqy, -bqz, bqw, ox - bpx, oy - bpy, oz - bpz
        )
        bdX, bdY, bdZ = _quat_rotate(-bqx, -bqy, -bqz, bqw, dx, dy, dz)
        boX = boX + bdX * t_min
        boY = boY + bdY * t_min
        boZ = boZ + bdZ * t_min
        inside = (
            jnp.maximum(
                jnp.abs(boX) / jnp.maximum(ex_, 1e-30),
                jnp.maximum(
                    jnp.abs(boY) / jnp.maximum(ey_, 1e-30),
                    jnp.abs(boZ) / jnp.maximum(ez_, 1e-30),
                ),
            ) < 1.0
        )
        winding = jnp.where(inside, -1.0, 1.0)
        sgx, sgy, sgz = -jnp.sign(bdX), -jnp.sign(bdY), -jnp.sign(bdZ)
        sdx_ = jnp.where(bdX == 0.0, 1e-30, bdX)
        sdy_ = jnp.where(bdY == 0.0, 1e-30, bdY)
        sdz_ = jnp.where(bdZ == 0.0, 1e-30, bdZ)
        dpx = (ex_ * winding * sgx - boX) / sdx_
        dpy = (ey_ * winding * sgy - boY) / sdy_
        dpz = (ez_ * winding * sgz - boZ) / sdz_
        test_x = (
            (dpx >= 0.0)
            & (jnp.abs(boY + bdY * dpx) < ey_)
            & (jnp.abs(boZ + bdZ * dpx) < ez_)
        )
        test_y = (
            (dpy >= 0.0)
            & (jnp.abs(boZ + bdZ * dpy) < ez_)
            & (jnp.abs(boX + bdX * dpy) < ex_)
        )
        test_z = (
            (dpz >= 0.0)
            & (jnp.abs(boX + bdX * dpz) < ex_)
            & (jnp.abs(boY + bdY * dpz) < ey_)
        )
        any_hit = test_x | test_y | test_z
        tb = jnp.where(test_x, dpx, jnp.where(test_y, dpy, dpz)) + t_min
        t_box = jnp.where(any_hit, tb, BIG)
        b_best = jnp.min(t_box, axis=0, keepdims=True)
        b_idx = jnp.argmin(t_box, axis=0, keepdims=True).astype(jnp.int32)
        b_rows = jax.lax.broadcasted_iota(
            jnp.int32, (t_box.shape[0], t_cols), 0
        )
        b_one_hot = (b_rows == b_idx).astype(jnp.float32)
        brec = jax.lax.dot_general(
            brec_ref[:, :], b_one_hot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (24, T): 0-10 material, 11-14 quat, 15-17 pos, 18-20 ext
        box_wins = b_best < best_t
        best_t = jnp.where(box_wins, b_best, best_t)
        mat = jnp.where(box_wins, brec[0:11, :], mat)
        mat_id = jnp.where(box_wins, brec[21:22, :], mat_id)
        if has_volumes:
            # slab exit for the convex walk (geometry.box_hit_single)
            ibx = jnp.where(bdX == 0.0, jnp.inf, 1.0 / sdx_)
            iby = jnp.where(bdY == 0.0, jnp.inf, 1.0 / sdy_)
            ibz = jnp.where(bdZ == 0.0, jnp.inf, 1.0 / sdz_)
            tx0 = (-ex_ - boX) * ibx
            tx1 = (ex_ - boX) * ibx
            ty0 = (-ey_ - boY) * iby
            ty1 = (ey_ - boY) * iby
            tz0 = (-ez_ - boZ) * ibz
            tz1 = (ez_ - boZ) * ibz
            b_far = jnp.minimum(
                jnp.maximum(tx0, tx1),
                jnp.minimum(jnp.maximum(ty0, ty1), jnp.maximum(tz0, tz1)),
            ) + t_min
            b_near = jnp.maximum(
                jnp.minimum(tx0, tx1),
                jnp.maximum(jnp.minimum(ty0, ty1), jnp.minimum(tz0, tz1)),
            ) + t_min
            exit_ok = (b_far > t_min) & (b_near < b_far)
            b_exit_all = jnp.where(exit_ok, b_far, BIG)
            b_exit = jnp.sum(b_one_hot * b_exit_all, axis=0, keepdims=True)
            t_exit = jnp.where(
                box_wins, jnp.where(b_best < BIG, b_exit, BIG), t_exit
            )

    # ---- triangles (HitTests.cs:116-150 Möller–Trumbore, chunked) --------
    tri_stream = tri_c is not None and len(tri_c) != 2
    if tri_c is not None and not tri_stream:
        tgeo, trec_ref = tri_c
        t_rows = tgeo.shape[0]

        # per-block early-out: slab-test every lane against the block's
        # AABB (pack_tri_tables cols 9-15 of the block's first row); when
        # no ACTIVE lane can hit it, lax.cond skips that block's sweep.
        # Blocks track objects (meshes are appended contiguously), so a
        # tile only sweeps the objects in front of its rays.
        def _inv_d(dc):
            safe = jnp.where(
                jnp.abs(dc) < 1e-12,
                jnp.where(dc >= 0.0, 1e-12, -1e-12),
                dc,
            )
            return 1.0 / safe

        ivx, ivy, ivz = _inv_d(dx), _inv_d(dy), _inv_d(dz)

        def _block_sweep(st, en):
            eax, eay, eaz = (tgeo[st:en, 0:1], tgeo[st:en, 1:2],
                             tgeo[st:en, 2:3])
            ebx, eby, ebz = (tgeo[st:en, 3:4], tgeo[st:en, 4:5],
                             tgeo[st:en, 5:6])
            v0x, v0y, v0z = (tgeo[st:en, 6:7], tgeo[st:en, 7:8],
                             tgeo[st:en, 8:9])
            pvx = dy * eaz - dz * eay  # (TB, T)
            pvy = dz * eax - dx * eaz
            pvz = dx * eay - dy * eax
            det = ebx * pvx + eby * pvy + ebz * pvz
            inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
            tvx = ox - v0x
            tvy = oy - v0y
            tvz = oz - v0z
            bu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            qvx = tvy * ebz - tvz * eby
            qvy = tvz * ebx - tvx * ebz
            qvz = tvx * eby - tvy * ebx
            bv = (dx * qvx + dy * qvy + dz * qvz) * inv_det
            t_mt = (eax * qvx + eay * qvy + eaz * qvz) * inv_det
            ok_t = (
                (det != 0.0)
                & (bu >= 0.0) & (bu <= 1.0)
                & (bv >= 0.0) & ((bu + bv) <= 1.0)
                & (t_mt > t_min)
            )
            tt = jnp.where(ok_t, t_mt, BIG)
            blk_best = jnp.min(tt, axis=0, keepdims=True)
            blk_idx = jnp.argmin(tt, axis=0, keepdims=True).astype(
                jnp.int32
            )
            blk_rows = jax.lax.broadcasted_iota(
                jnp.int32, (en - st, t_cols), 0
            )
            blk_hot = (blk_rows == blk_idx).astype(jnp.float32)
            blk_rec = jax.lax.dot_general(
                trec_ref[:, st:en], blk_hot,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (32, T): 0-10 material | 11 id | normals | uvs
            blk_u = jnp.sum(blk_hot * bu, axis=0, keepdims=True)
            blk_v = jnp.sum(blk_hot * bv, axis=0, keepdims=True)
            # global winner row (tape mode: megatrace_replay gathers the
            # winner's geo/record rows by this index; dead code otherwise)
            blk_gidx = jnp.float32(st) + blk_idx.astype(jnp.float32)
            return blk_best, blk_u, blk_v, blk_rec, blk_gidx

        def _block_skip(_):
            return (
                jnp.full((1, t_cols), BIG, jnp.float32),
                zero,
                zero,
                jnp.zeros((trec_ref.shape[0], t_cols), jnp.float32),
                zero,
            )

        tri_best = jnp.full((1, t_cols), BIG, jnp.float32)
        tri_u = zero
        tri_v = zero
        tri_idx = zero
        trec = jnp.zeros((trec_ref.shape[0], t_cols), jnp.float32)
        _sweep_ct = zero  # MESH_COUNT debug tally (+1 per swept block,
        #   matching the streamed branch's carry-slot semantics)
        for st in range(0, t_rows, TRI_BLOCK):
            en = min(st + TRI_BLOCK, t_rows)
            bx0 = (tgeo[st, 9] - ox) * ivx
            bx1 = (tgeo[st, 12] - ox) * ivx
            by0 = (tgeo[st, 10] - oy) * ivy
            by1 = (tgeo[st, 13] - oy) * ivy
            bz0 = (tgeo[st, 11] - oz) * ivz
            bz1 = (tgeo[st, 14] - oz) * ivz
            b_near = jnp.maximum(
                jnp.minimum(bx0, bx1),
                jnp.maximum(
                    jnp.minimum(by0, by1), jnp.minimum(bz0, bz1)
                ),
            )
            b_far = jnp.minimum(
                jnp.maximum(bx0, bx1),
                jnp.minimum(
                    jnp.maximum(by0, by1), jnp.maximum(bz0, bz1)
                ),
            )
            # distance bound: blocks beyond the lane's best hit so far
            # (earlier blocks or the sphere/rect/box winner) cannot win
            lane_may = (
                (b_far >= jnp.maximum(b_near, t_min))
                & (b_near < jnp.minimum(tri_best, best_t))
            ).astype(jnp.float32)
            blk_pred = jnp.max(jnp.where(active > 0.0, lane_may, 0.0)) > 0.0
            blk_best, blk_u, blk_v, blk_rec, blk_gidx = jax.lax.cond(
                blk_pred,
                lambda _, st=st, en=en: _block_sweep(st, en),
                _block_skip,
                0,
            )
            blk_wins = blk_best < tri_best
            tri_best = jnp.where(blk_wins, blk_best, tri_best)
            tri_u = jnp.where(blk_wins, blk_u, tri_u)
            tri_v = jnp.where(blk_wins, blk_v, tri_v)
            tri_idx = jnp.where(blk_wins, blk_gidx, tri_idx)
            trec = jnp.where(blk_wins, blk_rec, trec)
            _sweep_ct = _sweep_ct + jnp.where(blk_pred, 1.0, 0.0)
        if os.environ.get("MESH_COUNT") is not None:
            rays_cast = rays_cast + _sweep_ct
        tri_wins = tri_best < best_t
        best_t = jnp.where(tri_wins, tri_best, best_t)
        mat = jnp.where(tri_wins, trec[0:11, :], mat)
        mat_id = jnp.where(tri_wins, trec[11:12, :], mat_id)
        if has_volumes:
            t_exit = jnp.where(tri_wins, BIG, t_exit)  # no interior

    if tri_stream:
        # ---- streamed triangles (TRI_MAX < T <= TRI_STREAM_MAX) --------
        # Tables stay in HBM; each 192-row block is slab-tested against
        # its SMEM AABB and, only when an active lane can hit it, DMA'd
        # into the VMEM scratch and swept.  The wavefront BVH walk is not
        # viable on TPU at this scale (per-lane gathers in a lockstep
        # while_loop), so this per-block cull + stream IS the big-mesh
        # path (FindHitCandidates, SampleBatchJob.cs:403-448, re-shaped).
        if len(tri_c) > 5:
            # bounce-synchronous path (ops/pallas_meshtrace): per-tile
            # NEAR-TO-FAR super order + lower-bound distances, XLA-
            # precomputed from the tile's live-ray bounds — the while
            # loop below breaks the moment no active lane's best hit can
            # be beaten, the TPU analog of ordered BVH descent
            # (FindHitCandidates' shrinking t_max, SampleBatchJob.cs:
            # 403-448)
            (tbl_h, ab_ref, sup_ref, tbl_s, dma_sem,
             sord_ref, sdist_ref) = tri_c
        else:
            tbl_h, ab_ref, sup_ref, tbl_s, dma_sem = tri_c
            sord_ref = sdist_ref = None
        n_blk = tbl_h.shape[0] // TRI_ROWS
        n_sup = n_blk // TRI_SUP
        rb = TRI_STREAM_REC_BASE

        def _inv_d(dc):
            safe = jnp.where(
                jnp.abs(dc) < 1e-12,
                jnp.where(dc >= 0.0, 1e-12, -1e-12),
                dc,
            )
            return 1.0 / safe

        ivx, ivy, ivz = _inv_d(dx), _inv_d(dy), _inv_d(dz)

        def _slot_sweep(carry, cb, brows):
            # Möller–Trumbore over ONE packed slot (TRI_ROWS triangles
            # at STATIC col base cb of the resident block — see TRI_SLOT)
            tb, tu, tv, tr = carry
            eax, eay, eaz = (
                brows[:, cb + 0 : cb + 1],
                brows[:, cb + 1 : cb + 2],
                brows[:, cb + 2 : cb + 3],
            )
            ebx, eby, ebz = (
                brows[:, cb + 3 : cb + 4],
                brows[:, cb + 4 : cb + 5],
                brows[:, cb + 5 : cb + 6],
            )
            v0x, v0y, v0z = (
                brows[:, cb + 6 : cb + 7],
                brows[:, cb + 7 : cb + 8],
                brows[:, cb + 8 : cb + 9],
            )
            pvx = dy * eaz - dz * eay  # (TRI_ROWS, T)
            pvy = dz * eax - dx * eaz
            pvz = dx * eay - dy * eax
            det = ebx * pvx + eby * pvy + ebz * pvz
            inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
            tvx = ox - v0x
            tvy = oy - v0y
            tvz = oz - v0z
            bu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            qvx = tvy * ebz - tvz * eby
            qvy = tvz * ebx - tvx * ebz
            qvz = tvx * eby - tvy * ebx
            bv = (dx * qvx + dy * qvy + dz * qvz) * inv_det
            t_mt = (eax * qvx + eay * qvy + eaz * qvz) * inv_det
            ok_t = (
                (det != 0.0)
                & (bu >= 0.0) & (bu <= 1.0)
                & (bv >= 0.0) & ((bu + bv) <= 1.0)
                & (t_mt > t_min)
            )
            tt = jnp.where(ok_t, t_mt, BIG)
            blk_best = jnp.min(tt, axis=0, keepdims=True)
            blk_idx = jnp.argmin(tt, axis=0, keepdims=True).astype(
                jnp.int32
            )
            blk_rows = jax.lax.broadcasted_iota(
                jnp.int32, (TRI_ROWS, t_cols), 0
            )
            blk_hot = (blk_rows == blk_idx).astype(jnp.float32)
            # record cols cb+rb..cb+rb+31 of the slot: contract the
            # TRI_ROWS dim against the one-hot
            blk_rec = jax.lax.dot_general(
                brows[:, cb + rb : cb + rb + TRI_REC_ROWS], blk_hot,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (32, T)
            blk_u = jnp.sum(blk_hot * bu, axis=0, keepdims=True)
            blk_v = jnp.sum(blk_hot * bv, axis=0, keepdims=True)
            wins = blk_best < tb
            return (
                jnp.where(wins, blk_best, tb),
                jnp.where(wins, blk_u, tu),
                jnp.where(wins, blk_v, tv),
                jnp.where(wins, blk_rec, tr),
            )

        def _stream_sweep(carry, brows):
            extra = carry[4:]
            carry = carry[:4]
            for j in range(TRI_SLOT):  # static unroll: static col bases
                carry = _slot_sweep(carry, j * TRI_SLOT_COLS, brows)
            return carry + extra

        def _slab_pred(ref, base, best):
            """True when any ACTIVE lane's ray can beat its current best
            hit inside the AABB at ref[0, base:base+6]."""
            bx0 = (ref[0, base + 0] - ox) * ivx
            by0 = (ref[0, base + 1] - oy) * ivy
            bz0 = (ref[0, base + 2] - oz) * ivz
            bx1 = (ref[0, base + 3] - ox) * ivx
            by1 = (ref[0, base + 4] - oy) * ivy
            bz1 = (ref[0, base + 5] - oz) * ivz
            b_near = jnp.maximum(
                jnp.minimum(bx0, bx1),
                jnp.maximum(
                    jnp.minimum(by0, by1), jnp.minimum(bz0, bz1)
                ),
            )
            b_far = jnp.minimum(
                jnp.maximum(bx0, bx1),
                jnp.minimum(
                    jnp.maximum(by0, by1), jnp.maximum(bz0, bz1)
                ),
            )
            # distance bound: a box whose slab entry lies beyond the
            # lane's best hit so far (earlier blocks OR the
            # sphere/rect/box winner) cannot produce a nearer one — for
            # closed meshes this culls the back-facing shell once a
            # front block lands (FindHitCandidates' shrinking t_max,
            # SampleBatchJob.cs:403-448)
            bound = jnp.minimum(best, best_t)
            lane_may = (
                (b_far >= jnp.maximum(b_near, t_min))
                & (b_near < bound)
            ).astype(jnp.float32)
            return jnp.max(jnp.where(active > 0.0, lane_may, 0.0)) > 0.0

        # debug-only attribution knobs (.scratch measurements): force
        # every pred true (cull cost/benefit) or drop the per-block
        # level (super-only cull)
        _force = os.environ.get("MESH_FORCE_SWEEP") is not None
        _sup_only = os.environ.get("MESH_SUP_ONLY") is not None

        def _mk_blk_body(slot_base):
            def _blk_body(blk, carry):
                # post-DMA per-block cull: the block's rows are already
                # VMEM resident (the super-level DMA), so this pred only
                # gates the 192-triangle sweep — no transfer latency
                # rides on it.  The shrinking per-lane bound (carry[0])
                # still culls the back shell of closed meshes block by
                # block.  slot_base selects the double-buffer slot on
                # the sorted-stream path (0 on the megakernel path).
                if _force or _sup_only:
                    blk_pred = jnp.bool_(True)
                else:
                    blk_pred = _slab_pred(ab_ref, blk * 8, carry[0])

                def _do(carry):
                    rows = tbl_s[
                        pl.ds(
                            slot_base + (blk % TRI_SUP) * TRI_ROWS,
                            TRI_ROWS,
                        ),
                        :,
                    ]
                    c = _stream_sweep(carry, rows)
                    if os.environ.get("MESH_COUNT") is not None:
                        # debug: sweep tally rides the 5th carry slot
                        return c[:4] + (c[4] + 1.0,)
                    return c

                return jax.lax.cond(blk_pred, _do, lambda c: c, carry)

            return _blk_body

        _blk_body = _mk_blk_body(0)

        def _sup_body(sup, carry):
            # level-2 cull + super-granular DMA: one slab test skips
            # TRI_SUP blocks' worth of per-block tests, and one 512KB
            # transfer (TRI_SUP*TRI_ROWS rows) replaces up to TRI_SUP
            # synchronous 32KB block DMAs.  Round 3 paid a ~5us DMA
            # round trip PER PASSING BLOCK (measured: mesh_huge was
            # "DMA-bound" yet its total streamed bytes were <100ms/batch
            # of bandwidth — the cost was transfer LATENCY serialized
            # with the pred chain, not bytes).  Shipping a whole super
            # costs ~0.7us of extra bandwidth and removes the per-block
            # stall; blocks the bound then culls only waste VPU-free
            # DMA bytes.  (The round-2 "super-granularity DMA measured
            # slower" experiment swept every shipped block — this keeps
            # the per-block sweep cull.)
            sup_pred = (
                jnp.bool_(True) if _force
                else _slab_pred(sup_ref, sup * 8, carry[0])
            )

            def _do_sup(carry):
                cp = pltpu.make_async_copy(
                    tbl_h.at[
                        pl.ds(sup * TRI_SUP * TRI_ROWS,
                              TRI_SUP * TRI_ROWS)
                    ],
                    tbl_s, dma_sem,
                )
                cp.start()
                cp.wait()
                return jax.lax.fori_loop(
                    sup * TRI_SUP, (sup + 1) * TRI_SUP, _blk_body, carry
                )

            return jax.lax.cond(sup_pred, _do_sup, lambda c: c, carry)

        _count = os.environ.get("MESH_COUNT") is not None
        init = (
            jnp.full((1, t_cols), BIG, jnp.float32),
            zero,
            zero,
            jnp.zeros((TRI_REC_ROWS, t_cols), jnp.float32),
        ) + ((zero,) if _count else ())
        if sord_ref is not None:
            # ordered DOUBLE-BUFFERED stream: reachable supers (finite
            # lower-bound distance) are DMA'd unconditionally in
            # nearest-first order, each transfer overlapping the
            # previous super's sweep — the serialized per-super DMA
            # round trip (~10-20us x passing supers x live tile-bounces)
            # measured as the secondary-bounce bottleneck.  Sweeps stay
            # pred-gated: a super whose lower bound exceeds every active
            # lane's best hit ships bytes (VPU-free) but is never swept
            # — the BVH's shrinking-t_max cull.  (A true while-loop
            # break was tried first: Mosaic's compile of the big-carry
            # while hung >45 min.)
            rows_sup = TRI_SUP * TRI_ROWS
            big_cut = jnp.float32(1e29)

            def _dma(slot, sup):
                return pltpu.make_async_copy(
                    tbl_h.at[pl.ds(sup * rows_sup, rows_sup)],
                    tbl_s.at[pl.ds(slot * rows_sup, rows_sup)],
                    dma_sem.at[slot],
                )

            @pl.when(sdist_ref[0, 0, 0] < big_cut)
            def _():
                _dma(jnp.int32(0), sord_ref[0, 0, 0]).start()

            def _sup_stream(k, carry):
                reach_k = sdist_ref[0, 0, k] < big_cut
                nxt = jnp.minimum(k + 1, n_sup - 1)

                @pl.when(
                    (k + 1 < n_sup) & (sdist_ref[0, 0, nxt] < big_cut)
                )
                def _():
                    _dma((k + 1) % 2, sord_ref[0, 0, nxt]).start()

                def _consume(carry):
                    _dma(k % 2, sord_ref[0, 0, k]).wait()
                    bound = jnp.max(jnp.where(
                        active > 0.0,
                        jnp.minimum(carry[0], best_t), 0.0,
                    ))

                    def _sweep(carry):
                        sup = sord_ref[0, 0, k]
                        return jax.lax.fori_loop(
                            sup * TRI_SUP, (sup + 1) * TRI_SUP,
                            _mk_blk_body((k % 2) * rows_sup), carry,
                        )

                    return jax.lax.cond(
                        sdist_ref[0, 0, k] < bound, _sweep,
                        lambda c: c, carry,
                    )

                return jax.lax.cond(reach_k, _consume, lambda c: c, carry)

            out = jax.lax.fori_loop(0, n_sup, _sup_stream, init)
        else:
            out = jax.lax.fori_loop(0, n_sup, _sup_body, init)
        if _count:
            tri_best, tri_u, tri_v, trec, _sweep_ct = out
            rays_cast = rays_cast + _sweep_ct
        else:
            tri_best, tri_u, tri_v, trec = out
        tri_wins = tri_best < best_t
        best_t = jnp.where(tri_wins, tri_best, best_t)
        mat = jnp.where(tri_wins, trec[0:11, :], mat)
        mat_id = jnp.where(tri_wins, trec[11:12, :], mat_id)
        if has_volumes:
            t_exit = jnp.where(tri_wins, BIG, t_exit)  # no interior

    hit = best_t < BIG
    is_active = active > 0.0
    scatter_mask = is_active & hit
    miss = is_active & jnp.logical_not(hit)

    # winner attributes: hit point at the FINAL nearest t, normal per kind
    t_hit = jnp.where(hit, best_t, 0.0)
    px = ox + t_hit * dx
    py = oy + t_hit * dy
    pz = oz + t_hit * dz
    inv_r = rec[15:16, :]
    if has_motion:
        nx = (px - (rec[12:13, :] + rec[16:17, :] * ptime)) * inv_r
        ny = (py - (rec[13:14, :] + rec[17:18, :] * ptime)) * inv_r
        nz = (pz - (rec[14:15, :] + rec[18:19, :] * ptime)) * inv_r
    else:
        nx = (px - rec[12:13, :]) * inv_r
        ny = (py - rec[13:14, :]) * inv_r
        nz = (pz - rec[14:15, :]) * inv_r
    if rect_c is not None:
        nx = jnp.where(rect_wins, rrec[11:12, :], nx)
        ny = jnp.where(rect_wins, rrec[12:13, :], ny)
        nz = jnp.where(rect_wins, rrec[13:14, :], nz)
    if box_c is not None:
        # dominant-|p|/extent face normal (intersect._shading_attributes)
        wqx, wqy, wqz, wqw = (brec[11:12, :], brec[12:13, :],
                              brec[13:14, :], brec[14:15, :])
        plx, ply, plz = _quat_rotate(
            -wqx, -wqy, -wqz, wqw,
            px - brec[15:16, :], py - brec[16:17, :], pz - brec[17:18, :],
        )
        rex = jnp.abs(plx) / jnp.maximum(brec[18:19, :], 1e-12)
        rey = jnp.abs(ply) / jnp.maximum(brec[19:20, :], 1e-12)
        rez = jnp.abs(plz) / jnp.maximum(brec[20:21, :], 1e-12)
        is_x = (rex >= rey) & (rex >= rez)
        is_y = jnp.logical_not(is_x) & (rey >= rez)
        is_z = jnp.logical_not(is_x) & jnp.logical_not(is_y)
        lnx = jnp.where(is_x, jnp.sign(plx), 0.0)
        lny = jnp.where(is_y, jnp.sign(ply), 0.0)
        lnz = jnp.where(is_z, jnp.sign(plz), 0.0)
        bnx, bny, bnz = _quat_rotate(wqx, wqy, wqz, wqw, lnx, lny, lnz)
        nx = jnp.where(box_wins, bnx, nx)
        ny = jnp.where(box_wins, bny, ny)
        nz = jnp.where(box_wins, bnz, nz)
    if tri_c is not None:
        # barycentric vertex-normal interpolation, normalized after the
        # lerp (intersect._shading_attributes / Entity.cs:65)
        w0 = 1.0 - tri_u - tri_v
        tnx = (trec[12:13, :] * w0 + trec[15:16, :] * tri_u
               + trec[18:19, :] * tri_v)
        tny = (trec[13:14, :] * w0 + trec[16:17, :] * tri_u
               + trec[19:20, :] * tri_v)
        tnz = (trec[14:15, :] * w0 + trec[17:18, :] * tri_u
               + trec[20:21, :] * tri_v)
        tl2 = tnx * tnx + tny * tny + tnz * tnz
        t_inv = jax.lax.rsqrt(jnp.maximum(tl2, 1e-24))
        nx = jnp.where(tri_wins, tnx * t_inv, nx)
        ny = jnp.where(tri_wins, tny * t_inv, ny)
        nz = jnp.where(tri_wins, tnz * t_inv, nz)

    # winner UV: triangles lerp baked per-vertex UVs; spheres get the
    # Shirley Book-2 spherical mapping from the unit outward normal —
    # a DELIBERATE deviation from HitTests.cs:123 (texCoord = 0), which
    # made image textures on analytic spheres read a single texel; same
    # precedent as the resurrected checker/perlin dead branches.
    # rects/boxes keep uv = 0 (intersect._shading_attributes parity).
    uv_u = uv_v = zero
    if tex_c is not None and tex_c[2] is not None:
        sph_wins = hit
        if rect_c is not None:
            sph_wins = sph_wins & jnp.logical_not(rect_wins)
        if box_c is not None:
            sph_wins = sph_wins & jnp.logical_not(box_wins)
        if tri_c is not None:
            sph_wins = sph_wins & jnp.logical_not(tri_wins)
        # (nx,ny,nz) on sphere-winner lanes are the unit outward normals.
        # jnp.arctan2/arccos have NO Mosaic lowering (hardware-verified
        # NotImplementedError) — _atan2/_acos are select-based kernels.
        su = (_atan2(-nz, nx) + jnp.pi) * (0.5 / jnp.pi)
        sv = _acos(jnp.clip(-ny, -1.0, 1.0)) * (1.0 / jnp.pi)
        uv_u = jnp.where(sph_wins, su, uv_u)
        uv_v = jnp.where(sph_wins, sv, uv_v)
    if tri_c is not None and tex_c is not None and tex_c[2] is not None:
        uv_u = jnp.where(
            tri_wins,
            trec[21:22, :] * w0 + trec[22:23, :] * tri_u
            + trec[23:24, :] * tri_v,
            uv_u,
        )
        uv_v = jnp.where(
            tri_wins,
            trec[24:25, :] * w0 + trec[25:26, :] * tri_u
            + trec[26:27, :] * tri_v,
            uv_v,
        )

    mtype = mat[0:1, :]
    alb_r, alb_g, alb_b = mat[1:2, :], mat[2:3, :], mat[3:4, :]
    em_r, em_g, em_b = mat[4:5, :], mat[5:6, :], mat[6:7, :]
    gloss = mat[7:8, :]
    metallic = mat[8:9, :]
    parameter = mat[9:10, :]
    perfect_f = mat[10:11, :]  # stays float: bool-valued selects are
    # unsupported truncations in Mosaic

    if tex_c is not None:
        # procedural albedo override (constant albedo is pre-resolved in
        # the packed rows; checker/perlin/image evaluate here at the hit)
        alb_r, alb_g, alb_b = _bounce_textures(
            tex_c, mat_id, (alb_r, alb_g, alb_b), (nx, ny, nz),
            (px, py, pz), (uv_u, uv_v), t_cols,
        )

    # ---- probabilistic volume walk (integrator._bounce_once;
    #      SampleBatchJob.cs:212-303 entry/exit pairing + Beer-Lambert) ----
    if has_volumes:
        in_vol = in_id >= 0.0
        hit_is_vol = hit & (mtype > 1.5)  # PROBABILISTIC_VOLUME == 2
        entering = _dot3(dx, dy, dz, nx, ny, nz) < 0.0
        # current medium record: carried rows while inside, else the hit
        # volume's own rows at an entry boundary
        v_den = jnp.where(in_vol, in_den, parameter)
        v_ar = jnp.where(in_vol, in_ar, alb_r)
        v_ag = jnp.where(in_vol, in_ag, alb_g)
        v_ab = jnp.where(in_vol, in_ab, alb_b)
        v_er = jnp.where(in_vol, in_er, em_r)
        v_eg = jnp.where(in_vol, in_eg, em_g)
        v_eb = jnp.where(in_vol, in_eb, em_b)
        v_id = jnp.where(in_vol, in_id, mat_id)
        # free path d = -1/density * ln(u)  (Material.cs:49-65)
        u_free = jnp.maximum(u[6:7], 1e-12)
        free_path = -jnp.log(u_free) / jnp.maximum(v_den, 1e-12)
        seg_len = jnp.where(in_vol, best_t, t_exit - best_t)
        vol_candidate = hit & (in_vol | (hit_is_vol & entering))
        vol_scatter = vol_candidate & (free_path < seg_len)
        vol_t = jnp.where(in_vol, free_path, best_t + free_path)
        pass_through = (
            hit & jnp.logical_not(in_vol) & hit_is_vol & entering
            & jnp.logical_not(vol_scatter)
        )
        exits_own = (
            in_vol & hit & hit_is_vol & jnp.logical_not(entering)
            & jnp.logical_not(vol_scatter)
            & (jnp.abs(mat_id - in_id) < 0.5)
        )
        skip = pass_through | exits_own
        skip_t = jnp.where(pass_through, t_exit, best_t)

        scatter_mask = scatter_mask & jnp.logical_not(skip)
        # effective hit record (vol scatter replaces the surface hit)
        eff_t = jnp.where(vol_scatter, vol_t, t_hit)
        px = ox + eff_t * dx
        py = oy + eff_t * dy
        pz = oz + eff_t * dz
        nx = jnp.where(vol_scatter, -dx, nx)
        ny = jnp.where(vol_scatter, -dy, ny)
        nz = jnp.where(vol_scatter, -dz, nz)
        em_r = jnp.where(vol_scatter, v_er, em_r)
        em_g = jnp.where(vol_scatter, v_eg, em_g)
        em_b = jnp.where(vol_scatter, v_eb, em_b)
        perfect_f = jnp.where(vol_scatter, 0.0, perfect_f)

    # ---- Standard scatter (materials.scatter, Material.cs:75-119) -----
    roughness = (1.0 - gloss) * (1.0 - gloss)
    csx, csy, csz = _cosine_hemisphere(ua, ub, nx, ny, nz)
    rnx = nx + (csx - nx) * roughness
    rny = ny + (csy - ny) * roughness
    rnz = nz + (csz - nz) * roughness
    rnx, rny, rnz = _normalize3(rnx, rny, rnz)
    rough = roughness > 0.0
    rnx = jnp.where(rough, rnx, nx)
    rny = jnp.where(rough, rny, ny)
    rnz = jnp.where(rough, rnz, nz)

    incident_cos = -_dot3(dx, dy, dz, rnx, rny, rnz)
    std_ior = PLASTIC_IOR + (METAL_IOR - PLASTIC_IOR) * metallic
    fresnel = _schlick(incident_cos, std_ior)
    cos_dn = _dot3(dx, dy, dz, nx, ny, nz)
    masking = _smith_masking(cos_dn, roughness)
    refl_chance = jnp.clip(fresnel * gloss * masking, 0.0, 1.0)

    spec_dot = _dot3(dx, dy, dz, rnx, rny, rnz)
    spx = dx - 2.0 * spec_dot * rnx
    spy = dy - 2.0 * spec_dot * rny
    spz = dz - 2.0 * spec_dot * rnz
    lmx, lmy, lmz = _cosine_hemisphere(uc, ud, nx, ny, nz)
    if cos_tsd is not None:
        # pre-drawn STBN cosine direction, tangent->world about the hit
        # normal (Tools.cs:30-46) then normalized (byte quantization
        # leaves the baked vectors at |v| = 1 +- 0.02); first bounce only
        tsx, tsy, tsz = cos_tsd
        (btx, bty, btz), (bbx, bby, bbz) = _basis(nx, ny, nz)
        wx = tsx * btx + tsy * nx + tsz * bbx
        wy = tsx * bty + tsy * ny + tsz * bby
        wz = tsx * btz + tsy * nz + tsz * bbz
        wx, wy, wz = _normalize3(wx, wy, wz)
        # cos_all: the in-kernel STBN fetch supplies a fresh flavored
        # cosine direction EVERY bounce (full RandomSource.cs:63-89
        # routing); the pre-drawn path only has the first bounce's
        fb = depth > -1.0 if cos_all else depth < 0.5
        lmx = jnp.where(fb, wx, lmx)
        lmy = jnp.where(fb, wy, lmy)
        lmz = jnp.where(fb, wz, lmz)

    take_spec = (refl_chance > 0.0) & (u_choice < refl_chance)
    take_metal = (metallic > 0.0) & (u_choice2 < metallic)
    spec_like = take_spec | take_metal
    sdx = jnp.where(spec_like, spx, lmx)
    sdy = jnp.where(spec_like, spy, lmy)
    sdz = jnp.where(spec_like, spz, lmz)
    srr = jnp.where(take_spec, 1.0, alb_r)
    srg = jnp.where(take_spec, 1.0, alb_g)
    srb = jnp.where(take_spec, 1.0, alb_b)
    std_events = (
        jnp.where((refl_chance > 0.0) & (refl_chance < 1.0), 1.0, 0.0)
        + jnp.where((metallic > 0.0) & (metallic < 1.0), 1.0, 0.0)
        + roughness * (refl_chance + (1.0 - refl_chance) * metallic)
        + (1.0 - refl_chance) * (1.0 - metallic)
    )

    if has_dielectrics:
        # ---- Dielectric (Material.cs:121-161) --------------------------
        d_roughness = 1.0 - gloss
        ssx, ssy, ssz = _unit_sphere(ua, ub)
        drx = nx + d_roughness * ssx
        dry = ny + d_roughness * ssy
        drz = nz + d_roughness * ssz
        drx, dry, drz = _normalize3(drx, dry, drz)
        ddot = _dot3(dx, dy, dz, drx, dry, drz)
        exiting = ddot > 0.0
        onx = jnp.where(exiting, -drx, drx)
        ony = jnp.where(exiting, -dry, dry)
        onz = jnp.where(exiting, -drz, drz)
        ior = parameter
        ni_over_nt = jnp.where(exiting, ior, 1.0 / ior)
        cosine = jnp.where(exiting, ior * ddot, -ddot)
        dt = _dot3(dx, dy, dz, onx, ony, onz)
        disc_r = 1.0 - ni_over_nt * ni_over_nt * (1.0 - dt * dt)
        can_refract = disc_r > 0.0
        sq_r = jnp.sqrt(jnp.where(can_refract, disc_r, 0.0))
        rfx = ni_over_nt * (dx - onx * dt) - onx * sq_r
        rfy = ni_over_nt * (dy - ony * dt) - ony * sq_r
        rfz = ni_over_nt * (dz - onz * dt) - onz * sq_r
        refl_prob = _schlick(cosine, ior)
        do_refract = can_refract & (u_choice > refl_prob)
        drefl_dot = _dot3(dx, dy, dz, drx, dry, drz)
        dlx = jnp.where(do_refract, rfx, dx - 2.0 * drefl_dot * drx)
        dly = jnp.where(do_refract, rfy, dy - 2.0 * drefl_dot * dry)
        dlz = jnp.where(do_refract, rfz, dz - 2.0 * drefl_dot * drz)

        is_diel = mtype > 0.5
        sdx = jnp.where(is_diel, dlx, sdx)
        sdy = jnp.where(is_diel, dly, sdy)
        sdz = jnp.where(is_diel, dlz, sdz)
        drr = jnp.where(do_refract, alb_r, 1.0)
        drg = jnp.where(do_refract, alb_g, 1.0)
        drb = jnp.where(do_refract, alb_b, 1.0)
        srr = jnp.where(is_diel, drr, srr)
        srg = jnp.where(is_diel, drg, srg)
        srb = jnp.where(is_diel, drb, srb)
        std_events = jnp.where(is_diel, 1.0 + d_roughness, std_events)
        perfect_f = jnp.where(is_diel, 1.0, perfect_f)

    if has_volumes:
        # isotropic in-medium scatter (Material.cs:163-168): unit-sphere
        # direction, medium albedo as reflectance, 2 random events
        if vol_dir is not None:
            # baked STBN unitvec3 set, already [-1,1]-remapped by
            # stbn.load_stbn (byte quantization: |v| = 1±0.02)
            vsx, vsy, vsz = _normalize3(*vol_dir)
        else:
            vsx, vsy, vsz = _unit_sphere(uc, ud)
        sdx = jnp.where(vol_scatter, vsx, sdx)
        sdy = jnp.where(vol_scatter, vsy, sdy)
        sdz = jnp.where(vol_scatter, vsz, sdz)
        srr = jnp.where(vol_scatter, v_ar, srr)
        srg = jnp.where(vol_scatter, v_ag, srg)
        srb = jnp.where(vol_scatter, v_ab, srb)
        std_events = jnp.where(vol_scatter, 2.0, std_events)

    # ---- sky (environment.sample_sky gradient / cubemap branch) --------
    if cube_c is not None:
        # major-axis cubemap lookup (environment._sample_cubemap /
        # Texture.cs:172-210), fetched with the image-plane one-hot dots
        cube_ref, (c_w, c_h) = cube_c
        cax, cay, caz = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
        cuse_x = (cax >= cay) & (cax >= caz)
        cuse_y = (cay > cax) & (cay >= caz)
        # face offset (0 positive / 1 negative) kept f32 for Mosaic
        neg_off = jnp.where(
            cuse_x,
            jnp.where(dx >= 0.0, 0.0, 1.0),
            jnp.where(
                cuse_y,
                jnp.where(dy >= 0.0, 0.0, 1.0),
                jnp.where(dz >= 0.0, 0.0, 1.0),
            ),
        )
        cu_num = jnp.where(
            cuse_x,
            jnp.where(dx >= 0.0, -dz, dz),
            jnp.where(cuse_y, dx, jnp.where(dz >= 0.0, dx, -dx)),
        )
        cv_num = jnp.where(
            cuse_x, -dy,
            jnp.where(cuse_y, jnp.where(dy >= 0.0, dz, -dz), -dy),
        )
        cmajor = jnp.maximum(
            jnp.where(cuse_x, cax, jnp.where(cuse_y, cay, caz)), 1e-12
        )
        cuu = cu_num / cmajor
        cvv = cv_num / cmajor
        face = jnp.where(cuse_x, 0.0, jnp.where(cuse_y, 2.0, 4.0)) + neg_off
        ccx = jnp.minimum(
            ((cuu + 1.0) * (c_w / 2.0)).astype(jnp.int32), c_w - 1
        )
        ccy = jnp.minimum(
            ((cvv + 1.0) * (c_h / 2.0)).astype(jnp.int32), c_h - 1
        )
        crow = face.astype(jnp.int32) * c_h + ccy  # (1, T)
        cw_pad = cube_ref.shape[0] // 3
        cfh_pad = cube_ref.shape[1]
        cr_iota = jax.lax.broadcasted_iota(jnp.int32, (cfh_pad, t_cols), 0)
        cr_hot = (cr_iota == crow).astype(jnp.float32)
        cc_iota = jax.lax.broadcasted_iota(jnp.int32, (cw_pad, t_cols), 0)
        cc_hot = (cc_iota == ccx).astype(jnp.float32)
        csky = []
        for c in range(3):
            col = jax.lax.dot_general(
                cube_ref[c * cw_pad : (c + 1) * cw_pad, :], cr_hot,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (W_pad, T)
            csky.append(jnp.sum(cc_hot * col, axis=0, keepdims=True))
        skr, skg, skb = csky
    elif sky_on:
        tsky = 0.5 * (dy + 1.0)
        skr = sky_b[0] + (sky_t[0] - sky_b[0]) * tsky
        skg = sky_b[1] + (sky_t[1] - sky_b[1]) * tsky
        skb = sky_b[2] + (sky_t[2] - sky_b[2]) * tsky
    else:
        skr = skg = skb = zero

    # ---- fold (integrator._bounce_once) --------------------------------
    emr = jnp.where(scatter_mask, em_r, jnp.where(miss, skr, 0.0))
    emg = jnp.where(scatter_mask, em_g, jnp.where(miss, skg, 0.0))
    emb = jnp.where(scatter_mask, em_b, jnp.where(miss, skb, 0.0))
    rx = rx + thx * emr
    ry = ry + thy * emg
    rz = rz + thz * emb
    thx = jnp.where(scatter_mask, thx * srr, thx)
    thy = jnp.where(scatter_mask, thy * srg, thy)
    thz = jnp.where(scatter_mask, thz * srb, thz)

    # ---- AOV capture ----------------------------------------------------
    got_b = got > 0.5
    is_depth0 = depth == 0
    cap0 = scatter_mask & is_depth0 & jnp.logical_not(got_b)
    first_nonspec = (
        scatter_mask & jnp.logical_not(got_b) & (perfect_f < 0.5)
    )
    capn = cap0 | first_nonspec
    anx = jnp.where(capn, nx, anx)
    any_ = jnp.where(capn, ny, any_)
    anz = jnp.where(capn, nz, anz)
    aax = jnp.where(first_nonspec, em_r + srr, aax)
    aay = jnp.where(first_nonspec, em_g + srg, aay)
    aaz = jnp.where(first_nonspec, em_b + srb, aaz)
    sky_first = miss & jnp.logical_not(got_b)
    anx = jnp.where(sky_first, -dx, anx)
    any_ = jnp.where(sky_first, -dy, any_)
    anz = jnp.where(sky_first, -dz, anz)
    aax = jnp.where(sky_first, skr, aax)
    aay = jnp.where(sky_first, skg, aay)
    aaz = jnp.where(sky_first, skb, aaz)
    got = jnp.where(first_nonspec | sky_first, 1.0, got)

    # ---- events + ray count ---------------------------------------------
    depth_weight = jnp.exp2(-depth.astype(jnp.float32))
    step_events = jnp.where(scatter_mask, std_events, 0.0)
    if has_volumes:
        # ProbabilisticHit costs one event (SampleBatchJob.cs:332)
        step_events = step_events + jnp.where(
            is_active & vol_candidate, 1.0, 0.0
        )
    events = events + step_events * depth_weight
    rays_cast = rays_cast + jnp.where(is_active, 1.0, 0.0)

    # ---- advance ---------------------------------------------------------
    off_sign = jnp.where(
        _dot3(sdx, sdy, sdz, nx, ny, nz) >= 0.0, 1.0, -1.0
    )
    ox = jnp.where(scatter_mask, px + SELF_EPS * off_sign * nx, ox)
    oy = jnp.where(scatter_mask, py + SELF_EPS * off_sign * ny, oy)
    oz = jnp.where(scatter_mask, pz + SELF_EPS * off_sign * nz, oz)
    dx = jnp.where(scatter_mask, sdx, dx)
    dy = jnp.where(scatter_mask, sdy, dy)
    dz = jnp.where(scatter_mask, sdz, dz)
    if has_volumes:
        # pass-through / own-exit lanes advance past the boundary without
        # scattering (one bounce iteration, integrator deviation note)
        adv = is_active & skip
        ox = jnp.where(adv, ox + (skip_t + SELF_EPS) * dx, ox)
        oy = jnp.where(adv, oy + (skip_t + SELF_EPS) * dy, oy)
        oz = jnp.where(adv, oz + (skip_t + SELF_EPS) * dz, oz)
        # medium bookkeeping: enter on scatter, leave on skip, keep when
        # scattering off a solid while inside
        take = is_active & vol_scatter
        leave = is_active & skip
        in_id = jnp.where(take, v_id, jnp.where(leave, -1.0, in_id))
        in_den = jnp.where(take, v_den, in_den)
        in_ar = jnp.where(take, v_ar, in_ar)
        in_ag = jnp.where(take, v_ag, in_ag)
        in_ab = jnp.where(take, v_ab, in_ab)
        in_er = jnp.where(take, v_er, in_er)
        in_eg = jnp.where(take, v_eg, in_eg)
        in_eb = jnp.where(take, v_eb, in_eb)
    active = jnp.where(miss, 0.0, active)
    valid = jnp.where(miss, 1.0, valid)

    out = (ox, oy, oz, dx, dy, dz, thx, thy, thz, rx, ry, rz,
           active, valid, anx, any_, anz, aax, aay, aaz,
           got, events, rays_cast,
           in_id, in_den, in_ar, in_ag, in_ab, in_er, in_eg, in_eb,
           ptime)
    if want_winner:
        # tape row for the differentiable replay (megatrace_replay):
        # combined winner index in the KERNEL's padded row space —
        # spheres [0, s_pad), rects [s_pad, s_pad+R_pad), boxes after —
        # plus the hit flag.  The replay rebuilds the same combined table
        # (same pack layouts), so the code indexes it directly.
        widx = best_idx.astype(jnp.float32)
        if rect_c is not None:
            widx = jnp.where(
                rect_wins, jnp.float32(s) + r_idx.astype(jnp.float32), widx
            )
        if box_c is not None:
            r_rows_n = rect_c[0].shape[0] if rect_c is not None else 0
            widx = jnp.where(
                box_wins,
                jnp.float32(s + r_rows_n) + b_idx.astype(jnp.float32),
                widx,
            )
        if tri_c is not None and not tri_stream:
            # triangles append after the box pad in the combined row space
            r_rows_n = rect_c[0].shape[0] if rect_c is not None else 0
            b_rows_n = box_c[0].shape[0] if box_c is not None else 0
            widx = jnp.where(
                tri_wins, jnp.float32(s + r_rows_n + b_rows_n) + tri_idx,
                widx,
            )
        return out, (widx, jnp.where(hit, 1.0, 0.0))
    return out


def _trace_loop(
    carry0, consts, seed_ref, lane_row, salt_base, *, trace_depth: int,
    t_min: float, has_dielectrics: bool, sky_on: bool, hw_prng: bool,
    early_out: bool, has_volumes: bool = False, has_motion: bool = False,
):
    """Run the depth loop over _bounce_step with per-bounce uniforms."""
    t_cols = carry0[0].shape[1]

    def bounce(depth, carry):
        if hw_prng:
            u = _uniforms_hw((8, t_cols))
        else:
            u = _uniforms_hash(
                (8, t_cols), seed_ref[0, 0],
                salt_base + depth * jnp.int32(26699), lane_row,
            )
        return _bounce_step(
            depth, carry, u, consts,
            t_min=t_min, has_dielectrics=has_dielectrics, sky_on=sky_on,
            has_volumes=has_volumes, has_motion=has_motion,
        )

    if early_out:
        def bounce_or_skip(depth, carry):
            # Whole-tile early-out (the reference's cancellation-token /
            # sky-termination early exits, SampleBatchJob.cs:61-62,341):
            # once every lane in a tile has terminated, remaining bounces
            # are free.
            return jax.lax.cond(
                jnp.max(carry[12]) > 0.0, lambda c: bounce(depth, c),
                lambda c: c, carry,
            )
    else:
        bounce_or_skip = bounce

    return jax.lax.fori_loop(0, trace_depth, bounce_or_skip, carry0)


def _kernel(
    seed_ref, sky_ref, rays_ref, sph_ref, rec_ref, out_ref,
    *, trace_depth: int, t_min: float, has_dielectrics: bool, sky_on: bool,
    hw_prng: bool = True, early_out: bool = True,
):
    if hw_prng:
        # decorrelate tiles by the tile's first global lane id (rays row 7)
        pltpu.prng_seed(seed_ref[0, 0] + rays_ref[7, 0].astype(jnp.int32))

    consts = (
        (sph_ref[:, 0:1], sph_ref[:, 1:2], sph_ref[:, 2:3],
         sph_ref[:, 3:4], rec_ref, None),
        None,  # rects (batch kernel only)
        None,  # boxes
        None,  # triangles
        None,  # textures
        None,  # cubemap sky
        (sky_ref[0, 0], sky_ref[0, 1], sky_ref[0, 2]),
        (sky_ref[0, 3], sky_ref[0, 4], sky_ref[0, 5]),
    )
    t_shape = rays_ref[0:1, :].shape  # (1, T)
    zero = jnp.zeros(t_shape, jnp.float32)
    one = jnp.ones(t_shape, jnp.float32)

    carry0 = (
        rays_ref[0:1, :], rays_ref[1:2, :], rays_ref[2:3, :],  # origin
        rays_ref[3:4, :], rays_ref[4:5, :], rays_ref[5:6, :],  # direction
        one, one, one,  # throughput
        zero, zero, zero,  # radiance
        rays_ref[6:7, :],  # active (0/1)
        zero,  # valid
        zero, zero, zero,  # aov normal
        zero, zero, zero,  # aov albedo
        zero,  # got_nonspecular
        zero,  # events
        zero,  # pixel rays
        -one,  # inside-volume material id (-1 = none)
        zero, zero, zero, zero, zero, zero, zero,  # medium record rows
        zero,  # shutter time (static scenes)
    )

    carry = _trace_loop(
        carry0, consts, seed_ref, rays_ref[7:8, :], jnp.int32(0),
        trace_depth=trace_depth, t_min=t_min,
        has_dielectrics=has_dielectrics, sky_on=sky_on,
        hw_prng=hw_prng, early_out=early_out,
    )
    (_, _, _, _, _, _, _, _, _, rx, ry, rz,
     _, valid, anx, any_, anz, aax, aay, aaz, _, events, rays_cast,
     *_vol) = carry

    out_ref[0:1, :] = jnp.where(valid > 0.5, rx, 0.0)
    out_ref[1:2, :] = jnp.where(valid > 0.5, ry, 0.0)
    out_ref[2:3, :] = jnp.where(valid > 0.5, rz, 0.0)
    out_ref[3:4, :] = valid
    out_ref[4:5, :] = anx
    out_ref[5:6, :] = any_
    out_ref[6:7, :] = anz
    out_ref[7:8, :] = aax
    out_ref[8:9, :] = aay
    out_ref[9:10, :] = aaz
    out_ref[10:11, :] = events
    out_ref[11:12, :] = rays_cast
    out_ref[12:16, :] = jnp.zeros((4, rays_cast.shape[1]), jnp.float32)


# ---------------------------------------------------------------------------
# Fused sample-batch kernel: the WHOLE SampleBatchJob per pixel tile —
# camera ray generation + sample loop + bounce loop + accumulation, one
# pallas_call per batch (reference: SampleBatchJob.Execute,
# SampleBatchJob.cs:59-164, including the thin-lens View.GetRay at
# View.cs:38-48 and the per-pixel accumulation at :72-78,159).
# ---------------------------------------------------------------------------

BATCH_OUT_ROWS = 24


def sphere_pad_count(s: int) -> int:
    """Padded sphere-table rows (at least one pad block so sphere-free
    rect/box-only scenes still carry a valid never-hit table).  ONE
    definition shared with megatrace_replay, whose tape codes index the
    kernel's padded row space."""
    return max(SPHERE_PAD, -(-s // SPHERE_PAD) * SPHERE_PAD)


def aux_pad_count(k: int) -> int:
    """Padded rect/box-table rows (pack_aux_tables layout)."""
    return max(AUX_PAD, -(-k // AUX_PAD) * AUX_PAD)


def _pack_scene_tables(centers, radii, records, move_offsets=None):
    """Pad sphere + material-record tables into the kernels' VMEM layout
    (shared by megatrace and sample_batch — ONE definition so the two
    kernels can never disagree on the packed layout).

    Static scenes: sph col 3 = |c|^2 - r^2.  Moving scenes
    (move_offsets given): col 3 = -r^2 (|c(t)|^2 is ray-dependent and
    computed in-kernel), cols 4-6 = move offset; rec rows 16-18 mirror the
    offsets for winner-normal recomputation."""
    s = centers.shape[0]
    s_pad = sphere_pad_count(s)

    sph = jnp.full((s_pad, 8), PAD_CENTER, jnp.float32)
    sph = sph.at[:s, 0:3].set(centers)
    if move_offsets is None:
        c_sq = jnp.sum(centers * centers, axis=-1)
        sph = sph.at[:s, 3].set(c_sq - radii * radii)
    else:
        sph = sph.at[:s, 3].set(-radii * radii)
        sph = sph.at[:, 4:7].set(0.0)
        sph = sph.at[:s, 4:7].set(move_offsets)
    sph = sph.at[s:, 3].set(jnp.inf)  # pad rows can never hit

    safe_r = jnp.where(radii == 0.0, 1.0, radii)
    rec_t = jnp.zeros((REC_COLS, s_pad), jnp.float32)
    rec_t = rec_t.at[: records.shape[1], :s].set(records.T)
    rec_t = rec_t.at[12:15, :s].set(centers.T)
    rec_t = rec_t.at[15, :s].set(1.0 / safe_r)
    if move_offsets is not None:
        rec_t = rec_t.at[16:19, :s].set(move_offsets.T)
    return sph, rec_t, s_pad


def pack_sphere_blocks(centers, radii, move_offsets=None):
    """(1, n_blk*8) SMEM row of per-SPH_BLOCK sphere AABBs over the
    PADDED row space (cols blk*8+0..2 min xyz, +3..5 max xyz; pad-only
    blocks carry the degenerate 1e30 far point).  Motion-swept: a moving
    sphere's box covers center..center+offset (unit shutter).  Callers
    should deliver spheres in a spatially-coherent (Morton) order —
    SceneBuilder.build(sort_spheres=True) — or the block boxes sprawl
    and the cull never fires."""
    s = centers.shape[0]
    s_pad = sphere_pad_count(s)
    n_blk = -(-s_pad // SPH_BLOCK)
    lo = centers - radii[:, None]
    hi = centers + radii[:, None]
    if move_offsets is not None:
        lo = jnp.minimum(lo, lo + move_offsets)
        hi = jnp.maximum(hi, hi + move_offsets)
    rows = n_blk * SPH_BLOCK
    pad_lo = jnp.full((rows, 3), jnp.inf, jnp.float32).at[:s].set(lo)
    pad_hi = jnp.full((rows, 3), -jnp.inf, jnp.float32).at[:s].set(hi)
    blk_lo = jnp.min(pad_lo.reshape(n_blk, SPH_BLOCK, 3), axis=1) - 1e-4
    blk_hi = jnp.max(pad_hi.reshape(n_blk, SPH_BLOCK, 3), axis=1) + 1e-4
    real = (
        jnp.arange(n_blk, dtype=jnp.int32) * SPH_BLOCK < s
    )[:, None]
    far = jnp.full((3,), 1e30, jnp.float32)
    blk_lo = jnp.where(real, blk_lo, far)
    blk_hi = jnp.where(real, blk_hi, far)
    return jnp.concatenate(
        [blk_lo, blk_hi, jnp.zeros((n_blk, 2), jnp.float32)], axis=1
    ).reshape(1, n_blk * 8)


def _pack_sky_row(sky_bottom, sky_top):
    return jnp.concatenate(
        [sky_bottom, sky_top, jnp.zeros((2,), jnp.float32)]
    ).astype(jnp.float32).reshape(1, 8)


AUX_PAD = 8  # f32 sublane multiple for the rect/box tables
AUX_REC_ROWS = 24


def pack_aux_tables(scene, packed_materials):
    """(rect_tables, box_tables) for sample_batch, or None where the scene
    has none of that kind.

    rect geo (R_pad, 16): quat xyzw | pos | xy_from | xy_to; rec
    (24, R_pad): material rows 0-10 | world normal 11-13 (rects have a
    constant normal: rotated local +Z, Entity.cs:65).
    box geo (B_pad, 16): quat | pos | extents; rec (24, B_pad): material
    rows 0-10 | quat 11-14 | pos 15-17 | extents 18-20 (the winner's
    normal is recomputed in-kernel from these).  Pad rows can never hit
    (rect from>to; box extents 0)."""
    from raytracing_in_one_weekend_tpu.core import math3

    rect_tables = None
    rct = scene.rects
    if rct.rot.shape[0] > 0:
        r = rct.rot.shape[0]
        r_pad = aux_pad_count(r)
        # normalize at pack time: the kernel/replay quat math assumes
        # unit quats, and the scale gauge must be dead for raw-quat
        # gradients (matches ops/geometry's per-call normalization)
        rrot = math3.quat_normalize(rct.rot)
        geo = jnp.zeros((r_pad, 16), jnp.float32)
        geo = geo.at[:, 3].set(1.0)  # identity quats on pad rows
        geo = geo.at[:, 7:9].set(1.0)  # pad: from(1,1) > to(0,0) never hits
        geo = geo.at[:r, 0:4].set(rrot)
        geo = geo.at[:r, 4:7].set(rct.pos)
        geo = geo.at[:r, 7:9].set(rct.xy_from)
        geo = geo.at[:r, 9:11].set(rct.xy_to)
        normal = math3.quat_rotate(
            rrot, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (r, 3))
        )
        rec = jnp.zeros((AUX_REC_ROWS, r_pad), jnp.float32)
        rec = rec.at[:11, :r].set(packed_materials[rct.material][:, :11].T)
        rec = rec.at[11:14, :r].set(normal.T)
        rec = rec.at[14, :r].set(rct.material.astype(jnp.float32))
        rect_tables = (geo, rec)

    box_tables = None
    box = scene.boxes
    if box.rot.shape[0] > 0:
        b = box.rot.shape[0]
        b_pad = aux_pad_count(b)
        brot = math3.quat_normalize(box.rot)
        geo = jnp.zeros((b_pad, 16), jnp.float32)
        geo = geo.at[:, 3].set(1.0)
        geo = geo.at[:b, 0:4].set(brot)
        geo = geo.at[:b, 4:7].set(box.pos)
        geo = geo.at[:b, 7:10].set(box.extents)  # pad rows keep extents 0
        rec = jnp.zeros((AUX_REC_ROWS, b_pad), jnp.float32)
        rec = rec.at[:11, :b].set(packed_materials[box.material][:, :11].T)
        rec = rec.at[11:15, :b].set(brot.T)
        rec = rec.at[15:18, :b].set(box.pos.T)
        rec = rec.at[18:21, :b].set(box.extents.T)
        rec = rec.at[21, :b].set(box.material.astype(jnp.float32))
        box_tables = (geo, rec)

    return rect_tables, box_tables


def pack_sphere_records(scene, packed_materials):
    """(S, 12) sphere records: packed material rows 0-10 + material id —
    the ONE definition of the layout consumed by sample_batch / the
    replay (tests import it too)."""
    return jnp.concatenate(
        [
            packed_materials[scene.spheres.material][:, :11],
            scene.spheres.material[:, None].astype(jnp.float32),
        ],
        axis=1,
    )


def pack_tri_tables(scene, packed_materials):
    """Triangle tables for sample_batch, or None when the scene has none.

    geo (T_pad, 16): edge_a xyz | edge_b xyz | vert0 xyz (world-space,
    Entity.cs:91-97 — triangles skip the entity transform).  rec
    (TRI_REC_ROWS, T_pad): material rows 0-10 | material id 11 |
    per-vertex normals 12-14/15-17/18-20 | per-vertex u 21-23 / v 24-26
    for the in-kernel barycentric lerps.  Pad rows keep zero edges
    (det == 0: never hit)."""
    tri = scene.triangles
    t = tri.vert0.shape[0]
    if t == 0:
        return None
    edge_a, edge_b, vert0 = tri.edge_a, tri.edge_b, tri.vert0
    t_pad = max(TRI_PAD, -(-t // TRI_PAD) * TRI_PAD)
    geo = jnp.zeros((t_pad, 16), jnp.float32)
    geo = geo.at[:t, 0:3].set(edge_a)
    geo = geo.at[:t, 3:6].set(edge_b)
    geo = geo.at[:t, 6:9].set(vert0)
    # per-BLOCK AABBs in cols 9-15 of each block's first row (min xyz |
    # max xyz over that TRI_BLOCK chunk): the kernel slab-tests each
    # block and lax.cond-skips its Möller–Trumbore sweep when no active
    # lane can hit it.  SceneBuilder.build() Morton-sorts triangle rows
    # by centroid at scene compile (scene/scene.py::_morton_perm), so
    # blocks are spatially compact and the AABBs tight regardless of
    # mesh append order — this packer just chunks rows in order.
    v0 = vert0
    v1 = vert0 + edge_b
    v2 = vert0 + edge_a
    for st in range(0, t_pad, TRI_BLOCK):
        en = min(st + TRI_BLOCK, t_pad)
        lo, hi = st, min(en, t)
        if lo >= t:
            # pad-only block: a degenerate far-away point never passes the
            # slab test (it is symmetric in the two corners, so an
            # "inverted" min>max box would behave like a real box — a
            # point at 1e30 instead gives b_near==b_far==~1e30 only for
            # rays aimed exactly at it, and even then beyond any hit t)
            geo = geo.at[st, 9:12].set(1e30)
            geo = geo.at[st, 12:15].set(1e30)
            continue
        vs = jnp.concatenate([v0[lo:hi], v1[lo:hi], v2[lo:hi]], axis=0)
        geo = geo.at[st, 9:12].set(jnp.min(vs, axis=0) - 1e-4)
        geo = geo.at[st, 12:15].set(jnp.max(vs, axis=0) + 1e-4)
    material, normals, uvs = tri.material, tri.normals, tri.uvs
    rec = jnp.zeros((TRI_REC_ROWS, t_pad), jnp.float32)
    rec = rec.at[:11, :t].set(packed_materials[material][:, :11].T)
    rec = rec.at[11, :t].set(material.astype(jnp.float32))
    rec = rec.at[12:15, :t].set(normals[:, :, 0].T)
    rec = rec.at[15:18, :t].set(normals[:, :, 1].T)
    rec = rec.at[18:21, :t].set(normals[:, :, 2].T)
    rec = rec.at[21:24, :t].set(uvs[:, 0, :].T)
    rec = rec.at[24:27, :t].set(uvs[:, 1, :].T)
    return geo, rec


def pack_tri_stream_tables(scene, packed_materials):
    """HBM-streamed triangle tables for meshes beyond VMEM residence
    (TRI_MAX < count <= TRI_STREAM_MAX), or None when the scene has no
    triangles.

    Returns (tbl (n_blk * TRI_ROWS, 128), aabb_row (1, n_blk * 8),
    sup_row (1, n_sup * 8)).  tbl stays in HBM (pl.ANY) and is DMA'd one
    TRI_ROWS chunk (= TRI_BLOCK triangles) at a time — TRI_SLOT
    triangles per 128-col row, each in a TRI_SLOT_COLS slot: slot cols
    0-8 = edge_a | edge_b | vert0, cols 9-40 = the pack_tri_tables
    record TRANSPOSED (slot j of row b*TRI_ROWS+s holds triangle
    b*TRI_BLOCK + j*TRI_ROWS + s).  The 128-col row width keeps
    every DMA slice aligned to the f32 lane tiling (Mosaic rejects HBM
    slices whose minor dim is not a 128 multiple); packing 3 slots per
    row cuts streamed bytes 3x vs one-triangle-per-row.  aabb_row rides
    in SMEM: cols blk*8+0..2 = min xyz, +3..5 = max xyz of that block
    (pad-only blocks carry a degenerate far point, see pack_tri_tables).
    sup_row is the second cull level: the union AABB of each run of
    TRI_SUP consecutive blocks, so the kernel skips whole super-blocks
    with one slab test and per-block work is O(blocks near the ray),
    not O(all blocks).  n_blk is padded to a TRI_SUP multiple (and tbl
    to matching rows) so both loops have static extents.
    """
    tri = scene.triangles
    t = tri.vert0.shape[0]
    if t == 0:
        return None
    edge_a, edge_b, vert0 = tri.edge_a, tri.edge_b, tri.vert0
    material, normals, uvs = tri.material, tri.normals, tri.uvs

    # Morton-sort triangles by centroid so each TRI_BLOCK is a SPATIAL
    # cluster with a tight AABB — in OBJ file order the block boxes
    # sprawl and the per-block cull (and its DMA skip) almost never
    # fires.  10 bits/axis over the mesh bounds; ~0 cost per batch vs
    # the stream sweep.
    cen = vert0 + (edge_a + edge_b) * (1.0 / 3.0)
    lo = jnp.min(cen, axis=0)
    span = jnp.maximum(jnp.max(cen, axis=0) - lo, 1e-30)
    q = jnp.clip((cen - lo) / span * 1023.0, 0.0, 1023.0).astype(jnp.uint32)

    def _spread(x):
        x = (x | (x << jnp.uint32(16))) & jnp.uint32(0x030000FF)
        x = (x | (x << jnp.uint32(8))) & jnp.uint32(0x0300F00F)
        x = (x | (x << jnp.uint32(4))) & jnp.uint32(0x030C30C3)
        x = (x | (x << jnp.uint32(2))) & jnp.uint32(0x09249249)
        return x

    key = (
        (_spread(q[:, 0]) << jnp.uint32(2))
        | (_spread(q[:, 1]) << jnp.uint32(1))
        | _spread(q[:, 2])
    )
    order = jnp.argsort(key)
    edge_a, edge_b, vert0 = edge_a[order], edge_b[order], vert0[order]
    material, normals, uvs = material[order], normals[order], uvs[order]

    n_blk = -(-t // TRI_BLOCK)
    n_blk = -(-n_blk // TRI_SUP) * TRI_SUP
    t_pad = n_blk * TRI_BLOCK
    tbl = jnp.zeros((t_pad, TRI_SLOT_COLS), jnp.float32)
    tbl = tbl.at[:t, 0:3].set(edge_a)
    tbl = tbl.at[:t, 3:6].set(edge_b)
    tbl = tbl.at[:t, 6:9].set(vert0)
    v0 = vert0
    v1 = vert0 + edge_b
    v2 = vert0 + edge_a
    # vectorized block/super AABB reduction (a Python per-block loop
    # unrolls into thousands of ops inside the render jit at the
    # TRI_STREAM_MAX scale): per-triangle extents padded with +/-inf
    # sentinels, reshaped (n_blk, TRI_BLOCK, 3) and min/maxed.  Blocks
    # (and supers) with no real rows get the degenerate 1e30 far-POINT
    # marker — never an inverted min>max box, which the symmetric slab
    # test would treat as real.
    tri_lo = jnp.minimum(jnp.minimum(v0, v1), v2)
    tri_hi = jnp.maximum(jnp.maximum(v0, v1), v2)
    pad_lo = jnp.full((t_pad, 3), jnp.inf, jnp.float32).at[:t].set(tri_lo)
    pad_hi = jnp.full((t_pad, 3), -jnp.inf, jnp.float32).at[:t].set(tri_hi)
    blk_lo = jnp.min(pad_lo.reshape(n_blk, TRI_BLOCK, 3), axis=1) - 1e-4
    blk_hi = jnp.max(pad_hi.reshape(n_blk, TRI_BLOCK, 3), axis=1) + 1e-4
    blk_real = (
        jnp.arange(n_blk, dtype=jnp.int32) * TRI_BLOCK < t
    )[:, None]
    far = jnp.full((3,), 1e30, jnp.float32)
    blk_lo = jnp.where(blk_real, blk_lo, far)
    blk_hi = jnp.where(blk_real, blk_hi, far)
    aabb = jnp.concatenate(
        [blk_lo, blk_hi, jnp.zeros((n_blk, 2), jnp.float32)], axis=1
    ).reshape(1, n_blk * 8)
    n_sup = n_blk // TRI_SUP
    sup_lo = jnp.min(
        jnp.where(blk_real, blk_lo, jnp.inf).reshape(n_sup, TRI_SUP, 3),
        axis=1,
    )
    sup_hi = jnp.max(
        jnp.where(blk_real, blk_hi, -jnp.inf).reshape(n_sup, TRI_SUP, 3),
        axis=1,
    )
    sup_real = blk_real.reshape(n_sup, TRI_SUP).any(axis=1)[:, None]
    sup_lo = jnp.where(sup_real, sup_lo, far)
    sup_hi = jnp.where(sup_real, sup_hi, far)
    sup = jnp.concatenate(
        [sup_lo, sup_hi, jnp.zeros((n_sup, 2), jnp.float32)], axis=1
    ).reshape(1, n_sup * 8)
    r = TRI_STREAM_REC_BASE
    tbl = tbl.at[:t, r : r + 11].set(packed_materials[material][:, :11])
    tbl = tbl.at[:t, r + 11].set(material.astype(jnp.float32))
    tbl = tbl.at[:t, r + 12 : r + 15].set(normals[:, :, 0])
    tbl = tbl.at[:t, r + 15 : r + 18].set(normals[:, :, 1])
    tbl = tbl.at[:t, r + 18 : r + 21].set(normals[:, :, 2])
    tbl = tbl.at[:t, r + 21 : r + 24].set(uvs[:, 0, :])
    tbl = tbl.at[:t, r + 24 : r + 27].set(uvs[:, 1, :])
    # Interleave TRI_SLOT per-triangle rows into each 128-col streamed
    # row: slot j of packed row (b*TRI_ROWS + s) holds triangle
    # b*TRI_BLOCK + j*TRI_ROWS + s, so a block's TRI_BLOCK triangles
    # occupy exactly TRI_ROWS rows and the per-block DMA moves 1/TRI_SLOT
    # the bytes of the one-triangle-per-row layout (the sweep is
    # bandwidth-bound — BENCHMARKS.md dead ends).
    packed = (
        tbl.reshape(n_blk, TRI_SLOT, TRI_ROWS, TRI_SLOT_COLS)
        .transpose(0, 2, 1, 3)
        .reshape(n_blk * TRI_ROWS, TRI_SLOT * TRI_SLOT_COLS)
    )
    out = jnp.zeros((n_blk * TRI_ROWS, 128), jnp.float32)
    out = out.at[:, : TRI_SLOT * TRI_SLOT_COLS].set(packed)
    return out, aabb, sup


def pack_texture_tables(scene):
    """Per-MATERIAL albedo-texture tables for the in-kernel texture eval,
    or None when the scene has no procedural textures.

    Returns (texrec (TEX_ROWS, M_pad), perlin (8, 256) | None,
    img (3*W_pad, AH_pad) | None, (img_w, img_h)).

    texrec rows: 0 albedo TextureType | 1-3 main color | 4-6 secondary |
    7 parameter (checker/noise frequency) | 8 atlas row base
    (image_index * H).  perlin rows: 0-2 perm_x/y/z | 3-5 random-vector
    xyz (PerlinNoiseData.cs tables as f32; values are small ints / unit
    components, exact in f32).  img: per-channel (W_pad, AH_pad) planes
    stacked on rows — texel (a, y, x, c) lives at img[c*W_pad + x,
    a*H + y], fetched by two one-hot contractions (row dot then column
    mask).  Scope gate: scene_eligible(allow_textures=True) requires
    SceneFlags.procedural_albedo_only."""
    if not scene.flags.has_procedural_textures:
        return None
    tex = scene.textures
    mats = scene.materials
    m = mats.type.shape[0]
    m_pad = max(MAT_PAD, -(-m // MAT_PAD) * MAT_PAD)

    tid = mats.albedo_tex
    h = tex.atlas.shape[1] if tex.atlas is not None else 0
    texrec = jnp.zeros((TEX_ROWS, m_pad), jnp.float32)
    texrec = texrec.at[0, :m].set(tex.type[tid].astype(jnp.float32))
    texrec = texrec.at[1:4, :m].set(tex.main_color[tid].T)
    texrec = texrec.at[4:7, :m].set(tex.secondary_color[tid].T)
    texrec = texrec.at[7, :m].set(tex.parameter[tid])
    texrec = texrec.at[8, :m].set(
        (jnp.clip(tex.image_index[tid], 0, None) * h).astype(jnp.float32)
    )

    perlin = None
    if tex.perlin is not None:
        p = tex.perlin
        perlin = jnp.zeros((8, 256), jnp.float32)
        perlin = perlin.at[0, :].set(p.perm_x.astype(jnp.float32))
        perlin = perlin.at[1, :].set(p.perm_y.astype(jnp.float32))
        perlin = perlin.at[2, :].set(p.perm_z.astype(jnp.float32))
        perlin = perlin.at[3:6, :].set(p.random_vectors.T)

    img = None
    dims = (0, 0)
    if tex.atlas is not None:
        a, ih, iw = tex.atlas.shape[0], tex.atlas.shape[1], tex.atlas.shape[2]
        w_pad = -(-iw // 8) * 8
        ah_pad = -(-(a * ih) // 128) * 128
        img = jnp.zeros((3 * w_pad, ah_pad), jnp.float32)
        # atlas (A, H, W, 3) -> per-channel (W, A*H)
        flat = tex.atlas.reshape(a * ih, iw, 3)
        for c in range(3):
            img = img.at[c * w_pad : c * w_pad + iw, : a * ih].set(
                flat[:, :, c].T
            )
        dims = (iw, ih)

    return texrec, perlin, img, dims


def pack_cubemap_table(scene):
    """Cubemap sky planes for the in-kernel lookup, or None.

    Returns (cube (3*W_pad, FH_pad), (w, h)) with FH = 6*h rows in
    +x,-x,+y,-y,+z,-z face order (Texture.cs:141-211): texel
    (face, y, x, c) at cube[c*W_pad + x, face*h + y]."""
    cm = scene.environment.cubemap
    if cm is None:
        return None
    f, h, w = cm.shape[0], cm.shape[1], cm.shape[2]
    w_pad = -(-w // 8) * 8
    fh_pad = -(-(f * h) // 128) * 128
    cube = jnp.zeros((3 * w_pad, fh_pad), jnp.float32)
    flat = cm.reshape(f * h, w, 3)
    for c in range(3):
        cube = cube.at[c * w_pad : c * w_pad + w, : f * h].set(flat[:, :, c].T)
    return cube, (w, h)


def pack_noise_uniforms(noise_state, count_in, width, height, samples):
    """Pre-draw the batch's pixel-correlated camera uniforms
    (randomsource.pixel_uniforms — EXACT wavefront sampler parity) for
    sample indices count_in + 0..samples-1, as (4*samples, N) rows
    [channel-major: row c*samples + k] for the kernel's per-lane one-hot
    fetch.  None for white noise."""
    if noise_state is None:
        return None
    from raytracing_in_one_weekend_tpu.core import randomsource

    draws = [
        randomsource.pixel_uniforms(
            noise_state, count_in.astype(jnp.int32) + k, width, height
        )
        for k in range(samples)
    ]  # samples x (N, 4)
    stacked = jnp.stack(draws)  # (samples, N, 4)
    return stacked.transpose(2, 0, 1).reshape(4 * samples, -1)


def pack_noise_cosine(noise_state, count_in, width, height, samples):
    """Pre-draw the batch's pixel-correlated FIRST-BOUNCE cosine scatter
    directions (randomsource.pixel_cosine — the real STBN
    unitvec3_cosine set, exact wavefront parity) as (3*samples, N) rows
    [channel-major: row c*samples + k].  None when the flavor carries no
    cosine set (white/blue, or synthesized fallback)."""
    if noise_state is None or noise_state.cosine is None:
        return None
    from raytracing_in_one_weekend_tpu.core import randomsource

    draws = [
        randomsource.pixel_cosine(
            noise_state, count_in.astype(jnp.int32) + k, width, height
        )
        for k in range(samples)
    ]  # samples x (N, 3)
    stacked = jnp.stack(draws)  # (samples, N, 3)
    return stacked.transpose(2, 0, 1).reshape(3 * samples, -1)


def pack_noise_tables(noise_state, temporal: int = 8):
    """Pack the sampler-flavor tables for the IN-KERNEL tile fetch, or
    None when the flavor has none.

    Returns (tbl (rows, 128) f32, meta) with meta a STATIC dict:
      size  — tile side (128 for the real STBN sets, 64 synthesized)
      T     — temporal slices kept (capped at `temporal`)
      cam   — row base of the 4 camera channels (4*T*size rows,
              channel-major: channel c slice t row y at
              cam + ((c*T)+t)*size + y)
      cos   — row base of the 3 cosine channels, or -1
      scal  — row base of the scalar set, or -1
      uv3   — row base of the 3 unitvec3 channels (isotropic volume
              scatter, RandomSource.cs:113-128), or -1

    Unlike pack_noise_uniforms/pack_noise_cosine (pre-drawn (C*samples,N)
    rows with per-pixel progressive counters — exact wavefront parity,
    but ~270MB of HBM per 64-spp cover batch plus a per-iteration
    samples-row one-hot fetch), the packed tables live once in VMEM
    (~4MB) and the kernel fetches by (iteration, purpose)-keyed tile
    roll — same spatial blue-noise property, draw counters keyed by
    iteration instead of per-pixel sample index (persistent lanes
    regenerate at different iterations, so per-pixel counters cannot be
    shared anyway)."""
    if noise_state is None:
        return None
    tiles = noise_state.tiles  # (T0, S, S, 4) — may be traced (jit)
    t0, size = tiles.shape[0], tiles.shape[1]
    if size > 256:
        return None
    # 256px tables (the blue-noise EXRs) split each tile row across
    # `halves` 128-col packed rows — Mosaic's lane tiling wants 128-col
    # reads; _stbn_rows concatenates the halves back per fetch.  Their
    # 4x-per-slice area also quadruples VMEM cost, so fewer temporal
    # slices ride in-kernel (~4MB either way)
    halves = max(1, size // 128)
    t = min(t0, temporal if halves == 1 else 2)
    blocks = [
        tiles[:t, :, :, c].reshape(t * size, size) for c in range(4)
    ]
    meta = {"size": size, "T": t, "cam": 0, "cos": -1, "scal": -1}
    rows = 4 * t * size
    if noise_state.cosine is not None:
        cos = noise_state.cosine
        assert cos.shape[1] == size
        assert min(cos.shape[0], temporal) == t  # matching slice counts
        meta["cos"] = rows
        for c in range(3):
            blocks.append(cos[:t, :, :, c].reshape(t * size, size))
        rows += 3 * t * size
    if noise_state.scalar is not None:
        scal = noise_state.scalar
        assert scal.shape[1] == size
        # channel-derived stacks (the Blue arm: slice = texture*4 +
        # channel, randomsource.make_noise_state) carry 4 slices per
        # tile — keep them all; same-family stacks (STBN) keep t
        ts = 4 * t if scal.shape[0] == 4 * t0 else t
        meta["scal"] = rows
        meta["scalT"] = ts
        blocks.append(scal[:ts].reshape(ts * size, size))
        rows += ts * size
    else:
        meta["scalT"] = t
    meta["uv3"] = -1
    if getattr(noise_state, "unitvec3", None) is not None:
        uv3 = noise_state.unitvec3
        assert uv3.shape[1] == size
        meta["uv3"] = rows
        for c in range(3):
            blocks.append(uv3[:t, :, :, c].reshape(t * size, size))
        rows += 3 * t * size
    cat = jnp.concatenate(blocks, axis=0).astype(jnp.float32)
    if halves > 1:
        # logical row y -> packed rows y*halves..y*halves+halves-1
        tbl = cat.reshape(rows * halves, 128)
    else:
        tbl = jnp.zeros((rows, 128), jnp.float32)
        tbl = tbl.at[:, :size].set(cat)
    return jnp.asarray(tbl), meta


def _bounce_textures(
    tex_c, mat_id, alb, normal, point, uv, t_cols,
):
    """In-kernel albedo texture eval (Texture.cs SampleColor semantics,
    core/textures._sample_all parity): fetch the winner material's texture
    record by mat-id one-hot, evaluate checker (iq normal-projection) /
    Perlin marble / atlas image, and select over the packed constant
    albedo.  Returns (alb_r, alb_g, alb_b)."""
    texrec_ref, perlin_ref, img_ref, (img_w, img_h) = tex_c
    alb_r, alb_g, alb_b = alb
    nx, ny, nz = normal
    px, py, pz = point
    uu, vv = uv
    m_rows = texrec_ref.shape[1]

    m_iota = jax.lax.broadcasted_iota(jnp.int32, (m_rows, t_cols), 0)
    m_hot = (m_iota == mat_id.astype(jnp.int32)).astype(jnp.float32)
    tx = jax.lax.dot_general(
        texrec_ref[:, :], m_hot,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TEX_ROWS, T)
    ttype = tx[0:1, :]
    main_r, main_g, main_b = tx[1:2, :], tx[2:3, :], tx[3:4, :]
    freq = tx[7:8, :]

    # checker (textures._checker_uv: dominant-normal projection)
    ax, ay, az = jnp.abs(nx), jnp.abs(ny), jnp.abs(nz)
    use_x = (ax > ay) & (ax > az)
    use_y = jnp.logical_not(use_x) & (ay > ax) & (ay > az)
    use_z = jnp.logical_not(use_x) & jnp.logical_not(use_y)
    v0 = jnp.where(use_x, nx, jnp.where(use_y, ny, nz))
    v1 = jnp.where(use_x, ny, jnp.where(use_y, nz, nx))
    v2 = jnp.where(use_x, nz, jnp.where(use_y, nx, ny))
    safe0 = jnp.where(v0 == 0.0, 1.0, v0)
    cu = 0.5 + 0.5 * (v1 / safe0)
    cv = 0.5 + 0.5 * (v2 / safe0)
    sines = jnp.sin(jnp.pi * freq * cu) * jnp.sin(jnp.pi * freq * cv)
    chk_main = sines < 0.0
    is_chk = (ttype > 1.5) & (ttype < 2.5)
    pick_main = is_chk & chk_main
    pick_sec = is_chk & jnp.logical_not(chk_main)
    alb_r = jnp.where(pick_main, main_r, jnp.where(pick_sec, tx[4:5, :], alb_r))
    alb_g = jnp.where(pick_main, main_g, jnp.where(pick_sec, tx[5:6, :], alb_g))
    alb_b = jnp.where(pick_main, main_b, jnp.where(pick_sec, tx[6:7, :], alb_b))

    if perlin_ref is not None:
        # marble: 0.5*(1+sin(freq*z + 10*turbulence(p))) * main
        # (textures._sample_all / Texture.cs:74-78 dead branch)
        turb = _turbulence_rows(perlin_ref, px, py, pz, t_cols)
        marble = 0.5 * (1.0 + jnp.sin(freq * pz + 10.0 * turb))
        is_per = (ttype > 2.5) & (ttype < 3.5)
        alb_r = jnp.where(is_per, marble * main_r, alb_r)
        alb_g = jnp.where(is_per, marble * main_g, alb_g)
        alb_b = jnp.where(is_per, marble * main_b, alb_b)

    if img_ref is not None:
        # nearest-neighbor atlas fetch (Texture.cs:82-90): row one-hot
        # contraction then column mask-reduce, per channel plane
        w_pad = img_ref.shape[0] // 3
        ah_pad = img_ref.shape[1]
        cx = jnp.clip(
            (uu * img_w).astype(jnp.int32), 0, img_w - 1
        )
        cy = jnp.clip(
            (vv * img_h).astype(jnp.int32), 0, img_h - 1
        )
        row = tx[8:9, :].astype(jnp.int32) + cy  # (1, T)
        r_iota = jax.lax.broadcasted_iota(jnp.int32, (ah_pad, t_cols), 0)
        r_hot = (r_iota == row).astype(jnp.float32)
        c_iota = jax.lax.broadcasted_iota(jnp.int32, (w_pad, t_cols), 0)
        c_hot = (c_iota == cx).astype(jnp.float32)
        # bounded: CONSTANT_SCALAR (type 5) stays with its pre-resolved
        # packed albedo
        is_img = (ttype > 3.5) & (ttype < 4.5)
        texel = []
        for c in range(3):
            col = jax.lax.dot_general(
                img_ref[c * w_pad : (c + 1) * w_pad, :], r_hot,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (W_pad, T)
            texel.append(jnp.sum(c_hot * col, axis=0, keepdims=True))
        alb_r = jnp.where(is_img, texel[0] * main_r, alb_r)
        alb_g = jnp.where(is_img, texel[1] * main_g, alb_g)
        alb_b = jnp.where(is_img, texel[2] * main_b, alb_b)

    return alb_r, alb_g, alb_b


def _perlin_rows(perlin_ref, px, py, pz, t_cols):
    """Surflet gradient noise for (1, T) position rows
    (core/noise.perlin_noise / PerlinNoise.cs:36-52 parity): per-axis perm
    lookups via 256-one-hot contractions, corner hash = XOR of the three,
    gradient fetch from the random-vector rows."""
    i256 = jax.lax.broadcasted_iota(jnp.int32, (256, t_cols), 0)

    def lookup(row0, nrows, idx):
        hot = (i256 == (idx & 255)).astype(jnp.float32)
        return jax.lax.dot_general(
            perlin_ref[row0 : row0 + nrows, :], hot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    cellx = jnp.floor(px)
    celly = jnp.floor(py)
    cellz = jnp.floor(pz)
    cix = cellx.astype(jnp.int32)
    ciy = celly.astype(jnp.int32)
    ciz = cellz.astype(jnp.int32)

    def falloff(t):
        t = jnp.abs(t)
        return jnp.where(t >= 1.0, 0.0, 1.0 - (3.0 - 2.0 * t) * t * t)

    # per-axis perm values + fractional offsets at cell and cell+1
    perm = []
    frac = []
    fall = []
    for row, ci, cf, p in (
        (0, cix, cellx, px), (1, ciy, celly, py), (2, ciz, cellz, pz)
    ):
        pv0 = lookup(row, 1, ci).astype(jnp.int32)
        pv1 = lookup(row, 1, ci + 1).astype(jnp.int32)
        f0 = p - cf
        f1 = f0 - 1.0
        perm.append((pv0, pv1))
        frac.append((f0, f1))
        fall.append((falloff(f0), falloff(f1)))

    result = jnp.zeros((1, t_cols), jnp.float32)
    for dk in (0, 1):
        for dj in (0, 1):
            for di in (0, 1):
                h = perm[0][di] ^ perm[1][dj] ^ perm[2][dk]
                grad = lookup(3, 3, h)  # (3, T)
                dot = (
                    frac[0][di] * grad[0:1, :]
                    + frac[1][dj] * grad[1:2, :]
                    + frac[2][dk] * grad[2:3, :]
                )
                result = result + fall[0][di] * fall[1][dj] * fall[2][dk] * dot
    return jnp.clip(result, 0.0, 1.0)


def _turbulence_rows(perlin_ref, px, py, pz, t_cols, depth: int = 7):
    """7-octave fBm (core/noise.turbulence / PerlinNoise.cs:54-68)."""
    acc = jnp.zeros((1, t_cols), jnp.float32)
    weight = 1.0
    sx, sy, sz = px, py, pz
    for _ in range(depth):
        acc = acc + weight * _perlin_rows(perlin_ref, sx, sy, sz, t_cols)
        weight *= 0.5
        sx, sy, sz = sx * 2.0, sy * 2.0, sz * 2.0
    return jnp.clip(acc, 0.0, 1.0)



def _stbn_rows(
    ntbl_ref, meta, base, chn, seq, salt, px_row, py_row, t_cols,
    t_override=None,  # per-set temporal count (meta's scalT for the
    #   channel-derived Blue scalar stack); default meta[1]
):
    """In-kernel flavored-draw fetch: chn (1, t_cols) rows with
    value[lane] = tile[t_idx, (py+offy) % S, (px+offx) % S] from the
    pack_noise_tables layout — the PerPixelNoise addressing
    (PerPixelNoise.cs:24-44) with the draw counter `seq` keyed by
    iteration.

    Cost shape: because lanes are row-major pixels and the image width
    is a multiple of the tile size S, (px[lane]+offx) % S advances by 1
    per lane THROUGH row wraps — so the whole fetch is: per image row
    covered by the tile, one (1, S) table-row read + one (S, S)
    rotation matmul (k0 = (px0+offx) % S, shared across rows/channels),
    lane-tiled to (1, t_cols) and masked together by py.  No per-lane
    gathers, no (samples, N) one-hots.

    Returns a LIST of chn rows (uniform channels; the caller applies
    Cranley-Patterson rotations where the draw is a scalar)."""
    size, t = meta[0], meta[1]
    if t_override is not None:
        t = t_override
    halves = max(1, size // 128)
    nrows = max(1, t_cols // max(size, 1))  # lane reps of one tile row
    # R2 offsets (R2.cs:8-16 plastic constants) + temporal slice — all
    # scalars shared by the tile
    # wrap before the float R2 math: frac(seq * alpha) in f32 loses the
    # fraction entirely past ~2^22 (ulp 0.25 at 4M draws would collapse
    # the offsets to 4 values); 8192 draws of R2 coverage then repeat
    seq = jnp.mod(seq, 8192)
    seqf = seq.astype(jnp.float32) + jnp.float32(salt) * 101.0 + 0.5
    offx = jnp.floor(
        jnp.mod(seqf * 0.7548776662466927, 1.0) * size
    ).astype(jnp.int32)
    offy = jnp.floor(
        jnp.mod(seqf * 0.5698402909980532, 1.0) * size
    ).astype(jnp.int32)
    t_idx = jnp.mod(seq + jnp.int32(salt), t)

    px0 = px_row[0, 0].astype(jnp.int32)
    py0 = py_row[0, 0].astype(jnp.int32)
    k0 = jnp.mod(px0 + offx, size)
    # rotation one-hot: rot[j] = row[(j + k0) % S]
    br = jax.lax.broadcasted_iota(jnp.int32, (size, size), 0)
    bc = jax.lax.broadcasted_iota(jnp.int32, (size, size), 1)
    perm = (br == jnp.mod(bc + k0, size)).astype(jnp.float32)

    # distinct image rows the tile covers (static count)
    n_img_rows = meta[5]
    out = [jnp.zeros((1, t_cols), jnp.float32) for _ in range(chn)]
    for rr in range(n_img_rows):
        y_rr = jnp.mod(py0 + rr + offy, size)
        mask = py_row == (py0 + rr).astype(jnp.float32)
        for c in range(chn):
            row_idx = base + (c * t + t_idx) * size + y_rr
            if halves == 1:
                tile_row = ntbl_ref[pl.ds(row_idx, 1), :][:, :size]
            else:
                # 256px tables: the logical tile row lives split across
                # `halves` consecutive 128-col packed rows
                tile_row = jnp.concatenate(
                    [
                        ntbl_ref[pl.ds(row_idx * halves + h, 1), :]
                        for h in range(halves)
                    ],
                    axis=1,
                )
            rot = jax.lax.dot_general(
                tile_row, perm, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (1, S)
            tiled = jnp.concatenate([rot] * nrows, axis=1)
            out[c] = jnp.where(mask, tiled, out[c])
    return out


def _cp_rotate(rows, seq, salt):
    """Cranley-Patterson rotation for scalar-uniform fetches (mod-1
    shift preserves the blue-noise spectrum; randomsource.pixel_scalar
    does the same XLA-side)."""
    seq = jnp.mod(seq, 8192)  # f32 frac precision (see _stbn_rows)
    seqf = seq.astype(jnp.float32) + jnp.float32(salt) * 101.0 + 0.5
    out = []
    for i, r in enumerate(rows):
        rot = jnp.mod(seqf * 0.7548776662466927 + i * 0.3819660113, 1.0)
        out.append(jnp.mod(r + rot, 1.0))
    return out


def _batch_kernel(
    seed_ref, cam_ref, sky_ref, vol0_ref, pix_ref, sph_ref, rec_ref,
    *aux_and_out,
    samples: int, trace_depth: int, t_min: float, has_dielectrics: bool,
    sky_on: bool, hw_prng: bool, early_out: bool, jitter: bool,
    has_rects: bool = False, has_boxes: bool = False,
    has_tris: bool = False, has_tri_stream: bool = False,
    has_tex: bool = False, has_perlin: bool = False, has_img: bool = False,
    img_dims: tuple = (0, 0),
    has_cube: bool = False, cube_dims: tuple = (0, 0),
    has_noise: bool = False, has_cos: bool = False,
    has_volumes: bool = False, has_motion: bool = False,
    want_tape: bool = False, has_sph_blocks: bool = False,
    lockstep: bool = False,
    noise_meta: tuple | None = None,  # (size, T, cam, cos, scal,
    #   n_img_rows) static layout of the in-kernel noise tables
    #   (pack_noise_tables); None keeps the pre-drawn path
):
    # aux refs arrive positionally in (rect_geo, rect_rec, box_geo,
    # box_rec) order, each pair present only when the scene has that kind;
    # the last positional is always the output ref (plus the tape ref in
    # tape mode), then any scratch refs (streamed-triangle buffers).
    aux_and_out = list(aux_and_out)
    sph_blocks_ref = aux_and_out.pop(0) if has_sph_blocks else None
    if has_tri_stream:
        stream_scr = tuple(aux_and_out[-2:])  # tbl_scratch, dma_sem
        del aux_and_out[-2:]
    if want_tape:
        aux = list(aux_and_out[:-2])
        out_ref = aux_and_out[-2]
        tape_ref = aux_and_out[-1]
    else:
        aux = list(aux_and_out[:-1])
        out_ref = aux_and_out[-1]
    rect_c = (aux.pop(0), aux.pop(0)) if has_rects else None
    box_c = (aux.pop(0), aux.pop(0)) if has_boxes else None
    tri_c = (aux.pop(0), aux.pop(0)) if has_tris else None
    if has_tri_stream:
        # (tbl_hbm, aabb_smem, sup_smem, tbl_scratch, dma_sem)
        tri_c = (aux.pop(0), aux.pop(0), aux.pop(0)) + stream_scr
    tex_c = None
    if has_tex:
        tex_c = (
            aux.pop(0),
            aux.pop(0) if has_perlin else None,
            aux.pop(0) if has_img else None,
            img_dims,
        )
    cube_c = (aux.pop(0), cube_dims) if has_cube else None
    noise_ref = aux.pop(0) if has_noise else None
    cos_ref = aux.pop(0) if has_cos else None
    ntbl_ref = aux.pop(0) if noise_meta is not None else None

    lane = pix_ref[0:1, :]  # (1, T) global lane ids as f32 (RNG keying)
    per_pixel = pix_ref[1:2, :]  # samples to take this batch
    count_in = pix_ref[2:3, :]  # accumulated valid samples before batch
    pixel = pix_ref[3:4, :]  # pixel index this lane renders (row-major id;
    # a Morton permutation of lanes keeps each tile a coherent 2D block so
    # whole tiles terminate together and the early-out reclaims them)

    if hw_prng:
        pltpu.prng_seed(seed_ref[0, 0] + pix_ref[0, 0].astype(jnp.int32))

    consts = (
        (sph_ref[:, 0:1], sph_ref[:, 1:2], sph_ref[:, 2:3],
         sph_ref[:, 3:4], rec_ref,
         (sph_ref[:, 4:5], sph_ref[:, 5:6], sph_ref[:, 6:7])
         if has_motion else None,
         sph_blocks_ref),
        rect_c,
        box_c,
        tri_c,
        tex_c,
        cube_c,
        (sky_ref[0, 0], sky_ref[0, 1], sky_ref[0, 2]),
        (sky_ref[0, 3], sky_ref[0, 4], sky_ref[0, 5]),
    )

    # camera row: origin, lower_left, horizontal, vertical, right, up,
    # lens_radius, width, height (View.cs:16-36 basis)
    co = (cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2])
    ll = (cam_ref[0, 3], cam_ref[0, 4], cam_ref[0, 5])
    hh = (cam_ref[0, 6], cam_ref[0, 7], cam_ref[0, 8])
    vv = (cam_ref[0, 9], cam_ref[0, 10], cam_ref[0, 11])
    rr = (cam_ref[0, 12], cam_ref[0, 13], cam_ref[0, 14])
    uu = (cam_ref[0, 15], cam_ref[0, 16], cam_ref[0, 17])
    lens_radius = cam_ref[0, 18]
    width = cam_ref[0, 19]
    height = cam_ref[0, 20]

    py_row = jnp.floor(pixel / width)
    px_row = pixel - py_row * width

    t_shape = lane.shape
    zero = jnp.zeros(t_shape, jnp.float32)
    one = jnp.ones(t_shape, jnp.float32)

    # Persistent-lane PATH REGENERATION: each lane traces its per-pixel
    # samples back-to-back — the moment a path terminates, the next
    # sample's camera ray starts in the same lane on the next iteration.
    # A tile thus finishes in ~(total bounces of its busiest lane)
    # iterations instead of always samples*trace_depth, converting the
    # reference's per-pixel early exits (sky hit at SampleBatchJob.cs:341,
    # depth exhaustion :380) into reclaimed TPU lanes.
    state0 = (
        # path state
        zero, zero, zero,  # origin
        zero, zero, zero,  # direction
        one, one, one,  # throughput
        zero, zero, zero,  # radiance
        zero,  # path_active
        zero,  # valid (set by a sky miss)
        zero, zero, zero,  # aov normal
        zero, zero, zero,  # aov albedo
        zero,  # got_nonspecular
        zero,  # events (this path)
        zero,  # depth counter (this path)
        zero,  # samples started
        # per-pixel accumulators
        zero, zero, zero,  # color sum
        zero,  # valid count
        zero, zero, zero,  # normal sum
        zero, zero, zero,  # albedo sum
        zero,  # weight sum
        zero,  # rays
        zero, zero, zero,  # fallback normal
        zero, zero, zero,  # fallback albedo
        # inside-volume medium state (id -1 = vacuum) + its record rows
        -one, zero, zero, zero, zero, zero, zero, zero,
        zero,  # shutter time of the current path
    )
    if want_tape:
        # replay tape rows: -2 idle, -1 miss, else combined winner index
        # (padded sphere/rect/box row space; see _bounce_step
        # want_winner).  Rows are STORED directly to the output ref at a
        # dynamic sublane offset each iteration; the idle fill covers
        # early-out-skipped iterations.  (Round 2 carried the whole
        # (samples*depth, T) tape through the fori_loop state with a
        # one-hot accumulate — O(iters^2 * T) VPU work that also capped
        # compilation at 8 spp x depth 8; the direct store is O(iters * T)
        # and lifts the ceiling to 64-spp launches.)
        tape_ref[:, :] = jnp.full(
            (samples * trace_depth, t_shape[1]), -2.0, jnp.float32
        )

    def iteration(it, state):
        (ox, oy, oz, dx, dy, dz, thx, thy, thz, rx, ry, rz,
         pactive, valid, anx, any_, anz, aax, aay, aaz, got, events,
         depth_ct, started,
         csx_, csy_, csz_, cnt, nsx, nsy, nsz, asx, asy, asz,
         wsum, rays, fnx, fny, fnz, fax, fay, faz,
         in_id, in_den, in_ar, in_ag, in_ab, in_er, in_eg, in_eb,
         ptime) = state

        # ---- regenerate: start the next sample on idle lanes ----------
        regen = (pactive < 0.5) & (started < per_pixel)
        if lockstep:
            # LOCKSTEP regeneration (streamed-mesh scenes): lanes only
            # start a new sample at trace_depth boundaries, so every
            # active path in the tile is at the SAME (sample, bounce)
            # phase.  The streamed-triangle cull is tile-grained (a
            # block is swept when ANY active lane may hit it) — with
            # per-lane regen the tile mixes fresh camera rays with
            # deep-bounce rays every iteration and the union covers
            # ~half the mesh; in lockstep the camera-ray iterations
            # have a tight frustum union (few blocks) and the divergent
            # bounce iterations carry few active lanes and short
            # distance bounds.  Paths can't outlive trace_depth, so
            # cohorts stay aligned; the iteration budget
            # samples*trace_depth is exact, not amortized.
            regen = regen & (it % trace_depth == 0)
        if hw_prng:
            u = _uniforms_hw((8, t_shape[1]))
        else:
            u = _uniforms_hash(
                (8, t_shape[1]), seed_ref[0, 0],
                it * jnp.int32(1013904223), lane,
            )
        if noise_meta is not None:
            # IN-KERNEL flavored fetch (pack_noise_tables): per-draw
            # tile rolls off the VMEM-resident STBN tables, draw counter
            # keyed by batch-base + iteration (pix row 4 carries the
            # batch's draw_base so progressive batches never repeat a
            # draw sequence)
            seq = pix_ref[4, 0].astype(jnp.int32) + it
        if noise_meta is not None and noise_ref is None:
            cam_rows = _stbn_rows(
                ntbl_ref, noise_meta, noise_meta[2], 4, seq, 0,
                px_row, py_row, t_shape[1],
            )
            cam_u = tuple(_cp_rotate(cam_rows, seq, 0))
            if noise_meta[3] >= 0:
                cos_tsd = tuple(_stbn_rows(
                    ntbl_ref, noise_meta, noise_meta[3], 3, seq, 1,
                    px_row, py_row, t_shape[1],
                ))
            else:
                cos_tsd = None
        if noise_ref is not None or cos_ref is not None:
            # pixel-correlated per-sample draws are pre-drawn XLA-side
            # (randomsource.pixel_uniforms / pixel_cosine — exact
            # wavefront parity) into rows c*samples + k; the lane fetches
            # its next sample's row with a samples-row one-hot over the
            # `started` counter (tiny: samples <= 50 rows)
            s_iota = jax.lax.broadcasted_iota(
                jnp.int32, (samples, t_shape[1]), 0
            )
            s_hot = (s_iota == started.astype(jnp.int32)).astype(
                jnp.float32
            )
        if noise_ref is not None:
            cam_u = tuple(
                jnp.sum(
                    s_hot * noise_ref[c * samples : (c + 1) * samples, :],
                    axis=0, keepdims=True,
                )
                for c in range(4)
            )
        elif noise_meta is None:
            cam_u = (u[0:1], u[1:2], u[2:3], u[3:4])
        if cos_ref is not None:
            # this sample's pre-drawn tangent-space cosine direction
            # (rows c*samples + k); consumed by _bounce_step on
            # first-bounce lanes, which are exactly this iteration's
            # regen lanes (depth_ct == 0 only right after regen)
            cos_tsd = tuple(
                jnp.sum(
                    s_hot * cos_ref[c * samples : (c + 1) * samples, :],
                    axis=0, keepdims=True,
                )
                for c in range(3)
            )
        elif noise_meta is None:
            cos_tsd = None
        if jitter:
            jx, jy = cam_u[0], cam_u[1]
        else:
            jx = jy = 0.5
        un = (px_row + jx) / width
        vn = (py_row + jy) / height
        # thin-lens defocus (View.cs:38-48; sampling.in_unit_disk)
        theta = cam_u[2] * TWO_PI
        radius = jnp.sqrt(cam_u[3]) * lens_radius
        rdx = radius * jnp.cos(theta)
        rdy = radius * jnp.sin(theta)
        offx = rdx * rr[0] + rdy * uu[0]
        offy = rdx * rr[1] + rdy * uu[1]
        offz = rdx * rr[2] + rdy * uu[2]
        cdx = ll[0] - offx + un * hh[0] + vn * vv[0]
        cdy = ll[1] - offy + un * hh[1] + vn * vv[1]
        cdz = ll[2] - offz + un * hh[2] + vn * vv[2]
        cdx, cdy, cdz = _normalize3(cdx, cdy, cdz)

        ox = jnp.where(regen, co[0] + offx, ox)
        oy = jnp.where(regen, co[1] + offy, oy)
        oz = jnp.where(regen, co[2] + offz, oz)
        dx = jnp.where(regen, cdx, dx)
        dy = jnp.where(regen, cdy, dy)
        dz = jnp.where(regen, cdz, dz)
        thx = jnp.where(regen, 1.0, thx)
        thy = jnp.where(regen, 1.0, thy)
        thz = jnp.where(regen, 1.0, thz)
        rx = jnp.where(regen, 0.0, rx)
        ry = jnp.where(regen, 0.0, ry)
        rz = jnp.where(regen, 0.0, rz)
        anx = jnp.where(regen, 0.0, anx)
        any_ = jnp.where(regen, 0.0, any_)
        anz = jnp.where(regen, 0.0, anz)
        aax = jnp.where(regen, 0.0, aax)
        aay = jnp.where(regen, 0.0, aay)
        aaz = jnp.where(regen, 0.0, aaz)
        got = jnp.where(regen, 0.0, got)
        events = jnp.where(regen, 0.0, events)
        depth_ct = jnp.where(regen, 0.0, depth_ct)
        valid = jnp.where(regen, 0.0, valid)
        pactive = jnp.where(regen, 1.0, pactive)
        started = started + jnp.where(regen, 1.0, 0.0)
        if has_volumes:
            # camera containment (DetermineVolumeContainment analog,
            # computed host-side once for the shared camera origin)
            in_id = jnp.where(regen, vol0_ref[0, 0], in_id)
            in_den = jnp.where(regen, vol0_ref[0, 1], in_den)
            in_ar = jnp.where(regen, vol0_ref[0, 2], in_ar)
            in_ag = jnp.where(regen, vol0_ref[0, 3], in_ag)
            in_ab = jnp.where(regen, vol0_ref[0, 4], in_ab)
            in_er = jnp.where(regen, vol0_ref[0, 5], in_er)
            in_eg = jnp.where(regen, vol0_ref[0, 6], in_eg)
            in_eb = jnp.where(regen, vol0_ref[0, 7], in_eb)
        if has_motion:
            tdraw = u[7:8]
            if noise_meta is not None and noise_meta[4] >= 0:
                tdraw = _cp_rotate(
                    _stbn_rows(
                        ntbl_ref, noise_meta, noise_meta[4], 1, seq, 9,
                        px_row, py_row, t_shape[1],
                        t_override=(
                            noise_meta[7] if len(noise_meta) > 7
                            else None
                        ),
                    ),
                    seq, 9,
                )[0]
            ptime = jnp.where(regen, tdraw, ptime)

        was_active = pactive > 0.5

        # ---- one bounce ------------------------------------------------
        carry = (ox, oy, oz, dx, dy, dz, thx, thy, thz, rx, ry, rz,
                 pactive, valid, anx, any_, anz, aax, aay, aaz,
                 got, events, zero,
                 in_id, in_den, in_ar, in_ag, in_ab, in_er, in_eg, in_eb,
                 ptime)
        if hw_prng:
            ub = _uniforms_hw((8, t_shape[1]))
        else:
            ub = _uniforms_hash(
                (8, t_shape[1]), seed_ref[0, 0],
                it * jnp.int32(1013904223) + jnp.int32(7919), lane,
            )
        if noise_meta is not None and noise_meta[4] >= 0:
            # FULL flavored routing: the scatter block's scalar draws
            # (rough-normal inversion ua/ub, Lambert inversion uc/ud,
            # the two lotteries, the volume free path) come from the
            # STBN scalar set — the reference feeds every NextFloat
            # through the selected NoiseColor (RandomSource.cs:27-33
            # called from Material.cs:75-161)
            srows = []
            for k in range(7):
                r = _stbn_rows(
                    ntbl_ref, noise_meta, noise_meta[4], 1, seq, 2 + k,
                    px_row, py_row, t_shape[1],
                    t_override=(
                        noise_meta[7] if len(noise_meta) > 7 else None
                    ),
                )
                srows.append(_cp_rotate(r, seq, 2 + k)[0])
            ub = jnp.concatenate(srows + [ub[7:8]], axis=0)
        vol_tsd = None
        if (
            noise_meta is not None and has_volumes
            and len(noise_meta) > 6 and noise_meta[6] >= 0
            and noise_meta[4] >= 0  # same gate as the scatter scalars
        ):
            # isotropic volume scatter rides the baked unitvec3 set
            # (RandomSource.cs:113-128 NextFloat3Direction); unit
            # vectors take no Cranley-Patterson rotation
            vol_tsd = tuple(_stbn_rows(
                ntbl_ref, noise_meta, noise_meta[6], 3, seq, 13,
                px_row, py_row, t_shape[1],
            ))
        carry = _bounce_step(
            depth_ct, carry, ub, consts,
            t_min=t_min, has_dielectrics=has_dielectrics, sky_on=sky_on,
            has_volumes=has_volumes, has_motion=has_motion,
            want_winner=want_tape, cos_tsd=cos_tsd, vol_dir=vol_tsd,
            # every-bounce flavored cosines only when the SCALAR set is
            # also packed — the wavefront's noise_ctx gates its whole
            # flavored bounce path on state.scalar (integrator.trace), so
            # a cosine-only flavor must stay first-bounce-only here too
            # or the two integrators diverge statistically
            cos_all=(
                noise_meta is not None
                and noise_meta[3] >= 0
                and noise_meta[4] >= 0
            ),
        )
        if want_tape:
            carry, (widx, whit) = carry
            code = jnp.where(
                was_active,
                jnp.where(whit > 0.5, widx, -1.0),
                -2.0,
            )  # (1, T)
            # direct dynamic-sublane store of this iteration's row
            tape_ref[pl.ds(it, 1), :] = code
        (ox, oy, oz, dx, dy, dz, thx, thy, thz, rx, ry, rz,
         pactive, valid, anx, any_, anz, aax, aay, aaz,
         got, events, _rc,
         in_id, in_den, in_ar, in_ag, in_ab, in_er, in_eg, in_eb,
         ptime) = carry

        depth_ct = depth_ct + jnp.where(was_active, 1.0, 0.0)
        rays = rays + jnp.where(was_active, 1.0, 0.0)
        if os.environ.get("MESH_COUNT") is not None:
            rays = rays + _rc  # debug: per-iteration sweep tally

        # depth exhaustion fails the sample (SampleBatchJob.cs:380-381)
        exhausted = (pactive > 0.5) & (depth_ct > trace_depth - 0.5)
        pactive = jnp.where(exhausted, 0.0, pactive)

        # ---- commit terminated paths ------------------------------------
        terminated = was_active & (pactive < 0.5)
        ok = terminated & (valid > 0.5)
        csx_ = csx_ + jnp.where(ok, rx, 0.0)
        csy_ = csy_ + jnp.where(ok, ry, 0.0)
        csz_ = csz_ + jnp.where(ok, rz, 0.0)
        nsx = nsx + jnp.where(ok, anx, 0.0)
        nsy = nsy + jnp.where(ok, any_, 0.0)
        nsz = nsz + jnp.where(ok, anz, 0.0)
        asx = asx + jnp.where(ok, aax, 0.0)
        asy = asy + jnp.where(ok, aay, 0.0)
        asz = asz + jnp.where(ok, aaz, 0.0)
        wsum = wsum + jnp.where(ok, events, 0.0)

        # fallback AOVs while the pixel has no valid sample yet
        # (SampleBatchJob.cs:146-151; captured valid or not)
        is_first_ever = terminated & ((count_in + cnt) < 0.5)
        fnx = jnp.where(is_first_ever, anx, fnx)
        fny = jnp.where(is_first_ever, any_, fny)
        fnz = jnp.where(is_first_ever, anz, fnz)
        fax = jnp.where(is_first_ever, aax, fax)
        fay = jnp.where(is_first_ever, aay, fay)
        faz = jnp.where(is_first_ever, aaz, faz)

        cnt = cnt + jnp.where(ok, 1.0, 0.0)

        new_state = (
            ox, oy, oz, dx, dy, dz, thx, thy, thz, rx, ry, rz,
            pactive, valid, anx, any_, anz, aax, aay, aaz, got, events,
            depth_ct, started,
            csx_, csy_, csz_, cnt, nsx, nsy, nsz, asx, asy, asz,
            wsum, rays, fnx, fny, fnz, fax, fay, faz,
            in_id, in_den, in_ar, in_ag, in_ab, in_er, in_eg, in_eb,
            ptime)
        return new_state

    if early_out:
        def iteration_or_skip(it, state):
            # tile done: no live path and every lane exhausted its samples
            live = jnp.max(
                state[12] + jnp.where(state[23] < per_pixel, 1.0, 0.0)
            )
            return jax.lax.cond(
                live > 0.0, lambda s: iteration(it, s), lambda s: s, state
            )
    else:
        iteration_or_skip = iteration

    state = jax.lax.fori_loop(
        0, samples * trace_depth, iteration_or_skip, state0
    )
    acc = state[24:42]

    for i, row in enumerate(acc):
        out_ref[i : i + 1, :] = row
    out_ref[18:BATCH_OUT_ROWS, :] = jnp.zeros(
        (BATCH_OUT_ROWS - 18, t_shape[1]), jnp.float32
    )


def camera_containment_row(scene, packed_materials, origin) -> jnp.ndarray:
    """(8,) SMEM row [volume material id or -1, density, albedo rgb,
    emission rgb] for the camera origin — the megakernel's initial medium
    state (DetermineVolumeContainment, SampleBatchJob.cs:477-508; one
    shared origin stands in for the per-ray test since lens offsets are
    tiny relative to volume extents)."""
    from raytracing_in_one_weekend_tpu.ops import intersect

    mat = intersect.point_inside_volume(scene, jnp.asarray(origin)[None])[0]
    safe = jnp.maximum(mat, 0)
    row = packed_materials[safe]
    inside = (mat >= 0).astype(jnp.float32)
    return jnp.stack([
        jnp.where(mat >= 0, mat.astype(jnp.float32), -1.0),
        row[9] * inside,  # density
        row[1] * inside, row[2] * inside, row[3] * inside,
        row[4] * inside, row[5] * inside, row[6] * inside,
    ])


@functools.partial(
    jax.jit,
    static_argnames=("samples", "trace_depth", "t_min", "has_dielectrics",
                     "sky_on", "hw_prng", "early_out", "jitter", "interpret",
                     "img_dims", "cube_dims", "want_tape", "noise_meta"),
)
def sample_batch(
    lane_count: jnp.ndarray,  # (N,) per-pixel samples to take (int or float)
    count_in: jnp.ndarray,  # (N,) accumulated valid samples before batch
    camera_row: jnp.ndarray,  # (24,) packed thin-lens camera (see kernel)
    centers: jnp.ndarray,  # (S, 3)
    radii: jnp.ndarray,  # (S,)
    records: jnp.ndarray,  # (S, 11) packed material rows
    sky_bottom: jnp.ndarray,  # (3,)
    sky_top: jnp.ndarray,  # (3,)
    seed: jnp.ndarray,  # () int32
    pixel_index: jnp.ndarray | None = None,  # (N,) pixel id per lane
    rect_tables: tuple | None = None,  # (geo (R,16), rec (24,R)) pre-packed
    box_tables: tuple | None = None,  # (geo (B,16), rec (24,B)) pre-packed
    tri_tables: tuple | None = None,  # (geo (T,16), rec (32,T)) pre-packed
    tri_stream_tables: tuple | None = None,  # (tbl (T,128), aabb_row
    #   (1, n_blk*8), sup_row (1, n_sup*8)) from
    #   pack_tri_stream_tables: HBM-streamed
    #   triangles for TRI_MAX < count <= TRI_STREAM_MAX
    tex_tables: tuple | None = None,  # (texrec, perlin|None, img|None)
    #   from pack_texture_tables: enables the in-kernel procedural albedo
    #   eval (checker/perlin/image); img_dims rides separately (static)
    vol0: jnp.ndarray | None = None,  # (8,) camera_containment_row: enables
    #   the in-kernel convex volume walk
    move_offsets: jnp.ndarray | None = None,  # (S, 3) sphere motion (unit
    #   shutter range): enables the in-kernel motion-blur path
    lane_base: jnp.ndarray | int = 0,  # global id of lane 0 — RNG lane
    #   keying offset for sharded multi-device batches (parallel/shard's
    #   shard_map path gives each device a disjoint lane-id range so its
    #   hash-PRNG streams match the single-device render bit-exactly)
    *,
    samples: int,
    trace_depth: int,
    t_min: float = 0.0,
    has_dielectrics: bool = True,
    sky_on: bool = True,
    hw_prng: bool | None = None,
    early_out: bool = True,
    jitter: bool = True,
    interpret: bool = False,
    img_dims: tuple = (0, 0),
    cube_table: jnp.ndarray | None = None,  # pack_cubemap_table planes
    cube_dims: tuple = (0, 0),
    noise_uniforms: jnp.ndarray | None = None,  # (4*samples, N) pre-drawn
    #   pixel-correlated camera draws (pack_noise_uniforms)
    noise_cosine: jnp.ndarray | None = None,  # (3*samples, N) pre-drawn
    #   tangent-space cosine-hemisphere directions (pack_noise_cosine,
    #   the real STBN unitvec3_cosine set) for the first-bounce Lambert
    #   draw (RandomSource.cs:63-89)
    noise_tbl: jnp.ndarray | None = None,  # pack_noise_tables array:
    #   IN-KERNEL flavored fetch (full RandomSource routing — camera,
    #   every-bounce cosine, every scalar lottery/inversion, shutter
    #   time); requires noise_meta, row-major lanes, and an image width
    #   that is a multiple of the tile size.  Mutually exclusive with
    #   the pre-drawn noise_uniforms/noise_cosine rows.
    noise_draw_base: jnp.ndarray | int = 0,  # () batch draw-counter base
    #   (progressive batches must not repeat draw sequences)
    noise_meta: tuple | None = None,  # static (size, T, cam, cos, scal,
    #   n_img_rows) from pack_noise_tables (+ n_img_rows appended by the
    #   caller: distinct image rows per RAY_TILE lane tile)
    want_tape: bool = False,  # also return the replay tape (forces the
    #   reproducible hash PRNG; see megatrace_replay)
):
    """Fused SampleBatchJob: per-pixel accumulation DELTAS for one batch.

    Returns dict of flat (N,) / (N, 3) deltas in LANE order: color, count,
    normal, albedo, weight, rays, fallback_normal, fallback_albedo.  When
    `pixel_index` permutes lanes (Morton order), `lane_count`/`count_in`
    must arrive pre-permuted and the caller un-permutes the deltas.
    rect_tables/box_tables (from pack_aux_tables) add oriented rect/box
    entities to the in-kernel intersection sweep.
    """
    interpret = interpret or FORCE_INTERPRET
    if want_tape:
        # the replay VJP mirrors only the reproducible hash PRNG; a tape
        # recorded under the hardware PRNG would silently replay different
        # uniforms (plausible-looking but wrong gradients)
        hw_prng = False
        # the replay mirrors spheres/rects/boxes/VMEM-resident triangles
        # with constant, checker and image-atlas albedo textures, convex
        # volumes, unit-shutter motion and cubemap skies — a tape over
        # unsupported features (streamed triangles, perlin marble) would
        # replay the wrong state machine
        # (megatrace_replay.replay_eligible is the gate)
        assert tri_stream_tables is None
        assert (tex_tables is None or tex_tables[1] is None)
        assert noise_uniforms is None
        assert noise_cosine is None
        assert noise_tbl is None
    if hw_prng is None:
        hw_prng = not interpret
    n = lane_count.shape[0]
    n_pad = -(-n // RAY_TILE) * RAY_TILE

    pix = jnp.zeros((8, n_pad), jnp.float32)
    pix = pix.at[0, :].set(
        jnp.arange(n_pad, dtype=jnp.float32)
        + jnp.asarray(lane_base, jnp.float32)
    )
    pix = pix.at[1, :n].set(lane_count.astype(jnp.float32))
    pix = pix.at[2, :n].set(count_in.astype(jnp.float32))
    if pixel_index is None:
        pix = pix.at[3, :].set(jnp.arange(n_pad, dtype=jnp.float32))
    else:
        pix = pix.at[3, :n].set(pixel_index.astype(jnp.float32))
    if noise_tbl is not None:
        assert noise_meta is not None and pixel_index is None
        # row 4: the batch's draw-counter base for the in-kernel fetch
        pix = pix.at[4, :].set(
            jnp.asarray(noise_draw_base, jnp.float32)
        )

    # blocked-sweep gate (SPH_CULL_MIN; tape mode keeps the dense sweep —
    # the replay's row space must stay the caller's order).  Camera-
    # distance block ordering (near blocks first so the distance bound
    # culls far ones) was tried here and measured a WASH on sphere_field
    # (16.9 either way) — the tile-wide any-lane predicate, not the
    # bound, is what limits the skip rate.
    sph_cull = centers.shape[0] > SPH_CULL_MIN and not want_tape

    sph, rec_t, s_pad = _pack_scene_tables(
        centers, radii, records, move_offsets
    )
    sky = _pack_sky_row(sky_bottom, sky_top)
    cam = camera_row.astype(jnp.float32).reshape(1, 24)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape((1, 1))

    if vol0 is None:
        vol0_row = jnp.asarray(
            [-1.0, 0, 0, 0, 0, 0, 0, 0], jnp.float32
        ).reshape(1, 8)
    else:
        vol0_row = vol0.astype(jnp.float32).reshape(1, 8)

    inputs = [seed_arr, cam, sky, vol0_row, pix, sph, rec_t]
    in_specs = [
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 24), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(
            (8, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (s_pad, 8), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (REC_COLS, s_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
    ]
    # blocked sphere sweep for big scenes: per-SPH_BLOCK AABBs in SMEM
    if sph_cull:
        blocks_row = pack_sphere_blocks(
            centers, radii, move_offsets
        )
        inputs.append(blocks_row)
        in_specs.append(
            pl.BlockSpec(
                blocks_row.shape, lambda i: (0, 0),
                memory_space=pltpu.SMEM,
            )
        )
    for tables in (rect_tables, box_tables, tri_tables):
        if tables is not None:
            geo, rec = tables
            inputs += [geo, rec]
            in_specs += [
                pl.BlockSpec(
                    geo.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    rec.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
            ]
    if tri_stream_tables is not None:
        assert tri_tables is None, "tri_tables and tri_stream_tables clash"
        tbl_h, aabb_row, sup_row = tri_stream_tables
        inputs += [tbl_h, aabb_row, sup_row]
        in_specs += [
            # HBM-resident: the kernel DMAs TRI_BLOCK chunks on demand
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                aabb_row.shape, lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                sup_row.shape, lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
        ]
    if tex_tables is not None:
        texrec, perlin_t, img_t = tex_tables
        for arr in (texrec, perlin_t, img_t):
            if arr is not None:
                inputs.append(arr)
                in_specs.append(
                    pl.BlockSpec(
                        arr.shape, lambda i: (0, 0),
                        memory_space=pltpu.VMEM,
                    )
                )
    if cube_table is not None:
        inputs.append(cube_table)
        in_specs.append(
            pl.BlockSpec(
                cube_table.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            )
        )
    if noise_uniforms is not None:
        nu = jnp.zeros((4 * samples, n_pad), jnp.float32)
        nu = nu.at[:, :n].set(noise_uniforms)
        inputs.append(nu)
        in_specs.append(
            pl.BlockSpec(
                (4 * samples, RAY_TILE), lambda i: (0, i),
                memory_space=pltpu.VMEM,
            )
        )
    if noise_cosine is not None:
        nc = jnp.zeros((3 * samples, n_pad), jnp.float32)
        nc = nc.at[:, :n].set(noise_cosine)
        inputs.append(nc)
        in_specs.append(
            pl.BlockSpec(
                (3 * samples, RAY_TILE), lambda i: (0, i),
                memory_space=pltpu.VMEM,
            )
        )
    if noise_tbl is not None:
        inputs.append(noise_tbl)
        in_specs.append(
            pl.BlockSpec(
                noise_tbl.shape, lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            )
        )

    grid = (n_pad // RAY_TILE,)
    out = pl.pallas_call(
        functools.partial(
            _batch_kernel,
            samples=samples,
            trace_depth=trace_depth,
            t_min=t_min,
            has_dielectrics=has_dielectrics,
            sky_on=sky_on,
            hw_prng=hw_prng,
            early_out=early_out,
            jitter=jitter,
            has_rects=rect_tables is not None,
            has_boxes=box_tables is not None,
            has_tris=tri_tables is not None,
            has_tri_stream=tri_stream_tables is not None,
            has_tex=tex_tables is not None,
            has_perlin=tex_tables is not None and tex_tables[1] is not None,
            has_img=tex_tables is not None and tex_tables[2] is not None,
            img_dims=img_dims,
            has_cube=cube_table is not None,
            cube_dims=cube_dims,
            has_noise=noise_uniforms is not None,
            has_cos=noise_cosine is not None,
            has_volumes=vol0 is not None,
            has_motion=move_offsets is not None,
            want_tape=want_tape,
            noise_meta=noise_meta,
            lockstep=(
                tri_stream_tables is not None
                and os.environ.get("MESH_LOCKSTEP") is not None
            ),  # opt-in: measured SLOWER (mesh_large 4.0 -> 2.9) — the
            # 4x iteration inflation outweighs the tighter unions; kept
            # as a measurement knob for the sorted-wavefront follow-up
        ),
        scratch_shapes=(
            [
                # TRI_SLOT triangles per 128-col row (see pack_tri_
                # stream_tables): one SUPER-block resident at a time
                # (TRI_SUP blocks x TRI_ROWS rows = 512KB; the stream
                # DMAs super-granular, the sweep stays block-granular)
                pltpu.VMEM((TRI_SUP * TRI_ROWS, 128), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ]
            if tri_stream_tables is not None else []
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(
                (BATCH_OUT_ROWS, RAY_TILE), lambda i: (0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (samples * trace_depth, RAY_TILE), lambda i: (0, i),
                memory_space=pltpu.VMEM,
            ),
        ) if want_tape else pl.BlockSpec(
            (BATCH_OUT_ROWS, RAY_TILE), lambda i: (0, i),
            memory_space=pltpu.VMEM,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BATCH_OUT_ROWS, n_pad), jnp.float32),
            jax.ShapeDtypeStruct(
                (samples * trace_depth, n_pad), jnp.float32
            ),
        ) if want_tape else jax.ShapeDtypeStruct(
            (BATCH_OUT_ROWS, n_pad), jnp.float32
        ),
        compiler_params=(
            # tape launches: the (samples*depth, RAY_TILE) tape block
            # blows the DEFAULT 16M scoped-vmem limit past 8 spp; the
            # raised scope admits 16-64 spp grad batches (the same
            # tile-tail amortization the forward's 64-spp batches buy —
            # see ops/megatrace_bwd.VMEM_LIMIT for the backward's half)
            None if (interpret or not want_tape)
            else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            )
        ),
        interpret=interpret,
    )(*inputs)

    if want_tape:
        out, tape = out
    result = {
        "color": out[0:3, :n].T,
        "count": out[3, :n],
        "normal": out[4:7, :n].T,
        "albedo": out[7:10, :n].T,
        "weight": out[10, :n],
        "rays": out[11, :n].astype(jnp.int32),
        "fallback_normal": out[12:15, :n].T,
        "fallback_albedo": out[15:18, :n].T,
    }
    if want_tape:
        result["tape"] = tape[:, :n]
    return result


@functools.lru_cache(maxsize=8)
def morton_order(width: int, height: int):
    """(order, rank): lane->pixel Z-order permutation and its inverse.

    Z-order makes each RAY_TILE of lanes a compact 2D pixel block, so sky
    blocks terminate as whole tiles and the kernel's early-out reclaims
    them (host-side, cached per resolution)."""
    import numpy as np

    ys, xs = np.mgrid[0:height, 0:width]

    def spread(v):
        v = v.astype(np.uint64)
        v = (v | (v << 16)) & 0x0000FFFF0000FFFF
        v = (v | (v << 8)) & 0x00FF00FF00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0F
        v = (v | (v << 2)) & 0x3333333333333333
        v = (v | (v << 1)) & 0x5555555555555555
        return v

    code = (spread(xs) | (spread(ys) << np.uint64(1))).ravel()
    order = np.argsort(code, kind="stable").astype(np.int32)
    rank = np.empty_like(order)
    rank[order] = np.arange(order.size, dtype=np.int32)
    return order, rank


def pack_camera_row(camera, width: int, height: int) -> jnp.ndarray:
    """Pack a core.camera.Camera into the kernel's (24,) SMEM row."""
    return jnp.concatenate([
        camera.origin,
        camera.lower_left_corner,
        camera.horizontal,
        camera.vertical,
        camera.right,
        camera.up,
        jnp.stack([
            camera.lens_radius,
            jnp.asarray(width, jnp.float32),
            jnp.asarray(height, jnp.float32),
        ]),
        jnp.zeros((3,), jnp.float32),
    ]).astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("trace_depth", "t_min", "has_dielectrics", "sky_on",
                     "hw_prng", "early_out", "interpret"),
)
def megatrace(
    origin: jnp.ndarray,  # (N, 3)
    direction: jnp.ndarray,  # (N, 3)
    active: jnp.ndarray,  # (N,) bool
    centers: jnp.ndarray,  # (S, 3)
    radii: jnp.ndarray,  # (S,)
    records: jnp.ndarray,  # (S, 11) packed material rows
    sky_bottom: jnp.ndarray,  # (3,)
    sky_top: jnp.ndarray,  # (3,)
    seed: jnp.ndarray,  # () int32
    *,
    trace_depth: int,
    t_min: float = 0.0,
    has_dielectrics: bool = True,
    sky_on: bool = True,
    hw_prng: bool | None = None,
    early_out: bool = True,
    interpret: bool = False,
):
    """Full fused path trace; returns dict of flat per-ray outputs."""
    if hw_prng is None:
        hw_prng = not interpret  # no hardware PRNG in CPU interpret mode
    n = origin.shape[0]
    n_pad = -(-n // RAY_TILE) * RAY_TILE

    rays = jnp.zeros((8, n_pad), jnp.float32)
    rays = rays.at[0:3, :n].set(origin.T)
    rays = rays.at[3:6, :n].set(direction.T)
    rays = rays.at[6, :n].set(active.astype(jnp.float32))
    # row 7: global lane id (exact in f32 below 2^24) for RNG decorrelation
    rays = rays.at[7, :].set(jnp.arange(n_pad, dtype=jnp.float32))
    if n_pad != n:
        rays = rays.at[5, n:].set(1.0)

    sph, rec_t, s_pad = _pack_scene_tables(centers, radii, records)
    sky = _pack_sky_row(sky_bottom, sky_top)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape((1, 1))

    grid = (n_pad // RAY_TILE,)
    out = pl.pallas_call(
        functools.partial(
            _kernel,
            trace_depth=trace_depth,
            t_min=t_min,
            has_dielectrics=has_dielectrics,
            sky_on=sky_on,
            hw_prng=hw_prng,
            early_out=early_out,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (8, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (s_pad, 8), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (REC_COLS, s_pad), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (OUT_ROWS, RAY_TILE), lambda i: (0, i),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((OUT_ROWS, n_pad), jnp.float32),
        interpret=interpret,
    )(seed_arr, sky, rays, sph, rec_t)

    return {
        "radiance": out[0:3, :n].T,
        "valid": out[3, :n] > 0.5,
        "aov_normal": out[4:7, :n].T,
        "aov_albedo": out[7:10, :n].T,
        "events": out[10, :n],
        "pixel_rays": out[11, :n].astype(jnp.int32),
    }
