"""Differentiable tape-replay for the fused sample-batch megakernel.

The fused forward kernel (ops/pallas_megatrace.sample_batch) is ~2.7x
faster than the differentiable wavefront but its hit attributes carry no
gradients.  This module restores gradients WITHOUT giving up the fused
forward: the kernel (want_tape=True, reproducible hash PRNG) additionally
emits a per-iteration "tape" — the winner sphere index per lane (-1 miss,
-2 idle) — and the backward pass replays the whole persistent-lane state
machine here in O(N * iterations) differentiable jnp: per-lane gathers of
the WINNER's parameters only, no (N, S) intersection work and no Pallas in
the autodiff graph.  `sample_batch_diff` packages the pair as a
jax.custom_vjp whose primal is the kernel output and whose VJP is the
replay's.

Replay-vs-kernel contract: identical uniforms (the `_uniforms_hash`
counter PRNG is mirrored bit-exactly below), identical branch rules, so
the replay traverses the same paths; values differ only by float
reassociation (tests assert ~1e-4 channel agreement).  Discrete decisions
(winner selection, scatter lotteries, root choice) are constants of the
tape — the a.e.-correct detached-decision gradient estimator, same policy
as the wavefront's detached Pallas selection (render/integrator.py).

Scope (gated by `replay_eligible`): sphere/rect/box scenes plus
VMEM-resident triangle meshes (<= TRI_MAX rows — mesh vertex, shading
normal and uv gradients); constant, checker and image-atlas albedo
textures (texel gradients flow to the atlas from exactly the rays that
sampled each texel — nearest-neighbor index detached, same policy as the
wavefront's texture_atlas gradients); convex probabilistic volumes
(Beer–Lambert free-path score gradients for density); unit-shutter
sphere motion blur; gradient/none/cubemap sky (environment texel
gradients).  OUT of scope: HBM-streamed triangles and perlin marble —
those scenes keep the wavefront.  Covers the BASELINE gradient configs
(cover-scene class) plus Cornell-class rect/box scenes, mesh inverse
rendering and texture-painting inverse problems.
The tape code indexes the KERNEL's padded row space: spheres [0, s_pad),
rects [s_pad, s_pad + R_pad), boxes after, then triangles (pack layouts
are shared via mk.sphere_pad_count / mk.pack_aux_tables /
mk.pack_tri_tables).  Reference math parity anchors
are the same as ops/pallas_megatrace (View.cs:38-48 camera,
HitTests.cs:23-113 sphere/rect/box, Material.cs:75-161 scatter,
SampleBatchJob.cs:341-396 fold/termination).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from raytracing_in_one_weekend_tpu.ops import pallas_megatrace as mk

BIG = mk.BIG
SELF_EPS = mk.SELF_EPS
TWO_PI = mk.TWO_PI
INV_2_24 = mk.INV_2_24
PLASTIC_IOR = mk.PLASTIC_IOR
METAL_IOR = mk.METAL_IOR


_UNROLL = 1  # inner-scan unroll: 2/4/8 all measured a WASH on-chip
# (469 ms either way at 512^2 x 8 spp — the per-iteration jax.checkpoint
# blocks cross-iteration fusion, so unrolling only duplicates code)
_CKPT_SPAN = 8  # iterations fused per remat unit — on-chip sweep at
# 512^2 x 8 spp x depth 8: span 1 -> 388 ms replay-VJP, 2 -> 396,
# 4 -> 407, 8 -> 365 (whole trace_depth block per unit; falls back to 1
# when it doesn't divide the block)


def replay_eligible(scene) -> bool:
    """Static gate for the tape-replay differentiable fused path
    (spheres + oriented rects/boxes + VMEM-resident triangle meshes;
    constant/checker/image albedo textures — texture-atlas gradients
    included; convex probabilistic volumes — Beer–Lambert free-path
    score gradients for density; unit-shutter sphere motion blur;
    gradient/none sky; no HBM-streamed triangles or perlin marble — the
    marble turbulence is not mirrored here, so such scenes keep the
    wavefront)."""
    return (
        mk.scene_eligible(
            scene, allow_rect_box=True, allow_textures=True,
            allow_triangles=True, allow_volumes=True, allow_motion=True,
            allow_cubemap=True,
        )
        and scene.triangles.vert0.shape[0] <= mk.TRI_MAX
        and (
            not scene.flags.has_procedural_textures
            or scene.textures.perlin is None
        )
    )


# --------------------------------------------------------------------------
# Bit-exact jnp mirror of the kernel's counter PRNG (no pltpu ops)
# --------------------------------------------------------------------------


def _lowbias32(x):
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> jnp.uint32(15))
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> jnp.uint32(16))
    return x


def _uniforms_hash(seed, salt, lanes):
    """Tuple of 8 U[0,1) rows shaped like `lanes`; mirrors
    pallas_megatrace._uniforms_hash bit-exactly (same per-stream int32
    chain).  Per-stream rows instead of one (8, N) stack: the Pallas
    backward kernel (ops/megatrace_bwd) runs this on (1, T) lane rows,
    and rank-1 row slices of a stacked array CHECK-crash Mosaic's
    layout inference (layout.h:320) — XLA fuses the per-row chains
    identically either way."""
    rows = []
    for k in range(8):
        x = seed + lanes * jnp.int32(9781) + jnp.int32(k * 6271) + salt
        bits = _lowbias32(jax.lax.bitcast_convert_type(x, jnp.uint32))
        low24 = (bits >> jnp.uint32(8)).astype(jnp.int32)
        rows.append(low24.astype(jnp.float32) * INV_2_24)
    return tuple(rows)


def _normalize3(x, y, z, eps=1e-12):
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, eps))
    return x * inv, y * inv, z * inv


def _cosine_hemisphere(u, v, nx, ny, nz):
    return mk._cosine_hemisphere(u, v, nx, ny, nz)


def _unit_sphere(u, v):
    return mk._unit_sphere(u, v)


# --------------------------------------------------------------------------
# Shared per-iteration state machine (XLA replay AND the Pallas backward
# kernel both run THIS function — ops/megatrace_bwd.py calls it inside the
# kernel body and machine-derives its adjoint with jax.vjp, so the two
# backends cannot drift)
# --------------------------------------------------------------------------


def build_entity_rows(
    centers, radii, records, rect_tables=None, box_tables=None,
    tri_tables=None, tex_tables=None, move_vectors=None,
):
    """Pack every entity kind into one differentiable (rows, cols) table
    indexed by the KERNEL's padded combined row space (spheres [0, s_pad),
    rects, boxes, triangles).  Returns (entity_rows, layout) where layout
    is the static dict(mvbase, txbase, cols).  Columns:
      0:3  sphere center | quat xyz | tri edge_a
      3    radius | quat w
      4:7  (unused) | position | tri edge_b
      7:10 (unused) | box extents | tri vert0
      10:21 material rows 0-10
      21 kind (0 sphere / 1 rect / 2 box / 3 triangle)
      22 material id
      [triangle scenes only] 23:32 per-vertex normals (v0 v1 v2 xyz),
      32:38 per-vertex uvs (u0 u1 u2, v0 v1 v2)
      then (motion) 3 sphere move-offset cols, then TEX_ROWS per-material
      texture record columns (pack_texture_tables rows, pre-gathered per
      entity) when textured."""
    has_rects = rect_tables is not None
    has_boxes = box_tables is not None
    has_tris = tri_tables is not None
    has_tex = tex_tables is not None
    has_motion = move_vectors is not None
    s_real = centers.shape[0]
    s_pad = mk.sphere_pad_count(s_real)
    cols = 38 if has_tris else 23
    mvbase = cols
    if has_motion:
        cols += 3  # sphere move offsets (zero on other kinds' rows)
    txbase = cols
    sph_block = jnp.zeros((s_pad, cols), jnp.float32)
    sph_block = sph_block.at[:s_real, 0:3].set(centers)
    sph_block = sph_block.at[:s_real, 3].set(radii)
    sph_block = sph_block.at[:s_real, 10:21].set(records[:, :11])
    sph_block = sph_block.at[:s_real, 22].set(records[:, 11])
    if has_motion:
        sph_block = sph_block.at[:s_real, mvbase:mvbase + 3].set(
            move_vectors
        )
    blocks = [sph_block]
    if has_rects:
        rgeo, rrec = rect_tables
        rb = jnp.zeros((rgeo.shape[0], cols), jnp.float32)
        rb = rb.at[:, 0:7].set(rgeo[:, 0:7])  # quat | pos
        rb = rb.at[:, 10:21].set(rrec[0:11, :].T)
        rb = rb.at[:, 21].set(1.0)
        rb = rb.at[:, 22].set(rrec[14, :])
        blocks.append(rb)
    if has_boxes:
        bgeo, brec = box_tables
        bb = jnp.zeros((bgeo.shape[0], cols), jnp.float32)
        bb = bb.at[:, 0:10].set(bgeo[:, 0:10])  # quat | pos | extents
        bb = bb.at[:, 10:21].set(brec[0:11, :].T)
        bb = bb.at[:, 21].set(2.0)
        bb = bb.at[:, 22].set(brec[21, :])
        blocks.append(bb)
    if has_tris:
        tgeo, trec_t = tri_tables
        tb = jnp.zeros((tgeo.shape[0], cols), jnp.float32)
        tb = tb.at[:, 0:3].set(tgeo[:, 0:3])  # edge_a
        tb = tb.at[:, 4:7].set(tgeo[:, 3:6])  # edge_b
        tb = tb.at[:, 7:10].set(tgeo[:, 6:9])  # vert0
        tb = tb.at[:, 10:21].set(trec_t[0:11, :].T)
        tb = tb.at[:, 21].set(3.0)
        tb = tb.at[:, 22].set(trec_t[11, :])
        # per-vertex normals (rows 12-20) + uvs (rows 21-26), kernel
        # pack_tri_tables layout
        tb = tb.at[:, 23:38].set(trec_t[12:27, :].T)
        blocks.append(tb)
    entity_rows = (
        jnp.concatenate(blocks, axis=0) if len(blocks) > 1 else blocks[0]
    )
    if has_tex:
        # one build-time texture-record gather per entity (texrec main
        # colors stay differentiable through it); the per-lane atlas
        # texel fetch in the iteration is the only in-scan gather
        ent_ids = jax.lax.stop_gradient(
            entity_rows[:, 22]
        ).astype(jnp.int32)
        entity_rows = jnp.concatenate(
            [entity_rows, tex_tables[0].T[ent_ids]], axis=1
        )
    return entity_rows, dict(mvbase=mvbase, txbase=txbase, cols=cols)


def _onehot_fetch3(tbl, w_pad: int, h_pad: int, colx, rowy):
    """Per-lane nearest texel from a (3*w_pad, h_pad) channel-plane
    table via row one-hot contraction + column mask-reduce — the SAME
    fetch shape as the forward kernel (pallas_megatrace._bounce_textures)
    so Mosaic lowers it, and jax.vjp transposes it into the MXU texel
    cotangent scatter the backward kernel needs (ops/megatrace_bwd).
    colx/rowy may be any 2-D lane block (e.g. the packed (8, 128))."""
    shp = colx.shape
    m = colx.size
    cflat = colx.reshape(1, m)
    rflat = rowy.reshape(1, m)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (h_pad, m), 0)
    r_hot = (r_iota == rflat).astype(jnp.float32)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (w_pad, m), 0)
    c_hot = (c_iota == cflat).astype(jnp.float32)
    out = []
    for c in range(3):
        col = jax.lax.dot_general(
            tbl[c * w_pad : (c + 1) * w_pad, :], r_hot,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (w_pad, m)
        out.append(
            jnp.sum(c_hot * col, axis=0, keepdims=True).reshape(shp)
        )
    return out


def replay_iteration(
    state, wt, tape_row, it, env, *,
    jitter, has_motion, has_volumes, has_rects, has_boxes, has_tris,
    has_tex, has_img, has_dielectrics, sky_on, trace_depth,
    t_min, img_pads, cube_pads, mvbase, txbase,
    onehot_fetch: bool = False,  # Pallas-kernel context: per-lane flat
    #   gathers have no Mosaic lowering — image/cubemap texels ride
    #   one-hot MXU contractions against env["img_tbl"]/env["cube_tbl"]
    #   instead of env["img_flat"]/env["cube_flat"], and the sphere UV's
    #   arctan2/arccos take the kernel's select-based forms
):
    """One persistent-lane iteration of the tape replay: regen + one
    bounce at the tape-confirmed winner + fold/termination.  Runs
    unchanged under XLA (replay's scan body) and inside the Pallas
    backward kernel (ops/megatrace_bwd) — which also machine-derives
    its adjoint with jax.vjp, so the two backends cannot drift.

    EVERYTHING is per-component (n,) row math — no (3, n) stacks, no
    lane-dim column slices: Mosaic's vector layouts want plain lane
    vectors, and the transposes jax.vjp derives from them stay
    elementwise (a (n,)->(3,n) broadcast transposes into a sublane-dim
    multi_reduction Mosaic cannot lower with offset layouts).

    state: dict of (n,) rows — ox..oz, dx..dz, thx..thz (throughput),
    radx..radz (radiance), active, valid, started, depth_ct,
    csx..csz (color-sum accumulator), cnt, lp, [ptime], [in_id, in_den,
    in_ar, in_ag, in_ab, in_er, in_eg, in_eb medium rows].
    wt: (cols, n) pre-gathered winner entity rows, TRANSPOSED
    build_entity_rows layout (row k = column k for every lane).
    tape_row: (n,) winner codes.  it: () int32 iteration id.
    env: dict of traced constants — per_pixel/lanes/pixels (n,) rows,
    camera pieces co/ll/hh/vv/rr/uu (3-seqs of scalars), lens_radius/
    width/height scalars, sky_b/sky_t 3-seqs, seed, vol0 (8-seq of
    scalars) when has_volumes, img_flat/cube_flat flats when
    has_img/cube.  img_pads = (img_w, img_h, w_pad, ah_pad);
    cube_pads = (c_w, c_h, cw_pad, cfh_pad)."""
    per_pixel = env["per_pixel"]
    lanes = env["lanes"]
    seed = env["seed"]
    co, ll, hh, vv = env["co"], env["ll"], env["hh"], env["vv"]
    rr, uu_ = env["rr"], env["uu"]
    lens_radius = env["lens_radius"]
    width, height = env["width"], env["height"]
    # per-pixel coords recomputed here (not hoisted) so the kernel path's
    # machine-derived adjoint sees the same width chain as the XLA vjp
    py_row = jnp.floor(env["pixels"] / width)
    px_row = env["pixels"] - py_row * width

    ox, oy, oz = state["ox"], state["oy"], state["oz"]
    dx, dy, dz = state["dx"], state["dy"], state["dz"]
    thx, thy, thz = state["thx"], state["thy"], state["thz"]
    radx, rady, radz = state["radx"], state["rady"], state["radz"]
    active, valid = state["active"], state["valid"]
    started, depth_ct = state["started"], state["depth_ct"]

    # ---- regen (kernel _batch_kernel camera section) ---------------
    regen = (active < 0.5) & (started < per_pixel)
    u = _uniforms_hash(seed, it * jnp.int32(1013904223), lanes)
    if jitter:
        jx, jy = u[0], u[1]
    else:
        jx = jy = 0.5
    un = (px_row + jx) / width
    vn = (py_row + jy) / height
    theta = u[2] * TWO_PI
    radius = jnp.sqrt(u[3]) * lens_radius
    rdx = radius * jnp.cos(theta)
    rdy = radius * jnp.sin(theta)
    offx = rdx * rr[0] + rdy * uu_[0]
    offy = rdx * rr[1] + rdy * uu_[1]
    offz = rdx * rr[2] + rdy * uu_[2]
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
    radx = jnp.where(regen, 0.0, radx)
    rady = jnp.where(regen, 0.0, rady)
    radz = jnp.where(regen, 0.0, radz)
    valid = jnp.where(regen, 0.0, valid)
    depth_ct = jnp.where(regen, 0.0, depth_ct)
    started = started + jnp.where(regen, 1.0, 0.0)
    active = jnp.where(regen, 1.0, active)
    was_active = active > 0.5
    lp = jnp.where(regen, 0.0, state["lp"])
    if has_motion:
        # shutter time (kernel: ptime = u[7] at regen)
        ptime = jnp.where(regen, u[7], state["ptime"])
    if has_volumes:
        # camera-containment medium reset (kernel vol0_ref rows)
        v0 = env["vol0"]
        in_id = jnp.where(regen, v0[0], state["in_id"])
        in_den = jnp.where(regen, v0[1], state["in_den"])
        in_ar = jnp.where(regen, v0[2], state["in_ar"])
        in_ag = jnp.where(regen, v0[3], state["in_ag"])
        in_ab = jnp.where(regen, v0[4], state["in_ab"])
        in_er = jnp.where(regen, v0[5], state["in_er"])
        in_eg = jnp.where(regen, v0[6], state["in_eg"])
        in_eb = jnp.where(regen, v0[7], state["in_eb"])

    # ---- one bounce along the tape ---------------------------------
    ub = _uniforms_hash(
        seed, it * jnp.int32(1013904223) + jnp.int32(7919), lanes
    )
    code = tape_row
    hit = was_active & (code >= -0.5)
    miss = was_active & jnp.logical_not(hit)

    cx_, cy_, cz_ = wt[0], wt[1], wt[2]  # sphere center | quat xyz |
    # tri edge_a
    r = wt[3]  # radius | quat w
    kind = wt[21]
    has_aux = has_rects or has_boxes or has_tris
    s_hit = hit & (kind < 0.5) if has_aux else hit

    if has_motion:
        # TransformAtTime with the unit shutter (kernel motion path;
        # Entity.cs:124-127): winner center at the path's time (move
        # columns are zero on non-sphere rows)
        cx_ = cx_ + wt[mvbase] * ptime
        cy_ = cy_ + wt[mvbase + 1] * ptime
        cz_ = cz_ + wt[mvbase + 2] * ptime
    a = dx * dx + dy * dy + dz * dz
    b = (ox * dx + oy * dy + oz * dz) - (
        dx * cx_ + dy * cy_ + dz * cz_
    )
    c_term = (
        (ox * ox + oy * oy + oz * oz)
        - 2.0 * (ox * cx_ + oy * cy_ + oz * cz_)
        + (cx_ * cx_ + cy_ * cy_ + cz_ * cz_)
        - r * r
    )
    disc = b * b - a * c_term
    # double-where: idle/miss lanes hold garbage ray state (zero
    # directions, pad spheres); sanitize every sqrt/div argument so
    # the unselected branch can't inject NaN into the VJP
    # floor the discriminant: sqrt'(0) is infinite and grazing hits
    # (disc ~ 0 for a tape-confirmed hit) otherwise NaN the VJP; the
    # floor only caps the derivative, the primal comes from the kernel
    sq = jnp.sqrt(jnp.where(s_hit, jnp.maximum(disc, 1e-8), 1.0))
    inv_a = 1.0 / jnp.where(s_hit, a, 1.0)
    t_near = (-b - sq) * inv_a
    t_far = (-b + sq) * inv_a
    # same root rule as the kernel; the tape guarantees a hit exists
    t_hit = jnp.where(t_near > t_min, t_near, t_far)
    t_hit = jnp.where(s_hit, t_hit, 0.0)
    if has_volumes:
        # winner exit root for the convex volume walk (kernel
        # t_exit_s; FindHits exit injection SampleBatchJob.cs:462-470)
        t_exit = jnp.where(s_hit & (t_far > t_min), t_far, BIG)

    if has_rects or has_boxes:
        # winner-local ray for the oriented kinds (kernel rect/box
        # sections): rotate by the inverse quat.  Sphere-kind rows
        # hold center/radius in the quat slots — the products stay
        # finite and the per-kind selects below discard them.
        qx, qy, qz, qw = cx_, cy_, cz_, r
        ppx, ppy, ppz = wt[4], wt[5], wt[6]
        olx, oly, olz = mk._quat_rotate(
            -qx, -qy, -qz, qw, ox - ppx, oy - ppy, oz - ppz
        )
        dlx, dly, dlz = mk._quat_rotate(-qx, -qy, -qz, qw, dx, dy, dz)
    if has_rects:
        r_hit = hit & (kind > 0.5) & (kind < 1.5)
        safe_dz = jnp.where(r_hit & (dlz != 0.0), dlz, 1.0)
        t_hit = jnp.where(r_hit, -olz / safe_dz, t_hit)
    if has_boxes:
        # Majercik slab walk, same branch rules as the kernel
        # (HitTests.cs:81-113); the tape guarantees the box was hit
        b_hit = hit & (kind > 1.5)
        ex_, ey_, ez_ = wt[7], wt[8], wt[9]
        boX = olx + dlx * t_min
        boY = oly + dly * t_min
        boZ = olz + dlz * t_min
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
        sgx, sgy, sgz = -jnp.sign(dlx), -jnp.sign(dly), -jnp.sign(dlz)
        sdx_ = jnp.where(dlx == 0.0, 1e-30, dlx)
        sdy_ = jnp.where(dly == 0.0, 1e-30, dly)
        sdz_ = jnp.where(dlz == 0.0, 1e-30, dlz)
        dpx = (ex_ * winding * sgx - boX) / sdx_
        dpy = (ey_ * winding * sgy - boY) / sdy_
        dpz = (ez_ * winding * sgz - boZ) / sdz_
        test_x = (
            (dpx >= 0.0)
            & (jnp.abs(boY + dly * dpx) < ey_)
            & (jnp.abs(boZ + dlz * dpx) < ez_)
        )
        test_y = (
            (dpy >= 0.0)
            & (jnp.abs(boZ + dlz * dpy) < ez_)
            & (jnp.abs(boX + dlx * dpy) < ex_)
        )
        tb = jnp.where(
            test_x, dpx, jnp.where(test_y, dpy, dpz)
        ) + t_min
        t_hit = jnp.where(b_hit, tb, t_hit)
        if has_volumes:
            # slab exit for the convex walk (kernel b_far section;
            # parallel axes get 1/1e-30 = 1e30 instead of the
            # kernel's explicit inf — on tape-confirmed box hits the
            # min/max chain selects a finite real axis either way,
            # and 1e30 keeps the mul transposes NaN-free)
            ibx = 1.0 / sdx_
            iby = 1.0 / sdy_
            ibz = 1.0 / sdz_
            tx0 = (-ex_ - boX) * ibx
            tx1 = (ex_ - boX) * ibx
            ty0 = (-ey_ - boY) * iby
            ty1 = (ey_ - boY) * iby
            tz0 = (-ez_ - boZ) * ibz
            tz1 = (ez_ - boZ) * ibz
            b_far = jnp.minimum(
                jnp.maximum(tx0, tx1),
                jnp.minimum(
                    jnp.maximum(ty0, ty1), jnp.maximum(tz0, tz1)
                ),
            ) + t_min
            b_near = jnp.maximum(
                jnp.minimum(tx0, tx1),
                jnp.maximum(
                    jnp.minimum(ty0, ty1), jnp.minimum(tz0, tz1)
                ),
            ) + t_min
            exit_ok = (b_far > t_min) & (b_near < b_far)
            t_exit = jnp.where(
                b_hit, jnp.where(exit_ok, b_far, BIG), t_exit
            )

    if has_tris:
        # Möller–Trumbore recompute at the tape-confirmed winner
        # (kernel _block_sweep; HitTests.cs:116-150).  The tape
        # guarantees det != 0 and a valid barycentric hit on t3 lanes;
        # other kinds' rows hold unrelated data there, so every
        # division is where-guarded.
        t3_hit = hit & (kind > 2.5)
        eax, eay, eaz = wt[0], wt[1], wt[2]
        ebx, eby, ebz = wt[4], wt[5], wt[6]
        v0x, v0y, v0z = wt[7], wt[8], wt[9]
        pvx = dy * eaz - dz * eay
        pvy = dz * eax - dx * eaz
        pvz = dx * eay - dy * eax
        t_det = ebx * pvx + eby * pvy + ebz * pvz
        t_inv_det = 1.0 / jnp.where(t3_hit & (t_det != 0.0), t_det, 1.0)
        tvx = ox - v0x
        tvy = oy - v0y
        tvz = oz - v0z
        t_bu = (tvx * pvx + tvy * pvy + tvz * pvz) * t_inv_det
        qvx = tvy * ebz - tvz * eby
        qvy = tvz * ebx - tvx * ebz
        qvz = tvx * eby - tvy * ebx
        t_bv = (dx * qvx + dy * qvy + dz * qvz) * t_inv_det
        t_mt = (eax * qvx + eay * qvy + eaz * qvz) * t_inv_det
        t_hit = jnp.where(t3_hit, t_mt, t_hit)

    px = ox + t_hit * dx
    py = oy + t_hit * dy
    pz = oz + t_hit * dz
    safe_r = jnp.where(s_hit & (r != 0.0), r, 1.0)
    nx = jnp.where(s_hit, (px - cx_) / safe_r, 0.0)
    ny = jnp.where(s_hit, (py - cy_) / safe_r, 0.0)
    nz = jnp.where(s_hit, (pz - cz_) / safe_r, 0.0)
    if has_rects:
        # constant rect normal: rotated local +Z (Entity.cs:65)
        rnx, rny, rnz = mk._quat_rotate(qx, qy, qz, qw, 0.0, 0.0, 1.0)
        nx = jnp.where(r_hit, rnx, nx)
        ny = jnp.where(r_hit, rny, ny)
        nz = jnp.where(r_hit, rnz, nz)
    if has_boxes:
        # dominant-|p|/extent face normal (kernel box-normal section)
        plx, ply, plz = mk._quat_rotate(
            -qx, -qy, -qz, qw, px - ppx, py - ppy, pz - ppz
        )
        rex = jnp.abs(plx) / jnp.maximum(ex_, 1e-12)
        rey = jnp.abs(ply) / jnp.maximum(ey_, 1e-12)
        rez = jnp.abs(plz) / jnp.maximum(ez_, 1e-12)
        is_x = (rex >= rey) & (rex >= rez)
        is_y = jnp.logical_not(is_x) & (rey >= rez)
        is_z = jnp.logical_not(is_x) & jnp.logical_not(is_y)
        lnx = jnp.where(is_x, jnp.sign(plx), 0.0)
        lny = jnp.where(is_y, jnp.sign(ply), 0.0)
        lnz = jnp.where(is_z, jnp.sign(plz), 0.0)
        bnx, bny, bnz = mk._quat_rotate(qx, qy, qz, qw, lnx, lny, lnz)
        nx = jnp.where(b_hit, bnx, nx)
        ny = jnp.where(b_hit, bny, ny)
        nz = jnp.where(b_hit, bnz, nz)

    if has_tris:
        # barycentric vertex-normal lerp, normalized after (kernel
        # triangle-normal section / Entity.cs:65)
        t_w0 = 1.0 - t_bu - t_bv
        tnx = (wt[23] * t_w0 + wt[26] * t_bu + wt[29] * t_bv)
        tny = (wt[24] * t_w0 + wt[27] * t_bu + wt[30] * t_bv)
        tnz = (wt[25] * t_w0 + wt[28] * t_bu + wt[31] * t_bv)
        t_ninv = jax.lax.rsqrt(
            jnp.maximum(tnx * tnx + tny * tny + tnz * tnz, 1e-24)
        )
        nx = jnp.where(t3_hit, tnx * t_ninv, nx)
        ny = jnp.where(t3_hit, tny * t_ninv, ny)
        nz = jnp.where(t3_hit, tnz * t_ninv, nz)

    mtype = wt[10]
    alb_r, alb_g, alb_b = wt[11], wt[12], wt[13]
    em_r, em_g, em_b = wt[14], wt[15], wt[16]
    gloss = wt[17]
    metallic = wt[18]
    parameter = wt[19]

    if has_tex:
        # ---- procedural albedo override (kernel _bounce_textures;
        # Texture.cs SampleColor semantics) ---------------------------
        ttype = wt[txbase]
        main_r, main_g, main_b = (
            wt[txbase + 1], wt[txbase + 2], wt[txbase + 3]
        )
        freq = wt[txbase + 7]
        # checker: dominant-normal projection (textures._checker_uv)
        anx, any_, anz = jnp.abs(nx), jnp.abs(ny), jnp.abs(nz)
        use_x = (anx > any_) & (anx > anz)
        use_y = jnp.logical_not(use_x) & (any_ > anx) & (any_ > anz)
        v0_ = jnp.where(use_x, nx, jnp.where(use_y, ny, nz))
        v1_ = jnp.where(use_x, ny, jnp.where(use_y, nz, nx))
        v2_ = jnp.where(use_x, nz, jnp.where(use_y, nx, ny))
        safe0 = jnp.where(v0_ == 0.0, 1.0, v0_)
        cu = 0.5 + 0.5 * (v1_ / safe0)
        cv = 0.5 + 0.5 * (v2_ / safe0)
        sines = jnp.sin(jnp.pi * freq * cu) * jnp.sin(
            jnp.pi * freq * cv
        )
        is_chk = (ttype > 1.5) & (ttype < 2.5)
        pick_main = is_chk & (sines < 0.0)
        pick_sec = is_chk & jnp.logical_not(sines < 0.0)
        alb_r = jnp.where(
            pick_main, main_r,
            jnp.where(pick_sec, wt[txbase + 4], alb_r)
        )
        alb_g = jnp.where(
            pick_main, main_g,
            jnp.where(pick_sec, wt[txbase + 5], alb_g)
        )
        alb_b = jnp.where(
            pick_main, main_b,
            jnp.where(pick_sec, wt[txbase + 6], alb_b)
        )
        if has_img:
            # nearest-neighbor atlas fetch.  The texel INDEX is a
            # detached decision (same policy as the wavefront's
            # texture_atlas gradients: texels get cotangent from
            # exactly the rays that sampled them) — stop_gradient on
            # the UV kills the atan2/acos NaN transposes at poles and
            # on idle lanes in one move.  Sphere winners take the
            # Shirley Book-2 mapping; rect/box keep uv = 0 (kernel
            # winner-UV section).
            img_w, img_h, w_pad, ah_pad = img_pads
            if onehot_fetch:
                # jnp.arctan2/arccos have no Mosaic lowering; the
                # select-based kernel forms match the forward exactly
                su = (mk._atan2(-nz, jnp.where(s_hit, nx, 1.0))
                      + jnp.pi) * (0.5 / jnp.pi)
                sv = mk._acos(jnp.clip(-ny, -1.0, 1.0)) * (1.0 / jnp.pi)
            else:
                su = (jnp.arctan2(-nz, jnp.where(s_hit, nx, 1.0))
                      + jnp.pi) * (0.5 / jnp.pi)
                sv = jnp.arccos(
                    jnp.clip(-ny, -1.0, 1.0)
                ) * (1.0 / jnp.pi)
            tex_u = jnp.where(s_hit, su, 0.0)
            tex_v = jnp.where(s_hit, sv, 0.0)
            if has_tris:
                # triangles: baked per-vertex uv lerp (kernel
                # winner-UV section)
                tex_u = jnp.where(
                    t3_hit,
                    wt[32] * t_w0 + wt[33] * t_bu + wt[34] * t_bv,
                    tex_u,
                )
                tex_v = jnp.where(
                    t3_hit,
                    wt[35] * t_w0 + wt[36] * t_bu + wt[37] * t_bv,
                    tex_v,
                )
            tex_u = jax.lax.stop_gradient(tex_u)
            tex_v = jax.lax.stop_gradient(tex_v)
            cx2 = jnp.clip(
                (tex_u * img_w).astype(jnp.int32), 0, img_w - 1
            )
            cy2 = jnp.clip(
                (tex_v * img_h).astype(jnp.int32), 0, img_h - 1
            )
            roww = wt[txbase + 8].astype(jnp.int32) + cy2
            is_img = (ttype > 3.5) & (ttype < 4.5)
            if onehot_fetch:
                texel = _onehot_fetch3(
                    env["img_tbl"], w_pad, ah_pad, cx2, roww
                )
            else:
                img_flat = env["img_flat"]
                texel = [
                    img_flat[(c2 * w_pad + cx2) * ah_pad + roww]
                    for c2 in range(3)
                ]
            alb_r = jnp.where(is_img, texel[0] * main_r, alb_r)
            alb_g = jnp.where(is_img, texel[1] * main_g, alb_g)
            alb_b = jnp.where(is_img, texel[2] * main_b, alb_b)

    scatter_mask = hit
    if has_volumes:
        # ---- probabilistic volume walk (kernel has_volumes section;
        # SampleBatchJob.cs:212-303 entry/exit pairing + Beer-Lambert
        # free path).  Decisions recompute bit-exactly from the
        # mirrored uniforms + winner geometry; the free-path draw's
        # density dependence is DETACHED and carried by the
        # score-function lp terms instead (same policy as the
        # wavefront, render/integrator.py) — detached autodiff alone
        # measured d/d_density ~ 0.
        in_vol = in_id >= 0.0
        hit_is_vol = hit & (mtype > 1.5)
        entering = (dx * nx + dy * ny + dz * nz) < 0.0
        v_den = jnp.where(in_vol, in_den, parameter)
        v_ar = jnp.where(in_vol, in_ar, alb_r)
        v_ag = jnp.where(in_vol, in_ag, alb_g)
        v_ab = jnp.where(in_vol, in_ab, alb_b)
        v_er = jnp.where(in_vol, in_er, em_r)
        v_eg = jnp.where(in_vol, in_eg, em_g)
        v_eb = jnp.where(in_vol, in_eb, em_b)
        v_id = jnp.where(in_vol, in_id, wt[22])
        # the free-path draw comes from the BOUNCE uniforms block
        # (kernel _bounce_step u[6:7], which is _batch_kernel's ub)
        u_free = jnp.maximum(ub[6], 1e-12)
        den_sg = jax.lax.stop_gradient(
            jnp.maximum(v_den, 1e-12)
        )
        free_path = -jnp.log(u_free) / den_sg
        best_t_w = jnp.where(hit, t_hit, BIG)
        seg_len = jnp.where(in_vol, best_t_w, t_exit - best_t_w)
        vol_candidate = hit & (in_vol | (hit_is_vol & entering))
        vol_scatter = vol_candidate & (free_path < seg_len)
        vol_t = jnp.where(in_vol, free_path, best_t_w + free_path)
        pass_through = (
            hit & jnp.logical_not(in_vol) & hit_is_vol & entering
            & jnp.logical_not(vol_scatter)
        )
        exits_own = (
            in_vol & hit & hit_is_vol & jnp.logical_not(entering)
            & jnp.logical_not(vol_scatter)
            & (jnp.abs(wt[22] - in_id) < 0.5)
        )
        skip = pass_through | exits_own
        skip_t = jnp.where(pass_through, t_exit, best_t_w)
        skip_t = jnp.where(skip, skip_t, 0.0)  # garbage-lane guard
        scatter_mask = hit & jnp.logical_not(skip)

        # score-function log-probability of the observed decisions
        # (integrator._bounce_once volume logp): scatter at d has pdf
        # rho*exp(-rho d); surviving segment L has prob exp(-rho L)
        survive = vol_candidate & jnp.logical_not(vol_scatter)
        rho = jnp.maximum(v_den, 1e-8)
        d_obs = jax.lax.stop_gradient(
            jnp.where(vol_scatter, free_path, 0.0)
        )
        l_obs = jax.lax.stop_gradient(
            jnp.where(survive, jnp.minimum(seg_len, 1e6), 0.0)
        )
        lp = lp + jnp.where(
            vol_scatter, jnp.log(rho) - rho * d_obs, 0.0
        ) + jnp.where(survive, -rho * l_obs, 0.0)

        # effective hit record: the in-medium scatter replaces the
        # surface hit (position, backwards normal, medium emission)
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

    ua, ub_, uc, ud = ub[0], ub[1], ub[2], ub[3]
    u_choice, u_choice2 = ub[4], ub[5]

    # ---- Standard scatter (kernel lines; Material.cs:75-119) -------
    roughness = (1.0 - gloss) * (1.0 - gloss)
    csx_h, csy_h, csz_h = _cosine_hemisphere(ua, ub_, nx, ny, nz)
    rnx = nx + (csx_h - nx) * roughness
    rny = ny + (csy_h - ny) * roughness
    rnz = nz + (csz_h - nz) * roughness
    rnx, rny, rnz = _normalize3(rnx, rny, rnz)
    rough = roughness > 0.0
    rnx = jnp.where(rough, rnx, nx)
    rny = jnp.where(rough, rny, ny)
    rnz = jnp.where(rough, rnz, nz)
    incident_cos = -(dx * rnx + dy * rny + dz * rnz)
    std_ior = PLASTIC_IOR + (METAL_IOR - PLASTIC_IOR) * metallic
    fresnel = mk._schlick(incident_cos, std_ior)
    cos_dn = dx * nx + dy * ny + dz * nz
    masking = mk._smith_masking(cos_dn, roughness)
    refl_chance = jnp.clip(fresnel * gloss * masking, 0.0, 1.0)
    spec_dot = dx * rnx + dy * rny + dz * rnz
    spx = dx - 2.0 * spec_dot * rnx
    spy = dy - 2.0 * spec_dot * rny
    spz = dz - 2.0 * spec_dot * rnz
    lmx, lmy, lmz = _cosine_hemisphere(uc, ud, nx, ny, nz)
    take_spec = (refl_chance > 0.0) & (u_choice < refl_chance)
    take_metal = (metallic > 0.0) & (u_choice2 < metallic)
    # lottery log-probability (score-function term, mirrors
    # materials.Scatter.logp): detached replay decisions miss the
    # probability shift of gloss/metallic/ior
    lp_inc = jnp.where(
        take_spec,
        jnp.log(jnp.maximum(refl_chance, 1e-12)),
        jnp.log(jnp.maximum(1.0 - refl_chance, 1e-12))
        + jnp.where(
            take_metal,
            jnp.log(jnp.maximum(metallic, 1e-12)),
            jnp.log(jnp.maximum(1.0 - metallic, 1e-12)),
        ),
    )
    spec_like = take_spec | take_metal
    sdx = jnp.where(spec_like, spx, lmx)
    sdy = jnp.where(spec_like, spy, lmy)
    sdz = jnp.where(spec_like, spz, lmz)
    srr = jnp.where(take_spec, 1.0, alb_r)
    srg = jnp.where(take_spec, 1.0, alb_g)
    srb = jnp.where(take_spec, 1.0, alb_b)

    if has_dielectrics:
        # ---- Dielectric (Material.cs:121-161) ----------------------
        d_roughness = 1.0 - gloss
        ssx, ssy, ssz = _unit_sphere(ua, ub_)
        drx = nx + d_roughness * ssx
        dry = ny + d_roughness * ssy
        drz = nz + d_roughness * ssz
        drx, dry, drz = _normalize3(drx, dry, drz)
        ddot = dx * drx + dy * dry + dz * drz
        exiting = ddot > 0.0
        onx = jnp.where(exiting, -drx, drx)
        ony = jnp.where(exiting, -dry, dry)
        onz = jnp.where(exiting, -drz, drz)
        # guard non-dielectric lanes: 1/0 = inf upstream of the
        # now-differentiable refl_prob NaNs reverse mode (see
        # core/materials.py)
        is_diel = mtype > 0.5
        ior = jnp.where(is_diel, jnp.maximum(parameter, 1e-3), 1.5)
        ni_over_nt = jnp.where(exiting, ior, 1.0 / ior)
        cosine = jnp.where(exiting, ior * ddot, -ddot)
        dt = dx * onx + dy * ony + dz * onz
        disc_r = 1.0 - ni_over_nt * ni_over_nt * (1.0 - dt * dt)
        can_refract = disc_r > 0.0
        sq_r = jnp.sqrt(
            jnp.where(can_refract, jnp.maximum(disc_r, 1e-8), 1.0)
        )
        rfx = ni_over_nt * (dx - onx * dt) - onx * sq_r
        rfy = ni_over_nt * (dy - ony * dt) - ony * sq_r
        rfz = ni_over_nt * (dz - onz * dt) - onz * sq_r
        refl_prob = mk._schlick(cosine, ior)
        do_refract = can_refract & (u_choice > refl_prob)
        diel_lp = jnp.where(
            can_refract,
            jnp.where(
                do_refract,
                jnp.log(jnp.maximum(1.0 - refl_prob, 1e-12)),
                jnp.log(jnp.maximum(refl_prob, 1e-12)),
            ),
            0.0,
        )
        lp_inc = jnp.where(is_diel, diel_lp, lp_inc)
        drefl = dx * drx + dy * dry + dz * drz
        dlx2 = jnp.where(do_refract, rfx, dx - 2.0 * drefl * drx)
        dly2 = jnp.where(do_refract, rfy, dy - 2.0 * drefl * dry)
        dlz2 = jnp.where(do_refract, rfz, dz - 2.0 * drefl * drz)
        sdx = jnp.where(is_diel, dlx2, sdx)
        sdy = jnp.where(is_diel, dly2, sdy)
        sdz = jnp.where(is_diel, dlz2, sdz)
        srr = jnp.where(is_diel, jnp.where(do_refract, alb_r, 1.0), srr)
        srg = jnp.where(is_diel, jnp.where(do_refract, alb_g, 1.0), srg)
        srb = jnp.where(is_diel, jnp.where(do_refract, alb_b, 1.0), srb)

    if has_volumes:
        # isotropic in-medium scatter (kernel has_volumes scatter
        # override; Material.cs:163-168)
        vsx, vsy, vsz = _unit_sphere(uc, ud)
        sdx = jnp.where(vol_scatter, vsx, sdx)
        sdy = jnp.where(vol_scatter, vsy, sdy)
        sdz = jnp.where(vol_scatter, vsz, sdz)
        srr = jnp.where(vol_scatter, v_ar, srr)
        srg = jnp.where(vol_scatter, v_ag, srg)
        srb = jnp.where(vol_scatter, v_ab, srb)
        # the material lotteries don't apply on in-medium scatters
        # (isotropic, parameter-free); density's score terms were
        # added above
        lp_inc = jnp.where(vol_scatter, 0.0, lp_inc)

    # ---- sky + fold (SampleBatchJob.cs:341-396) --------------------
    if cube_pads is not None:
        # major-axis cubemap fetch (kernel cube_c section /
        # Texture.cs:172-210).  The texel INDEX is a detached
        # decision (direction -> int cast has zero gradient anyway);
        # texel VALUES stay differentiable through the gather —
        # environment-map gradients flow from exactly the rays that
        # missed into each texel.
        c_w, c_h, cw_pad, cfh_pad = cube_pads
        ddx = jax.lax.stop_gradient(dx)
        ddy = jax.lax.stop_gradient(dy)
        ddz = jax.lax.stop_gradient(dz)
        cax, cay, caz = jnp.abs(ddx), jnp.abs(ddy), jnp.abs(ddz)
        cuse_x = (cax >= cay) & (cax >= caz)
        cuse_y = (cay > cax) & (cay >= caz)
        neg_off = jnp.where(
            cuse_x,
            jnp.where(ddx >= 0.0, 0.0, 1.0),
            jnp.where(
                cuse_y,
                jnp.where(ddy >= 0.0, 0.0, 1.0),
                jnp.where(ddz >= 0.0, 0.0, 1.0),
            ),
        )
        cu_num = jnp.where(
            cuse_x,
            jnp.where(ddx >= 0.0, -ddz, ddz),
            jnp.where(cuse_y, ddx, jnp.where(ddz >= 0.0, ddx, -ddx)),
        )
        cv_num = jnp.where(
            cuse_x, -ddy,
            jnp.where(cuse_y, jnp.where(ddy >= 0.0, ddz, -ddz), -ddy),
        )
        cmajor = jnp.maximum(
            jnp.where(cuse_x, cax, jnp.where(cuse_y, cay, caz)), 1e-12
        )
        cuu = cu_num / cmajor
        cvv = cv_num / cmajor
        face = jnp.where(
            cuse_x, 0.0, jnp.where(cuse_y, 2.0, 4.0)
        ) + neg_off
        ccx = jnp.minimum(
            ((cuu + 1.0) * (c_w / 2.0)).astype(jnp.int32), c_w - 1
        )
        ccy = jnp.minimum(
            ((cvv + 1.0) * (c_h / 2.0)).astype(jnp.int32), c_h - 1
        )
        crow = face.astype(jnp.int32) * c_h + ccy
        if onehot_fetch:
            skr, skg, skb = _onehot_fetch3(
                env["cube_tbl"], cw_pad, cfh_pad, ccx, crow
            )
        else:
            cube_flat = env["cube_flat"]
            skr = cube_flat[(0 * cw_pad + ccx) * cfh_pad + crow]
            skg = cube_flat[(1 * cw_pad + ccx) * cfh_pad + crow]
            skb = cube_flat[(2 * cw_pad + ccx) * cfh_pad + crow]
    elif sky_on:
        sky_bottom, sky_top = env["sky_b"], env["sky_t"]
        tsky = 0.5 * (dy + 1.0)
        skr = sky_bottom[0] + (sky_top[0] - sky_bottom[0]) * tsky
        skg = sky_bottom[1] + (sky_top[1] - sky_bottom[1]) * tsky
        skb = sky_bottom[2] + (sky_top[2] - sky_bottom[2]) * tsky
    else:
        skr = skg = skb = jnp.zeros_like(dx)
    lp = lp + jnp.where(scatter_mask, lp_inc, 0.0)
    emr = jnp.where(scatter_mask, em_r, jnp.where(miss, skr, 0.0))
    emg = jnp.where(scatter_mask, em_g, jnp.where(miss, skg, 0.0))
    emb = jnp.where(scatter_mask, em_b, jnp.where(miss, skb, 0.0))
    radx = radx + thx * emr
    rady = rady + thy * emg
    radz = radz + thz * emb
    thx = jnp.where(scatter_mask, thx * srr, thx)
    thy = jnp.where(scatter_mask, thy * srg, thy)
    thz = jnp.where(scatter_mask, thz * srb, thz)

    # ---- advance + termination ------------------------------------
    off_sign = jnp.where(
        sdx * nx + sdy * ny + sdz * nz >= 0.0, 1.0, -1.0
    )
    ox = jnp.where(scatter_mask, px + SELF_EPS * off_sign * nx, ox)
    oy = jnp.where(scatter_mask, py + SELF_EPS * off_sign * ny, oy)
    oz = jnp.where(scatter_mask, pz + SELF_EPS * off_sign * nz, oz)
    dx = jnp.where(scatter_mask, sdx, dx)
    dy = jnp.where(scatter_mask, sdy, dy)
    dz = jnp.where(scatter_mask, sdz, dz)
    if has_volumes:
        # pass-through / own-exit lanes advance past the boundary
        # without scattering (kernel advance section; consumes one
        # bounce iteration, integrator deviation note)
        ox = jnp.where(skip, ox + (skip_t + SELF_EPS) * dx, ox)
        oy = jnp.where(skip, oy + (skip_t + SELF_EPS) * dy, oy)
        oz = jnp.where(skip, oz + (skip_t + SELF_EPS) * dz, oz)
        # medium bookkeeping: enter on scatter, leave on skip, keep
        # when scattering off a solid while inside
        in_den = jnp.where(vol_scatter, v_den, in_den)
        in_ar = jnp.where(vol_scatter, v_ar, in_ar)
        in_ag = jnp.where(vol_scatter, v_ag, in_ag)
        in_ab = jnp.where(vol_scatter, v_ab, in_ab)
        in_er = jnp.where(vol_scatter, v_er, in_er)
        in_eg = jnp.where(vol_scatter, v_eg, in_eg)
        in_eb = jnp.where(vol_scatter, v_eb, in_eb)
        in_id = jnp.where(
            vol_scatter, v_id, jnp.where(skip, -1.0, in_id)
        )
    active = jnp.where(miss, 0.0, active)
    valid = jnp.where(miss, 1.0, valid)
    depth_ct = depth_ct + jnp.where(was_active, 1.0, 0.0)
    exhausted = (active > 0.5) & (depth_ct > trace_depth - 0.5)
    active = jnp.where(exhausted, 0.0, active)
    terminated = was_active & (active < 0.5)
    ok = terminated & (valid > 0.5)
    # zero-valued score surrogates on BOTH accumulators (the valid
    # count is itself a decision outcome; see render/renderer.py)
    carrier = jnp.where(ok, lp - jax.lax.stop_gradient(lp), 0.0)
    rad_okx = jnp.where(ok, radx, 0.0)
    rad_oky = jnp.where(ok, rady, 0.0)
    rad_okz = jnp.where(ok, radz, 0.0)
    ok_f = jnp.where(ok, 1.0, 0.0)
    csx = state["csx"] + rad_okx + (
        jax.lax.stop_gradient(rad_okx) * carrier
    )
    csy = state["csy"] + rad_oky + (
        jax.lax.stop_gradient(rad_oky) * carrier
    )
    csz = state["csz"] + rad_okz + (
        jax.lax.stop_gradient(rad_okz) * carrier
    )
    cnt = state["cnt"] + ok_f + jax.lax.stop_gradient(ok_f) * carrier

    out = dict(
        ox=ox, oy=oy, oz=oz, dx=dx, dy=dy, dz=dz,
        thx=thx, thy=thy, thz=thz, radx=radx, rady=rady, radz=radz,
        active=active, valid=valid, started=started, depth_ct=depth_ct,
        csx=csx, csy=csy, csz=csz, cnt=cnt, lp=lp,
    )
    if has_motion:
        out["ptime"] = ptime
    if has_volumes:
        out.update(
            in_id=in_id, in_den=in_den, in_ar=in_ar, in_ag=in_ag,
            in_ab=in_ab, in_er=in_er, in_eg=in_eg, in_eb=in_eb,
        )
    return out


# --------------------------------------------------------------------------
# The replay
# --------------------------------------------------------------------------


def replay(
    tape,  # (samples*trace_depth, N) winner codes from the kernel
    lane_count,  # (N,)
    camera_row,  # (24,)
    centers,  # (S, 3)
    radii,  # (S,)
    records,  # (S, >=11) packed material rows
    sky_bottom,  # (3,)
    sky_top,  # (3,)
    seed,  # () int32
    rect_tables=None,  # (geo (R_pad, 16), rec (24, R_pad)) pack_aux_tables
    box_tables=None,  # (geo (B_pad, 16), rec (24, B_pad))
    tri_tables=None,  # (geo (T_pad, 16), rec (32, T_pad)) pack_tri_tables
    #   — edge_a/edge_b/vert0, per-vertex normals and uvs are
    #   differentiable leaves (mesh vertex gradients)
    tex_tables=None,  # (texrec (16, M_pad), None, img|None) from
    #   pack_texture_tables — perlin excluded by replay_eligible; texrec
    #   main colors and img texels are differentiable leaves
    move_vectors=None,  # (S, 3) sphere motion offsets (unit shutter) —
    #   differentiable leaf; enables the motion-blur mirror
    vol0=None,  # (8,) camera_containment_row — differentiable leaf;
    #   enables the convex-volume-walk mirror (Beer–Lambert density
    #   gradients ride the free-path score terms in lp)
    cube_table=None,  # (3*W_pad, FH_pad) pack_cubemap_table planes —
    #   differentiable leaf (environment-map texel gradients flow from
    #   exactly the rays that missed into each texel)
    *,
    samples: int,
    trace_depth: int,
    t_min: float = 0.0,
    has_dielectrics: bool = True,
    sky_on: bool = True,
    jitter: bool = True,
    img_dims: tuple = (0, 0),
    cube_dims: tuple = (0, 0),
    lane0=0,  # () int32: global RNG-lane id of lane 0 (sharded batches:
    #   each device's disjoint lane range keys its hash-PRNG streams,
    #   mirroring the kernel's lane_base — parallel/shard.py)
    pixel0=0,  # () int32: pixel id rendered by lane 0 (sharded batches:
    #   this shard's row-major offset into the full image)
):
    """Differentiable (color_sum (N,3), count (N,)) for one batch,
    replaying the kernel's persistent-lane loop along the recorded tape."""
    n = lane_count.shape[0]
    lanes = jnp.arange(n, dtype=jnp.int32) + jnp.asarray(lane0, jnp.int32)
    pixels = jnp.arange(n, dtype=jnp.int32) + jnp.asarray(pixel0, jnp.int32)
    per_pixel = lane_count.astype(jnp.float32)
    seed = jnp.asarray(seed, jnp.int32)

    cam = camera_row.astype(jnp.float32)

    zero = jnp.zeros((n,), jnp.float32)

    has_motion = move_vectors is not None
    has_volumes = vol0 is not None
    one = jnp.ones((n,), jnp.float32)
    state0 = dict(
        ox=zero, oy=zero, oz=zero, dx=zero, dy=zero, dz=zero,
        thx=one, thy=one, thz=one, radx=zero, rady=zero, radz=zero,
        active=zero, valid=zero, started=zero, depth_ct=zero,
        csx=zero, csy=zero, csz=zero, cnt=zero,
        lp=zero,  # per-sample lottery log-probability (score function)
    )
    if has_motion:
        state0["ptime"] = zero  # shutter time of the current path
    if has_volumes:
        # inside-volume medium state (kernel rows: id -1 = vacuum,
        # density, albedo rgb, emission rgb); traced so carried density
        # keeps its gradient across bounces
        state0.update(
            in_id=-one, in_den=zero, in_ar=zero, in_ag=zero,
            in_ab=zero, in_er=zero, in_eg=zero, in_eb=zero,
        )

    has_rects = rect_tables is not None
    has_boxes = box_tables is not None
    has_tris = tri_tables is not None
    has_tex = tex_tables is not None
    img = tex_tables[2] if has_tex else None
    has_img = img is not None
    iters = samples * trace_depth
    # ONE differentiable combined entity table, indexed by the tape's
    # padded combined row space (layout doc on build_entity_rows); the
    # per-BLOCK bulk winner gather below streams rows out of it (TPU
    # per-lane gathers inside the scan measured 8x slower)
    entity_rows, layout = build_entity_rows(
        centers, radii, records, rect_tables, box_tables, tri_tables,
        tex_tables, move_vectors,
    )
    if has_img:
        img_pads = (img_dims[0], img_dims[1],
                    img.shape[0] // 3, img.shape[1])
    else:
        img_pads = (0, 0, 1, 1)
    if cube_table is not None:
        cube_pads = (cube_dims[0], cube_dims[1],
                     cube_table.shape[0] // 3, cube_table.shape[1])
    else:
        cube_pads = None
    env = dict(
        per_pixel=per_pixel,
        lanes=lanes,
        pixels=pixels.astype(jnp.float32),
        seed=seed,
        co=cam[0:3], ll=cam[3:6], hh=cam[6:9], vv=cam[9:12],
        rr=cam[12:15], uu=cam[15:18],
        lens_radius=cam[18], width=cam[19], height=cam[20],
        sky_b=sky_bottom, sky_t=sky_top,
    )
    if has_volumes:
        env["vol0"] = tuple(vol0[k] for k in range(8))
    if has_img:
        env["img_flat"] = img.reshape(-1)
    if cube_table is not None:
        env["cube_flat"] = cube_table.reshape(-1)
    statics_it = dict(
        jitter=jitter, has_motion=has_motion, has_volumes=has_volumes,
        has_rects=has_rects, has_boxes=has_boxes, has_tris=has_tris,
        has_tex=has_tex, has_img=has_img,
        has_dielectrics=has_dielectrics, sky_on=sky_on,
        trace_depth=trace_depth, t_min=t_min,
        img_pads=img_pads, cube_pads=cube_pads,
        mvbase=layout["mvbase"], txbase=layout["txbase"],
    )
    w_all = jnp.clip(tape, 0.0, None).astype(jnp.int32)  # (IT, N)

    def iteration(state, per_it):
        it, tape_row, wt = per_it
        return replay_iteration(
            state, wt, tape_row, it, env, **statics_it
        ), None

    # Two-level scan: the winner-parameter gather runs per BLOCK of
    # trace_depth iterations inside the outer body instead of as one
    # bulk (iters, N, C) pre-gather — at 512x512 x 16 spp the bulk
    # tensor + its VJP cotangent alone blew past HBM (measured 22.3G
    # needed vs 15.75G); per-block it peaks at (depth, N, C).  The
    # per-ITERATION gathers that measured 8x slower stay avoided — each
    # block still gathers in one batched op.  Both levels are
    # checkpointed: the outer body stores only the block-entry carry,
    # the inner per-iteration checkpoint keeps the block's own backward
    # from materializing every bounce temporary.  (Round 1 measured
    # 4-iteration checkpoint blocks 9% slower than per-iteration remat
    # with the bulk pre-gather; the block gather is what buys 16-64 spp
    # tapes, the 9% is the price.)
    block = trace_depth
    n_blocks = iters // block
    tape_blocks = tape.reshape(n_blocks, block, n)
    w_blocks = w_all.reshape(n_blocks, block, n)

    span = _CKPT_SPAN if block % _CKPT_SPAN == 0 else 1

    def span_body(state, xs):
        its, tbs, wrs = xs
        for j in range(span):
            state, _ = iteration(state, (its[j], tbs[j], wrs[j]))
        return state, None

    def block_body(state, xs):
        b_idx, tape_blk, w_blk = xs
        # gather then transpose to the step's (cols, n) convention
        wrows = entity_rows[w_blk.reshape(-1)].reshape(
            block, n, entity_rows.shape[1]
        ).transpose(0, 2, 1)
        its = b_idx * block + jnp.arange(block, dtype=jnp.int32)
        state, _ = jax.lax.scan(
            jax.checkpoint(span_body), state,
            (
                its.reshape(-1, span),
                tape_blk.reshape(-1, span, n),
                wrows.reshape(-1, span, wrows.shape[1], n),
            ),
            unroll=_UNROLL,
        )
        return state, None

    state, _ = jax.lax.scan(
        jax.checkpoint(block_body), state0,
        (jnp.arange(n_blocks, dtype=jnp.int32), tape_blocks, w_blocks),
    )
    return (
        jnp.stack([state["csx"], state["csy"], state["csz"]], axis=-1),
        state["cnt"],
    )


# --------------------------------------------------------------------------
# custom_vjp wrapper: fused-kernel primal, replay VJP
# --------------------------------------------------------------------------


def sample_batch_diff(
    lane_count,
    count_in,
    camera_row,
    centers,
    radii,
    records,
    sky_bottom,
    sky_top,
    seed,
    rect_tables=None,  # (geo, rec) pack_aux_tables pair — differentiable
    box_tables=None,
    tri_tables=None,  # (geo, rec) pack_tri_tables pair — differentiable
    #   (mesh vertex/normal/uv + material gradients); VMEM-resident
    #   triangle counts only (replay_eligible)
    tex_tables=None,  # (texrec, None, img|None) pack_texture_tables —
    #   texrec + img are differentiable (atlas texel gradients); perlin
    #   must be None (replay_eligible)
    move_vectors=None,  # (S, 3) sphere motion offsets — differentiable
    vol0=None,  # (8,) camera_containment_row — differentiable; enables
    #   the convex volume walk (density gradients via free-path score)
    cube_table=None,  # pack_cubemap_table planes — differentiable
    #   (environment-map texel gradients)
    *,
    samples: int,
    trace_depth: int,
    has_dielectrics: bool = True,
    sky_on: bool = True,
    jitter: bool = True,
    interpret: bool = False,
    img_dims: tuple = (0, 0),
    cube_dims: tuple = (0, 0),
    lane_base=0,  # () int32: global RNG-lane id of lane 0 — sharded
    #   batches give each device a disjoint range so kernel + replay
    #   PRNG streams match the single-device render bit-exactly
    pixel_base=0,  # () int32: pixel id rendered by lane 0 — this
    #   shard's row-major offset into the full image
    kernel_bwd: bool = False,  # static: run the VJP as the Pallas
    #   backward kernel (ops/megatrace_bwd — VMEM-resident reverse
    #   sweep) instead of jax.vjp over the XLA replay.  Caller gates on
    #   megatrace_bwd.kernel_bwd_eligible (the full replay scope since
    #   round 5 — atlas/cubemap texels ride the one-hot fetch's vjp).
):
    """sample_batch with gradients wrt (centers, radii, records, sky,
    camera_row, rect/box geo+rec tables, texture record/atlas tables) via
    the tape replay.  Primal values are the kernel's; only the `color`
    output's cotangent is propagated (AOVs and counts are detached —
    losses are photometric).  Gradients wrt scene leaves (rect quat/pos,
    box extents, materials, atlas texels) flow through the caller's
    pack_aux_tables/pack_materials/pack_texture_tables."""
    interpret = interpret or mk.FORCE_INTERPRET
    statics = dict(
        samples=samples, trace_depth=trace_depth,
        has_dielectrics=has_dielectrics, sky_on=sky_on, jitter=jitter,
        img_dims=img_dims, cube_dims=cube_dims,
    )
    # aux rides as a dict pytree through the custom_vjp so the arity is
    # static per (has_rects, has_boxes, has_tex) combination
    aux = {}
    if rect_tables is not None:
        aux["rect_geo"], aux["rect_rec"] = rect_tables
    if box_tables is not None:
        aux["box_geo"], aux["box_rec"] = box_tables
    if tri_tables is not None:
        aux["tri_geo"], aux["tri_rec"] = tri_tables
    if tex_tables is not None:
        assert tex_tables[1] is None  # perlin marble: wavefront only
        aux["texrec"] = tex_tables[0]
        if tex_tables[2] is not None:
            aux["tex_img"] = tex_tables[2]
    if move_vectors is not None:
        aux["move"] = move_vectors
    if vol0 is not None:
        aux["vol0"] = vol0
    if cube_table is not None:
        aux["cube"] = cube_table

    def _aux_pairs(aux):
        rt = (
            (aux["rect_geo"], aux["rect_rec"]) if "rect_geo" in aux
            else None
        )
        bt = (
            (aux["box_geo"], aux["box_rec"]) if "box_geo" in aux
            else None
        )
        trt = (
            (aux["tri_geo"], aux["tri_rec"]) if "tri_geo" in aux
            else None
        )
        tt = (
            (aux["texrec"], None, aux.get("tex_img"))
            if "texrec" in aux else None
        )
        return (rt, bt, trt, tt, aux.get("move"), aux.get("vol0"),
                aux.get("cube"))

    # custom_vjp functions must not close over traced values: the
    # non-differentiated operands ride along as float32 args with zero
    # cotangents.
    # Integer scalars (seed, lane/pixel bases) ride as two f32-exact
    # 16-bit halves (s32 -> f32 would quantize values >= 2^24: distinct
    # batch seeds would collapse, and sharded lane bases g*n + t*shard
    # cross 2^24 at 1080p x 8 sample groups).
    def _i32_of(lo, hi):
        return (
            (hi.astype(jnp.int32) << jnp.int32(16)) | lo.astype(jnp.int32)
        )

    def _halves(v):
        v = jnp.asarray(v, jnp.int32)
        return (
            (v & jnp.int32(0xFFFF)).astype(jnp.float32),
            ((v >> jnp.int32(16)) & jnp.int32(0x7FFF)).astype(jnp.float32),
        )

    def _kernel_fwd(camera_row, centers, radii, records, sky_b, sky_t,
                    aux, lane_f, count_f, ints, want_tape):
        rt, bt, trt, tt, mv, v0, cube = _aux_pairs(aux)
        lane0 = _i32_of(ints[2], ints[3])
        pix0 = _i32_of(ints[4], ints[5])
        n = lane_f.shape[0]
        return mk.sample_batch(
            lane_f, count_f, camera_row, centers, radii, records,
            sky_b, sky_t, _i32_of(ints[0], ints[1]),
            pixel_index=pix0 + jnp.arange(n, dtype=jnp.int32),
            rect_tables=rt, box_tables=bt, tri_tables=trt, tex_tables=tt,
            move_offsets=mv, vol0=v0,
            cube_table=cube, cube_dims=cube_dims,
            lane_base=lane0,
            samples=samples, trace_depth=trace_depth,
            has_dielectrics=has_dielectrics, sky_on=sky_on,
            jitter=jitter, hw_prng=False, want_tape=want_tape,
            interpret=interpret, img_dims=img_dims,
        )

    from jax.custom_derivatives import CustomVJPPrimal, SymbolicZero

    def _unwrap(tree):
        return jax.tree.map(
            lambda a: a.value if isinstance(a, CustomVJPPrimal) else a,
            tree, is_leaf=lambda a: isinstance(a, CustomVJPPrimal),
        )

    @jax.custom_vjp
    def _run(camera_row, centers, radii, records, sky_b, sky_t, aux,
             lane_f, count_f, ints):
        # primal-only path (no grad requested): skip the tape entirely
        return _kernel_fwd(camera_row, centers, radii, records, sky_b,
                           sky_t, aux, lane_f, count_f, ints,
                           want_tape=False)

    def _fwd(camera_row, centers, radii, records, sky_b, sky_t, aux,
             lane_f, count_f, ints):
        # symbolic_zeros=True wraps every leaf as CustomVJPPrimal so the
        # bwd rule can DETECT unused-output cotangents (the AOV gate)
        args = _unwrap((camera_row, centers, radii, records, sky_b,
                        sky_t, aux, lane_f, count_f, ints))
        out = _kernel_fwd(*args, want_tape=True)
        tape = out.pop("tape")
        return out, (tape,) + args

    def _bwd(res, cot):
        (tape, camera_row, centers, radii, records, sky_b, sky_t, aux,
         lane_f, count_f, ints) = res

        # Only the color sum's and valid count's cotangents propagate
        # through the tape replay.  A loss touching the other outputs
        # (AOV normal/albedo/weight/fallbacks) would silently lose its
        # gradient paths — reject it LOUDLY at trace time instead; the
        # wavefront path (differentiable=True with replay ineligibility,
        # or noise_color != 0) carries full AOV gradients.
        leaked = [
            k for k, v in cot.items()
            if k not in ("color", "count")
            and not isinstance(v, SymbolicZero)
        ]
        if leaked:
            raise NotImplementedError(
                "the diff-fused tape replay propagates only the color "
                "sum's and valid count's cotangents, but this loss also "
                f"differentiates through {leaked}; route AOV-regularized "
                "losses through the wavefront integrator "
                "(render/renderer.py diff_fused gate)"
            )
        n = lane_f.shape[0]
        cot_color = (
            jnp.zeros((n, 3), jnp.float32)
            if isinstance(cot["color"], SymbolicZero) else cot["color"]
        )
        cot_count = (
            jnp.zeros((n,), jnp.float32)
            if isinstance(cot["count"], SymbolicZero) else cot["count"]
        )

        if kernel_bwd:
            # VMEM-resident reverse sweep (ops/megatrace_bwd): same
            # replay_iteration step, adjoint machine-derived inside the
            # kernel — returns the identical cotangent structure
            from raytracing_in_one_weekend_tpu.ops import megatrace_bwd

            rt, bt, trt, tt, mv, v0, cube = _aux_pairs(aux)
            cots = megatrace_bwd.replay_grad(
                tape, lane_f, camera_row, centers, radii, records,
                sky_b, sky_t, _i32_of(ints[0], ints[1]),
                cot_color, cot_count,
                rect_tables=rt, box_tables=bt, tri_tables=trt,
                tex_tables=tt, move_vectors=mv, vol0=v0,
                cube_table=cube,
                samples=samples, trace_depth=trace_depth,
                has_dielectrics=has_dielectrics, sky_on=sky_on,
                jitter=jitter, interpret=interpret,
                lane0=_i32_of(ints[2], ints[3]),
                pixel0=_i32_of(ints[4], ints[5]),
                img_dims=img_dims, cube_dims=cube_dims,
            )
            (cot_cam, cot_c, cot_r, cot_rec, cot_sb, cot_st,
             aux_part) = cots
            aux_cot = {k: jnp.zeros_like(v) for k, v in aux.items()}
            aux_cot.update(aux_part)
            return (
                cot_cam, cot_c, cot_r, cot_rec, cot_sb, cot_st,
                aux_cot, jnp.zeros_like(lane_f),
                jnp.zeros_like(count_f), jnp.zeros_like(ints),
            )

        def color_of(camera_row, centers, radii, records, sky_b, sky_t,
                     aux):
            rt, bt, trt, tt, mv, v0, cube = _aux_pairs(aux)
            csum, cnt = replay(
                tape, lane_f, camera_row, centers, radii, records,
                sky_b, sky_t, _i32_of(ints[0], ints[1]), rt, bt, trt, tt,
                mv, v0, cube,
                lane0=_i32_of(ints[2], ints[3]),
                pixel0=_i32_of(ints[4], ints[5]),
                **statics,
            )
            # cnt carries the count's score surrogate — the valid-count
            # is a lottery-dependent outcome, and losses divide by it
            return csum, cnt

        _, vjp_fn = jax.vjp(
            color_of, camera_row, centers, radii, records, sky_b, sky_t,
            aux,
        )
        return vjp_fn((cot_color, cot_count)) + (
            jnp.zeros_like(lane_f), jnp.zeros_like(count_f),
            jnp.zeros_like(ints),
        )

    _run.defvjp(_fwd, _bwd, symbolic_zeros=True)
    ints = jnp.stack(
        _halves(seed) + _halves(lane_base) + _halves(pixel_base)
    )
    return _run(
        camera_row, centers, radii, records, sky_bottom, sky_top, aux,
        lane_count.astype(jnp.float32),
        count_in.astype(jnp.float32),
        ints,
    )
