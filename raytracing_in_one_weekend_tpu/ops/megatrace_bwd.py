"""Pallas backward kernel for the fused-megakernel tape replay.

The XLA tape replay (ops/megatrace_replay.replay) is HBM-bound: every
scan iteration round-trips the full (N,) lane state through HBM, and its
jax.vjp costs ~3.7x its own forward (512^2 x 8 spp on one v5e chip:
kernel fwd+tape 107 ms, replay fwd 98 ms, replay VJP 365 ms — the
structural floor of an XLA-side adjoint).  This module runs the SAME
state machine VMEM-resident: a Pallas kernel sweeps the tape forward
once (checkpointing the carry every trace_depth iterations), then walks
the checkpoints in reverse, re-forwarding each block and calling
jax.vjp on the shared per-iteration step (megatrace_replay
.replay_iteration) INSIDE the kernel body — the adjoint is
machine-derived from the exact function the XLA replay runs, so the two
backends cannot drift.  Winner-parameter fetches and their cotangent
scatters are one-hot MXU contractions against the combined entity table
(build_entity_rows layout); camera/sky/vol0 cotangents reduce to
scalars in-kernel.  Blocks whose tape rows are all idle (-2) are
skipped — the persistent-lane forward's early-out (pallas_megatrace
._batch_kernel) guarantees such a block is an identity step, so this is
the backward's mirror of the forward's reclaimed-lane win.

Lane layout (round 4): every per-lane value is a PACKED (8, 128) block
— 8 sublanes x 128 lanes = one full vreg per row — instead of the
round-3 (1, T) rows.  Measured on v5e: Mosaic lays a (1, N) f32 row out
one-sublane-per-vreg, so (1, T) elementwise math wastes 7/8 of the VPU
(.scratch/layout_bench.py: (1,1024) 41 Gop/s vs (8,1024) 254 Gop/s,
identical wall time).  A tile is BWD_TILE = 1024 lanes shaped (8, 128);
host-side `_to8` regroups every (R, N) lane-major input into
(R*8, N/8) so the kernel slices var k as rows [k*8:(k+1)*8] with no
in-kernel relayouts.  The one-hot winner fetch flattens (8, 128) ->
(1, 1024) and reshapes the (cols, 1024) matmul result to
(cols*8, 128) — both pure sublane regroups (.scratch/proto_pack8.py
validated the semantics on hardware).  replay_iteration is
shape-polymorphic (elementwise row math), so it runs unchanged on the
packed rows.

Scope (kernel_bwd_eligible): the FULL replay scope.  Covers the
BASELINE gradient configs (cover-scene class), Cornell-class rect/box
scenes, VMEM-resident meshes, convex volumes, motion blur, and (round
5) image-atlas textures + cubemap skies: their per-lane texel fetches
ride the same one-hot MXU contractions as the forward kernel
(megatrace_replay._onehot_fetch3, onehot_fetch=True), whose jax.vjp
transpose IS the texel cotangent scatter — accumulated into dedicated
(3*w_pad, h_pad) output planes across lane tiles.

Reference anchors are the replay's (View.cs camera, HitTests.cs
intersections, Material.cs scatter, SampleBatchJob.cs fold).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracing_in_one_weekend_tpu.ops import megatrace_replay as mr

SUB = 8  # sublanes per packed lane block (one full vreg row)
LN = 128  # lanes per packed row
BWD_TILE = SUB * LN  # 1024 lanes per backward tile, shaped (8, 128).
# Tile width is a pure packing choice: the kernel is
# throughput-bound, so wall time tracks total vreg-ops, and (8, 128)
# blocks hit 8x the elements per vreg-op of the old (1, T) rows.
SCAL_PAD = 48  # padded scalar-cotangent vars (24 cam + 6 sky + 8 vol0)
VMEM_LIMIT = 100 * 1024 * 1024  # scoped-vmem ceiling for the Mosaic
# compile (v5e has 128M physical; the default 16M scope rejects
# wider tiles long before the hardware does)
FULL_STORE_BYTES = 24 * 1024 * 1024  # store EVERY iteration's entry
# state in phase 1 (skipping phase 2's re-forward sweep entirely) when
# the per-tile state history fits this budget; else fall back to
# block-entry checkpoints + re-forward


def kernel_bwd_eligible(scene) -> bool:
    """Static gate for the Pallas backward: the full replay scope.
    Image-atlas textures and cubemap skies (round 5) ride the same
    one-hot MXU texel fetch as the forward kernel
    (megatrace_replay._onehot_fetch3 under onehot_fetch=True); jax.vjp
    transposes it into the texel cotangent scatter, accumulated into
    dedicated (3*w_pad, h_pad) output planes."""
    return mr.replay_eligible(scene)


_BASE_KEYS = (
    "ox", "oy", "oz", "dx", "dy", "dz", "thx", "thy", "thz",
    "radx", "rady", "radz", "active", "valid", "started", "depth_ct",
    "csx", "csy", "csz", "cnt", "lp",
)
_MOTION_KEYS = ("ptime",)
_VOL_KEYS = (
    "in_id", "in_den", "in_ar", "in_ag", "in_ab", "in_er", "in_eg",
    "in_eb",
)


def _state_keys(has_motion: bool, has_volumes: bool) -> tuple:
    keys = _BASE_KEYS
    if has_motion:
        keys = keys + _MOTION_KEYS
    if has_volumes:
        keys = keys + _VOL_KEYS
    return keys


def _pack_state(state, keys):
    # one (rows*8, 128) block of (8, 128) vars — the only shape op in
    # the kernel besides the one-hot matmuls (checkpoint store format)
    return jnp.concatenate([state[k] for k in keys], axis=0)


def _unpack_state(carry, keys):
    return {k: carry[i * SUB:(i + 1) * SUB] for i, k in enumerate(keys)}


def _to8(x):
    """(R, N) lane-major -> (R*8, N/8): each BWD_TILE lane span becomes
    a per-tile (8, 128) block so the kernel never relayouts.  N must be
    a multiple of BWD_TILE."""
    r, n = x.shape
    nt = n // BWD_TILE
    return (
        x.reshape(r, nt, SUB, LN)
        .transpose(0, 2, 1, 3)
        .reshape(r * SUB, nt * LN)
    )


def _bwd_kernel(
    seed_ref, cam_ref, sky_ref, vol0_ref, pix_ref, tape_ref,
    cot_ref, table_ref, *rest,
    samples: int, trace_depth: int, statics: dict, s_tot: int,
    cols: int, full_store: bool = False, n_tex: int = 0,
):
    # rest = [img_ref?][cube_ref?] dtable_ref dscal_ref
    #        [dimg_ref?][dcube_ref?] ckpt_ref [blk_ref]
    rest = list(rest)
    tex_refs = [rest.pop(0) for _ in range(n_tex)]
    dtable_ref = rest.pop(0)
    dscal_ref = rest.pop(0)
    dtex_refs = [rest.pop(0) for _ in range(n_tex)]
    ckpt_ref = rest.pop(0)
    blk_ref = rest.pop(0) if rest else None
    has_motion = statics["has_motion"]
    has_volumes = statics["has_volumes"]
    keys = _state_keys(has_motion, has_volumes)
    rows = len(keys)
    srows = rows * SUB  # per-iteration checkpoint stride (8-multiple by
    # construction: Mosaic dynamic sublane offsets must be provable
    # multiples of 8)
    span = trace_depth
    iters = samples * trace_depth
    nblk = iters // span

    def var(ref, k):
        # packed var k of a _to8'd ref: one (8, 128) vreg block
        return ref[k * SUB:(k + 1) * SUB, :]

    table_t = table_ref[:, :]  # (cols, s_tot) transposed entity table
    seed = seed_ref[0, 0]
    # first-tile flag rides pix var 3 (1.0 only on the first lane tile;
    # read as a (1,1)-slice reduction instead of program_id, which has
    # no interpret-mode lowering)
    first_tile = jnp.max(pix_ref[3 * SUB:3 * SUB + 1, 0:1])
    lane = var(pix_ref, 0)
    per_pixel = var(pix_ref, 1)
    pixels = var(pix_ref, 2)

    # differentiable env values as BROADCAST (8, 128) lane blocks, not
    # 0-d scalars: a scalar diff's transpose is a lane reduction Mosaic
    # can't lay out; block cotangents stay elementwise and XLA sums
    # the lanes after the kernel
    cam = [var(cam_ref, k) for k in range(24)]
    diffs = dict(
        co=tuple(cam[0:3]), ll=tuple(cam[3:6]), hh=tuple(cam[6:9]),
        vv=tuple(cam[9:12]), rr=tuple(cam[12:15]), uu=tuple(cam[15:18]),
        lens_radius=cam[18], width=cam[19], height=cam[20],
        cam_tail=tuple(cam[21:24]),  # unused rows: zero cotangent,
        # kept so the row layout below stays position-stable
        sky_b=tuple(var(sky_ref, k) for k in range(3)),
        sky_t=tuple(var(sky_ref, k) for k in range(3, 6)),
    )
    if has_volumes:
        diffs["vol0"] = tuple(var(vol0_ref, k) for k in range(8))

    env_nondiff = dict(
        per_pixel=per_pixel,
        lanes=lane.astype(jnp.int32),
        pixels=pixels,
        seed=seed,
    )

    # texture-plane tables (image atlas / cubemap) as DIFFERENTIABLE
    # kernel args: the one-hot fetch's vjp is the texel scatter
    texs = tuple(r[:, :] for r in tex_refs)
    has_img_tbl = statics["has_img"]
    has_cube_tbl = statics["cube_pads"] is not None

    def kstep(state, table_t, diffs, texs, tape_row, it):
        env = dict(env_nondiff)
        env.update(
            co=diffs["co"], ll=diffs["ll"], hh=diffs["hh"],
            vv=diffs["vv"], rr=diffs["rr"], uu=diffs["uu"],
            lens_radius=diffs["lens_radius"], width=diffs["width"],
            height=diffs["height"],
            sky_b=diffs["sky_b"], sky_t=diffs["sky_t"],
        )
        if has_volumes:
            env["vol0"] = diffs["vol0"]
        if has_img_tbl:
            env["img_tbl"] = texs[0]
        if has_cube_tbl:
            env["cube_tbl"] = texs[-1]
        w = jnp.clip(tape_row, 0.0, None).astype(jnp.int32)  # (8, 128)
        wflat = w.reshape(1, SUB * LN)  # sublane regroup: t = sub*128+ln
        iota = jax.lax.broadcasted_iota(jnp.int32, (s_tot, SUB * LN), 0)
        onehot = (iota == wflat).astype(jnp.float32)  # (S, 1024)
        wtf = jax.lax.dot_general(
            table_t, onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (cols, 1024)
        packed = wtf.reshape(cols * SUB, LN)  # row k*8.. = var k (8,128)
        wt = tuple(
            packed[k * SUB:(k + 1) * SUB, :] for k in range(cols)
        )
        return mr.replay_iteration(
            state, wt, tape_row, it, env, **statics
        )

    def block_live(bi):
        # a block whose tape rows are all idle (-2) is an identity step
        # (every lane done + nothing left to regenerate — the forward's
        # early-out wrote the fill), so both sweeps skip it
        m = tape_ref[pl.ds(bi * span * SUB, SUB), :]
        for j in range(1, span):
            m = jnp.maximum(
                m, tape_ref[pl.ds((bi * span + j) * SUB, SUB), :]
            )
        return jnp.max(m) > -1.5

    # ---- phase 1: forward sweep, checkpoint carry per block ---------
    zrow = jnp.zeros((SUB, LN), jnp.float32)
    state0 = {k: zrow for k in keys}
    state0.update(thx=zrow + 1.0, thy=zrow + 1.0, thz=zrow + 1.0)
    if has_volumes:
        state0["in_id"] = zrow - 1.0  # medium: vacuum

    def fwd_block(bi, state):
        if not full_store:
            ckpt_ref[pl.ds(bi * srows, srows), :] = _pack_state(
                state, keys
            )

        def one(j, st):
            it = bi * span + j
            if full_store:
                # per-ITERATION entry states: phase 2 reads them back
                # directly, no re-forward sweep
                ckpt_ref[pl.ds(it * srows, srows), :] = _pack_state(
                    st, keys
                )
            return kstep(
                st, table_t, diffs, texs,
                tape_ref[pl.ds(it * SUB, SUB), :], it,
            )

        return jax.lax.cond(
            block_live(bi),
            lambda st: jax.lax.fori_loop(0, span, one, st),
            lambda st: st,
            state,
        )

    # debug-only phase knobs for perf attribution (.scratch/bwd_profile)
    _p1 = nblk if os.environ.get("BWD_SKIP_PHASE1") is None else 0
    _p2 = nblk if os.environ.get("BWD_SKIP_PHASE2") is None else 0
    jax.lax.fori_loop(0, _p1, fwd_block, state0)

    # ---- phase 2: reverse sweep with per-iteration jax.vjp -----------
    cot0 = {k: zrow for k in keys}
    cot0.update(
        csx=var(cot_ref, 0), csy=var(cot_ref, 1), csz=var(cot_ref, 2),
        cnt=var(cot_ref, 3),
    )
    dtab0 = jnp.zeros((cols, s_tot), jnp.float32)
    dscal0 = jax.tree.map(lambda s: jnp.zeros_like(s), diffs)
    dtex0 = tuple(jnp.zeros_like(t) for t in texs)

    def rev_block(k, acc):
        bi = nblk - 1 - k

        def run(acc):
            if not full_store:
                st = _unpack_state(
                    ckpt_ref[pl.ds(bi * srows, srows), :], keys
                )

                def refwd(j, st):
                    blk_ref[pl.ds(j * srows, srows), :] = _pack_state(
                        st, keys
                    )
                    it = bi * span + j
                    return kstep(
                        st, table_t, diffs, texs,
                        tape_ref[pl.ds(it * SUB, SUB), :], it,
                    )

                jax.lax.fori_loop(0, span, refwd, st)

            def rev_one(j2, acc):
                cot_state, dtab, dscal, dtex = acc
                j = span - 1 - j2
                it = bi * span + j
                st_in = _unpack_state(
                    ckpt_ref[pl.ds(it * srows, srows), :]
                    if full_store
                    else blk_ref[pl.ds(j * srows, srows), :],
                    keys,
                )
                row = tape_ref[pl.ds(it * SUB, SUB), :]
                _, vjp_fn = jax.vjp(
                    lambda s, tb, df, tx: kstep(s, tb, df, tx, row, it),
                    st_in, table_t, diffs, texs,
                )
                dst, dt, dd, dtx = vjp_fn(cot_state)
                return (
                    dst, dtab + dt,
                    jax.tree.map(jnp.add, dscal, dd),
                    tuple(a + b for a, b in zip(dtex, dtx)),
                )

            return jax.lax.fori_loop(0, span, rev_one, acc)

        return jax.lax.cond(block_live(bi), run, lambda a: a, acc)

    _, dtab, dscal, dtex = jax.lax.fori_loop(
        0, _p2, rev_block, (cot0, dtab0, dscal0, dtex0)
    )

    # ---- accumulate across lane tiles (sequential TPU grid) ----------
    flat, _ = jax.tree.flatten(dscal)  # sorted-key order; replay_grad
    # reconstructs with the same treedef.  Each entry is an (8, 128)
    # block cotangent of a broadcast input; XLA sums lanes after the
    # kernel.
    rows_s = list(flat)
    rows_s += [zrow] * (SCAL_PAD - len(rows_s))
    scal_block = jnp.concatenate(rows_s, axis=0)

    @pl.when(first_tile > 0.5)
    def _init():
        dtable_ref[:, :] = jnp.zeros((cols, s_tot), jnp.float32)
        dscal_ref[:, :] = jnp.zeros((SCAL_PAD * SUB, LN), jnp.float32)
        for dref, tref in zip(dtex_refs, tex_refs):
            dref[:, :] = jnp.zeros(tref.shape, jnp.float32)

    dtable_ref[:, :] += dtab
    dscal_ref[:, :] += scal_block
    for dref, dtx in zip(dtex_refs, dtex):
        dref[:, :] += dtx


def replay_grad(
    tape,  # (samples*trace_depth, N) winner codes from the kernel
    lane_count,  # (N,)
    camera_row,  # (24,)
    centers,
    radii,
    records,
    sky_bottom,
    sky_top,
    seed,
    cot_color,  # (N, 3) color-sum cotangent
    cot_count,  # (N,) valid-count cotangent
    rect_tables=None,
    box_tables=None,
    tri_tables=None,
    tex_tables=None,  # (texrec, None, img|None) — the atlas plane
    #   table is differentiable via the one-hot fetch's vjp
    move_vectors=None,
    vol0=None,
    cube_table=None,  # pack_cubemap_table planes — differentiable
    *,
    samples: int,
    trace_depth: int,
    t_min: float = 0.0,
    has_dielectrics: bool = True,
    sky_on: bool = True,
    jitter: bool = True,
    interpret: bool = False,
    lane0=0,
    pixel0=0,
    img_dims: tuple = (0, 0),
    cube_dims: tuple = (0, 0),
):
    """VMEM-resident tape-replay VJP.  Returns the cotangent 7-tuple
    (camera_row, centers, radii, records, sky_bottom, sky_top, aux)
    matching jax.vjp(replay)'s structure for sample_batch_diff._bwd —
    aux keyed like sample_batch_diff's aux dict."""
    if tex_tables is not None:
        assert tex_tables[1] is None  # perlin marble: wavefront only
    img = tex_tables[2] if tex_tables is not None else None
    has_img = img is not None
    has_cube = cube_table is not None
    has_motion = move_vectors is not None
    has_volumes = vol0 is not None
    n = lane_count.shape[0]
    iters = samples * trace_depth
    n_pad = -(-n // BWD_TILE) * BWD_TILE

    # differentiable entity-table build (XLA-side, one-time): the kernel
    # returns d/d_entity_rows; this vjp scatters it back to the leaves
    leaves = dict(centers=centers, radii=radii, records=records)
    if rect_tables is not None:
        leaves["rect_geo"], leaves["rect_rec"] = rect_tables
    if box_tables is not None:
        leaves["box_geo"], leaves["box_rec"] = box_tables
    if tri_tables is not None:
        leaves["tri_geo"], leaves["tri_rec"] = tri_tables
    if tex_tables is not None:
        leaves["texrec"] = tex_tables[0]
    if has_motion:
        leaves["move"] = move_vectors

    def build(lv):
        return mr.build_entity_rows(
            lv["centers"], lv["radii"], lv["records"],
            rect_tables=(
                (lv["rect_geo"], lv["rect_rec"])
                if "rect_geo" in lv else None
            ),
            box_tables=(
                (lv["box_geo"], lv["box_rec"])
                if "box_geo" in lv else None
            ),
            tri_tables=(
                (lv["tri_geo"], lv["tri_rec"])
                if "tri_geo" in lv else None
            ),
            tex_tables=(
                (lv["texrec"], None, None) if "texrec" in lv else None
            ),
            move_vectors=lv.get("move"),
        )[0]

    entity_rows, build_vjp = jax.vjp(build, leaves)
    _, layout = mr.build_entity_rows(
        centers, radii, records,
        rect_tables=rect_tables, box_tables=box_tables,
        tri_tables=tri_tables,
        tex_tables=(
            (tex_tables[0], None, None) if tex_tables is not None
            else None
        ),
        move_vectors=move_vectors,
    )
    s_tot, cols = entity_rows.shape

    statics = dict(
        jitter=jitter, has_motion=has_motion, has_volumes=has_volumes,
        has_rects=rect_tables is not None,
        has_boxes=box_tables is not None,
        has_tris=tri_tables is not None,
        has_tex=tex_tables is not None, has_img=has_img,
        has_dielectrics=has_dielectrics, sky_on=sky_on,
        trace_depth=trace_depth, t_min=t_min,
        img_pads=(
            (img_dims[0], img_dims[1], img.shape[0] // 3, img.shape[1])
            if has_img else (0, 0, 1, 1)
        ),
        cube_pads=(
            (cube_dims[0], cube_dims[1],
             cube_table.shape[0] // 3, cube_table.shape[1])
            if has_cube else None
        ),
        mvbase=layout["mvbase"], txbase=layout["txbase"],
        onehot_fetch=True,  # Mosaic context: texels via one-hot MXU
    )

    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    # broadcast lane-block layouts (see _bwd_kernel: no 0-d diffs);
    # every per-lane input is regrouped by _to8 so the kernel reads
    # var k as packed rows [k*8:(k+1)*8]
    cam = jnp.broadcast_to(
        jnp.repeat(camera_row.astype(jnp.float32), SUB)[:, None],
        (24 * SUB, LN),
    )
    sky = jnp.broadcast_to(
        jnp.repeat(
            jnp.concatenate(
                [sky_bottom.astype(jnp.float32),
                 sky_top.astype(jnp.float32)]
            ),
            SUB,
        )[:, None],
        (6 * SUB, LN),
    )
    vol0_row = jnp.broadcast_to(
        jnp.repeat(
            (vol0.astype(jnp.float32) if has_volumes
             else jnp.zeros((8,), jnp.float32)),
            SUB,
        )[:, None],
        (8 * SUB, LN),
    )

    pix = jnp.zeros((4, n_pad), jnp.float32)
    pix = pix.at[0, :].set(
        jnp.arange(n_pad, dtype=jnp.float32)
        + jnp.asarray(lane0, jnp.float32)
    )
    pix = pix.at[1, :n].set(lane_count.astype(jnp.float32))
    pix = pix.at[2, :].set(
        jnp.arange(n_pad, dtype=jnp.float32)
        + jnp.asarray(pixel0, jnp.float32)
    )
    pix = pix.at[3, :BWD_TILE].set(1.0)  # first-tile flag

    if n == n_pad:
        # aligned batches (every 2^k image) skip a gratuitous copy of
        # the tape — at 64 spp x depth 8 x 512^2 lanes that is 537MB
        tape_pad = tape
    else:
        tape_pad = jnp.full((iters, n_pad), -2.0, jnp.float32)
        tape_pad = tape_pad.at[:, :n].set(tape)
    cot = jnp.zeros((4, n_pad), jnp.float32)
    cot = cot.at[0:3, :n].set(cot_color.astype(jnp.float32).T)
    cot = cot.at[3, :n].set(cot_count.astype(jnp.float32))

    rows = len(_state_keys(has_motion, has_volumes))
    srows = rows * SUB
    full_store = iters * srows * LN * 4 <= FULL_STORE_BYTES
    if full_store:
        scratch = [
            pltpu.VMEM((iters * srows, LN), jnp.float32),
        ]
    else:
        scratch = [
            pltpu.VMEM((iters // trace_depth * srows, LN), jnp.float32),
            pltpu.VMEM((trace_depth * srows, LN), jnp.float32),
        ]

    tex_inputs = []
    if has_img:
        tex_inputs.append(img.astype(jnp.float32))
    if has_cube:
        tex_inputs.append(cube_table.astype(jnp.float32))
    tex_specs = [
        pl.BlockSpec(t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for t in tex_inputs
    ]

    grid = (n_pad // BWD_TILE,)
    out = pl.pallas_call(
        functools.partial(
            _bwd_kernel, samples=samples, trace_depth=trace_depth,
            statics=statics, s_tot=s_tot, cols=cols,
            full_store=full_store, n_tex=len(tex_inputs),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((24 * SUB, LN), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6 * SUB, LN), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * SUB, LN), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * SUB, LN), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((iters * SUB, LN), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * SUB, LN), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cols, s_tot), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + tex_specs,
        out_specs=(
            pl.BlockSpec((cols, s_tot), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SCAL_PAD * SUB, LN), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ) + tuple(tex_specs),
        out_shape=(
            jax.ShapeDtypeStruct((cols, s_tot), jnp.float32),
            jax.ShapeDtypeStruct((SCAL_PAD * SUB, LN), jnp.float32),
        ) + tuple(
            jax.ShapeDtypeStruct(t.shape, jnp.float32)
            for t in tex_inputs
        ),
        scratch_shapes=scratch,
        compiler_params=(
            None if interpret
            else pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT)
        ),
        interpret=interpret,
    )(seed_arr, cam, sky, vol0_row, _to8(pix), _to8(tape_pad),
      _to8(cot), entity_rows.T, *tex_inputs)
    dtable, dscal = out[0], out[1]
    dtex_out = list(out[2:])
    dimg = dtex_out.pop(0) if has_img else None
    dcube = dtex_out.pop(0) if has_cube else None

    # ---- scatter the table cotangent back to the scene leaves --------
    (dleaves,) = build_vjp(dtable.T)

    # scalar layout: jax.tree flattens the diffs dict in SORTED key
    # order — mirror it here (cam_tail, co, hh, lens_radius, ll, rr,
    # sky_b, sky_t, uu, [vol0,] vv, width, height is NOT the order;
    # compute it from the same structure instead of hand-writing)
    diffs_proto = dict(
        co=(0.0,) * 3, ll=(0.0,) * 3, hh=(0.0,) * 3, vv=(0.0,) * 3,
        rr=(0.0,) * 3, uu=(0.0,) * 3, lens_radius=0.0, width=0.0,
        height=0.0, cam_tail=(0.0,) * 3, sky_b=(0.0,) * 3,
        sky_t=(0.0,) * 3,
    )
    if has_volumes:
        diffs_proto["vol0"] = (0.0,) * 8
    treedef = jax.tree.structure(diffs_proto)
    nscal = treedef.num_leaves
    scal_vals = [
        jnp.sum(dscal[i * SUB:(i + 1) * SUB, :]) for i in range(nscal)
    ]
    ds = jax.tree.unflatten(treedef, scal_vals)

    cot_cam = jnp.stack(
        list(ds["co"]) + list(ds["ll"]) + list(ds["hh"])
        + list(ds["vv"]) + list(ds["rr"]) + list(ds["uu"])
        + [ds["lens_radius"], ds["width"], ds["height"]]
        + list(ds["cam_tail"])
    )
    cot_sky_b = jnp.stack(list(ds["sky_b"]))
    cot_sky_t = jnp.stack(list(ds["sky_t"]))

    aux_cot = {}
    if rect_tables is not None:
        aux_cot["rect_geo"] = dleaves["rect_geo"]
        aux_cot["rect_rec"] = dleaves["rect_rec"]
    if box_tables is not None:
        aux_cot["box_geo"] = dleaves["box_geo"]
        aux_cot["box_rec"] = dleaves["box_rec"]
    if tri_tables is not None:
        aux_cot["tri_geo"] = dleaves["tri_geo"]
        aux_cot["tri_rec"] = dleaves["tri_rec"]
    if tex_tables is not None:
        aux_cot["texrec"] = dleaves["texrec"]
    if has_img:
        aux_cot["tex_img"] = dimg
    if has_cube:
        aux_cot["cube"] = dcube
    if has_motion:
        aux_cot["move"] = dleaves["move"]
    if has_volumes:
        aux_cot["vol0"] = jnp.stack(list(ds["vol0"]))

    return (
        cot_cam, dleaves["centers"], dleaves["radii"],
        dleaves["records"], cot_sky_b, cot_sky_t, aux_cot,
    )
