"""Bounce-synchronous streamed-mesh sampler (sorted-compacted wavefront).

Reference: the per-ray BVH walk of FindHitCandidates
(Runtime/Jobs/SampleBatchJob.cs:403-448 over BvhNodeData.cs:109-238) gives
a desktop CPU O(log n) triangle tests per ray.  The fused megakernel's
persistent-lane tiles cannot match that for HBM-streamed meshes: lanes in
a tile desynchronize (each regenerates its next sample the moment a path
dies), so the tile-grained block cull unions rays at MIXED bounce phases
and passes ~half the mesh per iteration (~15,000 triangle-lane tests per
ray on mesh_large — measured, BENCHMARKS.md).

TPU-native redesign (this module): run the bounce loop OUTSIDE the kernel,
one pallas launch per bounce over ALL lanes.

  * Bounce-synchronous: every lane in a tile is at the same bounce, so a
    camera-ray tile's block-cull union is its (tight) pixel-tile frustum,
    and a bounce-k tile's union is the surface patch its rays left from.
  * Sorted: lanes are Morton-ordered pixels with the wave's samples
    interleaved adjacently — a RAY_TILE is a compact 2D pixel block.
  * Compacted: between bounces a STABLE partition moves live lanes to the
    front (stable = survivors keep their Morton order, so tiles stay
    spatially coherent AND dense); all-dead trailing tiles skip via the
    whole-tile early-out.
  * The kernel body is one `pallas_megatrace._bounce_step` call — the
    SAME sphere sweep, 2-level SMEM AABB cull, super-granular DMA,
    Möller–Trumbore slot sweep, material scatter and sky fold as the
    megakernel, so the two paths cannot drift apart formula-wise.

Path state lives in HBM between bounces ((ST_ROWS, N) f32, donated via
input_output_aliases); per-wave camera regeneration happens XLA-side
(core.camera.generate_rays — threefry, wavefront-parity statistics).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracing_in_one_weekend_tpu.ops.pallas_megatrace import (
    RAY_TILE, TRI_ROWS, TRI_SUP,
    _bounce_step, _pack_scene_tables, _pack_sky_row, _uniforms_hash,
    morton_order,
)

FORCE_INTERPRET = False  # test hook (see pallas_megatrace.FORCE_INTERPRET)

# Renderer routing threshold: the bounce-sync path beats the persistent-
# lane megakernel only once the mesh is big enough for the ordered
# near-to-far super cull to outweigh the per-bounce launch overheads —
# measured on v5e: mesh_huge (103k tris, 34 supers) 1.5 vs 1.3 MRays/s,
# mesh_large (21k tris, 7 supers) 3.2 vs 4.0.  Scenes at or below this
# keep the megakernel's streamed path.
SYNC_TRI_MIN = 65536

# State rows: carry slots 0..22 of pallas_megatrace._bounce_step in order
# (origin xyz, direction xyz, throughput rgb, radiance rgb, active, valid,
# aov-normal xyz, aov-albedo xyz, got_nonspecular, events, rays_cast),
# then row 23 = lane id (hash-RNG keying + the inverse of the compaction
# permutation: lane ids start as iota, so after any composition of
# partitions the row itself IS the original index).
ST_ROWS = 24
LANE_ROW = 23
_CARRY_ROWS = 23

# per-(wave, bounce) salt spacing for the counter-based hash PRNG: the
# kernel consumes 8 streams per draw block; these odd constants keep all
# (wave, bounce) draw blocks on disjoint counters
_SALT_WAVE = 1640531527  # golden-ratio odd constant (int32 range)
_SALT_BOUNCE = 40503


def _tile_super_order(state, sup_arr, n_tiles: int, n_sup: int):
    """Per-tile NEAR-TO-FAR super visit order + conservative lower-bound
    distances, from the tile's live-ray bounds (XLA-side, per bounce).

    For each RAY_TILE of lanes: the AABB of active-ray origins and the
    per-component direction bounds give (a) a Euclidean lower bound on
    the ray parameter t at which ANY tile ray can enter each super's
    AABB (directions are unit), and (b) a sound reachability cull (a
    super strictly on one side of the origin box needs a direction
    component of that sign).  Unreachable supers sort to the end with
    dist = inf; the kernel's while loop never reaches them."""
    o = state[0:3].reshape(3, n_tiles, RAY_TILE)
    d = state[3:6].reshape(3, n_tiles, RAY_TILE)
    act = (state[12].reshape(n_tiles, RAY_TILE) >= 0.5)[None]
    big = jnp.float32(1e30)
    olo = jnp.min(jnp.where(act, o, big), axis=2).T  # (T, 3)
    ohi = jnp.max(jnp.where(act, o, -big), axis=2).T
    dlo = jnp.min(jnp.where(act, d, big), axis=2).T
    dhi = jnp.max(jnp.where(act, d, -big), axis=2).T
    sup8 = sup_arr.reshape(n_sup, 8)
    slo, shi = sup8[None, :, 0:3], sup8[None, :, 3:6]  # (1, S, 3)
    gap = jnp.maximum(
        jnp.maximum(slo - ohi[:, None, :], olo[:, None, :] - shi), 0.0
    )  # (T, S, 3)
    dist = jnp.sqrt(jnp.sum(gap * gap, axis=2)) * 0.999
    unreach = (
        ((slo > ohi[:, None, :]) & (dhi[:, None, :] <= 0.0))
        | ((shi < olo[:, None, :]) & (dlo[:, None, :] >= 0.0))
    )
    key = jnp.where(jnp.any(unreach, axis=2), jnp.inf, dist)
    order = jnp.argsort(key, axis=1).astype(jnp.int32)  # (T, S)
    dist_sorted = jnp.take_along_axis(key, order, axis=1)
    # (T, 1, S): leading tile dim blocked by 1, trailing dims full —
    # the only per-tile SMEM block shape Mosaic admits
    return (
        order[:, None, :],
        dist_sorted.astype(jnp.float32)[:, None, :],
    )


def _sync_kernel(
    seed_ref, sky_ref, sph_ref, rec_ref, state_ref, tbl_h, ab_ref, sup_ref,
    sord_ref, sdist_ref, out_ref, tbl_s, dma_sem, *,
    t_min: float, has_dielectrics: bool, sky_on: bool,
):
    """One bounce for one RAY_TILE of lanes (state rows in/out)."""
    live = jnp.max(state_ref[12:13, :]) > 0.0

    @pl.when(jnp.logical_not(live))
    def _():
        out_ref[:, :] = state_ref[:, :]

    @pl.when(live)
    def _():
        t_shape = (1, state_ref.shape[1])
        lane = state_ref[LANE_ROW : LANE_ROW + 1, :]
        u = _uniforms_hash(
            (8, t_shape[1]), seed_ref[0, 0], seed_ref[0, 1], lane
        )
        zero = jnp.zeros(t_shape, jnp.float32)
        bounce_f = seed_ref[0, 2].astype(jnp.float32)
        depth_row = zero + bounce_f

        carry = tuple(
            state_ref[i : i + 1, :] for i in range(_CARRY_ROWS)
        ) + (
            # volume medium slots (id -1 = vacuum; unused, has_volumes off)
            zero - 1.0, zero, zero, zero, zero, zero, zero, zero,
            zero,  # shutter time (has_motion off)
        )
        consts = (
            (sph_ref[:, 0:1], sph_ref[:, 1:2], sph_ref[:, 2:3],
             sph_ref[:, 3:4], rec_ref, None, None),
            None,  # rects
            None,  # boxes
            # streamed triangles + the per-tile near-to-far super order
            # (MESH_SYNC_NOMESH: debug floor — skip the whole mesh phase)
            None if os.environ.get("MESH_SYNC_NOMESH") else
            (tbl_h, ab_ref, sup_ref, tbl_s, dma_sem, sord_ref, sdist_ref),
            None,  # textures
            None,  # cubemap
            (sky_ref[0, 0], sky_ref[0, 1], sky_ref[0, 2]),
            (sky_ref[0, 3], sky_ref[0, 4], sky_ref[0, 5]),
        )
        carry = _bounce_step(
            depth_row, carry, u, consts,
            t_min=t_min, has_dielectrics=has_dielectrics, sky_on=sky_on,
            has_volumes=False, has_motion=False,
        )
        for i in range(_CARRY_ROWS):
            out_ref[i : i + 1, :] = carry[i]
        out_ref[LANE_ROW : LANE_ROW + 1, :] = lane


_PAIR = 2 * RAY_TILE  # lanes per pair-compaction block (two bounce tiles)


def _pair_compact_kernel(state_ref, out_ref):
    """Stable 9-class sort WITHIN a pair of adjacent tiles: live lanes
    grouped by direction octant (classes 0-7), dead lanes last (8).

    XLA-side lane-level partitions are catastrophically slow on this
    hardware (measured: every gather/scatter/sort formulation of a 2M
    permutation costs 90-270 ms, and the 24-payload lax.sort that runs
    in 29 ms never finishes COMPILING) — so the partition runs on the
    MXU instead: exclusive prefix sums of the alive mask via strict
    upper-triangular one-hot matmuls give each lane its destination,
    and a destination one-hot contraction permutes all state rows at
    once.  One pass per bounce over (Morton-adjacent) tile pairs
    empties the back tile whenever the pair's survivors fit the front
    one; repeated across bounces this drains whole tiles for the bounce
    kernel's early-out, which is where compaction actually pays (the
    mesh phase measured 12.3 s sparse vs 4.3 s densified on
    mesh_large).  Stable: survivors keep Morton order."""
    t = RAY_TILE
    alive = (state_ref[12:13, :] > 0.5).astype(jnp.float32)  # (1, 2t)
    # 9-way class key: alive lanes grouped by DIRECTION OCTANT (0-7),
    # dead lanes last (class 8).  Secondary bounces are where the mesh
    # cull drowns — surface-scattered rays union a hemisphere per tile
    # (measured: bounce 0 runs 0.5 s, each secondary bounce 1.5-3.5 s
    # on mesh_large) — so the local sort narrows each tile toward one
    # direction cone AND drains dead tiles.
    octant = (
        jnp.where(state_ref[3:4, :] > 0.0, 4.0, 0.0)
        + jnp.where(state_ref[4:5, :] > 0.0, 2.0, 0.0)
        + jnp.where(state_ref[5:6, :] > 0.0, 1.0, 0.0)
    )
    cls = jnp.where(alive > 0.5, octant, 8.0)  # (1, 2t)
    # strict upper-triangular ones: sut[j, s] = 1 where j < s
    br = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    bc = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    sut = (br < bc).astype(jnp.float32)

    def _excl(a):  # (1, t) -> exclusive prefix sum at each lane
        return jax.lax.dot_general(
            a, sut, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    dest = jnp.zeros((1, _PAIR), jnp.float32)
    offset = jnp.float32(0.0)
    for c in range(9):
        m = (cls == jnp.float32(c)).astype(jnp.float32)
        m0, m1 = m[:, :t], m[:, t:]
        n0 = jnp.sum(m0)
        rank = jnp.concatenate([_excl(m0), _excl(m1) + n0], axis=1)
        dest = jnp.where(m > 0.5, offset + rank, dest)
        offset = offset + n0 + jnp.sum(m1)

    # permute every state row by destination one-hot, 512-dst chunks (a
    # full (2t, 2t) one-hot is 16MB of VMEM).  The one-hot is built
    # TRANSPOSED — (dst, src) with dest broadcast along sublanes — so
    # no (1, N) -> (N, 1) cross-lane reshape exists anywhere (hardware
    # runs of that relayout silently corrupted the permutation at 2048
    # tiles while interpret mode stayed exact)
    src_rows = state_ref[:, :]
    for c in range(_PAIR // 512):
        d_iota = jax.lax.broadcasted_iota(
            jnp.int32, (512, _PAIR), 0
        ).astype(jnp.float32) + jnp.float32(c * 512)
        onehot_t = (d_iota == dest).astype(jnp.float32)  # (512, 2t)
        # HIGHEST: the default TPU matmul precision feeds the MXU
        # bf16-rounded operands — every compaction pass would quantize
        # ray state to 8 mantissa bits (hardware-only corruption the
        # f32 interpret oracle cannot see; measured as +22% rays on
        # mesh_large from drifted intersections)
        out_ref[:, c * 512 : (c + 1) * 512] = jax.lax.dot_general(
            src_rows, onehot_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )


def _pair_compact(state, interpret: bool):
    n_pad = state.shape[1]
    if n_pad < _PAIR:
        return state
    grid = (n_pad // _PAIR,)
    return pl.pallas_call(
        _pair_compact_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (ST_ROWS, _PAIR), lambda i: (0, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (ST_ROWS, _PAIR), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((ST_ROWS, n_pad), jnp.float32),
        input_output_aliases={0: 0},
        interpret=interpret,
    )(state)


_HALF_BAND = 8  # restore band: a lane migrates <= 1 tile per
# pair-compaction pass and <= _HALF_BAND passes run per wave


def _restore_kernel(tid_ref, *refs):
    """Banded inverse permutation: dest tile d gathers the lanes whose
    lane-id row falls in [d*RAY_TILE, (d+1)*RAY_TILE) from the source
    tiles within +-_HALF_BAND of d (pair compaction moves a lane at
    most one tile per pass), via destination one-hot MXU contractions —
    no XLA gather/scatter anywhere."""
    out_ref = refs[-1]
    srcs = refs[:-1]
    t = RAY_TILE
    d = tid_ref[0, 0, 0]  # dest tile id (program_id has no interpret
    # lowering; an SMEM iota row carries it)
    base = d.astype(jnp.float32) * t
    # transposed one-hot (dst, src): dest-id iota along sublanes, the
    # lane-id row broadcast along them — no cross-lane reshapes (see
    # _pair_compact_kernel)
    d_iota = jax.lax.broadcasted_iota(
        jnp.int32, (t, t), 0
    ).astype(jnp.float32) + base
    acc = jnp.zeros((ST_ROWS, t), jnp.float32)
    n_band = len(srcs)
    for k in range(n_band):
        src = srcs[k]
        lane = src[LANE_ROW : LANE_ROW + 1, :]  # (1, t) original ids
        # mask away edge-clamped duplicate blocks: block k contributes
        # only when d - _HALF_BAND + k is in range (clamped duplicates
        # land at out-of-range rel)
        rel = d + jnp.int32(k - _HALF_BAND)
        ok = (
            (rel >= 0) & (rel < jnp.int32(tid_ref[0, 0, 1]))
        ).astype(jnp.float32)
        onehot_t = (d_iota == lane).astype(jnp.float32) * ok  # (t, t)
        acc = acc + jax.lax.dot_general(
            src[:, :], onehot_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # exact f32 state
        )
    out_ref[:, :] = acc


def _restore(state, interpret: bool):
    """Undo the wave's compaction permutation (banded inverse)."""
    n_pad = state.shape[1]
    n_tiles = n_pad // RAY_TILE
    tid = jnp.stack(
        [
            jnp.arange(n_tiles, dtype=jnp.int32),
            jnp.full((n_tiles,), n_tiles, jnp.int32),
        ],
        axis=-1,
    ).reshape(n_tiles, 1, 2)
    in_specs = [
        pl.BlockSpec(
            (1, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
        ),
    ]
    nb = 2 * _HALF_BAND + 1

    def _mk(k):
        off = k - _HALF_BAND
        return pl.BlockSpec(
            (ST_ROWS, RAY_TILE),
            lambda i, off=off: (0, jnp.clip(i + off, 0, n_tiles - 1)),
            memory_space=pltpu.VMEM,
        )

    in_specs += [_mk(k) for k in range(nb)]
    return pl.pallas_call(
        _restore_kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (ST_ROWS, RAY_TILE), lambda i: (0, i),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((ST_ROWS, n_pad), jnp.float32),
        compiler_params=(
            # 17 unrolled (t, t) one-hot streams exceed the default 16M
            # scoped-vmem; v5e has 128M physical (same raise as
            # megatrace_bwd.VMEM_LIMIT)
            None if interpret
            else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
        ),
        interpret=interpret,
    )(tid, *([state] * nb))


def _bounce_launch(
    state, seed, salt, bounce, sph, rec_t, sky, tbl_h, aabb_row, sup_row,
    *, t_min: float, has_dielectrics: bool, sky_on: bool, interpret: bool,
):
    n_pad = state.shape[1]
    s_pad = sph.shape[0]
    n_tiles = n_pad // RAY_TILE
    n_sup = sup_row.shape[1] // 8
    sord, sdist = _tile_super_order(state, sup_row, n_tiles, n_sup)
    seed_arr = jnp.stack(
        [jnp.asarray(seed, jnp.int32), jnp.asarray(salt, jnp.int32),
         jnp.asarray(bounce, jnp.int32), jnp.int32(0)]
    ).reshape(1, 4)
    grid = (n_tiles,)
    return pl.pallas_call(
        functools.partial(
            _sync_kernel,
            t_min=t_min, has_dielectrics=has_dielectrics, sky_on=sky_on,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (s_pad, 8), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                rec_t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (ST_ROWS, RAY_TILE), lambda i: (0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # streamed triangle table
            pl.BlockSpec(
                aabb_row.shape, lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                sup_row.shape, lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(  # per-tile near-to-far super ids
                (1, 1, sord.shape[2]), lambda i: (i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(  # matching lower-bound distances
                (1, 1, sdist.shape[2]), lambda i: (i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (ST_ROWS, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((ST_ROWS, n_pad), jnp.float32),
        scratch_shapes=[
            # two 512KB slots: the sorted-stream path double-buffers
            # super DMAs (transfer k+1 overlaps sweep k)
            pltpu.VMEM((2 * TRI_SUP * TRI_ROWS, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={4: 0},
        interpret=interpret,
    )(seed_arr, sky, sph, rec_t, state, tbl_h, aabb_row, sup_row,
      sord, sdist)


def sample_batch_sync(
    lane_count: jnp.ndarray,  # (N,) pixel-order samples to take per pixel
    count_in: jnp.ndarray,  # (N,) accumulated valid samples before batch
    camera,  # core.camera.Camera
    key: jax.Array,
    centers: jnp.ndarray,  # (S, 3)
    radii: jnp.ndarray,  # (S,)
    records: jnp.ndarray,  # (S, 11) packed material rows
    sky_bottom: jnp.ndarray,
    sky_top: jnp.ndarray,
    tri_stream_tables: tuple,  # pack_tri_stream_tables output
    *,
    width: int,
    height: int,
    samples: int,
    trace_depth: int,
    t_min: float = 0.0,
    has_dielectrics: bool = True,
    sky_on: bool = True,
    jitter: bool = True,
    wave_spp: int = 8,
    compact: bool = True,
    interpret: bool = False,
) -> dict:
    """Fused-parity accumulation deltas for one batch, PIXEL order.

    Same contract as pallas_megatrace.sample_batch (color/count/normal/
    albedo/weight/rays/fallback_*), computed by the bounce-synchronous
    wave loop: `samples` samples split into waves of `wave_spp` per
    pixel; each wave regenerates camera rays XLA-side, then runs
    `trace_depth` per-bounce kernel launches with a stable alive-first
    compaction between bounces.
    """
    from raytracing_in_one_weekend_tpu.core import camera as camera_mod
    from raytracing_in_one_weekend_tpu.core import rng

    interpret = interpret or FORCE_INTERPRET
    n = width * height
    k_spp = max(1, min(wave_spp, samples))
    n_waves = -(-samples // k_spp)
    order, rank = morton_order(width, height)
    order = jnp.asarray(order)
    rank = jnp.asarray(rank)

    nw = n * k_spp
    nw_pad = -(-nw // RAY_TILE) * RAY_TILE

    pix = jnp.repeat(order, k_spp)  # (nw,) pixel id per lane
    px_f = (pix % width).astype(jnp.float32)
    py_f = (pix // width).astype(jnp.float32)
    per_lane_cap = lane_count[pix].astype(jnp.int32)
    s_local = jnp.arange(nw, dtype=jnp.int32) % k_spp
    count_in_m = count_in[order].astype(jnp.float32)  # (n,) morton order

    seed = jax.random.randint(
        rng.purpose_key(key, rng.Purpose.SCATTER_A), (), 0, 2**31 - 1
    ).astype(jnp.int32)

    sph, rec_t, _ = _pack_scene_tables(centers, radii, records, None)
    sky = _pack_sky_row(sky_bottom, sky_top)
    tbl_h, aabb_row, sup_row = tri_stream_tables

    zeros_n = jnp.zeros((n,), jnp.float32)
    zeros_n3 = jnp.zeros((3, n), jnp.float32)
    carry0 = (
        zeros_n3, zeros_n,  # color sum, valid count
        zeros_n3, zeros_n3, zeros_n,  # normal, albedo, weight sums
        zeros_n,  # rays per pixel
        zeros_n3, zeros_n3,  # fallback normal / albedo
    )

    def one_wave(carry, w):
        (color, cnt, nsum, asum, wsum, rays_pix, fn, fa) = carry
        wkey = jax.random.fold_in(key, w)
        if jitter:
            ju = jax.random.uniform(
                rng.purpose_key(wkey, rng.Purpose.PIXEL_JITTER), (nw, 2)
            )
            jx, jy = ju[:, 0], ju[:, 1]
        else:
            jx = jy = 0.5
        coords = jnp.stack(
            [(px_f + jx) / width, (py_f + jy) / height], axis=-1
        )
        rays = camera_mod.generate_rays(camera, coords, wkey)
        s_global = w * k_spp + s_local
        active0 = (s_global < per_lane_cap).astype(jnp.float32)

        state0 = jnp.zeros((ST_ROWS, nw_pad), jnp.float32)
        state0 = state0.at[0:3, :nw].set(rays.origin.T)
        state0 = state0.at[3:6, :nw].set(rays.direction.T)
        state0 = state0.at[6:9, :].set(1.0)  # throughput
        state0 = state0.at[12, :nw].set(active0)
        state0 = state0.at[LANE_ROW, :].set(
            jnp.arange(nw_pad, dtype=jnp.float32)
        )

        # python bounce loop (static b): one cached kernel instance per
        # bounce, pair-compaction phase alternates with b
        n_passes = min(trace_depth - 1, _HALF_BAND)
        state = state0
        for b in range(trace_depth):
            salt = w * jnp.int32(_SALT_WAVE) + jnp.int32(
                b * _SALT_BOUNCE
            )
            state = _bounce_launch(
                state, seed, salt, b, sph, rec_t, sky,
                tbl_h, aabb_row, sup_row,
                t_min=t_min, has_dielectrics=has_dielectrics,
                sky_on=sky_on, interpret=interpret,
            )
            if compact and b < n_passes:
                # alternating-phase pair compaction: survivors of two
                # Morton-adjacent tiles pack into the front tile (MXU
                # one-hot permute, _pair_compact_kernel); the phase
                # shift lets density propagate across pair boundaries
                # over successive bounces.  Dead trailing tiles then
                # skip in the bounce kernel's whole-tile early-out.
                if b % 2 == 0 or nw_pad < 3 * RAY_TILE:
                    state = _pair_compact(state, interpret)
                else:
                    inner = (
                        (nw_pad // RAY_TILE - 1) // 2 * 2 * RAY_TILE
                    )
                    state = jnp.concatenate(
                        [
                            state[:, :RAY_TILE],
                            _pair_compact(
                                state[:, RAY_TILE : RAY_TILE + inner],
                                interpret,
                            ),
                            state[:, RAY_TILE + inner :],
                        ],
                        axis=1,
                    )
        if compact and n_passes > 0:
            # banded inverse permutation back to wave-start lane order
            state = _restore(state, interpret)
        res = state[
            jnp.array([9, 10, 11, 13, 14, 15, 16, 17, 18, 19, 21, 22])
        ][:, :nw]
        res = res.reshape(12, n, k_spp)
        rad = res[0:3]
        valid = res[3]  # 0/1 (depth-exhausted lanes keep 0: failed sample)
        an = res[4:7]
        aa = res[7:10]
        ev = res[10]
        rays_l = res[11]

        color = color + jnp.sum(rad * valid[None], axis=2)
        cnt = cnt + jnp.sum(valid, axis=1)
        nsum = nsum + jnp.sum(an * valid[None], axis=2)
        asum = asum + jnp.sum(aa * valid[None], axis=2)
        wsum = wsum + jnp.sum(ev * valid, axis=1)
        rays_pix = rays_pix + jnp.sum(rays_l, axis=1)

        # fallback AOVs: the pixel's FIRST sample this run (wave 0,
        # sample slot 0), captured valid or not (SampleBatchJob.cs:146-151)
        is_first = (
            (w == 0) & (count_in_m < 0.5) & (lane_count[order] > 0)
        ).astype(jnp.float32)[None]
        fn = fn + is_first * an[:, :, 0]
        fa = fa + is_first * aa[:, :, 0]
        return (color, cnt, nsum, asum, wsum, rays_pix, fn, fa), None

    carry, _ = jax.lax.scan(one_wave, carry0, jnp.arange(n_waves))
    (color, cnt, nsum, asum, wsum, rays_pix, fn, fa) = carry

    # morton -> pixel order
    return {
        "color": color[:, rank].T,
        "count": cnt[rank],
        "normal": nsum[:, rank].T,
        "albedo": asum[:, rank].T,
        "weight": wsum[rank],
        "rays": rays_pix[rank].astype(jnp.int32),
        "fallback_normal": fn[:, rank].T,
        "fallback_albedo": fa[:, rank].T,
    }
