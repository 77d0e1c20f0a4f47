"""Jitted render step: a batch of samples for every pixel, accumulated.

Reference: the ScheduleSample job graph (Unity/Raytracer.cs:602-816) —
copy accumulators, run SampleBatchJob over WxH pixels, reduce metrics, swap
buffers. Here the whole graph is one jitted function: the sample loop is a
`lax.scan`, the accumulators are donated device buffers, and the metric
reduction is a couple of jnp reductions that XLA fuses into the epilogue.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from raytracing_in_one_weekend_tpu.core import camera as camera_mod
from raytracing_in_one_weekend_tpu.core import rng
from raytracing_in_one_weekend_tpu.core.camera import Camera
from raytracing_in_one_weekend_tpu.render import film, integrator
from raytracing_in_one_weekend_tpu.scene.scene import Scene


class BatchMetrics(NamedTuple):
    """Per-batch reduced metrics (reference: Jobs/ReduceMetricsJob.cs:22-47)."""

    total_rays: jnp.ndarray  # () float32 — summed in float so huge batches
    #   (>2^31 rays at 4K x high spp) cannot wrap an int32 reduction
    total_samples: jnp.ndarray  # () float
    min_sample_count: jnp.ndarray  # ()
    max_sample_count: jnp.ndarray  # ()
    weight_min: jnp.ndarray  # () sample-count-weight extrema -> next batch's
    weight_max: jnp.ndarray  # () adaptive sampler normalization
    pixel_rays: jnp.ndarray  # (P,) int32 rays cast this batch per pixel
    #   (Diagnostics.RayCount buffer view, Raytracer.cs:239-250)


def noise_draw_base(draw_base, samples: int, trace_depth: int):
    """Per-batch base for the kernel's iteration-keyed flavored-draw
    counter.  `draw_base` arrives in SAMPLE units (driver.py:
    batch_index * max_lanes); the kernel consumes at most
    samples*trace_depth iteration draws per batch, and its R2 offsets
    wrap mod 8192 (pallas_megatrace._stbn_rows f32-frac precision).  The
    per-batch stride must therefore be (a) >= samples*trace_depth so
    consecutive batches never overlap and (b) ODD so it is coprime to
    the 2^13 wrap — all 8192 residues are visited before any repeat.
    (The round-4 formula draw_base*samples*trace_depth had stride
    samples^2*depth = 0 mod 8192 at the production 64-spp x depth-8
    config: every progressive batch replayed the identical STBN
    sequence and flavored accumulation stopped converging.)"""
    stride = samples * trace_depth + (1 - (samples * trace_depth) % 2)
    return (jnp.asarray(draw_base, jnp.int32) // samples) * stride


def render_batch(
    scene: Scene,
    camera: Camera,
    acc: film.Accumulators,
    key: jax.Array,
    *,
    width: int,
    height: int,
    samples: int,
    trace_depth: int,
    sub_pixel_jitter: bool = True,
    interlace: tuple[int, int] = (0, 1),
    differentiable: bool = True,
    sample_range: tuple[int, int] | None = None,
    weight_extrema: jnp.ndarray | None = None,
    noise_color: int = 0,
    noise_state=None,
    draw_base: jnp.ndarray | int = 0,
) -> tuple[film.Accumulators, BatchMetrics]:
    """Accumulate up to `samples` new samples per pixel.

    interlace = (slice_offset, slice_divider): only rows with
    row % divider == offset do work this batch (reference row-skip at
    SampleBatchJob.cs:69-70); masked lanes still fly but their results are
    dropped, which preserves static shapes.

    Adaptive sampling (SampleBatchJob.cs:118-126): when `sample_range`
    (min, max) and `weight_extrema` (2,) — the previous batch's reduced
    noise-weight extrema — are given, each pixel accumulates
    round(lerp(min, max, unlerp(extrema, weight))) samples this batch,
    with `samples` lanes in flight and the excess masked off. Pixels with
    zero accumulated weight get the minimum (first-batch behavior).
    """
    n = width * height

    row = jnp.arange(n, dtype=jnp.int32) // width
    slice_offset, slice_divider = interlace
    row_active = (row % slice_divider) == slice_offset

    if sample_range is not None and weight_extrema is not None:
        lo, hi = sample_range
        wps = acc.weight / jnp.maximum(acc.sample_count, 1.0)
        span = jnp.maximum(weight_extrema[1] - weight_extrema[0], 1e-12)
        norm = jnp.clip((wps - weight_extrema[0]) / span, 0.0, 1.0)
        per_pixel = jnp.where(
            wps == 0.0,
            jnp.float32(lo),
            jnp.round(lo + (hi - lo) * norm),
        ).astype(jnp.int32)
    else:
        per_pixel = jnp.full((n,), samples, jnp.int32)

    # --- fused SampleBatchJob kernel (ops/pallas_megatrace.sample_batch):
    # camera raygen + sample loop + bounce loop + accumulation, one
    # pallas_call per batch, all state VMEM-resident.
    from raytracing_in_one_weekend_tpu.core import materials
    from raytracing_in_one_weekend_tpu.ops import pallas_megatrace, pallas_sphere

    def _apply_deltas(acc, d, lane_count):
        """Merge a sample_batch delta dict into the accumulators (shared
        by the fused and diff-fused branches — one copy of the
        fallback-AOV rule)."""
        fb_new = ((acc.sample_count == 0) & (lane_count > 0))[:, None]
        acc = film.Accumulators(
            color=acc.color + d["color"],
            sample_count=acc.sample_count + d["count"],
            normal=acc.normal + d["normal"],
            albedo=acc.albedo + d["albedo"],
            weight=acc.weight + d["weight"],
            fallback_normal=jnp.where(
                fb_new, d["fallback_normal"], acc.fallback_normal
            ),
            fallback_albedo=jnp.where(
                fb_new, d["fallback_albedo"], acc.fallback_albedo
            ),
        )
        return acc, _reduce_metrics(acc, d["rays"])

    def _wavefront_pass(start_acc):
        """The scan-over-samples wavefront integrator (defined here so
        the diff-fused branch below can reuse it as the AOV-gradient
        carrier).  Returns (accumulators, per-sample pixel rays)."""

        def one_sample(carry, sample_index):
            acc_c = carry
            skey = rng.sample_key(key, sample_index)
            first_bounce_tsd = None
            if noise_color != 0 and noise_state is not None:
                # Pixel-correlated sampler flavors (RandomSource.cs
                # NoiseColor): blue / spatio-temporal blue drive jitter +
                # lens draws, and — when the real STBN cosine set is
                # loaded — the first bounce's Lambert scatter
                # (RandomSource.cs:63-89).
                from raytracing_in_one_weekend_tpu.core import randomsource

                u4 = randomsource.pixel_uniforms(
                    noise_state, draw_base + sample_index, width, height
                )
                coords = camera_mod.pixel_coords(
                    width, height, None, sub_pixel_jitter,
                    jitter_uv=u4[:, 0:2],
                )
                rays = camera_mod.generate_rays(
                    camera, coords, skey, lens_uv=u4[:, 2:4]
                )
                first_bounce_tsd = randomsource.pixel_cosine(
                    noise_state, draw_base + sample_index, width, height
                )
            else:
                coords = camera_mod.pixel_coords(
                    width, height, skey if sub_pixel_jitter else None,
                    sub_pixel_jitter,
                )
                rays = camera_mod.generate_rays(camera, coords, skey)
            lane_active = row_active & (sample_index < per_pixel)
            noise_ctx = None
            if noise_color != 0 and noise_state is not None:
                # full flavored-draw routing (scalar/cosine sets at
                # every bounce) — see integrator.trace noise_ctx
                noise_ctx = (
                    noise_state, draw_base + sample_index, width, height
                )
            result = integrator.trace(
                scene, rays, skey, trace_depth,
                differentiable=differentiable,
                active=lane_active, first_bounce_tsd=first_bounce_tsd,
                noise_ctx=noise_ctx,
            )

            valid = result.valid & row_active
            fvalid = valid.astype(jnp.float32)
            is_first_ever = acc_c.sample_count == 0.0

            color_add = result.radiance * fvalid[:, None]
            count_add = fvalid
            if differentiable:
                # zero-valued score-function surrogates
                # (integrator.TraceResult logp): unbiased gradients of the
                # SAMPLING DECISIONS (volume free paths, material
                # lotteries) need E[f * dlogp] on the color SUM and on the
                # valid COUNT — both are functions of those decisions.
                # One surrogate per accumulated product (a product of two
                # surrogated factors double-counts).  logp is identically
                # 0 along deterministic branches, so lambert-only scenes
                # see no extra variance.
                carrier = result.logp - jax.lax.stop_gradient(result.logp)
                color_add = color_add + (
                    jax.lax.stop_gradient(color_add) * carrier[:, None]
                )
                count_add = count_add + (
                    jax.lax.stop_gradient(count_add) * carrier
                )

            new_acc = film.Accumulators(
                color=acc_c.color + color_add,
                sample_count=acc_c.sample_count + count_add,
                normal=acc_c.normal + result.aov_normal * fvalid[:, None],
                albedo=acc_c.albedo + result.aov_albedo * fvalid[:, None],
                weight=acc_c.weight + result.events * fvalid,
                # Fallback AOVs: the first sample's AOV, valid or not
                # (SampleBatchJob.cs:146-151 s==0 fallback capture).
                fallback_normal=jnp.where(
                    (is_first_ever & lane_active)[:, None],
                    result.aov_normal,
                    acc_c.fallback_normal,
                ),
                fallback_albedo=jnp.where(
                    (is_first_ever & lane_active)[:, None],
                    result.aov_albedo,
                    acc_c.fallback_albedo,
                ),
            )
            return new_acc, result.pixel_rays

        return jax.lax.scan(
            one_sample, start_acc, jnp.arange(samples), unroll=1
        )

    # --- differentiable fused path (ops/megatrace_replay): fused-kernel
    # primal + tape-replay VJP.  Sphere/rect/box/VMEM-triangle gradient
    # scope (Cornell + mesh classes); everything else keeps the wavefront
    # below.  The replay propagates the COLOR sum's and valid COUNT's
    # cotangents; AOV (normal/albedo/weight) cotangents ride a
    # stop-gradient-grafted differentiable wavefront term added at the
    # end of this branch — automatic, no flag, and free for photometric
    # losses (DCE removes the unused wavefront subgraph).
    if differentiable and noise_color == 0 and pallas_sphere.use_pallas():
        from raytracing_in_one_weekend_tpu.ops import (
            megatrace_bwd, megatrace_replay,
        )

        diff_fused = megatrace_replay.replay_eligible(scene)
    else:
        diff_fused = False
    if diff_fused:
        lane_count = jnp.where(row_active, per_pixel, 0)
        packed = materials.pack_materials(scene)
        records = pallas_megatrace.pack_sphere_records(scene, packed)
        rect_tables, box_tables = pallas_megatrace.pack_aux_tables(
            scene, packed
        )  # gradients wrt rect/box scene leaves flow through this pack
        tri_tables = pallas_megatrace.pack_tri_tables(scene, packed)
        # gradients wrt triangle soup vertices/normals/uvs flow through
        # this pack (replay_eligible caps the count at VMEM residence)
        tex_all = pallas_megatrace.pack_texture_tables(scene)
        # atlas texel / texture main-color gradients flow through this
        # pack (replay_eligible guarantees perlin is None here)
        tex_tables = tex_all[:3] if tex_all is not None else None
        img_dims = tex_all[3] if tex_all is not None else (0, 0)
        vol0 = (
            pallas_megatrace.camera_containment_row(
                scene, packed, camera.origin
            )
            if scene.flags.has_volumes
            else None
        )  # differentiable: the camera medium's density/albedo leaves
        move_vectors = (
            scene.spheres.move_offset if scene.flags.has_motion else None
        )
        cube_all = (
            pallas_megatrace.pack_cubemap_table(scene)
            if scene.flags.sky == 2 else None
        )  # differentiable: environment-map texel gradients
        seed = jax.random.randint(key, (), 0, 2**31 - 1).astype(jnp.int32)
        d = megatrace_replay.sample_batch_diff(
            lane_count,
            acc.sample_count,
            pallas_megatrace.pack_camera_row(camera, width, height),
            scene.spheres.center,
            scene.spheres.radius,
            records,
            scene.environment.sky_bottom,
            scene.environment.sky_top,
            seed,
            rect_tables=rect_tables,
            box_tables=box_tables,
            tri_tables=tri_tables,
            tex_tables=tex_tables,
            move_vectors=move_vectors,
            vol0=vol0,
            cube_table=cube_all[0] if cube_all is not None else None,
            cube_dims=cube_all[1] if cube_all is not None else (0, 0),
            img_dims=img_dims,
            samples=samples,
            trace_depth=trace_depth,
            has_dielectrics=scene.flags.has_dielectrics,
            sky_on=scene.flags.sky == 1,
            jitter=sub_pixel_jitter,
            # VMEM-resident Pallas reverse sweep across the full replay
            # scope (round 5: image-atlas + cubemap texel cotangents ride
            # the one-hot fetch's vjp); the XLA replay VJP remains the
            # interpret-mode oracle (ops/megatrace_bwd.kernel_bwd_eligible)
            kernel_bwd=megatrace_bwd.kernel_bwd_eligible(scene),
        )
        # (no lane reorder here: the diff-fused gate caps triangles at
        # VMEM residence, so the Morton-routed streamed-triangle path can
        # never be taken)

        # ---- automatic AOV-gradient fallback -------------------------
        # The tape replay propagates only the color/count cotangents; an
        # AOV-regularized loss (normal/albedo/weight) used to raise
        # NotImplementedError at transpose time.  Instead, graft the
        # differentiable WAVEFRONT's AOV channels on with stop-gradient
        # algebra: primal values stay the kernel's (the wave terms cancel
        # exactly), while AOV cotangents flow through the wavefront graph
        # (threefry sample set — an independent unbiased gradient
        # estimate, like any fresh MC estimate of the same expectation).
        # When the loss never touches an AOV channel its cotangent is
        # zero and XLA dead-code-eliminates the whole wavefront subgraph,
        # so photometric-loss gradients pay nothing.  CAVEAT: that DCE
        # fires at TRACE time, so the loss must be jitted TOGETHER with
        # this render (jit(lambda ...: loss(render_batch(...)))); a
        # standalone-jitted differentiable forward returns every AOV
        # channel and therefore executes the full wavefront alongside
        # the kernel (XLA cannot fold float `wv - stop_gradient(wv)`).
        # Forward-only callers should pass differentiable=False.
        acc_w, _ = _wavefront_pass(film.zero_accumulators(n))
        d_wave = dict(
            normal=acc_w.normal,
            albedo=acc_w.albedo,
            weight=acc_w.weight,
            fallback_normal=acc_w.fallback_normal,
            fallback_albedo=acc_w.fallback_albedo,
        )
        for k, wv in d_wave.items():
            d[k] = (
                jax.lax.stop_gradient(d[k])
                + wv - jax.lax.stop_gradient(wv)
            )
        return _apply_deltas(acc, d, lane_count)

    noise_fusable = noise_color == 0 or noise_state is not None
    if (
        not differentiable
        and noise_fusable  # blue/STBN draws come from in-kernel tile dots
        and pallas_sphere.use_pallas()
        and pallas_megatrace.scene_eligible(
            scene, allow_rect_box=True, allow_volumes=True,
            allow_motion=True, allow_triangles=True, allow_textures=True,
            allow_cubemap=True,
        )
    ):
        lane_count = jnp.where(row_active, per_pixel, 0)
        packed = materials.pack_materials(scene)
        records = pallas_megatrace.pack_sphere_records(scene, packed)
        rect_tables, box_tables = pallas_megatrace.pack_aux_tables(
            scene, packed
        )
        tri_count = scene.triangles.vert0.shape[0]
        if tri_count > pallas_megatrace.TRI_MAX:
            # beyond VMEM residence: HBM-streamed per-block tables
            tri_tables = None
            tri_stream_tables = pallas_megatrace.pack_tri_stream_tables(
                scene, packed
            )
        else:
            tri_tables = pallas_megatrace.pack_tri_tables(scene, packed)
            tri_stream_tables = None

        # ---- bounce-synchronous streamed-mesh path -------------------
        # The persistent-lane megakernel's tile-grained block cull unions
        # rays at MIXED bounce phases (lanes desynchronize as they
        # regenerate) and passes ~half the mesh per iteration; the
        # sorted-compacted per-bounce loop (ops/pallas_meshtrace) keeps
        # each tile phase-pure, Morton-coherent and dense, which is what
        # makes the cull actually selective (the TPU answer to the
        # reference's per-ray BVH walk, SampleBatchJob.cs:403-448).
        import os as _os

        from raytracing_in_one_weekend_tpu.ops import pallas_meshtrace

        if (
            tri_stream_tables is not None
            and tri_count > pallas_meshtrace.SYNC_TRI_MIN
            and noise_color == 0
            and not scene.flags.has_volumes
            and not scene.flags.has_motion
            and not scene.flags.has_procedural_textures
            and scene.flags.sky in (0, 1)
            and scene.rects.rot.shape[0] == 0
            and scene.boxes.rot.shape[0] == 0
            and _os.environ.get("MESH_SYNC", "1") != "0"
        ):
            lane_count = jnp.where(row_active, per_pixel, 0)
            d = pallas_meshtrace.sample_batch_sync(
                lane_count,
                acc.sample_count,
                camera,
                key,
                scene.spheres.center,
                scene.spheres.radius,
                pallas_megatrace.pack_sphere_records(scene, packed),
                scene.environment.sky_bottom,
                scene.environment.sky_top,
                tri_stream_tables,
                width=width,
                height=height,
                samples=samples,
                trace_depth=trace_depth,
                has_dielectrics=scene.flags.has_dielectrics,
                sky_on=scene.flags.sky == 1,
                jitter=sub_pixel_jitter,
            )
            return _apply_deltas(acc, d, lane_count)
        tex_all = pallas_megatrace.pack_texture_tables(scene)
        tex_tables = tex_all[:3] if tex_all is not None else None
        img_dims = tex_all[3] if tex_all is not None else (0, 0)
        cube_all = (
            pallas_megatrace.pack_cubemap_table(scene)
            if scene.flags.sky == 2 else None
        )
        # flavored-sampler dispatch: IN-KERNEL tile fetch when the
        # tables fit the packed layout and lanes are row-major (full
        # RandomSource routing at ~zero HBM cost), else the pre-drawn
        # per-sample rows (exact wavefront-parity camera+first-bounce)
        noise_pack = (
            pallas_megatrace.pack_noise_tables(noise_state)
            if noise_color != 0 else None
        )
        noise_u = noise_c = noise_tbl = noise_meta = None
        if noise_pack is not None and width % noise_pack[1]["size"] == 0:
            noise_tbl, meta = noise_pack
            exact = pallas_megatrace.RAY_TILE % width == 0
            n_img_rows = max(1, pallas_megatrace.RAY_TILE // width) + (
                0 if exact else 2
            )
            noise_meta = (
                meta["size"], meta["T"], meta["cam"], meta["cos"],
                meta["scal"], n_img_rows, meta.get("uv3", -1),
                meta.get("scalT", meta["T"]),
            )
        elif noise_color != 0:
            noise_u = pallas_megatrace.pack_noise_uniforms(
                noise_state, acc.sample_count, width, height, samples
            )  # pixel-order columns (lanes are pixel-order, see NOTE)
            noise_c = pallas_megatrace.pack_noise_cosine(
                noise_state, acc.sample_count, width, height, samples
            )  # first-bounce STBN cosine directions
        vol0 = (
            pallas_megatrace.camera_containment_row(
                scene, packed, camera.origin
            )
            if scene.flags.has_volumes
            else None
        )
        seed = jax.random.randint(key, (), 0, 2**31 - 1).astype(jnp.int32)
        # NOTE: lanes map to pixels row-major (identity) for most scenes.
        # A Morton lane permutation was measured 5% SLOWER on the cover
        # scene, and a wash for small VMEM meshes (kernel +17%, host
        # permute gathers -17%).  The exceptions are scenes whose kernel
        # runs tile-wide cull predicates over many blocks: a row-major
        # RAY_TILE covers two full-width pixel rows, whose rays cross
        # nearly every block, so the per-block skip almost never fires;
        # Morton's 32x32 tiles make the predicate actually selective.
        # That's HBM-streamed meshes (per-block DMA skip) and
        # big-sphere-count scenes (the SPH_BLOCK cond-skipped sweep).
        sph_cull = (
            scene.spheres.center.shape[0] > pallas_megatrace.SPH_CULL_MIN
        )
        if (tri_stream_tables is not None or sph_cull) and (
            noise_tbl is not None
        ):
            # Morton lanes break the in-kernel fetch's row-major
            # contiguity — those scene classes keep pre-drawn rows
            noise_tbl = noise_meta = None
            noise_u = pallas_megatrace.pack_noise_uniforms(
                noise_state, acc.sample_count, width, height, samples
            )
            noise_c = pallas_megatrace.pack_noise_cosine(
                noise_state, acc.sample_count, width, height, samples
            )
        if tri_stream_tables is not None or sph_cull:
            order, rank = pallas_megatrace.morton_order(width, height)
            order = jnp.asarray(order)
            rank = jnp.asarray(rank)
            pixel_index = order.astype(jnp.int32)
            lane_count_k = lane_count[order]
            count_in_k = acc.sample_count[order]
            if noise_u is not None:
                noise_u = noise_u[:, order]
            if noise_c is not None:
                noise_c = noise_c[:, order]
        else:
            pixel_index = None
            lane_count_k = lane_count
            count_in_k = acc.sample_count
        d = pallas_megatrace.sample_batch(
            lane_count_k,
            count_in_k,
            pallas_megatrace.pack_camera_row(camera, width, height),
            scene.spheres.center,
            scene.spheres.radius,
            records,
            scene.environment.sky_bottom,
            scene.environment.sky_top,
            seed,
            pixel_index=pixel_index,
            rect_tables=rect_tables,
            box_tables=box_tables,
            tri_tables=tri_tables,
            tri_stream_tables=tri_stream_tables,
            tex_tables=tex_tables,
            img_dims=img_dims,
            cube_table=cube_all[0] if cube_all is not None else None,
            cube_dims=cube_all[1] if cube_all is not None else (0, 0),
            noise_uniforms=noise_u,
            noise_cosine=noise_c,
            noise_tbl=noise_tbl,
            noise_meta=noise_meta,
            noise_draw_base=noise_draw_base(
                draw_base, samples, trace_depth
            ),
            vol0=vol0,
            move_offsets=(
                scene.spheres.move_offset
                if scene.flags.has_motion else None
            ),
            samples=samples,
            trace_depth=trace_depth,
            has_dielectrics=scene.flags.has_dielectrics,
            sky_on=scene.flags.sky == 1,
            jitter=sub_pixel_jitter,
        )
        if tri_stream_tables is not None:
            # deltas arrive in LANE order; pixel p was rendered by lane
            # rank[p]
            d = {k: v[rank] for k, v in d.items()}
        return _apply_deltas(acc, d, lane_count)

    acc, pixel_rays_per_sample = _wavefront_pass(acc)
    pixel_rays = jnp.sum(pixel_rays_per_sample, axis=0)

    return acc, _reduce_metrics(acc, pixel_rays)


def _reduce_metrics(acc: film.Accumulators, pixel_rays) -> BatchMetrics:
    """Shared batch-metric reduction (ReduceMetricsJob.cs:22-47) for the
    fused-kernel and wavefront paths — one definition so the adaptive
    sampler's feedback signals can't diverge between them."""
    count = acc.sample_count
    weight_per_sample = acc.weight / jnp.maximum(count, 1.0)
    return BatchMetrics(
        total_rays=jnp.sum(pixel_rays.astype(jnp.float32)),
        total_samples=jnp.sum(count),
        min_sample_count=jnp.min(count),
        max_sample_count=jnp.max(count),
        weight_min=jnp.min(jnp.where(count > 0, weight_per_sample, jnp.inf)),
        weight_max=jnp.max(jnp.where(count > 0, weight_per_sample, -jnp.inf)),
        pixel_rays=pixel_rays,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "samples", "trace_depth", "sub_pixel_jitter",
        "slice_divider", "differentiable", "sample_range", "noise_color",
    ),
    donate_argnames=("acc",),
)
def render_batch_jit(
    scene: Scene,
    camera: Camera,
    acc: film.Accumulators,
    key: jax.Array,
    slice_offset: jnp.ndarray,
    *,
    width: int,
    height: int,
    samples: int,
    trace_depth: int,
    sub_pixel_jitter: bool = True,
    slice_divider: int = 1,
    differentiable: bool = False,
    sample_range: tuple[int, int] | None = None,
    weight_extrema: jnp.ndarray | None = None,
    noise_color: int = 0,
    noise_state=None,
    draw_base: jnp.ndarray | int = 0,
):
    """Donated-accumulator jitted batch step — the analog of the reference's
    pooled-buffer double-buffering (Raytracer.cs:798-802), which collapses
    to XLA buffer donation.

    NOTE: differentiable defaults to FALSE here (progressive forward
    rendering wants the fused Pallas fast path); pass True before taking
    gradients through this function."""
    return render_batch(
        scene, camera, acc, key,
        width=width, height=height, samples=samples, trace_depth=trace_depth,
        sub_pixel_jitter=sub_pixel_jitter,
        interlace=(slice_offset, slice_divider),
        differentiable=differentiable,
        sample_range=sample_range,
        weight_extrema=weight_extrema,
        noise_color=noise_color,
        noise_state=noise_state,
        draw_base=draw_base,
    )


def render_image(
    scene: Scene,
    camera: Camera,
    key: jax.Array,
    *,
    width: int,
    height: int,
    samples_per_pixel: int,
    trace_depth: int,
    sub_pixel_jitter: bool = True,
    differentiable: bool = True,
) -> film.CombinedImage:
    """One-shot convenience render (no progressive driver).

    Defaults to the differentiable path so jax.grad through this function
    is always correct; pass differentiable=False for forward-only speed."""
    acc = film.zero_accumulators(width * height)
    acc, _ = render_batch_jit(
        scene, camera, acc, key, jnp.asarray(0, jnp.int32),
        width=width, height=height, samples=samples_per_pixel,
        trace_depth=trace_depth, sub_pixel_jitter=sub_pixel_jitter,
        differentiable=differentiable,
    )
    return film.combine(acc, width, height)
