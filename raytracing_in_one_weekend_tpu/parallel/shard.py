"""Device-mesh sharding of the render pipeline.

The reference's only parallelism is a shared-memory IJobParallelFor over
pixels (Raytracer.cs:730; SURVEY.md section 2.7).  The TPU-native
counterpart is a `jax.sharding.Mesh` with two logical axes:

  * "tiles"   — data parallelism over the pixel grid (the reference's
                pixel-parallel axis, scaled across chips/hosts)
  * "samples" — sample parallelism over samples-per-pixel (the renderer's
                "sequence" axis, SURVEY.md section 5): each group of chips
                renders the full image with a disjoint sample stream and
                accumulators are psum'd across the axis

Scene parameters and the BVH are tiny and replicated; gradients and metric
reductions become XLA collectives (psum over ICI) inserted automatically by
GSPMD from the sharding annotations — no hand-written NCCL analog.
"""

from __future__ import annotations

import functools
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TILE_AXIS = "tiles"
SAMPLE_AXIS = "samples"


def make_mesh(
    devices=None, sample_parallel: int = 1
) -> Mesh:
    """Build a (tiles, samples) mesh over the available devices.

    sample_parallel divides the device count; the remainder becomes the
    pixel-tile axis.  With one device this degenerates gracefully (1x1).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % sample_parallel != 0:
        raise ValueError(
            f"sample_parallel={sample_parallel} must divide device count {n}"
        )
    tiles = n // sample_parallel
    grid = np.asarray(devices).reshape(tiles, sample_parallel)
    return Mesh(grid, (TILE_AXIS, SAMPLE_AXIS))


def pixel_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (pixel) axis sharded over tiles, replicated over samples."""
    return NamedSharding(mesh, P(TILE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def constrain_pixels(mesh: Mesh, tree: Any) -> Any:
    """with_sharding_constraint: every leaf's leading axis over tiles."""
    sharding = pixel_sharding(mesh)

    def _c(x):
        if x.ndim == 0:
            return x
        return jax.lax.with_sharding_constraint(x, sharding)

    return jax.tree.map(_c, tree)


def place_scene(mesh: Mesh, scene):
    """Replicate the scene pytree on every device (the reference's
    'BVH + materials are shared memory' become replicated params)."""
    return jax.device_put(scene, replicated(mesh))


def place_accumulators(mesh: Mesh, acc):
    """Shard the per-pixel accumulators over the tile axis."""
    return jax.device_put(acc, pixel_sharding(mesh))


def padded_pixel_count(pixel_count: int, mesh: Mesh) -> int:
    """Pixels must divide evenly over the tile axis; pad to a multiple."""
    tiles = mesh.shape[TILE_AXIS]
    return int(math.ceil(pixel_count / tiles) * tiles)


# ---------------------------------------------------------------------------
# Sharded render + train steps
# ---------------------------------------------------------------------------


def sharded_render_batch(
    mesh: Mesh,
    scene,
    camera,
    acc,
    key,
    *,
    width: int,
    height: int,
    samples: int,
    trace_depth: int,
    sub_pixel_jitter: bool = True,
):
    """Pixel-tile-sharded progressive batch step.

    The sample loop additionally splits across the mesh's sample axis:
    each sample-group accumulates `samples / sample_axis` samples with an
    independent key, and the per-pixel sums are psum'd — an all-reduce over
    ICI, overlapping with the next tile's compute (XLA schedules it).
    """
    from raytracing_in_one_weekend_tpu.render import film as film_mod
    from raytracing_in_one_weekend_tpu.render import renderer as renderer_mod

    n_sample_groups = mesh.shape[SAMPLE_AXIS]
    if samples % n_sample_groups != 0:
        raise ValueError(
            f"samples={samples} must divide over sample axis {n_sample_groups}"
        )

    def step(scene, camera, acc, key):
        acc = constrain_pixels(mesh, acc)

        if n_sample_groups == 1:
            new_acc, metrics = renderer_mod.render_batch(
                scene, camera, acc, key,
                width=width, height=height, samples=samples,
                trace_depth=trace_depth, sub_pixel_jitter=sub_pixel_jitter,
            )
            return constrain_pixels(mesh, new_acc), metrics

        # sample-axis parallelism: each group renders samples/n with its
        # own key; the delta-accumulators are summed (GSPMD -> psum).
        group_keys = jax.random.split(key, n_sample_groups)
        zero = film_mod.zero_accumulators(width * height)

        def group(gkey):
            delta, gmetrics = renderer_mod.render_batch(
                scene, camera, zero, gkey,
                width=width, height=height,
                samples=samples // n_sample_groups,
                trace_depth=trace_depth, sub_pixel_jitter=sub_pixel_jitter,
            )
            return delta, gmetrics.pixel_rays

        deltas, group_pixel_rays = jax.vmap(group)(group_keys)
        deltas = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(SAMPLE_AXIS, TILE_AXIS))
            ),
            deltas,
        )
        summed = jax.tree.map(lambda x: jnp.sum(x, axis=0), deltas)
        pixel_rays = jnp.sum(group_pixel_rays, axis=0)
        new_acc = film_mod.Accumulators(
            color=acc.color + summed.color,
            sample_count=acc.sample_count + summed.sample_count,
            normal=acc.normal + summed.normal,
            albedo=acc.albedo + summed.albedo,
            weight=acc.weight + summed.weight,
            fallback_normal=jnp.where(
                (acc.sample_count == 0)[:, None],
                summed.fallback_normal, acc.fallback_normal,
            ),
            fallback_albedo=jnp.where(
                (acc.sample_count == 0)[:, None],
                summed.fallback_albedo, acc.fallback_albedo,
            ),
        )
        new_acc = constrain_pixels(mesh, new_acc)
        return new_acc, renderer_mod._reduce_metrics(new_acc, pixel_rays)

    return jax.jit(step, donate_argnums=(2,))(scene, camera, acc, key)


def sharded_fused_render_batch(
    mesh: Mesh,
    scene,
    camera,
    acc,
    key,
    *,
    width: int,
    height: int,
    samples: int,
    trace_depth: int,
    sub_pixel_jitter: bool = True,
    interpret: bool = False,
):
    """Pixel-tile-sharded batch step running the FUSED megakernel on every
    device via shard_map.

    `pallas_call` has no GSPMD partitioning rule, so the plain-jit path
    (sharded_render_batch) would replicate/gather the kernel's operands
    instead of scaling; shard_map places one kernel invocation per device
    on its lane shard.  Each device's `lane_base` offsets the kernel's
    hash-PRNG lane keying so the sharded render is BIT-IDENTICAL to the
    single-device kernel (tests/test_sharding.py oracles it), and the
    mesh's sample axis splits samples-per-pixel into independent streams
    whose delta-accumulators psum over ICI.

    Scope: white-noise sampler, uniform samples/pixel, VMEM-resident
    scenes (every fused feature incl. rects/boxes/triangles <= TRI_MAX,
    textures, cubemap, volumes, motion).  The wavefront path under plain
    GSPMD (sharded_render_batch) covers everything else.
    """
    from raytracing_in_one_weekend_tpu.core import materials
    from raytracing_in_one_weekend_tpu.ops import pallas_megatrace as mk
    from raytracing_in_one_weekend_tpu.render import film as film_mod
    from raytracing_in_one_weekend_tpu.render import renderer as renderer_mod

    n = width * height
    tiles = mesh.shape[TILE_AXIS]
    sgroups = mesh.shape[SAMPLE_AXIS]
    if n % tiles != 0:
        raise ValueError(f"pixels {n} must divide over {tiles} tiles")
    if samples % sgroups != 0:
        raise ValueError(
            f"samples={samples} must divide over sample axis {sgroups}"
        )
    if not mk.scene_eligible(
        scene, allow_rect_box=True, allow_volumes=True, allow_motion=True,
        allow_triangles=True, allow_textures=True, allow_cubemap=True,
    ) or scene.triangles.vert0.shape[0] > mk.TRI_MAX:
        raise ValueError(
            "scene outside the fused-kernel scope; use "
            "sharded_render_batch (wavefront under GSPMD)"
        )
    shard = n // tiles
    s_local = samples // sgroups

    has_img = (
        scene.textures.atlas is not None
        and scene.flags.has_procedural_textures
    )
    step = _fused_step(
        mesh, width, height, shard, s_local, sgroups, trace_depth,
        scene.flags, bool(sub_pixel_jitter), bool(interpret),
        scene.rects.rot.shape[0] > 0, scene.boxes.rot.shape[0] > 0,
        scene.triangles.vert0.shape[0] > 0, bool(has_img),
        scene.textures.perlin is not None,
    )
    return step(scene, camera, acc, key)


@functools.lru_cache(maxsize=64)
def _fused_step(
    mesh, width, height, shard, s_local, sgroups, trace_depth,
    flags, jitter, interpret, has_rects, has_boxes, has_tris, has_img,
    has_perlin,
):
    """Build (and cache) the jitted packing + shard_map step for one
    (mesh, scene topology, batch shape) — a fresh jit wrapper per call
    retraced every batch, and eager per-call packing cost ~3x the kernel
    in dispatch (measured 16 vs 54 MRays/s); packing is traced here so
    XLA folds it into the step."""
    from raytracing_in_one_weekend_tpu.core import materials
    from raytracing_in_one_weekend_tpu.ops import pallas_megatrace as mk
    from raytracing_in_one_weekend_tpu.render import film as film_mod
    from raytracing_in_one_weekend_tpu.render import renderer as renderer_mod

    n = width * height
    sky_on = int(flags.sky) == 1
    has_dielectrics = bool(flags.has_dielectrics)

    table_keys = {"cam_row", "centers", "radii", "records", "sky_bottom",
                  "sky_top"}
    if has_rects:
        table_keys |= {"rect_geo", "rect_rec"}
    if has_boxes:
        table_keys |= {"box_geo", "box_rec"}
    if has_tris:
        table_keys |= {"tri_geo", "tri_rec"}
    if flags.has_procedural_textures:
        table_keys |= {"texrec"}
        if has_img:
            table_keys |= {"tex_img"}
        if has_perlin:
            table_keys |= {"tex_perlin"}
    if int(flags.sky) == 2:
        table_keys |= {"cube"}
    if flags.has_volumes:
        table_keys |= {"vol0"}
    if flags.has_motion:
        table_keys |= {"move"}

    def fn(scene, camera, acc, key):
        # seed derived in-jit: an eager randint here cost a host round
        # trip per batch (part of the measured 1-chip shard overhead)
        seed0 = jax.random.randint(key, (), 0, 2**30 - 1).astype(jnp.int32)
        # ---- packing, traced (XLA folds/caches it in the step) --------
        packed = materials.pack_materials(scene)
        records = mk.pack_sphere_records(scene, packed)
        rect_tables, box_tables = mk.pack_aux_tables(scene, packed)
        tri_tables = mk.pack_tri_tables(scene, packed)
        tex_all = mk.pack_texture_tables(scene)
        cube_all = (
            mk.pack_cubemap_table(scene) if int(flags.sky) == 2 else None
        )
        tables = dict(
            cam_row=mk.pack_camera_row(camera, width, height),
            centers=scene.spheres.center,
            radii=scene.spheres.radius,
            records=records,
            sky_bottom=scene.environment.sky_bottom,
            sky_top=scene.environment.sky_top,
        )
        if rect_tables is not None:
            tables["rect_geo"], tables["rect_rec"] = rect_tables
        if box_tables is not None:
            tables["box_geo"], tables["box_rec"] = box_tables
        if tri_tables is not None:
            tables["tri_geo"], tables["tri_rec"] = tri_tables
        img_dims = (0, 0)
        if tex_all is not None:
            tables["texrec"] = tex_all[0]
            if tex_all[1] is not None:
                tables["tex_perlin"] = tex_all[1]
            if tex_all[2] is not None:
                tables["tex_img"] = tex_all[2]
            img_dims = tex_all[3]
        cube_dims = (0, 0)
        if cube_all is not None:
            tables["cube"] = cube_all[0]
            cube_dims = cube_all[1]
        if flags.has_volumes:
            tables["vol0"] = mk.camera_containment_row(
                scene, packed, camera.origin
            )
        if flags.has_motion:
            tables["move"] = scene.spheres.move_offset
        assert set(tables) == table_keys, (set(tables), table_keys)
        return _mapped(img_dims, cube_dims)(acc, seed0, tables)

    def _mapped(img_dims, cube_dims):
        def body(acc, seed0, tables):

            t = jax.lax.axis_index(TILE_AXIS)
            g = jax.lax.axis_index(SAMPLE_AXIS)
            base = (t * shard).astype(jnp.int32)
            lane_count = jnp.full((shard,), s_local, jnp.int32)
            pair = lambda a, b: (
                (tables[a], tables[b]) if a in tables else None
            )
            tex_tables = (
                (tables["texrec"], tables.get("tex_perlin"),
                 tables.get("tex_img"))
                if "texrec" in tables else None
            )
            d = mk.sample_batch(
                lane_count,
                acc.sample_count,
                tables["cam_row"],
                tables["centers"],
                tables["radii"],
                tables["records"],
                tables["sky_bottom"],
                tables["sky_top"],
                seed0,
                pixel_index=base + jnp.arange(shard, dtype=jnp.int32),
                rect_tables=pair("rect_geo", "rect_rec"),
                box_tables=pair("box_geo", "box_rec"),
                tri_tables=pair("tri_geo", "tri_rec"),
                tex_tables=tex_tables,
                img_dims=img_dims,
                cube_table=tables.get("cube"),
                cube_dims=cube_dims,
                vol0=tables.get("vol0"),
                move_offsets=tables.get("move"),
                lane_base=base + g * jnp.int32(n),
                samples=s_local,
                trace_depth=trace_depth,
                has_dielectrics=has_dielectrics,
                sky_on=sky_on,
                jitter=jitter,
                interpret=interpret,
            )
            if sgroups > 1:
                d = jax.tree.map(
                    lambda x: jax.lax.psum(x, SAMPLE_AXIS), d
                )
            fb_new = ((acc.sample_count == 0) & (d["count"] > 0))[:, None]
            new_acc = film_mod.Accumulators(
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
            # global metric reductions: local reduce + psum/pmin/pmax over
            # the mesh (ReduceMetricsJob analog as ICI collectives).
            # d was already psummed over SAMPLE_AXIS above (and with
            # sgroups == 1 that axis is trivial), so the additive totals
            # reduce over TILE_AXIS only — psumming them over both axes
            # double-counts by sgroups (each sample-group device holds the
            # identical sample-reduced value).  pmin/pmax are idempotent
            # over the replicated axis and keep both.
            axes = (TILE_AXIS, SAMPLE_AXIS)
            count = new_acc.sample_count
            wps = new_acc.weight / jnp.maximum(count, 1.0)
            metrics = renderer_mod.BatchMetrics(
                total_rays=jax.lax.psum(
                    jnp.sum(d["rays"].astype(jnp.float32)), TILE_AXIS
                ),
                total_samples=jax.lax.psum(jnp.sum(count), TILE_AXIS),
                min_sample_count=jax.lax.pmin(jnp.min(count), axes),
                max_sample_count=jax.lax.pmax(jnp.max(count), axes),
                weight_min=jax.lax.pmin(
                    jnp.min(jnp.where(count > 0, wps, jnp.inf)), axes
                ),
                weight_max=jax.lax.pmax(
                    jnp.max(jnp.where(count > 0, wps, -jnp.inf)), axes
                ),
                pixel_rays=d["rays"].astype(jnp.int32),
            )
            return new_acc, metrics

        pixel_spec = P(TILE_AXIS)
        acc_spec = film_mod.Accumulators(
            color=pixel_spec, sample_count=pixel_spec, normal=pixel_spec,
            albedo=pixel_spec, weight=pixel_spec, fallback_normal=pixel_spec,
            fallback_albedo=pixel_spec,
        )
        mapped = jax.shard_map(
            body, mesh=mesh,
            in_specs=(
                acc_spec,
                P(),
                {k: P() for k in table_keys},
            ),
            out_specs=(
                acc_spec,
                renderer_mod.BatchMetrics(
                    total_rays=P(), total_samples=P(), min_sample_count=P(),
                    max_sample_count=P(), weight_min=P(), weight_max=P(),
                    pixel_rays=pixel_spec,
                ),
            ),
            check_vma=False,
        )
        return mapped

    return jax.jit(fn, donate_argnums=(2,))


def make_sharded_train_step(
    mesh: Mesh,
    scene_template,
    camera,
    target_image,
    optimizer,
    *,
    width: int,
    height: int,
    samples_per_pixel: int,
    trace_depth: int,
):
    """Jitted, mesh-sharded inverse-rendering train step (GSPMD).

    Scene parameters are replicated; the rendered image and target are
    pixel-sharded; the photometric loss mean and the parameter gradients
    contract over the sharded pixel axis, which GSPMD lowers to psum over
    ICI (the BASELINE 'gradients all-reduced overlapped with the backward
    sweep' north star — XLA's latency-hiding scheduler does the overlap).

    NOTE: on TPU the differentiable render dispatches the diff-fused
    kernel (a pallas_call), which GSPMD CANNOT partition — this plain-jit
    step then replicates/gathers instead of scaling.  It remains correct
    (and is the right step for the wavefront/CPU path); for the fused
    path at scale use make_sharded_fused_train_step below.
    """
    from raytracing_in_one_weekend_tpu.diff import params as params_mod
    from raytracing_in_one_weekend_tpu.render import renderer as renderer_mod

    target_image = jax.device_put(target_image, pixel_sharding(mesh))

    def loss_fn(params, key):
        scene = params_mod.apply_params(scene_template, params)
        img = renderer_mod.render_image(
            scene, camera, key,
            width=width, height=height,
            samples_per_pixel=samples_per_pixel, trace_depth=trace_depth,
        )
        color = constrain_pixels(mesh, img.color)
        return jnp.mean((color - target_image) ** 2)

    @jax.jit
    def train_step(params, opt_state, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return train_step


def make_sharded_fused_train_step(
    mesh: Mesh,
    scene_template,
    camera,
    target_image,
    optimizer,
    *,
    width: int,
    height: int,
    samples_per_pixel: int,
    trace_depth: int,
    interpret: bool = False,
):
    """Mesh-sharded train step over the DIFFERENTIABLE FUSED path
    (megatrace_replay.sample_batch_diff under shard_map).

    `pallas_call` has no GSPMD partitioning rule, so taking gradients
    through the fused kernel under plain jit (make_sharded_train_step)
    replicates instead of scaling; here shard_map places one
    kernel-fwd + tape-replay-VJP per device on its pixel shard, with the
    forward path's lane_base RNG keying (pixel_base = the shard's
    row-major offset) so the sharded gradients equal the single-device
    gradients bit-for-bit modulo float reduction order
    (tests/test_sharding.py oracles them on the 8-device CPU mesh).
    The mesh's sample axis splits samples-per-pixel into independent
    streams whose color/count deltas psum over ICI inside the
    differentiated function; parameter gradients psum over BOTH axes
    (the config-5 'gradients all-reduced with the backward sweep' north
    star as explicit shard_map collectives).

    Scope = the diff-fused scope (megatrace_replay.replay_eligible);
    ineligible scenes raise — use make_sharded_train_step's wavefront.
    """
    from raytracing_in_one_weekend_tpu.core import materials
    from raytracing_in_one_weekend_tpu.diff import params as params_mod
    from raytracing_in_one_weekend_tpu.ops import megatrace_bwd
    from raytracing_in_one_weekend_tpu.ops import megatrace_replay
    from raytracing_in_one_weekend_tpu.ops import pallas_megatrace as mk

    # static per-topology choice: the VMEM-resident Pallas reverse sweep
    # where eligible, the XLA replay VJP otherwise (same rule as the
    # single-device renderer dispatch)
    kernel_bwd = megatrace_bwd.kernel_bwd_eligible(scene_template)

    if not megatrace_replay.replay_eligible(scene_template):
        raise ValueError(
            "scene outside the diff-fused (tape replay) scope; use "
            "make_sharded_train_step (wavefront under GSPMD)"
        )
    n = width * height
    tiles = mesh.shape[TILE_AXIS]
    sgroups = mesh.shape[SAMPLE_AXIS]
    if n % tiles != 0:
        raise ValueError(f"pixels {n} must divide over {tiles} tiles")
    if samples_per_pixel % sgroups != 0:
        raise ValueError(
            f"samples_per_pixel={samples_per_pixel} must divide over "
            f"sample axis {sgroups}"
        )
    shard = n // tiles
    s_local = samples_per_pixel // sgroups
    flags = scene_template.flags
    sky_on = int(flags.sky) == 1

    target_image = jax.device_put(target_image, pixel_sharding(mesh))

    def device_loss(params, target_shard, seed0):
        """Per-device loss contribution; runs INSIDE shard_map so the
        pallas_call + custom_vjp never meet the GSPMD partitioner."""
        t = jax.lax.axis_index(TILE_AXIS)
        g = jax.lax.axis_index(SAMPLE_AXIS)
        base = (t * shard).astype(jnp.int32)

        scene = params_mod.apply_params(scene_template, params)
        packed = materials.pack_materials(scene)
        records = mk.pack_sphere_records(scene, packed)
        rect_tables, box_tables = mk.pack_aux_tables(scene, packed)
        tri_tables = mk.pack_tri_tables(scene, packed)
        tex_all = mk.pack_texture_tables(scene)
        tex_tables = tex_all[:3] if tex_all is not None else None
        img_dims = tex_all[3] if tex_all is not None else (0, 0)
        cube_all = (
            mk.pack_cubemap_table(scene) if int(flags.sky) == 2 else None
        )
        vol0 = (
            mk.camera_containment_row(scene, packed, camera.origin)
            if flags.has_volumes else None
        )
        move_vectors = (
            scene.spheres.move_offset if flags.has_motion else None
        )
        d = megatrace_replay.sample_batch_diff(
            jnp.full((shard,), s_local, jnp.int32),
            jnp.zeros((shard,), jnp.float32),
            mk.pack_camera_row(camera, width, height),
            scene.spheres.center,
            scene.spheres.radius,
            records,
            scene.environment.sky_bottom,
            scene.environment.sky_top,
            seed0,
            rect_tables=rect_tables,
            box_tables=box_tables,
            tri_tables=tri_tables,
            tex_tables=tex_tables,
            move_vectors=move_vectors,
            vol0=vol0,
            cube_table=cube_all[0] if cube_all is not None else None,
            cube_dims=cube_all[1] if cube_all is not None else (0, 0),
            img_dims=img_dims,
            samples=s_local,
            trace_depth=trace_depth,
            has_dielectrics=bool(flags.has_dielectrics),
            sky_on=sky_on,
            lane_base=base + g * jnp.int32(n),
            pixel_base=base,
            interpret=interpret,
            kernel_bwd=kernel_bwd,
        )
        color, cnt = d["color"], d["count"]
        if sgroups > 1:
            # sample-group deltas combine BEFORE the ratio estimator;
            # differentiable (psum transposes to a per-device cotangent
            # broadcast, so each group backprops its own contribution)
            color = jax.lax.psum(color, SAMPLE_AXIS)
            cnt = jax.lax.psum(cnt, SAMPLE_AXIS)
        img = color / jnp.maximum(cnt, 1.0)[:, None]
        # this tile's contribution to the full-image mean
        return jnp.sum((img - target_shard) ** 2) / (n * 3)

    def body(params, target_shard, seed0):
        loss, grads = jax.value_and_grad(device_loss)(
            params, target_shard, seed0
        )
        # loss: tile contributions sum over TILE (identical over SAMPLE
        # after the in-loss psum).  grads: shard_map transposes the
        # in-loss psum(color, SAMPLE) to another psum, so each device's
        # cotangent — and hence its grad contribution — carries an extra
        # sgroups factor (verified exactly 2x on a 2-group mesh); psum
        # over BOTH axes then divide it back out.
        loss = jax.lax.psum(loss, TILE_AXIS)
        grads = jax.tree.map(
            lambda x: jax.lax.psum(x, (TILE_AXIS, SAMPLE_AXIS)) / sgroups,
            grads,
        )
        return loss, grads

    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(TILE_AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @jax.jit
    def train_step(params, opt_state, key):
        seed0 = jax.random.randint(key, (), 0, 2**30 - 1).astype(jnp.int32)
        loss, grads = mapped(params, target_image, seed0)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return train_step
