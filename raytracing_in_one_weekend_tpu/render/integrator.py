"""Wavefront path-tracing integrator.

Reference: the Sample() bounce loop of the megakernel
(Jobs/SampleBatchJob.cs:166-401): per bounce — BVH candidate walk, sorted
hits, probabilistic-volume walk, material scatter, emission/attenuation
stacks, AOV capture, sky termination; depth exhaustion *fails* the sample
(SampleBatchJob.cs:380-381); final radiance is the back-to-front fold
c = c*a + e (SampleBatchJob.cs:384-396).

TPU-native redesign:
  * One `lax.scan` over bounce depth; every ray of the wavefront advances in
    lockstep with an active mask (no divergence, static shapes).
  * The emission/attenuation two-stack fold is algebraically identical to
    the running pair  radiance += throughput * e;  throughput *= a,
    which needs no stacks and is the associative, scan- and autodiff-
    friendly form.
  * The sorted-hit volume walk (SampleBatchJob.cs:212-303) collapses to
    per-ray state: the id of the volume we are inside (-1 when outside)
    plus the hit entity's convex exit distance. Equivalent for the convex
    hulls volumes are restricted to (Entity.cs:24 IsConvexHull). Deviation:
    passing *through* a volume without scattering consumes one bounce
    iteration here (the reference advances within the same depth); deep
    nested-volume scenes should raise trace_depth accordingly.
  * "Camera starts inside a volume" (DetermineVolumeContainment,
    SampleBatchJob.cs:477-508) becomes a direct point-in-convex-hull test.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from raytracing_in_one_weekend_tpu.core import (
    environment, materials, math3, randomsource, rng,
)
from raytracing_in_one_weekend_tpu.core.ray import Rays, SELF_INTERSECTION_OFFSET
from raytracing_in_one_weekend_tpu.ops import intersect
from raytracing_in_one_weekend_tpu.scene.scene import MaterialType, Scene


class PathState(NamedTuple):
    origin: jnp.ndarray  # (N, 3)
    direction: jnp.ndarray  # (N, 3)
    time: jnp.ndarray  # (N,)
    throughput: jnp.ndarray  # (N, 3)
    radiance: jnp.ndarray  # (N, 3)
    active: jnp.ndarray  # (N,) bool — still bouncing
    valid: jnp.ndarray  # (N,) bool — terminated successfully (sky)
    inside_volume: jnp.ndarray  # (N,) int32 — material id or -1
    aov_normal: jnp.ndarray  # (N, 3)
    aov_albedo: jnp.ndarray  # (N, 3)
    got_nonspecular: jnp.ndarray  # (N,) bool
    events: jnp.ndarray  # (N,) RandomEvents accumulator
    logp: jnp.ndarray  # (N,) score-function accumulator: log-probability
    # of the path's volume decisions as a (traced) function of density.
    # Zero-valued surrogate at fold time gives unbiased density gradients
    # (the Beer-Lambert free-path draw and the scatter/survive branch are
    # sampling DECISIONS — detached-autodiff sees no density dependence;
    # measured interior-only d/d_density ~ 0 vs FD -0.01 on volume_test)


class TraceResult(NamedTuple):
    radiance: jnp.ndarray  # (N, 3) — zero where invalid
    valid: jnp.ndarray  # (N,) bool
    logp: jnp.ndarray  # (N,) score-function accumulator: traced
    # parameter dependence of the path's sampling decisions (volume free
    # paths + scatter/survive, material specular/metal lotteries,
    # dielectric reflect/refract).  Consumers wanting decision gradients
    # attach the zero-valued surrogate sg(x) * (logp - sg(logp)) ONCE per
    # accumulated product — render_batch does this for the color sum AND
    # the valid count (the ratio estimator's denominator is also a
    # decision; covering only the numerator measured a 48% biased
    # d/d_density on volume_test)
    aov_normal: jnp.ndarray  # (N, 3)
    aov_albedo: jnp.ndarray  # (N, 3)
    events: jnp.ndarray  # (N,)
    ray_count: jnp.ndarray  # () total rays cast (for MRays/s metrics)
    pixel_rays: jnp.ndarray  # (N,) rays cast per pixel (Diagnostics.RayCount)


def trace(
    scene: Scene,
    rays: Rays,
    key: jax.Array,
    trace_depth: int,
    differentiable: bool = True,
    active: jnp.ndarray | None = None,
    first_bounce_tsd: jnp.ndarray | None = None,  # (N, 3) pre-drawn
    #   tangent-space cosine directions for the FIRST bounce's Lambert
    #   draw (the STBN unitvec3_cosine set, RandomSource.cs:63-89);
    #   deeper bounces stay white unless noise_ctx routes them
    noise_ctx: tuple | None = None,  # (NoiseState, draw_index (), width,
    #   height): FULL flavored-draw routing — when the state carries the
    #   STBN scalar/cosine sets, every bounce's scatter draws
    #   (rough-normal inversion, material lotteries, dielectric choice),
    #   the volume free-path draw and every Lambert cosine draw come
    #   from the baked sets with (draw, bounce, purpose)-keyed R2
    #   offsets — the reference feeds ALL of these through the selected
    #   NoiseColor (RandomSource.cs:27-33 NextFloat from Material.cs
    #   lotteries, :63-89 OnCosineWeightedHemisphere from
    #   Material.cs:92,107)
) -> TraceResult:
    """Trace a wavefront of rays to completion (one full path per ray).

    differentiable=False enables the fused Pallas fast path (selection +
    record fetch in VMEM, no HBM gathers) whose hit attributes carry NO
    gradients wrt scene geometry — use it for forward-only progressive
    rendering; keep True for anything under jax.grad.

    `active` optionally masks lanes off from the start (the reference's
    per-pixel adaptive sample count, SampleBatchJob.cs:118-126, and
    interlace row skip, :69-70): masked lanes fly but cast no counted rays
    and never become valid.
    """
    n = rays.origin.shape[0]

    # --- fully fused megakernel dispatch (ops/pallas_megatrace.py): the
    # entire bounce loop in one VMEM-resident Pallas kernel for the
    # sphere-only / constant-texture / gradient-sky scene class.
    from raytracing_in_one_weekend_tpu.ops import pallas_megatrace, pallas_sphere

    mega = (
        not differentiable
        and first_bounce_tsd is None  # megatrace has no pre-drawn-set slot
        and noise_ctx is None
        and pallas_sphere.use_pallas()
        and pallas_megatrace.scene_eligible(scene)
    )
    if mega:
        packed0 = materials.pack_materials(scene)
        records = packed0[scene.spheres.material][:, :11]
        seed = jax.random.randint(
            rng.purpose_key(key, rng.Purpose.SCATTER_A), (), 0, 2**31 - 1
        ).astype(jnp.int32)
        out = pallas_megatrace.megatrace(
            rays.origin,
            rays.direction,
            jnp.ones((n,), jnp.bool_) if active is None else active,
            scene.spheres.center,
            scene.spheres.radius,
            records,
            scene.environment.sky_bottom,
            scene.environment.sky_top,
            seed,
            trace_depth=trace_depth,
            has_dielectrics=scene.flags.has_dielectrics,
            sky_on=scene.flags.sky == 1,
        )
        return TraceResult(
            radiance=out["radiance"],
            valid=out["valid"],
            logp=jnp.zeros_like(out["valid"], dtype=jnp.float32),
            aov_normal=out["aov_normal"],
            aov_albedo=out["aov_albedo"],
            events=out["events"],
            ray_count=jnp.sum(out["pixel_rays"]),
            pixel_rays=out["pixel_rays"],
        )

    if scene.flags.has_volumes:
        inside0 = intersect.point_inside_volume(scene, rays.origin)
    else:
        inside0 = jnp.full((n,), -1, jnp.int32)
    state = PathState(
        origin=rays.origin,
        direction=rays.direction,
        time=rays.time,
        throughput=jnp.ones((n, 3)),
        radiance=jnp.zeros((n, 3)),
        active=jnp.ones((n,), jnp.bool_) if active is None else active,
        valid=jnp.zeros((n,), jnp.bool_),
        inside_volume=inside0,
        aov_normal=jnp.zeros((n, 3)),
        aov_albedo=jnp.zeros((n, 3)),
        got_nonspecular=jnp.zeros((n,), jnp.bool_),
        events=jnp.zeros((n,)),
        logp=jnp.zeros((n,)),
    )

    # Loop-invariant packed material records (see materials.pack_materials).
    packed = materials.pack_materials(scene)

    # Per-sphere records for the fused fast path: packed material row of
    # each sphere + its material id (S-sized, loop-invariant).
    from raytracing_in_one_weekend_tpu.ops import pallas_sphere

    fast = (
        not differentiable
        and pallas_sphere.use_pallas()
        and not scene.flags.has_motion
        and not scene.flags.has_procedural_textures
        and not scene.flags.has_volumes
        and scene.spheres.center.shape[0] > 0
        and scene.rects.rot.shape[0] == 0
        and scene.boxes.rot.shape[0] == 0
        and scene.triangles.vert0.shape[0] == 0
    )
    if fast:
        sph_records = jnp.concatenate(
            [
                packed[scene.spheres.material][:, :11],
                scene.spheres.material[:, None].astype(jnp.float32),
            ],
            axis=1,
        )
    else:
        sph_records = None

    # Remat policy: on the CPU/brute-force path the adjoint would store
    # O(depth * N * S) intersection residuals per bounce — remat
    # (jax.checkpoint) trades that for recompute.  On TPU the Pallas
    # selection kernel already reduces residuals to O(N)-sized winner
    # attributes, where remat only doubles work: grad measured 1.5x faster
    # without it (235ms -> 159ms, cover scene 262k rays x depth 8).
    use_remat = not (
        pallas_sphere.use_pallas() and not scene.flags.has_motion
    )

    def bounce(state: PathState, bounce_index):
        bkey = rng.bounce_key(key, bounce_index)
        flavored = None
        if noise_ctx is not None:
            nstate, dbase, width, height = noise_ctx
            if nstate is not None and nstate.scalar is not None:
                # one draw slot per (sample, bounce); purposes split the
                # slot into independent streams (randomsource.pixel_*
                # R2-offset keying)
                u6 = jnp.stack([
                    randomsource.pixel_scalar(
                        nstate, dbase, bounce_index, pu, width, height
                    )
                    for pu in range(6)
                ])
                u_free = randomsource.pixel_scalar(
                    nstate, dbase, bounce_index, 6, width, height
                )
                tsd = randomsource.pixel_cosine_at(
                    nstate, dbase, bounce_index, width, height
                )
                uv3 = randomsource.pixel_unitvec3(
                    nstate, dbase, bounce_index, width, height
                )
                flavored = (u6, u_free, tsd, uv3)
        new_state = _bounce_once(
            scene, state, bkey, bounce_index, packed, sph_records,
            first_bounce_tsd, flavored=flavored,
        )
        # Per-pixel ray counting (the reference increments
        # Diagnostics.RayCount every bounce, SampleBatchJob.cs:203).
        return new_state, state.active

    if use_remat:
        bounce = jax.checkpoint(bounce)

    state, active_per_bounce = jax.lax.scan(
        bounce, state, jnp.arange(trace_depth), unroll=2
    )
    pixel_rays = jnp.sum(active_per_bounce.astype(jnp.int32), axis=0)

    valid = state.valid
    radiance = jnp.where(valid[:, None], state.radiance, 0.0)
    return TraceResult(
        radiance=radiance,
        valid=valid,
        logp=state.logp,
        aov_normal=state.aov_normal,
        aov_albedo=state.aov_albedo,
        events=state.events,
        ray_count=jnp.sum(pixel_rays),
        pixel_rays=pixel_rays,
    )


def _bounce_once(
    scene: Scene, state: PathState, key: jax.Array, bounce_index,
    packed: jnp.ndarray | None = None,
    sph_records: jnp.ndarray | None = None,
    first_bounce_tsd: jnp.ndarray | None = None,
    flavored: tuple | None = None,  # (u6 (6,N), u_free (N,), tsd (N,3)):
    #   full STBN draw routing (see trace's noise_ctx)
) -> PathState:
    mats = scene.materials
    if packed is None:
        packed = materials.pack_materials(scene)
    rays = Rays(state.origin, state.direction, state.time)

    row = None  # pre-fetched material records (fast path only)
    if sph_records is not None:
        # Fused Pallas fast path (spheres-only, non-differentiable):
        # selection + winner normal + winner record in one VMEM kernel.
        from raytracing_in_one_weekend_tpu.ops import pallas_sphere
        from raytracing_in_one_weekend_tpu.ops.intersect import Hit
        from raytracing_in_one_weekend_tpu.scene.scene import EntityKind

        t, t_exit, normal, rec = pallas_sphere.sphere_select_full(
            rays.origin, rays.direction,
            scene.spheres.center, scene.spheres.radius, sph_records,
            active=state.active,
        )
        hit_mask = t < intersect.BIG
        hit = Hit(
            t=t,
            hit=hit_mask,
            point=rays.at(jnp.where(hit_mask, t, 0.0)),
            normal=normal,
            uv=jnp.zeros((t.shape[0], 2)),
            material=rec[:, 11].astype(jnp.int32),
            kind=jnp.where(
                hit_mask, jnp.int32(EntityKind.SPHERE), jnp.int32(-1)
            ),
            index=jnp.zeros((t.shape[0],), jnp.int32),
            t_exit=t_exit,
        )
        row = rec[:, :12]
    else:
        hit = intersect.nearest_hit(scene, rays)

    n = state.origin.shape[0]
    if scene.flags.has_volumes:
        hit_mat_type = mats.type[hit.material]
        hit_is_volume = hit.hit & (
            hit_mat_type == MaterialType.PROBABILISTIC_VOLUME
        )
        entering = math3.dot(hit.normal, state.direction) < 0.0
        in_vol = state.inside_volume >= 0

        # --- probabilistic volume walk (SampleBatchJob.cs:212-303) ---------
        vol_mat = jnp.where(in_vol, state.inside_volume, hit.material)
        density = mats.parameter[jnp.maximum(vol_mat, 0)]
        if flavored is not None and flavored[1] is not None:
            u_free = flavored[1]
        else:
            u_free = jax.random.uniform(
                rng.purpose_key(key, rng.Purpose.VOLUME_FREE_PATH), (n,)
            )
        # the free-path draw is a sampling DECISION: detach its density
        # dependence and account for it through the score-function logp
        # below (keeping it traced here would double-count part of the
        # gradient against the score term)
        free_path = materials.volume_free_path(
            jax.lax.stop_gradient(density), u_free
        )

        # Inside a volume the whole segment [0, t_hit) is in-medium; at an
        # entry boundary it is [t_hit, t_exit) of the hit convex entity.
        seg_len = jnp.where(in_vol, hit.t, hit.t_exit - hit.t)
        vol_candidate = hit.hit & (in_vol | (hit_is_volume & entering))
        vol_scatter = vol_candidate & (free_path < seg_len)
        vol_t = jnp.where(in_vol, free_path, hit.t + free_path)

        # Pass-through / own-exit transitions (no scatter, ray continues).
        pass_through = (
            hit.hit & ~in_vol & hit_is_volume & entering & ~vol_scatter
        )
        exits_own = (
            in_vol & hit.hit & hit_is_volume & ~entering & ~vol_scatter
            & (hit.material == state.inside_volume)
        )
        skip = pass_through | exits_own
        skip_t = jnp.where(pass_through, hit.t_exit, hit.t)

        # score-function log-probability of the observed volume decisions
        # as a function of (traced) density: scatter at observed d has
        # pdf rho*exp(-rho d); surviving the observed in-medium segment L
        # has probability exp(-rho L).  Observations are detached; only
        # rho stays traced.  d/d_rho: scatter -> 1/rho - d, survive -> -L.
        survive = vol_candidate & ~vol_scatter
        d_obs = jax.lax.stop_gradient(free_path)
        l_obs = jax.lax.stop_gradient(seg_len)
        rho = jnp.maximum(density, 1e-8)
        logp_inc = jnp.where(
            vol_scatter, jnp.log(rho) - rho * d_obs, 0.0
        ) + jnp.where(survive, -rho * l_obs, 0.0)
        logp = state.logp + jnp.where(state.active, logp_inc, 0.0)
    else:
        logp = state.logp
        false_n = jnp.zeros((n,), jnp.bool_)
        vol_candidate = vol_scatter = skip = false_n
        vol_mat = hit.material
        vol_t = hit.t
        skip_t = hit.t

    # --- effective scatter record -------------------------------------------
    scatter_mask = state.active & hit.hit & ~skip
    if scene.flags.has_volumes:
        eff_t = jnp.where(vol_scatter, vol_t, hit.t)
        eff_point = state.origin + eff_t[:, None] * state.direction
        eff_normal = jnp.where(
            vol_scatter[:, None], -state.direction, hit.normal
        )
        eff_material = jnp.where(vol_scatter, vol_mat, hit.material)
        eff_uv = jnp.where(vol_scatter[:, None], jnp.zeros_like(hit.uv), hit.uv)
    else:
        eff_t = hit.t
        eff_point = hit.point
        eff_normal = hit.normal
        eff_material = hit.material
        eff_uv = hit.uv

    if flavored is not None and flavored[2] is not None:
        # full routing: every bounce's Lambert draw rides the cosine set
        tsd, tsd_on = flavored[2], True
    else:
        tsd = first_bounce_tsd
        tsd_on = (
            bounce_index == 0 if first_bounce_tsd is not None else False
        )
    sc = materials.scatter(
        scene, state.direction, eff_normal, eff_point, eff_uv, eff_material,
        key, packed=packed, row=row,
        lambert_tsd=tsd,
        lambert_tsd_on=tsd_on,
        u_override=flavored[0] if flavored is not None else None,
        vol_dir_override=(
            flavored[3]
            if flavored is not None and len(flavored) > 3 else None
        ),
    )
    # material-lottery decisions join the path's score accumulator
    # (materials.Scatter.logp: specular/metal lotteries, dielectric
    # reflect/refract) — zero along deterministic branches
    logp = logp + jnp.where(scatter_mask, sc.logp, 0.0)

    # --- sky termination (SampleBatchJob.cs:341-374) -------------------------
    miss = state.active & ~hit.hit
    sky = environment.sample_sky(scene.environment, state.direction)

    # --- emission/attenuation running fold -----------------------------------
    emission = jnp.where(
        scatter_mask[:, None], sc.emission, jnp.where(miss[:, None], sky, 0.0)
    )
    radiance = state.radiance + state.throughput * emission
    throughput = jnp.where(
        scatter_mask[:, None], state.throughput * sc.reflectance, state.throughput
    )

    # --- AOV capture (SampleBatchJob.cs:313-330,366-372) ----------------------
    is_depth0 = bounce_index == 0
    aov_normal = jnp.where(
        (scatter_mask & is_depth0 & ~state.got_nonspecular)[:, None],
        eff_normal,
        state.aov_normal,
    )
    first_nonspec = scatter_mask & ~state.got_nonspecular & ~sc.perfect_specular
    aov_normal = jnp.where(first_nonspec[:, None], eff_normal, aov_normal)
    aov_albedo = jnp.where(
        first_nonspec[:, None], sc.emission + sc.reflectance, state.aov_albedo
    )
    sky_first = miss & ~state.got_nonspecular
    aov_normal = jnp.where(sky_first[:, None], -state.direction, aov_normal)
    aov_albedo = jnp.where(sky_first[:, None], sky, aov_albedo)
    got_nonspecular = state.got_nonspecular | first_nonspec | sky_first

    # --- RandomEvents accumulation (SampleBatchJob.cs:332,363) ----------------
    step_events = (
        jnp.where(scatter_mask, sc.random_events, 0.0)
        + jnp.where(state.active & vol_candidate, 1.0, 0.0)  # ProbabilisticHit
    )
    depth_weight = jnp.exp2(-bounce_index.astype(jnp.float32))
    events = state.events + step_events * depth_weight

    # --- advance rays -----------------------------------------------------------
    offset_sign = jnp.where(
        math3.dot(sc.direction, eff_normal) >= 0.0, 1.0, -1.0
    )
    new_origin = jnp.where(
        scatter_mask[:, None],
        eff_point + SELF_INTERSECTION_OFFSET * offset_sign[:, None] * eff_normal,
        jnp.where(
            (state.active & skip)[:, None],
            state.origin
            + (skip_t + SELF_INTERSECTION_OFFSET)[:, None] * state.direction,
            state.origin,
        ),
    )
    new_direction = jnp.where(scatter_mask[:, None], sc.direction, state.direction)

    if scene.flags.has_volumes:
        new_inside = jnp.where(
            state.active,
            jnp.where(
                vol_scatter,
                vol_mat,
                jnp.where(
                    skip,
                    -1,
                    state.inside_volume,  # obstacle scatter keeps volume state
                ),
            ),
            state.inside_volume,
        )
    else:
        new_inside = state.inside_volume

    active = state.active & ~miss
    valid = state.valid | miss

    return PathState(
        origin=new_origin,
        direction=new_direction,
        time=state.time,
        throughput=jnp.where(state.active[:, None], throughput, state.throughput),
        radiance=jnp.where(state.active[:, None], radiance, state.radiance),
        active=active,
        valid=valid,
        inside_volume=new_inside,
        aov_normal=jnp.where(state.active[:, None], aov_normal, state.aov_normal),
        aov_albedo=jnp.where(state.active[:, None], aov_albedo, state.aov_albedo),
        got_nonspecular=jnp.where(
            state.active, got_nonspecular, state.got_nonspecular
        ),
        events=events,
        logp=logp,
    )
