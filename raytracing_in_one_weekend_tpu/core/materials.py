"""Material scatter, batched + branchless.

Reference: Runtime/Material.cs:16-218 — three material types:
  * Standard (Material.cs:75-119): unified Lambert/metal/glossy.
    roughness = (1 - gloss)^2; rough normal = normalize(lerp(n, cosine-
    hemisphere sample, roughness)); reflectionChance = saturate(schlick
    (cosTheta, lerp(1.5, 1.1, metallic)) * gloss * smithG1); reflection
    lottery -> untinted specular reflect about the rough normal; else
    metallic lottery -> tinted rough-metal reflect; else cosine-weighted
    Lambert about the geometric normal.
  * Dielectric (Material.cs:121-161): rough normal = normalize(n +
    roughness * unit-sphere sample); Snell refract or Schlick-lottery
    reflect; reflect leaves reflectance = 1 (untinted).
  * ProbabilisticVolume (Material.cs:49-65, 163-168): isotropic scatter;
    Beer-Lambert free-path handled by the integrator's volume walk.

TPU shape: every ray evaluates all three branches on the VPU and the result
is mask-blended by material type; the discrete lotteries consume independent
uniforms.  Each helper also returns the reference's `RandomEvents` cost
signal (Material.cs:112-117,156-159,167) which drives adaptive sampling.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from raytracing_in_one_weekend_tpu.core import math3, microfacet, rng, sampling, textures
from raytracing_in_one_weekend_tpu.scene.scene import (
    MaterialType,
    METAL_IOR,
    PLASTIC_IOR,
    Scene,
)


class Scatter(NamedTuple):
    direction: jnp.ndarray  # (N, 3) scattered direction
    reflectance: jnp.ndarray  # (N, 3) path attenuation for this bounce
    emission: jnp.ndarray  # (N, 3)
    random_events: jnp.ndarray  # (N,) adaptive-sampling cost signal
    perfect_specular: jnp.ndarray  # (N,) bool — gates AOV capture
    logp: jnp.ndarray  # (N,) log-probability of the DISCRETE lottery
    # decisions taken this bounce (specular/metal lotteries, dielectric
    # reflect/refract) as a traced function of the material parameters.
    # Detached autodiff misses the probability shift (measured full-frame
    # d/d_ior 20x undersized); the integrator accumulates this into
    # PathState.logp and render_batch attaches the score-function
    # surrogate (see integrator.TraceResult.logp).  Zero along 0/1
    # (deterministic) branches, so lambert-only scenes are unaffected.


PACKED_COLS = 12


def pack_materials(scene: Scene) -> jnp.ndarray:
    """Resolve the material tables into one (M, 12) float record:

      0: type | 1:4 albedo | 4:7 emission | 7 gloss | 8 metallic |
      9: parameter (IOR/density) | 10: perfect_specular | 11: pad

    Constant textures are resolved here at M-size (loop-invariant — XLA
    hoists it out of the bounce scan), so the per-ray hot path needs ONE
    (N, 12) gather instead of ~30 table gathers.  Procedural textures
    (checker/perlin/image) are still evaluated per-ray when the scene flag
    says they exist.  Built in-jit from traced tables so texture/material
    parameters remain differentiable/optimizable.
    """
    tex = scene.textures
    mats = scene.materials

    def color_of(tex_id):
        t = tex.type[tex_id]
        c = jnp.where(
            (t == textures.TextureType.CONSTANT)[:, None],
            tex.main_color[tex_id],
            0.0,
        )
        return jnp.where(
            (t == textures.TextureType.CONSTANT_SCALAR)[:, None],
            tex.parameter[tex_id][:, None],
            c,
        )

    def scalar_of(tex_id):
        t = tex.type[tex_id]
        main = tex.main_color[tex_id]
        ch = tex.scalar_channel[tex_id]
        s = jnp.take_along_axis(main, ch[:, None], axis=-1)[:, 0]
        s = jnp.where(t == textures.TextureType.CONSTANT, s, 0.0)
        return jnp.where(
            t == textures.TextureType.CONSTANT_SCALAR, tex.parameter[tex_id], s
        )

    m = mats.type.shape[0]
    return jnp.concatenate(
        [
            mats.type[:, None].astype(jnp.float32),
            color_of(mats.albedo_tex),
            color_of(mats.emission_tex),
            scalar_of(mats.glossiness_tex)[:, None],
            scalar_of(mats.metallic_tex)[:, None],
            mats.parameter[:, None],
            mats.perfect_specular[:, None].astype(jnp.float32),
            jnp.zeros((m, 1), jnp.float32),
        ],
        axis=1,
    )


def scatter(
    scene: Scene,
    ray_direction: jnp.ndarray,  # (N, 3)
    normal: jnp.ndarray,  # (N, 3) geometric normal at hit
    point: jnp.ndarray,  # (N, 3) hit point
    uv: jnp.ndarray,  # (N, 2)
    material: jnp.ndarray,  # (N,) int32
    key: jax.Array,
    packed: jnp.ndarray | None = None,  # (M, 12) from pack_materials
    row: jnp.ndarray | None = None,  # (N, >=11) pre-fetched records
    lambert_tsd: jnp.ndarray | None = None,  # (N, 3) pre-drawn
    #   tangent-space (y-up) cosine-hemisphere directions — the STBN
    #   unitvec3_cosine set (RandomSource.cs:63-89 SpatioTemporalBlue
    #   arm); replaces the Lambert diffuse draw when lambert_tsd_on
    lambert_tsd_on: jnp.ndarray | bool = False,  # traced bool: use the
    #   pre-drawn set this bounce (the renderer gates it to bounce 0,
    #   or every bounce under full STBN routing)
    u_override: jnp.ndarray | None = None,  # (6, N) pre-drawn scalar
    #   uniforms replacing the threefry draws — the STBN scalar set
    #   (randomsource.pixel_scalar) so EVERY lottery/inversion draw
    #   carries the flavored sampler (RandomSource.cs:27-33)
    vol_dir_override: jnp.ndarray | None = None,  # (N, 3) pre-drawn
    #   ~unit-sphere directions replacing the isotropic volume scatter
    #   draw — the STBN unitvec3 set (randomsource.pixel_unitvec3, the
    #   reference's NextFloat3Direction arm, RandomSource.cs:113-128)
) -> Scatter:
    """Scatter all rays at once (reference dispatch: Material.cs:68-174)."""
    mats = scene.materials
    tex = scene.textures
    if row is None:
        if packed is None:
            packed = pack_materials(scene)
        row = packed[material]  # (N, 12): the one hot-path gather
    mtype = row[:, 0].astype(jnp.int32)
    albedo = row[:, 1:4]
    emission = row[:, 4:7]
    glossiness = row[:, 7]
    metallic = row[:, 8]
    parameter = row[:, 9]
    perfect_specular = row[:, 10] > 0.5

    if scene.flags.has_procedural_textures:
        # Full texture path (checker / perlin / image) overrides constants.
        albedo = textures.sample_color(
            tex, mats.albedo_tex[material], uv, point, normal
        )
        emission = textures.sample_color(
            tex, mats.emission_tex[material], uv, point, normal
        )
        glossiness = textures.sample_scalar(
            tex, mats.glossiness_tex[material], uv, point, normal
        )
        metallic = textures.sample_scalar(
            tex, mats.metallic_tex[material], uv, point, normal
        )

    n = ray_direction.shape[0]
    if u_override is not None:
        u = u_override
    else:
        u = jax.random.uniform(
            rng.purpose_key(key, rng.Purpose.SCATTER_A), (6, n)
        )
    ua, ub, uc, ud, u_choice, u_choice2 = u

    # ---- Standard (Material.cs:75-119) -----------------------------------
    roughness = jnp.square(1.0 - glossiness)
    cos_sample = sampling.cosine_hemisphere(ua, ub, normal)
    rough_normal = jnp.where(
        (roughness > 0.0)[:, None],
        math3.normalize(math3.lerp(normal, cos_sample, roughness[:, None])),
        normal,
    )
    incident_cos = -math3.dot(ray_direction, rough_normal)
    std_ior = math3.lerp(PLASTIC_IOR, METAL_IOR, metallic)
    fresnel = sampling.schlick(incident_cos, std_ior)
    masking = microfacet.smith_masking_shadowing(ray_direction, normal, roughness)
    reflection_chance = math3.saturate(fresnel * glossiness * masking)

    specular_dir = math3.reflect(ray_direction, rough_normal)
    lambert_dir = sampling.cosine_hemisphere(uc, ud, normal)
    if lambert_tsd is not None:
        # reference normalizes after the tangent->world map
        # (Tools.cs:30-46); the baked set's byte quantization leaves
        # norms at 1 +- 0.02
        stbn_dir = math3.normalize(math3.tangent_to_world(lambert_tsd, normal))
        lambert_dir = jnp.where(
            jnp.broadcast_to(lambert_tsd_on, lambert_dir.shape[:1])[:, None],
            stbn_dir,
            lambert_dir,
        )

    take_specular = (reflection_chance > 0.0) & (u_choice < reflection_chance)
    take_metal = (metallic > 0.0) & (u_choice2 < metallic)

    std_dir = jnp.where(
        take_specular[:, None],
        specular_dir,
        jnp.where(take_metal[:, None], specular_dir, lambert_dir),
    )
    std_reflectance = jnp.where(
        take_specular[:, None], jnp.ones_like(albedo), albedo
    )
    # Lottery log-probability: specular w.p. reflection_chance; else the
    # metal lottery (u_choice2 < metallic).  The untaken second lottery is
    # omitted when specular wins (its term is zero-mean noise).
    p_spec = math3.saturate(reflection_chance)
    std_logp = jnp.where(
        take_specular,
        jnp.log(jnp.maximum(p_spec, 1e-12)),
        jnp.log(jnp.maximum(1.0 - p_spec, 1e-12))
        + jnp.where(
            take_metal,
            jnp.log(jnp.maximum(metallic, 1e-12)),
            jnp.log(jnp.maximum(1.0 - metallic, 1e-12)),
        ),
    )
    # RandomEvents bookkeeping (Material.cs:111-118).
    std_events = (
        jnp.where((reflection_chance > 0.0) & (reflection_chance < 1.0), 1.0, 0.0)
        + jnp.where((metallic > 0.0) & (metallic < 1.0), 1.0, 0.0)
        + roughness * (reflection_chance + (1.0 - reflection_chance) * metallic)
        + (1.0 - reflection_chance) * (1.0 - metallic)
    )

    # ---- Dielectric (Material.cs:121-161) ---------------------------------
    # (compiled out entirely when the scene has none — SceneFlags)
    if scene.flags.has_dielectrics:
        d_roughness = 1.0 - glossiness
        sphere_sample = sampling.unit_sphere(ua, ub)
        d_rough_normal = math3.normalize(
            normal + d_roughness[:, None] * sphere_sample
        )
        d_dot = math3.dot(ray_direction, d_rough_normal)
        exiting = d_dot > 0.0
        outward_normal = jnp.where(
            exiting[:, None], -d_rough_normal, d_rough_normal
        )
        # non-dielectric lanes carry parameter values (density, 0) whose
        # 1/ior is inf — harmless while refl_prob only fed the boolean
        # lottery, but diel_logp now CONSUMES refl_prob differentiably
        # and reverse-mode turns 0-cotangent x inf-partial into NaN that
        # contaminates the whole parameter gradient.  Guard the lanes.
        ior = jnp.where(
            mtype == MaterialType.DIELECTRIC,
            jnp.maximum(parameter, 1e-3), 1.5,
        )
        ni_over_nt = jnp.where(exiting, ior, 1.0 / ior)
        cosine = jnp.where(exiting, ior * d_dot, -d_dot)
        refracted, can_refract = sampling.refract(
            ray_direction, outward_normal, ni_over_nt
        )
        refl_prob = sampling.schlick(cosine, ior)
        do_refract = can_refract & (u_choice > refl_prob)
        diel_dir = jnp.where(
            do_refract[:, None],
            refracted,
            math3.reflect(ray_direction, d_rough_normal),
        )
        diel_reflectance = jnp.where(
            do_refract[:, None], albedo, jnp.ones_like(albedo)
        )
        diel_events = 1.0 + d_roughness
        # reflect/refract lottery (TIR forces reflect deterministically:
        # no probability term; the TIR threshold itself is a measure-zero
        # discrete boundary)
        diel_logp = jnp.where(
            can_refract,
            jnp.where(
                do_refract,
                jnp.log(jnp.maximum(1.0 - refl_prob, 1e-12)),
                jnp.log(jnp.maximum(refl_prob, 1e-12)),
            ),
            0.0,
        )

    # ---- ProbabilisticVolume isotropic scatter (Material.cs:163-168) ------
    if scene.flags.has_volumes:
        if vol_dir_override is not None:
            # the baked STBN unitvec3 set (RandomSource.cs:113-128);
            # byte quantization leaves |v| at 1 +- 0.02 — normalize
            vol_dir = math3.normalize_safe(vol_dir_override)
        else:
            vol_dir = sampling.unit_sphere(uc, ud)
        vol_events = jnp.full((n,), 2.0)

    # ---- blend by type -----------------------------------------------------
    direction = std_dir
    reflectance = std_reflectance
    events = std_events
    logp = std_logp
    if scene.flags.has_dielectrics:
        is_diel = (mtype == MaterialType.DIELECTRIC)[:, None]
        direction = jnp.where(is_diel, diel_dir, direction)
        reflectance = jnp.where(is_diel, diel_reflectance, reflectance)
        events = jnp.where(
            mtype == MaterialType.DIELECTRIC, diel_events, events
        )
        logp = jnp.where(mtype == MaterialType.DIELECTRIC, diel_logp, logp)
    if scene.flags.has_volumes:
        is_vol = (mtype == MaterialType.PROBABILISTIC_VOLUME)[:, None]
        direction = jnp.where(is_vol, vol_dir, direction)
        reflectance = jnp.where(is_vol, albedo, reflectance)
        events = jnp.where(
            mtype == MaterialType.PROBABILISTIC_VOLUME, vol_events, events
        )
        logp = jnp.where(
            mtype == MaterialType.PROBABILISTIC_VOLUME, 0.0, logp
        )  # isotropic scatter has no parameter-dependent decision

    return Scatter(
        direction=direction,
        reflectance=reflectance,
        emission=emission,
        random_events=events,
        perfect_specular=perfect_specular,
        logp=logp,
    )


def volume_free_path(density: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Beer-Lambert free-path sample d = -1/max(density, eps) * ln(u)
    (reference: Material.cs:49-65 ProbabilisticHit)."""
    return -1.0 / jnp.maximum(density, 1e-8) * jnp.log(jnp.maximum(u, 1e-12))
