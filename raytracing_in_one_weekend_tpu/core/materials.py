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


def scatter(
    scene: Scene,
    ray_direction: jnp.ndarray,  # (N, 3)
    normal: jnp.ndarray,  # (N, 3) geometric normal at hit
    point: jnp.ndarray,  # (N, 3) hit point
    uv: jnp.ndarray,  # (N, 2)
    material: jnp.ndarray,  # (N,) int32
    key: jax.Array,
) -> Scatter:
    """Scatter all rays at once (reference dispatch: Material.cs:68-174)."""
    mats = scene.materials
    tex = scene.textures
    mtype = mats.type[material]

    albedo = textures.sample_color(tex, mats.albedo_tex[material], uv, point, normal)
    emission = textures.sample_color(
        tex, mats.emission_tex[material], uv, point, normal
    )
    glossiness = textures.sample_scalar(
        tex, mats.glossiness_tex[material], uv, point, normal
    )
    metallic = textures.sample_scalar(
        tex, mats.metallic_tex[material], uv, point, normal
    )
    parameter = mats.parameter[material]  # IOR or density

    n = ray_direction.shape[0]
    ua, ub = jax.random.uniform(rng.purpose_key(key, rng.Purpose.SCATTER_A), (2, n))
    uc, ud = jax.random.uniform(rng.purpose_key(key, rng.Purpose.SCATTER_B), (2, n))
    u_choice = jax.random.uniform(
        rng.purpose_key(key, rng.Purpose.SCATTER_CHOICE), (n,)
    )
    u_choice2 = jax.random.uniform(
        rng.purpose_key(key, rng.Purpose.DIELECTRIC_CHOICE), (n,)
    )

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
    # RandomEvents bookkeeping (Material.cs:111-118).
    std_events = (
        jnp.where((reflection_chance > 0.0) & (reflection_chance < 1.0), 1.0, 0.0)
        + jnp.where((metallic > 0.0) & (metallic < 1.0), 1.0, 0.0)
        + roughness * (reflection_chance + (1.0 - reflection_chance) * metallic)
        + (1.0 - reflection_chance) * (1.0 - metallic)
    )

    # ---- Dielectric (Material.cs:121-161) ---------------------------------
    d_roughness = 1.0 - glossiness
    sphere_sample = sampling.unit_sphere(ua, ub)
    d_rough_normal = math3.normalize(normal + d_roughness[:, None] * sphere_sample)
    d_dot = math3.dot(ray_direction, d_rough_normal)
    exiting = d_dot > 0.0
    outward_normal = jnp.where(exiting[:, None], -d_rough_normal, d_rough_normal)
    ior = parameter
    ni_over_nt = jnp.where(exiting, ior, 1.0 / ior)
    cosine = jnp.where(exiting, ior * d_dot, -d_dot)
    refracted, can_refract = sampling.refract(
        ray_direction, outward_normal, ni_over_nt
    )
    refl_prob = sampling.schlick(cosine, ior)
    do_refract = can_refract & (u_choice > refl_prob)
    diel_dir = jnp.where(
        do_refract[:, None], refracted, math3.reflect(ray_direction, d_rough_normal)
    )
    diel_reflectance = jnp.where(
        do_refract[:, None], albedo, jnp.ones_like(albedo)
    )
    diel_events = 1.0 + d_roughness

    # ---- ProbabilisticVolume isotropic scatter (Material.cs:163-168) ------
    vol_dir = sampling.unit_sphere(uc, ud)
    vol_events = jnp.full((n,), 2.0)

    # ---- blend by type -----------------------------------------------------
    is_std = (mtype == MaterialType.STANDARD)[:, None]
    is_diel = (mtype == MaterialType.DIELECTRIC)[:, None]
    direction = jnp.where(is_std, std_dir, jnp.where(is_diel, diel_dir, vol_dir))
    reflectance = jnp.where(
        is_std, std_reflectance, jnp.where(is_diel, diel_reflectance, albedo)
    )
    events = jnp.where(
        mtype == MaterialType.STANDARD,
        std_events,
        jnp.where(mtype == MaterialType.DIELECTRIC, diel_events, vol_events),
    )
    perfect_specular = mats.perfect_specular[material]

    return Scatter(
        direction=direction,
        reflectance=reflectance,
        emission=emission,
        random_events=events,
        perfect_specular=perfect_specular,
    )


def volume_free_path(density: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Beer-Lambert free-path sample d = -1/max(density, eps) * ln(u)
    (reference: Material.cs:49-65 ProbabilisticHit)."""
    return -1.0 / jnp.maximum(density, 1e-8) * jnp.log(jnp.maximum(u, 1e-12))
