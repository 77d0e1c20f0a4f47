"""Monte-Carlo sampling primitives, batched over ray lanes.

Each function mirrors one reference RandomSource method
(Runtime/RandomSource.cs) but takes uniform U[0,1) inputs explicitly so the
same math serves white noise, blue noise and low-discrepancy sequences, and
stays reparameterization-differentiable w.r.t. nothing (the uniforms are
detached by construction in the adjoint).
"""

from __future__ import annotations

import jax.numpy as jnp

from raytracing_in_one_weekend_tpu.core import math3

TWO_PI = 2.0 * jnp.pi


def in_unit_disk(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Uniform point in the unit disk via polar inversion
    (reference: RandomSource.cs:40-61 InUnitDisk). Returns (..., 2)."""
    theta = u * TWO_PI
    radius = jnp.sqrt(v)
    return radius[..., None] * jnp.stack(
        [jnp.cos(theta), jnp.sin(theta)], axis=-1
    )


def cosine_hemisphere(
    u: jnp.ndarray, v: jnp.ndarray, normal: jnp.ndarray
) -> jnp.ndarray:
    """Cosine-weighted hemisphere direction about `normal` by the inversion
    method (reference: RandomSource.cs:63-89 OnCosineWeightedHemisphere):
    tangent-space (r cos t, sqrt(1-u), r sin t) with r = sqrt(u)."""
    radius = jnp.sqrt(u)
    theta = v * TWO_PI
    x = radius * jnp.cos(theta)
    z = radius * jnp.sin(theta)
    y = jnp.sqrt(jnp.maximum(1.0 - u, 0.0))
    tangent_dir = jnp.stack([x, y, z], axis=-1)
    return math3.tangent_to_world(tangent_dir, normal)


def uniform_hemisphere(
    u: jnp.ndarray, v: jnp.ndarray, normal: jnp.ndarray
) -> jnp.ndarray:
    """Uniform hemisphere direction (reference: RandomSource.cs:91-111):
    tangent-space (r cos t, 1-u, r sin t) with r = sqrt(2u - u^2)."""
    radius = jnp.sqrt(jnp.maximum(2.0 * u - u * u, 0.0))
    theta = v * TWO_PI
    x = radius * jnp.cos(theta)
    z = radius * jnp.sin(theta)
    y = 1.0 - u
    tangent_dir = jnp.stack([x, y, z], axis=-1)
    return math3.tangent_to_world(tangent_dir, normal)


def unit_sphere(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Uniform direction on the unit sphere
    (reference: RandomSource.cs:113-128 NextFloat3Direction)."""
    z = u * 2.0 - 1.0
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    angle = v * TWO_PI
    return jnp.stack([jnp.cos(angle) * r, jnp.sin(angle) * r, z], axis=-1)


def schlick(cosine: jnp.ndarray, refractive_index) -> jnp.ndarray:
    """Schlick fresnel approximation (reference: Material.cs:212-217)."""
    r0 = (1.0 - refractive_index) / (1.0 + refractive_index)
    r0 = r0 * r0
    m = jnp.maximum(1.0 - cosine, 0.0)
    return r0 + (1.0 - r0) * m * m * m * m * m


def refract(
    v: jnp.ndarray, n: jnp.ndarray, ni_over_nt: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Snell refraction (reference: Material.cs:198-210 Refract).

    Returns (refracted_dir, can_refract_mask); where total internal
    reflection occurs the direction is garbage-but-finite and must be
    masked by the caller (the discriminant is clamped so gradients stay
    finite at the TIR boundary).
    """
    dt = math3.dot(v, n)
    discriminant = 1.0 - ni_over_nt * ni_over_nt * (1.0 - dt * dt)
    can_refract = discriminant > 0.0
    # Adjoint-safe: masked lanes must not see sqrt(0) (inf backward).
    sqrt_disc = jnp.sqrt(jnp.where(can_refract, discriminant, 1.0))
    sqrt_disc = jnp.where(can_refract, sqrt_disc, 0.0)
    refracted = (
        ni_over_nt[..., None] * (v - n * dt[..., None])
        - n * sqrt_disc[..., None]
    )
    return refracted, can_refract
