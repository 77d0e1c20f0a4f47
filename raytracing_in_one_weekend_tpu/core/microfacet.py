"""Trowbridge-Reitz (GGX) microfacet functions, batched.

Reference: Runtime/Microfacet.cs:8-88 — D, Smith G / Lambda and the PBRT
RoughnessToAlpha polynomial.  Only SmithMaskingShadowing feeds the Standard
material's reflection lottery (Material.cs:88), but the full set is exposed
for the Torrance-Sparrow BRDF path.
"""

from __future__ import annotations

import jax.numpy as jnp

from raytracing_in_one_weekend_tpu.core import math3


def roughness_to_alpha(roughness: jnp.ndarray) -> jnp.ndarray:
    """PBRT fitted polynomial (reference: Microfacet.cs:74-83)."""
    roughness = jnp.maximum(roughness, 1e-3)
    x = jnp.log(roughness)
    return (
        1.62142
        + 0.819955 * x
        + 0.1734 * x * x
        + 0.0171201 * x * x * x
        + 0.000640711 * x * x * x * x
    )


def smith_lambda(
    w: jnp.ndarray, normal: jnp.ndarray, roughness: jnp.ndarray
) -> jnp.ndarray:
    """Smith Lambda for GGX (reference: Microfacet.cs:49-72).

    Branchless: the isinf(tanTheta) -> 0 case falls out of clamping since
    cosTheta==0 gives a huge-but-finite tan with the epsilon denominator,
    and the alpha^2 tan^2 term then dominates consistently.
    """
    cos_theta = math3.dot(w, normal)
    sq_cos = cos_theta * cos_theta
    sq_sin = jnp.maximum(0.0, 1.0 - sq_cos)
    # tan^2 computed without the intermediate sqrt(sin^2) so normal
    # incidence (sin == 0) has a finite backward pass.  Degenerate lanes
    # (grazing/zero normals, e.g. missed rays fed through the branchless
    # scatter) must see CONSTANT inputs to the division: a floored
    # denominator alone keeps the primal finite but its transpose
    # d/d_den = -num/den^2 ~ 1e48 overflows f32 to inf, and inf times the
    # masked lanes' zero cotangent is NaN — which contaminated every
    # gradient once Scatter.logp made fresnel*masking differentiable.
    degenerate = sq_cos < 1e-12
    safe_sq_cos = jnp.where(degenerate, 1.0, sq_cos)
    sq_tan = jnp.where(degenerate, 0.0, sq_sin) / safe_sq_cos
    alpha = roughness_to_alpha(roughness)
    a2t2 = alpha * alpha * sq_tan
    lam = (-1.0 + jnp.sqrt(1.0 + a2t2)) / 2.0
    return jnp.where(degenerate, 0.0, lam)


def smith_masking_shadowing(
    w: jnp.ndarray, normal: jnp.ndarray, roughness: jnp.ndarray
) -> jnp.ndarray:
    """G1 (reference: Microfacet.cs:10-13)."""
    return 1.0 / (1.0 + smith_lambda(w, normal, roughness))


def trowbridge_reitz_d(
    wh: jnp.ndarray, normal: jnp.ndarray, roughness: jnp.ndarray
) -> jnp.ndarray:
    """GGX normal distribution, isotropic (reference: Microfacet.cs:27-47;
    the reference computes identical sqAlpha for both phi terms so the
    anisotropy machinery reduces to the isotropic D)."""
    alpha = roughness_to_alpha(roughness)
    sq_alpha = alpha * alpha
    cos_theta = math3.dot(normal, wh)
    sq_cos = cos_theta * cos_theta
    sq_sin = jnp.maximum(0.0, 1.0 - sq_cos)
    safe_sq_cos = jnp.maximum(sq_cos, 1e-12)
    sq_tan = sq_sin / safe_sq_cos
    e = sq_tan / sq_alpha
    d = 1.0 / (jnp.pi * sq_alpha * safe_sq_cos * safe_sq_cos * (1.0 + e) * (1.0 + e))
    return jnp.where(sq_cos < 1e-12, 0.0, d)


def smith_g(
    wi: jnp.ndarray, wo: jnp.ndarray, normal: jnp.ndarray, roughness: jnp.ndarray
) -> jnp.ndarray:
    """Smith height-correlated-ish G (reference: Microfacet.cs:49-53)."""
    return 1.0 / (
        1.0
        + smith_lambda(wo, normal, roughness)
        + smith_lambda(wi, normal, roughness)
    )


def torrance_sparrow_brdf(
    wi: jnp.ndarray,
    wo: jnp.ndarray,
    normal: jnp.ndarray,
    roughness: jnp.ndarray,
    fresnel: jnp.ndarray,
) -> jnp.ndarray:
    """Torrance-Sparrow microfacet BRDF (reference: Microfacet.cs:15-24)."""
    wh = math3.normalize(wi + wo)
    abs_cos_o = jnp.abs(math3.dot(wo, normal))
    abs_cos_i = jnp.abs(math3.dot(wi, normal))
    denom = jnp.maximum(4.0 * abs_cos_i * abs_cos_o, 1e-12)
    return (
        trowbridge_reitz_d(wh, normal, roughness)
        * smith_g(wi, wo, normal, roughness)
        * fresnel
        / denom
    )
