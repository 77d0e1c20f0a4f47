"""Film: accumulation resolve + LDR finalize.

Reference:
  * CombineJob (Jobs/CombineJob.cs:11-75): divide accumulated color/normal/
    albedo by the per-pixel valid sample count, scrub NaNs, debug magenta
    (no samples) / cyan (NaN), interlace gap-fill from rows below, optional
    LDR albedo clamp.
  * FinalizeTexturesJob (Jobs/FinalizeTexturesJob.cs:11-58): float3 -> RGBA
    bytes with linear->gamma; normals remapped *0.5+0.5; optional ACES.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from raytracing_in_one_weekend_tpu.core import math3

NO_SAMPLES_COLOR = jnp.asarray([1.0, 0.0, 1.0])  # magenta (CombineJob.cs:14)
NAN_COLOR = jnp.asarray([0.0, 1.0, 1.0])  # cyan (CombineJob.cs:15)


class Accumulators(NamedTuple):
    """Progressive per-pixel accumulation state — the reference's pooled
    float4/float3/float buffers (Raytracer.cs:124-132) as one donated pytree.
    color carries (sum rgb); sample_count is the reference's float4.w."""

    color: jnp.ndarray  # (P, 3) radiance sum over valid samples
    sample_count: jnp.ndarray  # (P,) valid samples so far
    normal: jnp.ndarray  # (P, 3) AOV sums
    albedo: jnp.ndarray  # (P, 3)
    weight: jnp.ndarray  # (P,) RandomEvents noise weight (adaptive sampling)
    fallback_normal: jnp.ndarray  # (P, 3) first-sample AOV (CombineJob fallback)
    fallback_albedo: jnp.ndarray  # (P, 3)


def zero_accumulators(pixel_count: int) -> Accumulators:
    return Accumulators(
        color=jnp.zeros((pixel_count, 3)),
        sample_count=jnp.zeros((pixel_count,)),
        normal=jnp.zeros((pixel_count, 3)),
        albedo=jnp.zeros((pixel_count, 3)),
        weight=jnp.zeros((pixel_count,)),
        fallback_normal=jnp.zeros((pixel_count, 3)),
        fallback_albedo=jnp.zeros((pixel_count, 3)),
    )


class CombinedImage(NamedTuple):
    color: jnp.ndarray  # (P, 3) linear HDR
    normal: jnp.ndarray  # (P, 3) unit or zero
    albedo: jnp.ndarray  # (P, 3)


def combine(
    acc: Accumulators,
    width: int,
    height: int,
    debug_mode: bool = False,
    ldr_albedo: bool = False,
    interlacing: int = 1,
) -> CombinedImage:
    """Accumulation -> image resolve (reference: CombineJob.cs:29-74)."""
    count = acc.sample_count
    color_sum = acc.color

    if interlacing > 1:
        # Interlace gap-fill: propagate the nearest filled row from below
        # (reference scans rows at -Size.x steps, CombineJob.cs:44-50).
        c2 = count.reshape(height, width)
        s2 = color_sum.reshape(height, width, 3)
        filled_c, filled_s = c2, s2
        for _ in range(interlacing - 1):
            shifted_c = jnp.concatenate([filled_c[:1] * 0, filled_c[:-1]], axis=0)
            shifted_s = jnp.concatenate([filled_s[:1] * 0, filled_s[:-1]], axis=0)
            use = filled_c == 0
            filled_c = jnp.where(use, shifted_c, filled_c)
            filled_s = jnp.where(use[..., None], shifted_s, filled_s)
        count = filled_c.reshape(-1)
        color_sum = filled_s.reshape(-1, 3)

    has_nan = jnp.any(jnp.isnan(color_sum), axis=-1) | jnp.isnan(count)
    safe_count = jnp.maximum(count, 1.0)
    mean = jnp.nan_to_num(color_sum) / safe_count[:, None]

    if debug_mode:
        color = jnp.where(
            (count == 0)[:, None],
            NO_SAMPLES_COLOR,
            jnp.where(has_nan[:, None], NAN_COLOR, mean),
        )
    else:
        color = jnp.where(((count == 0) | has_nan)[:, None], 0.0, mean)

    own_count = jnp.maximum(acc.sample_count, 1.0)
    normal = math3.normalize_safe(
        jnp.where(
            (acc.sample_count == 0)[:, None],
            acc.fallback_normal,
            acc.normal / own_count[:, None],
        )
    )
    albedo = jnp.where(
        (acc.sample_count == 0)[:, None],
        acc.fallback_albedo,
        acc.albedo / own_count[:, None],
    )
    if ldr_albedo:
        albedo = jnp.minimum(albedo, 1.0)

    return CombinedImage(color=color, normal=normal, albedo=albedo)


def finalize(
    image: CombinedImage, width: int, height: int, tonemap: str = "gamma"
) -> dict[str, jnp.ndarray]:
    """LDR finalize (reference: FinalizeTexturesJob.cs:24-57).

    Returns uint8 (H, W, 3) images for color/normal/albedo. tonemap:
    'gamma' (the live reference path) or 'aces' (Tools.ACESFitted,
    the commented-out path at FinalizeTexturesJob.cs:29).
    """
    color = image.color
    if tonemap == "aces":
        color = math3.aces_fitted(color)
    color_ldr = math3.saturate(math3.linear_to_gamma(color)) * 255.0
    normal_ldr = (
        math3.saturate(math3.linear_to_gamma(image.normal * 0.5 + 0.5)) * 255.0
    )
    albedo_ldr = math3.saturate(math3.linear_to_gamma(image.albedo)) * 255.0

    def to_img(flat):
        # Flat buffers are v-major bottom-up (pixel row r maps to viewport
        # v=(r+0.5)/H, camera.pixel_coords); image row 0 is the TOP, so
        # flip rows here (the reference's blit shader handles orientation).
        return flat.reshape(height, width, 3)[::-1].astype(jnp.uint8)

    return {
        "color": to_img(color_ldr),
        "normal": to_img(normal_ldr),
        "albedo": to_img(albedo_ldr),
    }
