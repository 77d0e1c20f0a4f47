"""Procedural texture table, sampled struct-of-arrays style.

Reference: Runtime/Texture.cs:13-139 — TextureType {None, Constant,
CheckerPattern, PerlinNoise, Image, ConstantScalar} with SampleColor /
SampleScalar.  The reference's checker & Perlin branches are commented out
(dead code, Texture.cs:61-78,106-123); this build implements them *live*
(same iq normal-projection checker and turbulence-modulated Perlin the dead
code describes), because the TPU build has no Unity scene pipeline to
replace them.  Image textures are supported through a fixed-size RGBA atlas
(all image textures packed into one (A, H, W, 3) stack) so lookups stay a
single gather.

A texture table is a pytree of parallel arrays; `tex_id` indexes rows.
Sampling all rays' textures at once is a gather + masked blend over type.
"""

from __future__ import annotations

import enum
from typing import NamedTuple

import jax.numpy as jnp

from raytracing_in_one_weekend_tpu.core import noise as noise_mod


class TextureType(enum.IntEnum):
    NONE = 0
    CONSTANT = 1
    CHECKER = 2
    PERLIN = 3
    IMAGE = 4
    CONSTANT_SCALAR = 5


class TextureTable(NamedTuple):
    type: jnp.ndarray  # (K,) int32
    main_color: jnp.ndarray  # (K, 3)
    secondary_color: jnp.ndarray  # (K, 3)
    parameter: jnp.ndarray  # (K,) noise frequency / constant scalar
    scalar_channel: jnp.ndarray  # (K,) int32 channel for SampleScalar
    image_index: jnp.ndarray  # (K,) int32 row into the atlas (-1 = none)
    atlas: jnp.ndarray | None  # (A, H, W, 3) float, or None
    perlin: noise_mod.PerlinTables | None


def _checker_uv(normal: jnp.ndarray) -> jnp.ndarray:
    """Normal-projected UV for the checker (reference dead code at
    Texture.cs:63-72, from iq https://www.shadertoy.com/view/ltl3D8):
    pick the dominant-normal axis, project the other two."""
    n = jnp.abs(normal)
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    use_x = (nx > ny) & (nx > nz)
    use_y = (ny > nx) & (ny > nz)
    v = jnp.where(
        use_x[..., None],
        normal,
        jnp.where(
            use_y[..., None],
            jnp.stack([normal[..., 1], normal[..., 2], normal[..., 0]], axis=-1),
            jnp.stack([normal[..., 2], normal[..., 0], normal[..., 1]], axis=-1),
        ),
    )
    safe_x = jnp.where(v[..., 0] == 0.0, 1.0, v[..., 0])
    q = v[..., 1:] / safe_x[..., None]
    return 0.5 + 0.5 * q


def _sample_all(
    table: TextureTable,
    tex_id: jnp.ndarray,  # (N,) int32
    uv: jnp.ndarray,  # (N, 2)
    position: jnp.ndarray,  # (N, 3)
    normal: jnp.ndarray,  # (N, 3)
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Gather per-ray texture rows and evaluate every live branch once.

    Returns (type, color (N,3), scalar (N,), image_rgb (N,3))."""
    t = table.type[tex_id]
    main = table.main_color[tex_id]
    secondary = table.secondary_color[tex_id]
    param = table.parameter[tex_id]

    color = jnp.zeros_like(main)
    color = jnp.where((t == TextureType.CONSTANT)[..., None], main, color)
    color = jnp.where(
        (t == TextureType.CONSTANT_SCALAR)[..., None], param[..., None], color
    )

    if table.perlin is not None:
        # 0.5 * (1 + sin(freq * z + 10 * turbulence(p))) * main
        # (reference dead branch Texture.cs:74-78)
        turb = noise_mod.turbulence(table.perlin, position)
        marble = 0.5 * (1.0 + jnp.sin(param * position[..., 2] + 10.0 * turb))
        color = jnp.where(
            (t == TextureType.PERLIN)[..., None], marble[..., None] * main, color
        )

    cuv = _checker_uv(normal)
    sines = jnp.sin(jnp.pi * param[..., None] * cuv)
    checker = jnp.where(
        (sines[..., 0] * sines[..., 1] < 0.0)[..., None], main, secondary
    )
    color = jnp.where((t == TextureType.CHECKER)[..., None], checker, color)

    if table.atlas is not None:
        a, h, w = table.atlas.shape[0], table.atlas.shape[1], table.atlas.shape[2]
        img_idx = jnp.clip(table.image_index[tex_id], 0, a - 1)
        # Nearest-neighbor, like the reference (Texture.cs:82-90).
        cx = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
        cy = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
        texel = table.atlas[img_idx, cy, cx]
        color = jnp.where((t == TextureType.IMAGE)[..., None], texel * main, color)

    ch = table.scalar_channel[tex_id]
    scalar = jnp.take_along_axis(main, ch[..., None], axis=-1)[..., 0]
    scalar = jnp.where(t == TextureType.CONSTANT, scalar, 0.0)
    scalar = jnp.where(t == TextureType.CONSTANT_SCALAR, param, scalar)
    if table.atlas is not None:
        img_scalar = jnp.take_along_axis(texel, ch[..., None], axis=-1)[..., 0]
        main_ch = jnp.take_along_axis(main, ch[..., None], axis=-1)[..., 0]
        scalar = jnp.where(t == TextureType.IMAGE, img_scalar * main_ch, scalar)
    scalar = jnp.where(t == TextureType.CHECKER, checker[..., 0], scalar)

    return t, color, scalar


def sample_color(table, tex_id, uv, position, normal):
    """SampleColor (reference: Texture.cs:51-93); NONE -> 0."""
    _, color, _ = _sample_all(table, tex_id, uv, position, normal)
    return color


def sample_scalar(table, tex_id, uv, position, normal):
    """SampleScalar (reference: Texture.cs:96-138); NONE -> 0."""
    _, _, scalar = _sample_all(table, tex_id, uv, position, normal)
    return scalar
