"""RandomSource facade: pluggable sampler flavors for camera-space draws.

Reference: Runtime/RandomSource.cs:15-151 — a per-pixel RNG switched by
NoiseColor {White, Blue, SpatioTemporalBlue} (RandomSource.cs:8-13), with
per-pixel progressive offsets into baked noise tiles (PerPixelNoise.cs:
24-44 R2 offsets; texture cycling per frame BlueNoiseData.cs:42-58,
SpatioTemporalBlueNoiseData.cs).

TPU-native redesign: white noise stays threefry (core/rng.py).  Blue /
spatio-temporal-blue supply the PIXEL-CORRELATED draws (sub-pixel jitter +
lens disk — where low-discrepancy visibly reduces noise) from synthesized
tileable blue-noise textures (core/noise.make_blue_noise_tile — no baked
assets), Cranley-Patterson-rotated per draw by the R2 sequence; the
in-flight bounce draws remain white, a deliberate deviation (documented)
that keeps the bounce loop fusion-friendly.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from raytracing_in_one_weekend_tpu.core import noise
from raytracing_in_one_weekend_tpu.utils.config import NoiseColor

TILE = 64  # reference blue-noise textures are 64x64 (BlueNoise.cs:6-41)


class NoiseState(NamedTuple):
    """Sampler tables; tiles is (T, TILE, TILE, 4) — T=1 for plain blue,
    T>1 temporal slices for the spatio-temporal flavor."""

    tiles: jnp.ndarray


def make_noise_state(
    color: NoiseColor, seed: int = 7, temporal: int = 8
) -> Optional[NoiseState]:
    """Build sampler tables for the given flavor (None for white noise)."""
    if color == NoiseColor.WHITE:
        return None
    t = 1 if color == NoiseColor.BLUE else temporal
    tiles = jnp.stack(
        [noise.make_blue_noise_tile(TILE, 4, seed + i) for i in range(t)]
    )
    return NoiseState(tiles=tiles)


def pixel_uniforms(
    state: NoiseState,
    draw_index: jnp.ndarray,  # () or (width*height,) progressive draw ctr
    width: int,
    height: int,
) -> jnp.ndarray:
    """(width*height, 4) pixel-correlated uniforms for one draw.

    Per-draw decorrelation follows the reference's PerPixelNoise: the R2
    sequence offsets the pixel's tile coordinates each draw
    (PerPixelNoise.cs:24-44), plus a Cranley-Patterson rotation (fractional
    add) so values differ even when offsets collide; temporal tiles cycle
    per draw like the reference's per-frame texture cycling.

    A (N,) per-pixel draw_index (the fused kernel's progressive per-lane
    counter under adaptive sampling) vectorizes every per-draw quantity."""
    t = state.tiles.shape[0]
    draw_index = jnp.asarray(draw_index)
    tile_idx = jnp.mod(draw_index.astype(jnp.int32), t)
    offs = noise.per_pixel_noise_offset(
        draw_index.astype(jnp.float32), TILE
    )  # (2,) or (N, 2) int32

    ys, xs = jnp.divmod(jnp.arange(width * height, dtype=jnp.int32), width)
    tx = jnp.mod(xs + offs[..., 0], TILE)
    ty = jnp.mod(ys + offs[..., 1], TILE)
    vals = state.tiles[tile_idx, ty, tx]  # (N, 4)

    rot = noise.r2_sequence(draw_index.astype(jnp.float32) + 0.5)
    rotation = jnp.concatenate(
        [rot, rot * 0.61803398875 + 0.1], axis=-1
    )  # (4,) or (N, 4)
    return jnp.mod(vals + jnp.broadcast_to(rotation, vals.shape), 1.0)
