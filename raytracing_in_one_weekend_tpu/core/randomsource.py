"""RandomSource facade: pluggable sampler flavors for camera-space draws.

Reference: Runtime/RandomSource.cs:15-151 — a per-pixel RNG switched by
NoiseColor {White, Blue, SpatioTemporalBlue} (RandomSource.cs:8-13), with
per-pixel progressive offsets into baked noise tiles (PerPixelNoise.cs:
24-44 R2 offsets; texture cycling per frame BlueNoiseData.cs:42-58,
SpatioTemporalBlueNoiseData.cs).

TPU-native redesign: white noise stays threefry (core/rng.py).  Blue /
spatio-temporal-blue supply the PIXEL-CORRELATED draws from the
reference's own baked tables when the assets are available
(core/stbn.py: HDR blue-noise EXRs for the blue flavor, the five NVIDIA
STBN sets for the spatio-temporal flavor), falling back to synthesized
tileable tiles (core/noise.make_blue_noise_tile) otherwise.  Flavored
draws cover sub-pixel jitter + the lens disk (camera) and — with the
real STBN assets — the FIRST-BOUNCE cosine-hemisphere scatter from the
stbn_unitvec3_cosine set (RandomSource.cs:63-89's SpatioTemporalBlue
arm), where pixel-correlation visibly reduces noise.  Deeper-bounce
draws remain white, a documented deviation that keeps the bounce loop
fusion-friendly.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from raytracing_in_one_weekend_tpu.core import noise, stbn
from raytracing_in_one_weekend_tpu.utils.config import NoiseColor

TILE = 64  # synthesized-tile size (fallback when no baked assets exist)


class NoiseState(NamedTuple):
    """Sampler tables.

    tiles — (T, S, S, 4) camera-draw uniforms (jitter xy, lens theta_u /
    radius_u): T=1 synthesized or T>=1 baked textures for blue, temporal
    slices for spatio-temporal blue.
    cosine — (T, S, S, 3) tangent-space (y-up) cosine-hemisphere
    directions from the real stbn_unitvec3_cosine set, or None (white
    first-bounce scatter).
    scalar — (T, S, S) scalars from the real stbn_scalar set (the
    reference's NextFloat arm, RandomSource.cs:27-33), or None: drives
    EVERY in-path scalar draw (rough-normal inversion, material
    lotteries, dielectric choice, volume free path) when present.
    unitvec3 — (T, S, S, 3) ~unit-sphere directions from the real
    stbn_unitvec3 set (the reference's NextFloat3Direction arm,
    RandomSource.cs:113-128 -> stbNoise.NextUnitVector3), or None:
    drives the isotropic volume scatter when present."""

    tiles: jnp.ndarray
    cosine: Optional[jnp.ndarray] = None
    scalar: Optional[jnp.ndarray] = None
    unitvec3: Optional[jnp.ndarray] = None


def make_noise_state(
    color: NoiseColor, seed: int = 7, temporal: int = 8
) -> Optional[NoiseState]:
    """Build sampler tables for the given flavor (None for white noise).

    Prefers the reference's baked assets (core/stbn.find_asset_root);
    synthesizes tiles when they aren't available."""
    if color == NoiseColor.WHITE:
        return None
    if color == NoiseColor.BLUE:
        baked = stbn.load_blue_noise()
        if baked is not None:
            # Full Blue routing (round 5): the reference's Blue arm
            # feeds EVERY NextFloat from the blue-noise textures
            # (RandomSource.cs:27-33,50-53,70-71 channel cycling) — the
            # per-channel planes double as the SCALAR draw stack
            # (slice = texture*4 + channel), so material lotteries,
            # inversions and free paths all ride blue like STBN's
            # scalar set.  (pack_noise_tables caps how many slices the
            # in-kernel VMEM copy keeps; the XLA-side wavefront cycles
            # through all of them.)
            scal = jnp.asarray(
                baked.transpose(0, 3, 1, 2).reshape(
                    -1, *baked.shape[1:3]
                )
            )
            return NoiseState(tiles=jnp.asarray(baked), scalar=scal)
        tiles = noise.make_blue_noise_tile(TILE, 4, seed)[None]
        return NoiseState(
            tiles=tiles,
            scalar=jnp.asarray(
                tiles.transpose(0, 3, 1, 2).reshape(-1, TILE, TILE)
            ),
        )
    tables = stbn.load_stbn(temporal=temporal)
    if tables is not None:
        return NoiseState(
            tiles=jnp.asarray(stbn.stbn_camera_tiles(tables)),
            cosine=jnp.asarray(tables.cosine),
            scalar=jnp.asarray(tables.scalar),
            unitvec3=jnp.asarray(tables.unitvec3),
        )
    tiles = jnp.stack(
        [noise.make_blue_noise_tile(TILE, 4, seed + i) for i in range(temporal)]
    )
    return NoiseState(tiles=tiles)


def _tile_lookup(table: jnp.ndarray, draw_index, width: int, height: int):
    """Per-pixel fetch from a (T, S, S, C) table with the reference's
    PerPixelNoise addressing: R2-offset pixel coords wrapped to the tile
    (PerPixelNoise.cs:24-44), temporal slice cycling per draw."""
    t, size = table.shape[0], table.shape[1]
    draw_index = jnp.asarray(draw_index)
    tile_idx = jnp.mod(draw_index.astype(jnp.int32), t)
    offs = noise.per_pixel_noise_offset(
        draw_index.astype(jnp.float32), size
    )  # (2,) or (N, 2) int32

    ys, xs = jnp.divmod(jnp.arange(width * height, dtype=jnp.int32), width)
    tx = jnp.mod(xs + offs[..., 0], size)
    ty = jnp.mod(ys + offs[..., 1], size)
    return table[tile_idx, ty, tx]  # (N, C)


def pixel_uniforms(
    state: NoiseState,
    draw_index: jnp.ndarray,  # () or (width*height,) progressive draw ctr
    width: int,
    height: int,
) -> jnp.ndarray:
    """(width*height, 4) pixel-correlated camera uniforms for one draw.

    Per-draw decorrelation follows the reference's PerPixelNoise: the R2
    sequence offsets the pixel's tile coordinates each draw
    (PerPixelNoise.cs:24-44), plus a Cranley-Patterson rotation (fractional
    add) so values differ even when offsets collide; temporal tiles cycle
    per draw like the reference's per-frame texture cycling.

    A (N,) per-pixel draw_index (the fused kernel's progressive per-lane
    counter under adaptive sampling) vectorizes every per-draw quantity."""
    vals = _tile_lookup(state.tiles, draw_index, width, height)  # (N, 4)
    draw_index = jnp.asarray(draw_index)
    rot = noise.r2_sequence(draw_index.astype(jnp.float32) + 0.5)
    rotation = jnp.concatenate(
        [rot, rot * 0.61803398875 + 0.1], axis=-1
    )  # (4,) or (N, 4)
    return jnp.mod(vals + jnp.broadcast_to(rotation, vals.shape), 1.0)


def pixel_cosine(
    state: Optional[NoiseState],
    draw_index: jnp.ndarray,
    width: int,
    height: int,
) -> Optional[jnp.ndarray]:
    """(width*height, 3) tangent-space cosine-hemisphere directions for
    one draw from the real STBN cosine set (RandomSource.cs:63-89), or
    None when the flavor doesn't carry one.  Unit vectors — no
    Cranley-Patterson rotation (that would break the distribution); the
    R2 coordinate offsets alone decorrelate draws, exactly like the
    reference's PerPixelNoise."""
    if state is None or state.cosine is None:
        return None
    return _tile_lookup(state.cosine, draw_index, width, height)


def _tile_lookup_split(table, slice_index, offset_index, width, height):
    """_tile_lookup with the temporal-slice index decoupled from the R2
    offset index: the STBN sets are optimized along the temporal axis
    at stride 1 (consecutive slices anticorrelate per pixel), so
    consecutive DRAWS must step slices by 1 while (bounce, purpose)
    decorrelation rides the spatial R2 offsets only.  (Folding bounce or
    purpose into one combined index gave slice strides that were even —
    period-2 slice cycling measured WORSE than white noise.)"""
    t, size = table.shape[0], table.shape[1]
    tile_idx = jnp.mod(jnp.asarray(slice_index).astype(jnp.int32), t)
    # wrap before the float R2 math: frac(x * alpha) loses precision as
    # x grows (f32 ulp is 0.06 at 1M) and the offsets would quantize
    offs = noise.per_pixel_noise_offset(
        jnp.mod(jnp.asarray(offset_index).astype(jnp.float32), 4096.0),
        size,
    )
    ys, xs = jnp.divmod(jnp.arange(width * height, dtype=jnp.int32), width)
    tx = jnp.mod(xs + offs[..., 0], size)
    ty = jnp.mod(ys + offs[..., 1], size)
    return table[tile_idx, ty, tx]


def pixel_scalar(
    state: Optional[NoiseState],
    draw_index: jnp.ndarray,  # () per-sample progressive draw counter
    bounce,  # () bounce index within the path
    purpose: int,  # decorrelation salt (one per independent consumer)
    width: int,
    height: int,
) -> Optional[jnp.ndarray]:
    """(width*height,) pixel-correlated scalars from the STBN scalar set
    (the reference's flavored NextFloat, RandomSource.cs:27-33), or None
    when the flavor carries no scalar set.

    Temporal slice advances 1 per draw (the set's optimized axis);
    (bounce, purpose) decorrelate through the R2 spatial offset and a
    Cranley-Patterson rotation — both spectrum-preserving."""
    if state is None or state.scalar is None:
        return None
    idx = jnp.asarray(draw_index).astype(jnp.float32)
    b = jnp.asarray(bounce).astype(jnp.float32)
    off_idx = idx * 97.0 + b * 11.0 + jnp.float32(purpose) * 29.0
    vals = _tile_lookup_split(
        state.scalar[..., None], idx + b, off_idx, width, height
    )[..., 0]
    rot = noise.r2_sequence(jnp.mod(off_idx, 4096.0) + 0.5)[..., 0]
    return jnp.mod(vals + rot, 1.0)


def pixel_cosine_at(
    state: Optional[NoiseState],
    draw_index: jnp.ndarray,
    bounce,  # () bounce index (0 = the pixel_cosine first-bounce draw)
    width: int,
    height: int,
) -> Optional[jnp.ndarray]:
    """pixel_cosine generalized to every bounce: slice stride 1 per
    draw, per-bounce R2 offsets (RandomSource.cs:63-89 — the reference
    advances its per-pixel counter every draw; the bounce offset plays
    that role).  Unit vectors take no Cranley-Patterson rotation."""
    if state is None or state.cosine is None:
        return None
    idx = jnp.asarray(draw_index).astype(jnp.float32)
    b = jnp.asarray(bounce).astype(jnp.float32)
    return _tile_lookup_split(
        state.cosine, idx + b, idx * 97.0 + b * 11.0 + 7.0,
        width, height,
    )


def pixel_unitvec3(
    state: Optional[NoiseState],
    draw_index: jnp.ndarray,
    bounce,  # () bounce index within the path
    width: int,
    height: int,
) -> Optional[jnp.ndarray]:
    """(width*height, 3) ~unit-sphere directions from the real STBN
    unitvec3 set for the isotropic volume scatter (the reference's
    NextFloat3Direction, RandomSource.cs:113-128 SpatioTemporalBlue arm
    -> stbNoise.NextUnitVector3), or None when the flavor carries no
    unitvec3 set.  Same slice/offset discipline as pixel_cosine_at
    (stride-1 temporal axis, R2 spatial offsets; purpose salt 13 keeps
    it decorrelated from the cosine set's 7); unit vectors take no
    Cranley-Patterson rotation.  Consumers normalize (byte quantization
    leaves |v| at 1 +- 0.02)."""
    if state is None or state.unitvec3 is None:
        return None
    idx = jnp.asarray(draw_index).astype(jnp.float32)
    b = jnp.asarray(bounce).astype(jnp.float32)
    return _tile_lookup_split(
        state.unitvec3, idx + b, idx * 97.0 + b * 11.0 + 13.0,
        width, height,
    )
