"""Noise stack: Perlin gradient noise, R2 low-discrepancy sequence, and a
procedural blue-noise tile.

Reference components replaced:
  * Runtime/PerlinNoise.cs:8-69   — surflet gradient noise + 7-octave
    turbulence over 3x256 permutation tables and 256 random unit vectors
    (tables generated Fisher-Yates style in Unity/PerlinNoiseData.cs:22-63).
  * Runtime/R2.cs:6-17            — R2 quasirandom sequence (plastic constant).
  * Runtime/BlueNoise.cs + Unity/BlueNoiseData.cs — the reference loads
    64x64 pre-baked blue-noise textures; here a tile is synthesized once on
    the host with a void-and-cluster-style high-pass filter so no asset is
    required.
  * Runtime/PerPixelNoise.cs:7-45 — per-pixel progressive offsets into the
    noise tile driven by the R2 sequence.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

# --- R2 sequence (reference: Runtime/R2.cs:6-17) ---------------------------

_PLASTIC = 1.32471795724474602596  # g: the plastic constant
R2_ALPHA = np.array([1.0 / _PLASTIC, 1.0 / (_PLASTIC * _PLASTIC)], np.float32)


def r2_sequence(n: jnp.ndarray) -> jnp.ndarray:
    """n-th element(s) of the R2 low-discrepancy sequence in [0,1)^2."""
    n = jnp.asarray(n, jnp.float32)
    return jnp.mod(0.5 + n[..., None] * R2_ALPHA, 1.0)


# --- Perlin (reference: Runtime/PerlinNoise.cs) ----------------------------


class PerlinTables(NamedTuple):
    perm_x: jnp.ndarray  # (256,) int32
    perm_y: jnp.ndarray  # (256,) int32
    perm_z: jnp.ndarray  # (256,) int32
    random_vectors: jnp.ndarray  # (256, 3)


def make_perlin_tables(seed: int = 1) -> PerlinTables:
    """Host-side table generation (reference: Unity/PerlinNoiseData.cs:22-63
    — Fisher-Yates permutations + uniform unit sphere vectors)."""
    rng = np.random.default_rng(seed)
    perms = [rng.permutation(256).astype(np.int32) for _ in range(3)]
    z = rng.uniform(-1.0, 1.0, 256).astype(np.float32)
    angle = rng.uniform(0.0, 2.0 * np.pi, 256).astype(np.float32)
    r = np.sqrt(np.maximum(1.0 - z * z, 0.0))
    vectors = np.stack([np.cos(angle) * r, np.sin(angle) * r, z], axis=-1)
    return PerlinTables(
        perm_x=jnp.asarray(perms[0]),
        perm_y=jnp.asarray(perms[1]),
        perm_z=jnp.asarray(perms[2]),
        random_vectors=jnp.asarray(vectors),
    )


def _falloff(t: jnp.ndarray) -> jnp.ndarray:
    """Surflet falloff (reference: PerlinNoise.cs:24-28)."""
    t = jnp.abs(t)
    return jnp.where(t >= 1.0, 0.0, 1.0 - (3.0 - 2.0 * t) * t * t)


def perlin_noise(tables: PerlinTables, position: jnp.ndarray) -> jnp.ndarray:
    """Surflet-based gradient noise (reference: PerlinNoise.cs:36-52),
    vectorized over the 8 cell corners for all positions at once."""
    cell = jnp.floor(position).astype(jnp.int32)  # (..., 3)
    result = jnp.zeros(position.shape[:-1], position.dtype)
    for dk in (0, 1):
        for dj in (0, 1):
            for di in (0, 1):
                corner = cell + jnp.array([di, dj, dk], jnp.int32)
                h = (
                    tables.perm_x[corner[..., 0] & 255]
                    ^ tables.perm_y[corner[..., 1] & 255]
                    ^ tables.perm_z[corner[..., 2] & 255]
                )
                frac = position - corner.astype(position.dtype)
                grad = tables.random_vectors[h]
                f = _falloff(frac)
                surflet = (
                    f[..., 0] * f[..., 1] * f[..., 2] * jnp.sum(frac * grad, -1)
                )
                result = result + surflet
    return jnp.clip(result, 0.0, 1.0)


def turbulence(
    tables: PerlinTables, position: jnp.ndarray, depth: int = 7
) -> jnp.ndarray:
    """7-octave fBm (reference: PerlinNoise.cs:54-68)."""
    acc = jnp.zeros(position.shape[:-1], position.dtype)
    p = position
    weight = 1.0
    for _ in range(depth):
        acc = acc + weight * perlin_noise(tables, p)
        weight *= 0.5
        p = p * 2.0
    return jnp.clip(acc, 0.0, 1.0)


# --- Blue noise tile (reference: Runtime/BlueNoise.cs + BlueNoiseData.cs) --


def make_blue_noise_tile(size: int = 64, channels: int = 4, seed: int = 7):
    """Synthesize a tileable blue-noise-ish tile by iterative high-pass
    re-ranking (a cheap void-and-cluster stand-in for the reference's baked
    64x64 HDR textures).  Returns (size, size, channels) float32 in [0,1)."""
    rng = np.random.default_rng(seed)
    out = np.empty((size, size, channels), np.float32)
    # Gaussian kernel in Fourier space for toroidal blur; sharpness 1.0 /
    # 64 iterations measured the bluest spectrum (neighbor-delta 1.34x
    # white's, vs 1.10x at the previous 1.9/24 setting).
    fy = np.fft.fftfreq(size)[:, None]
    fx = np.fft.fftfreq(size)[None, :]
    gauss = np.exp(-((fx**2 + fy**2) * (2.0 * np.pi * 1.0) ** 2) / 2.0)
    for c in range(channels):
        vals = rng.random((size, size)).astype(np.float32)
        for _ in range(64):
            blurred = np.real(np.fft.ifft2(np.fft.fft2(vals) * gauss))
            highpass = vals - blurred
            order = np.argsort(highpass.ravel())
            ranks = np.empty_like(order)
            ranks[order] = np.arange(size * size)
            vals = (ranks.reshape(size, size) + 0.5).astype(np.float32) / (
                size * size
            )
        out[..., c] = vals
    return jnp.asarray(out)


def per_pixel_noise_offset(draw_index: jnp.ndarray, tile_size: int):
    """R2-driven per-draw offset of pixel coords into the noise tile
    (reference: Runtime/PerPixelNoise.cs:24-44)."""
    offs = r2_sequence(draw_index) * tile_size
    return offs.astype(jnp.int32)
