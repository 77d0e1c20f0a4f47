"""Baked blue-noise asset ingestion: the reference's real noise tables.

The reference ships two families of pre-baked sampler textures:

  * 64x64-class HDR blue-noise EXRs (`Assets/Textures/BlueNoise/BlueNoise/
    HDR_RGB_*.exr`, bound by Unity/BlueNoiseData.cs and sampled through
    Runtime/BlueNoise.cs:6-41) — the plain "blue" NoiseColor flavor;
  * the five NVIDIA spatio-temporal blue-noise sets (128x128x64 PNGs,
    `Assets/Textures/BlueNoise/SpatioTemporalBlueNoise/stbn_{scalar,vec2,
    unitvec2,unitvec3,unitvec3_cosine}_*.png`, decoded at
    Runtime/SpatioTemporalBlueNoise.cs:57-78) — the "spatio-temporal
    blue" flavor.  Decode semantics mirrored exactly: byte values divide
    by 256 (not 255), unit-vector sets remap to [-1, 1), and the
    cosine-hemisphere set reads channels (r, b, g) so the tangent-space
    "up" (the surface normal's axis, Tools.cs:30-46 TangentToWorldSpace
    convention) comes from the PNG's blue channel.

Loaders return numpy tables; `core/randomsource.py` wires them into the
sampler flavors (camera draws + the first-bounce cosine scatter set) and
falls back to the synthesized tiles (core/noise.make_blue_noise_tile)
when no asset directory is available.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import numpy as np

from raytracing_in_one_weekend_tpu.utils import image as image_io

_STBN_DIR = "Textures/BlueNoise/SpatioTemporalBlueNoise"
_BLUE_DIR = "Textures/BlueNoise/BlueNoise"
STBN_SIZE = 128  # per-slice resolution of every STBN set
STBN_SLICES = 64  # temporal depth shipped by the reference


def find_asset_root() -> Optional[str]:
    """Asset root that actually carries the STBN tables, or None
    (synthesized fallbacks apply).  Discovery shared with assets.py
    (env override RTIW_ASSET_ROOT, then the reference checkout)."""
    from raytracing_in_one_weekend_tpu import assets

    root = assets.find_asset_root()
    if root is not None and os.path.isdir(os.path.join(root, _STBN_DIR)):
        return root
    return None


class StbnTables(NamedTuple):
    """Decoded STBN sets, slice-major.  Value ranges follow the
    reference's samplers (SpatioTemporalBlueNoise.cs:57-78)."""

    scalar: np.ndarray  # (T, 128, 128) float32 in [0, 1)
    vec2: np.ndarray  # (T, 128, 128, 2) float32 in [0, 1)
    unitvec2: np.ndarray  # (T, 128, 128, 2) float32, ~unit circle
    unitvec3: np.ndarray  # (T, 128, 128, 3) float32, ~unit sphere
    cosine: np.ndarray  # (T, 128, 128, 3) float32 tangent-space (y-up)
    #   cosine-weighted hemisphere directions


def _bytes256(path: str) -> np.ndarray:
    """(H, W, C) float32 = byte / 256 — the reference's exact decode
    (SpatioTemporalBlueNoise.cs divides raw bytes by 256.0, not 255)."""
    f = image_io.read_image(path)  # byte / 255
    return f * (255.0 / 256.0)


@functools.lru_cache(maxsize=4)
def load_stbn(
    root: Optional[str] = None, temporal: int = 8
) -> Optional[StbnTables]:
    """Decode the first `temporal` slices of all five STBN sets.

    Returns None when the assets aren't available."""
    root = root or find_asset_root()
    if root is None:
        return None
    d = os.path.join(root, _STBN_DIR)
    temporal = min(temporal, STBN_SLICES)

    def slices(pattern):
        return np.stack(
            [_bytes256(os.path.join(d, pattern % i)) for i in range(temporal)]
        )

    scalar = slices("stbn_scalar_2Dx1Dx1D_128x128x64x1_%d.png")[..., 0]
    vec2 = slices("stbn_vec2_2Dx1D_128x128x64_%d.png")[..., :2]
    unitvec2 = slices("stbn_unitvec2_2Dx1D_128x128x64_%d.png")[..., :2]
    unitvec3 = slices("stbn_unitvec3_2Dx1D_128x128x64_%d.png")[..., :3]
    cos_rgba = slices("stbn_unitvec3_cosine_2Dx1D_128x128x64_%d.png")
    # channel order (r, b, g): the hemisphere axis rides in blue
    cosine = np.stack(
        [cos_rgba[..., 0], cos_rgba[..., 2], cos_rgba[..., 1]], axis=-1
    )
    return StbnTables(
        scalar=scalar.astype(np.float32),
        vec2=vec2.astype(np.float32),
        unitvec2=(unitvec2 * 2.0 - 1.0).astype(np.float32),
        unitvec3=(unitvec3 * 2.0 - 1.0).astype(np.float32),
        cosine=(cosine * 2.0 - 1.0).astype(np.float32),
    )


@functools.lru_cache(maxsize=2)
def load_blue_noise(
    root: Optional[str] = None, count: int = 8
) -> Optional[np.ndarray]:
    """(T, S, S, 4) float32 in [0, 1) from the HDR blue-noise EXRs
    (BlueNoise.cs:6-41 samples xy of a half4 texture; the decoded files
    are RGB — a half-tile roll of R supplies the 4th channel so every
    camera draw stays blue without reusing a channel verbatim)."""
    root = root or find_asset_root()
    if root is None:
        return None
    d = os.path.join(root, _BLUE_DIR)
    if not os.path.isdir(d):
        return None
    tiles = []
    for i in range(count):
        path = os.path.join(d, f"HDR_RGB_{i}.exr")
        if not os.path.exists(path):
            break
        tiles.append(image_io.read_exr(path))
    if not tiles:
        return None
    rgb = np.stack(tiles)  # (T, S, S, 3)
    s = rgb.shape[1]
    fourth = np.roll(rgb[..., 0], (s // 2, s // 2), axis=(1, 2))
    out = np.concatenate([rgb, fourth[..., None]], axis=-1)
    return np.clip(out, 0.0, 1.0 - 2.0**-24).astype(np.float32)


def stbn_camera_tiles(tables: StbnTables) -> np.ndarray:
    """(T, S, S, 4) camera-draw uniforms from the real sets, in the
    renderer's (jitter_x, jitter_y, lens_theta_u, lens_radius_u) channel
    layout: jitter from the vec2 set (RandomSource.cs NextFloat2), the
    lens draw from the unitvec2 set mapped into the thin-lens
    (theta, sqrt(radius_u)) parametrization — InUnitDisk's
    SpatioTemporalBlue arm returns the unitvec2 sample directly
    (RandomSource.cs:41-60), so theta_u = atan2(y, x)/2pi and
    radius_u = |v|^2 reproduce that point exactly."""
    v = tables.unitvec2
    theta_u = np.mod(np.arctan2(v[..., 1], v[..., 0]), 2.0 * np.pi) / (
        2.0 * np.pi
    )
    radius_u = np.clip(v[..., 0] ** 2 + v[..., 1] ** 2, 0.0, 1.0 - 2.0**-24)
    return np.concatenate(
        [
            tables.vec2,
            theta_u[..., None].astype(np.float32),
            radius_u[..., None].astype(np.float32),
        ],
        axis=-1,
    )
