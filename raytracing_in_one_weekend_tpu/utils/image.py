"""Image IO: dependency-free PNG/PPM writers + diagnostic colormap.

Replaces the reference's display/save path — Unity Texture2D upload + HDRP
blit (Raytracer.cs:1044-1091) and PNG save (Raytracer.Editor.cs:22-28) —
with a zlib-based PNG encoder (a native C++ encoder in native/ is used when
built; this is the always-available fallback) and the inferno colormap the
reference's ViewRange debug shader applies to diagnostic buffers
(Shaders/Debug/ViewRange.shader:54+).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def write_png(path: str, image: np.ndarray) -> None:
    """Write (H, W, 3) or (H, W, 4) uint8 image as PNG."""
    image = np.asarray(image)
    if image.dtype != np.uint8:
        image = np.clip(image, 0, 255).astype(np.uint8)
    if image.ndim == 2:
        image = np.repeat(image[..., None], 3, axis=-1)
    h, w, c = image.shape
    color_type = 6 if c == 4 else 2

    def chunk(tag: bytes, data: bytes) -> bytes:
        raw = tag + data
        return (
            struct.pack(">I", len(data))
            + raw
            + struct.pack(">I", zlib.crc32(raw) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 per scanline
    raw = b"".join(b"\x00" + image[row].tobytes() for row in range(h))
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)


def write_ppm(path: str, image: np.ndarray) -> None:
    image = np.clip(np.asarray(image), 0, 255).astype(np.uint8)
    h, w = image.shape[:2]
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(image[..., :3].tobytes())


# Compact inferno stops; interpolated on demand (ViewRange shader analog).
_INFERNO = np.array(
    [
        [0.0015, 0.0005, 0.0139],
        [0.0873, 0.0444, 0.2243],
        [0.2582, 0.0386, 0.4065],
        [0.4166, 0.0903, 0.4328],
        [0.5783, 0.1480, 0.4044],
        [0.7354, 0.2155, 0.3297],
        [0.8658, 0.3165, 0.2261],
        [0.9541, 0.4586, 0.1128],
        [0.9880, 0.6522, 0.0399],
        [0.9409, 0.8750, 0.1394],
        [0.9884, 0.9984, 0.6449],
    ],
    np.float32,
)


def inferno_colormap(values: np.ndarray, vmin=None, vmax=None) -> np.ndarray:
    """Map scalar buffer -> (…, 3) uint8 via inferno, for diagnostic views
    (per-pixel ray count / BVH hits / sample weight, Raytracer.cs:239-250)."""
    values = np.asarray(values, np.float32)
    vmin = float(np.min(values)) if vmin is None else vmin
    vmax = float(np.max(values)) if vmax is None else vmax
    t = np.clip((values - vmin) / max(vmax - vmin, 1e-12), 0.0, 1.0)
    x = t * (len(_INFERNO) - 1)
    lo = np.floor(x).astype(np.int32)
    hi = np.minimum(lo + 1, len(_INFERNO) - 1)
    frac = (x - lo)[..., None]
    rgb = _INFERNO[lo] * (1 - frac) + _INFERNO[hi] * frac
    return (rgb * 255).astype(np.uint8)
