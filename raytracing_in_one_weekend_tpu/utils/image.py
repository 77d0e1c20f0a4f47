"""Image IO: dependency-free PNG/PPM writers, PNG/JPG/EXR readers, and a
diagnostic colormap.

Replaces the reference's display/save path — Unity Texture2D upload + HDRP
blit (Raytracer.cs:1044-1091) and PNG save (Raytracer.Editor.cs:22-28) —
with a zlib-based PNG encoder (a native C++ encoder in native/ is used when
built; this is the always-available fallback) and the inferno colormap the
reference's ViewRange debug shader applies to diagnostic buffers
(Shaders/Debug/ViewRange.shader:54+).

Readers cover the reference's ingestion path — Unity's texture importer
feeding Texture2D.GetRawTextureData (ImageTexture binding Texture.cs:61-78,
BlueNoiseData/SpatioTemporalBlueNoiseData table decode): `read_image`
(PNG/JPG via PIL) and `read_exr` (a minimal self-contained OpenEXR
scanline decoder — NONE/ZIPS/ZIP compression, HALF/FLOAT/UINT channels —
enough for the reference's baked HDR blue-noise tables).
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


def read_image(path: str, dtype=np.float32) -> np.ndarray:
    """Read a PNG/JPG/etc. via PIL as (H, W, C) float32 in [0, 1]
    (C = 1 for grayscale, 3 for RGB, 4 for RGBA — mode preserved, no
    palette).  Raw texel values: color-space handling (sRGB vs linear)
    is the caller's choice, matching Unity's per-texture import flag."""
    from PIL import Image

    with Image.open(path) as im:
        if im.mode == "P":
            im = im.convert("RGBA")
        arr = np.asarray(im)
    if arr.ndim == 2:
        arr = arr[..., None]
    if arr.dtype == np.uint8:
        return arr.astype(dtype) / 255.0
    if arr.dtype == np.uint16:
        return arr.astype(dtype) / 65535.0
    return arr.astype(dtype)


def srgb_to_linear(c: np.ndarray) -> np.ndarray:
    """IEC 61966-2-1 decode — Unity applies this in the sampler for
    sRGB-flagged textures (earthmap.jpg class)."""
    c = np.asarray(c, np.float32)
    return np.where(
        c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4
    ).astype(np.float32)


def _exr_unpredict(raw: bytes) -> np.ndarray:
    """Invert the EXR ZIP predictor: running delta-decode then
    de-interleave of the two byte planes."""
    d = np.frombuffer(raw, np.uint8).astype(np.int64)
    d[0] += 128  # uniform cumsum form: recon[i] = sum(d[:i+1] - 128)
    recon = (np.cumsum(d - 128) & 0xFF).astype(np.uint8)
    half = (len(recon) + 1) // 2
    out = np.empty_like(recon)
    out[0::2] = recon[:half]
    out[1::2] = recon[half:]
    return out


_EXR_DTYPES = {0: np.dtype("<u4"), 1: np.dtype("<f2"), 2: np.dtype("<f4")}


def read_exr(path: str) -> np.ndarray:
    """Minimal OpenEXR scanline reader -> (H, W, C) float32.

    Supports single-part scanline files with NONE (0), ZIPS (2) or ZIP
    (3) compression and UINT/HALF/FLOAT channels.  Channels are returned
    in R, G, B, A order when those names are present (EXR stores them
    alphabetically), else in file order."""
    data = open(path, "rb").read()
    if data[:4] != b"\x76\x2f\x31\x01":
        raise ValueError(f"{path}: not an EXR file")
    version = struct.unpack("<i", data[4:8])[0]
    if version & 0x200:
        raise ValueError(f"{path}: multi-part EXR unsupported")

    pos = 8
    channels = []
    compression = 0
    xmin = ymin = 0
    xmax = ymax = 0
    while True:
        end = data.index(b"\0", pos)
        name = data[pos:end].decode("latin-1")
        pos = end + 1
        if name == "":
            break
        end = data.index(b"\0", pos)
        pos = end + 1  # attr type string (implied by name below)
        size = struct.unpack("<i", data[pos : pos + 4])[0]
        pos += 4
        val = data[pos : pos + size]
        pos += size
        if name == "channels":
            cpos = 0
            while val[cpos] != 0:
                cend = val.index(b"\0", cpos)
                cname = val[cpos:cend].decode("latin-1")
                cpos = cend + 1
                ptype = struct.unpack("<i", val[cpos : cpos + 4])[0]
                cpos += 16  # pixel type + pLinear/reserved + x/y sampling
                channels.append((cname, ptype))
        elif name == "compression":
            compression = val[0]
        elif name == "dataWindow":
            xmin, ymin, xmax, ymax = struct.unpack("<4i", val)

    if compression not in (0, 2, 3):
        raise ValueError(
            f"{path}: EXR compression {compression} unsupported "
            "(NONE/ZIPS/ZIP only)"
        )
    width = xmax - xmin + 1
    height = ymax - ymin + 1
    lines_per_block = 16 if compression == 3 else 1
    n_blocks = -(-height // lines_per_block)
    # skip the scanline offset table (we read chunks sequentially)
    pos += 8 * n_blocks

    line_bytes = sum(
        width * _EXR_DTYPES[pt].itemsize for _, pt in channels
    )
    planes = {
        cname: np.empty((height, width), np.float32) for cname, _ in channels
    }
    for _ in range(n_blocks):
        y, size = struct.unpack("<2i", data[pos : pos + 8])
        pos += 8
        chunk = data[pos : pos + size]
        pos += size
        y0 = y - ymin
        n_lines = min(lines_per_block, height - y0)
        expect = line_bytes * n_lines
        if compression and size < expect:
            chunk = bytes(_exr_unpredict(zlib.decompress(chunk)))
        buf = np.frombuffer(chunk, np.uint8)
        off = 0
        for line in range(n_lines):
            for cname, ptype in channels:
                dt = _EXR_DTYPES[ptype]
                nb = width * dt.itemsize
                row = buf[off : off + nb].view(dt)
                planes[cname][y0 + line] = (
                    row.astype(np.float32)
                    if ptype != 0
                    else row.astype(np.float32)
                )
                off += nb

    order = [c for c in "RGBA" if c in planes]
    if len(order) != len(planes):
        order = [cname for cname, _ in channels]
    return np.stack([planes[c] for c in order], axis=-1)


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
