"""Reference-asset discovery and texture ingestion.

The reference binds image textures through Unity's importer
(Texture.cs:61-78 ImageTexture reads Texture2D pixel data; the repo ships
`Assets/Textures/earthmap.jpg` for the Book-2 textured sphere).  This
module is the TPU build's equivalent ingestion path: locate a reference
checkout (or any directory of assets), decode with utils/image.read_image,
convert sRGB -> linear (Unity's sampler does this for sRGB-flagged
textures), and downsample to a VMEM-friendly size — the fused megakernel
holds the texture atlas resident in VMEM, so a 5400x2700 source must not
land on-device at full resolution.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from raytracing_in_one_weekend_tpu.utils import image as image_io

_ASSET_ROOT_CANDIDATES = (
    os.environ.get("RTIW_ASSET_ROOT"),
    "/root/reference/RaytracingInOneWeekend/Assets",
)


def find_asset_root() -> Optional[str]:
    """First existing reference-asset root, or None."""
    for root in _ASSET_ROOT_CANDIDATES:
        if root and os.path.isdir(root):
            return root
    return None


def load_texture(
    path: str,
    *,
    max_width: int = 1024,
    srgb: bool = True,
    root: Optional[str] = None,
) -> Optional[np.ndarray]:
    """Decode an image texture as (H, W, 3) linear float32.

    `path` may be absolute or relative to the asset root.  Returns None
    when neither resolves (callers keep their procedural fallbacks).
    Downsampling uses PIL's antialiased resize to at most `max_width`
    columns, preserving aspect."""
    full = path
    if not os.path.isabs(full) or not os.path.exists(full):
        r = root or find_asset_root()
        if r is not None and os.path.exists(os.path.join(r, path)):
            full = os.path.join(r, path)
    if not os.path.exists(full):
        return None
    if full.lower().endswith(".exr"):
        arr = image_io.read_exr(full)[..., :3]
        srgb = False  # EXR is linear by definition
    else:
        arr = image_io.read_image(full)
        if arr.shape[-1] == 1:
            arr = np.repeat(arr, 3, axis=-1)
        arr = arr[..., :3]
    h, w = arr.shape[:2]
    if w > max_width:
        from PIL import Image

        nh = max(1, round(h * max_width / w))
        im = Image.fromarray(
            (np.clip(arr, 0, 1) * 255.0 + 0.5).astype(np.uint8)
        ).resize((max_width, nh), Image.LANCZOS)
        arr = np.asarray(im).astype(np.float32) / 255.0
    if srgb:
        arr = image_io.srgb_to_linear(arr)
    return arr.astype(np.float32)
