"""Thin-lens camera.

Reference: Runtime/View.cs:6-49 — basis construction from
origin/lookAt/up/vfov/aspect/aperture/focusDistance and `GetRay`, which
applies a lens-disk defocus offset, normalizes the direction and stamps a
random shutter time in [0,1) for motion blur.

TPU shape: the camera is a small pytree of (3,) vectors; `generate_rays`
produces a whole wavefront of rays for a batch of pixels in one call so ray
generation fuses with the first intersection pass.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from raytracing_in_one_weekend_tpu.core import math3, rng, sampling
from raytracing_in_one_weekend_tpu.core.ray import Rays


class Camera(NamedTuple):
    origin: jnp.ndarray  # (3,)
    lower_left_corner: jnp.ndarray  # (3,)
    horizontal: jnp.ndarray  # (3,)
    vertical: jnp.ndarray  # (3,)
    forward: jnp.ndarray  # (3,)
    up: jnp.ndarray  # (3,)
    right: jnp.ndarray  # (3,)
    lens_radius: jnp.ndarray  # ()


def make_camera(
    origin,
    look_at,
    up,
    vertical_fov_degrees,
    aspect,
    aperture=0.0,
    focus_distance=None,
) -> Camera:
    """Build the view basis (reference: View.cs:16-36).

    All inputs may be traced arrays, so camera parameters are themselves
    differentiable/optimizable.
    """
    origin = jnp.asarray(origin, jnp.float32)
    look_at = jnp.asarray(look_at, jnp.float32)
    up = jnp.asarray(up, jnp.float32)

    if focus_distance is None:
        focus_distance = math3.length(origin - look_at)
    focus_distance = jnp.asarray(focus_distance, jnp.float32)

    theta = jnp.asarray(vertical_fov_degrees, jnp.float32) * jnp.pi / 180.0
    half_height = jnp.tan(theta / 2.0)
    half_width = aspect * half_height

    # Basis (View.cs:24-26 builds Right = Forward x up in Unity's
    # left-handed world; the right-handed equivalent that preserves the
    # image orientation — +x on the image's right for the canonical book
    # camera — is Shirley's u = up x w, v = w x u).
    forward = math3.normalize(origin - look_at)
    right = math3.normalize(jnp.cross(up, forward))
    cam_up = jnp.cross(forward, right)

    lower_left = (
        half_width * focus_distance * -right
        + half_height * focus_distance * -cam_up
        + focus_distance * -forward
    )
    return Camera(
        origin=origin,
        lower_left_corner=lower_left,
        horizontal=2.0 * half_width * focus_distance * right,
        vertical=2.0 * half_height * focus_distance * cam_up,
        forward=forward,
        up=cam_up,
        right=right,
        lens_radius=jnp.asarray(aperture, jnp.float32) / 2.0,
    )


def generate_rays(
    camera: Camera,
    normalized_coords: jnp.ndarray,
    key: jax.Array,
    lens_uv: jnp.ndarray | None = None,
) -> Rays:
    """Primary rays for normalized pixel coords (N, 2) in [0,1)^2
    (reference: View.cs:38-48 GetRay).

    The defocus offset is `lens_radius * sample_in_unit_disk` projected on
    the camera right/up axes; the shutter time is U[0,1).  `lens_uv`
    optionally supplies the (N, 2) disk uniforms (blue-noise sampler,
    RandomSource.cs InUnitDisk slot); default is white noise.
    """
    n = normalized_coords.shape[0]
    if lens_uv is not None:
        u1, u2 = lens_uv[:, 0], lens_uv[:, 1]
    else:
        u1, u2 = jax.random.uniform(
            rng.purpose_key(key, rng.Purpose.LENS), (2, n)
        )
    disk = sampling.in_unit_disk(u1, u2)
    rd = camera.lens_radius * disk
    offset = rd[:, 0:1] * camera.right + rd[:, 1:2] * camera.up

    direction = (
        camera.lower_left_corner
        - offset
        + normalized_coords[:, 0:1] * camera.horizontal
        + normalized_coords[:, 1:2] * camera.vertical
    )
    time = jax.random.uniform(rng.purpose_key(key, rng.Purpose.TIME), (n,))
    return Rays(
        origin=camera.origin + offset,
        direction=math3.normalize(direction),
        time=time,
    )


def pixel_coords(
    width: int,
    height: int,
    key: jax.Array | None,
    sub_pixel_jitter: bool,
    jitter_uv: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Normalized sample coordinates for the full pixel grid, row-major
    (N, 2) with N = width*height.  Jitter follows the reference
    (SampleBatchJob.cs:134: coords + jitter-or-0.5, divided by size);
    `jitter_uv` optionally supplies (N, 2) jitter uniforms (blue-noise
    sampler slot)."""
    xs = jnp.arange(width, dtype=jnp.float32)
    ys = jnp.arange(height, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # (H, W)
    coords = jnp.stack([gx.ravel(), gy.ravel()], axis=-1)  # (N, 2)
    if not sub_pixel_jitter:
        jitter = 0.5
    elif jitter_uv is not None:
        jitter = jitter_uv
    elif key is not None:
        jitter = jax.random.uniform(
            rng.purpose_key(key, rng.Purpose.PIXEL_JITTER), coords.shape
        )
    else:
        jitter = 0.5
    size = jnp.asarray([width, height], jnp.float32)
    return (coords + jitter) / size
