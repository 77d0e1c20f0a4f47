"""TPU-native AOV-guided denoiser.

Reference slot: the Intel OIDN and NVidia OptiX native denoisers the
reference binds through P/Invoke (ThirdParty/Intel Open Image
Denoise/OidnApi.cs:84-168, ThirdParty/nVidia OptiX Denoiser/
OptixApi.cs:162-212, driven by Jobs/DenoiseJobs.cs:11-123).  Both consume
the color + normal + albedo AOV triple produced by CombineJob.

TPU-native redesign: instead of shipping a CPU/CUDA binary, the denoiser
is an edge-avoiding a-trous wavelet filter (Dammertz et al. 2010) written
directly in JAX — a handful of dilated 5x5 stencil passes, each a dense
depthwise convolution XLA maps straight onto the TPU vector unit, guided
by exactly the same normal/albedo AOV channels the reference feeds OIDN
(DenoiseJobs.cs:27-35 SetSharedImage bindings).  It is jittable,
differentiable, and runs on-device — no host round trip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# 1D B3-spline kernel; the 5x5 a-trous kernel is its outer product.
_B3 = jnp.asarray([1.0 / 16.0, 1.0 / 4.0, 3.0 / 8.0, 1.0 / 4.0, 1.0 / 16.0])


def _shift2d(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift (H, W, C) by (dy, dx) with edge clamping (zero-flux boundary)."""
    h, w = img.shape[0], img.shape[1]
    ys = jnp.clip(jnp.arange(h) + dy, 0, h - 1)
    xs = jnp.clip(jnp.arange(w) + dx, 0, w - 1)
    return img[ys][:, xs]


def _atrous_pass(
    color: jnp.ndarray,
    normal: jnp.ndarray,
    albedo: jnp.ndarray,
    step: int,
    sigma_color: float,
    sigma_normal: float,
    sigma_albedo: float,
) -> jnp.ndarray:
    """One edge-avoiding a-trous pass at dilation `step` (all (H, W, 3))."""
    acc = jnp.zeros_like(color)
    wsum = jnp.zeros(color.shape[:2] + (1,))
    for iy in range(5):
        for ix in range(5):
            dy, dx = (iy - 2) * step, (ix - 2) * step
            k = _B3[iy] * _B3[ix]
            c = _shift2d(color, dy, dx)
            nrm = _shift2d(normal, dy, dx)
            alb = _shift2d(albedo, dy, dx)
            # Edge-stopping weights: range (color), normal, albedo.
            dc = jnp.sum((color - c) ** 2, axis=-1, keepdims=True)
            dn = jnp.sum((normal - nrm) ** 2, axis=-1, keepdims=True)
            da = jnp.sum((albedo - alb) ** 2, axis=-1, keepdims=True)
            w = k * jnp.exp(
                -dc / (2.0 * sigma_color**2)
                - dn / (2.0 * sigma_normal**2)
                - da / (2.0 * sigma_albedo**2)
            )
            acc = acc + w * c
            wsum = wsum + w
    return acc / jnp.maximum(wsum, 1e-8)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "passes"),
)
def denoise(
    color: jnp.ndarray,
    normal: jnp.ndarray,
    albedo: jnp.ndarray,
    *,
    width: int,
    height: int,
    passes: int = 4,
    sigma_color: float = 0.5,
    sigma_normal: float = 0.25,
    sigma_albedo: float = 0.25,
) -> jnp.ndarray:
    """Denoise a linear HDR image guided by its normal/albedo AOVs.

    Inputs are flat (P, 3) buffers as produced by film.combine (the same
    shape contract as the reference's OIDN shared-image bindings,
    DenoiseJobs.cs:27-35); returns a flat (P, 3) denoised color buffer.
    """
    c = color.reshape(height, width, 3)
    nrm = normal.reshape(height, width, 3)
    alb = albedo.reshape(height, width, 3)
    sc = sigma_color
    for i in range(passes):
        c = _atrous_pass(c, nrm, alb, 1 << i, sc, sigma_normal, sigma_albedo)
        # Tighten the range sigma each level (standard a-trous schedule) so
        # coarse passes don't blur across features the fine passes kept.
        sc = sc * 0.5
    return c.reshape(-1, 3)
