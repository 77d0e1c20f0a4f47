"""Sky / environment sampling.

Reference: Environment.cs:5-18 (SkyType + gradient colors) with the gradient
evaluated in-kernel at SampleBatchJob.cs:352-354 and the HDR cubemap sampler
at Texture.cs:141-211 (major-axis face select + UV).
"""

from __future__ import annotations

import jax.numpy as jnp

from raytracing_in_one_weekend_tpu.scene.scene import Environment, SkyType


def sample_sky(env: Environment, direction: jnp.ndarray) -> jnp.ndarray:
    """Radiance from the sky along (N,3) unit directions.

    Gradient: lerp(bottom, top, 0.5*(dir.y + 1))  (SampleBatchJob.cs:352-354)
    Cubemap:  face-select + nearest texel          (Texture.cs:172-210)
    NONE:     black (terminates the path with zero emission).
    """
    t = 0.5 * (direction[..., 1] + 1.0)
    gradient = env.sky_bottom + (env.sky_top - env.sky_bottom) * t[..., None]

    out = jnp.where(
        (env.sky_type == SkyType.GRADIENT), gradient, jnp.zeros_like(gradient)
    )
    if env.cubemap is not None:
        cube = _sample_cubemap(env.cubemap, direction)
        out = jnp.where((env.sky_type == SkyType.CUBEMAP), cube, out)
    return out


def _sample_cubemap(cubemap: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Major-axis cubemap lookup (reference: Texture.cs:172-210).

    Face order (6, H, W, 3): +x, -x, +y, -y, +z, -z. Nearest-neighbor like
    the reference's raw pointer fetch.
    """
    av = jnp.abs(v)
    ax, ay, az = av[..., 0], av[..., 1], av[..., 2]
    x, y, z = v[..., 0], v[..., 1], v[..., 2]

    use_x = (ax >= ay) & (ax >= az)
    use_y = (ay > ax) & (ay >= az)
    positive = jnp.where(
        use_x, x >= 0, jnp.where(use_y, y >= 0, z >= 0)
    )

    # Per-face (u, v) numerators (Texture.cs:180-188).
    u_num = jnp.where(
        use_x,
        jnp.where(x >= 0, -z, z),
        jnp.where(use_y, x, jnp.where(z >= 0, x, -x)),
    )
    v_num = jnp.where(use_x, -y, jnp.where(use_y, jnp.where(y >= 0, z, -z), -y))
    major = jnp.where(use_x, ax, jnp.where(use_y, ay, az))
    major = jnp.maximum(major, 1e-12)
    uv = jnp.stack([u_num, v_num], axis=-1) / major[..., None]

    face = jnp.where(use_x, 0, jnp.where(use_y, 2, 4)) + jnp.where(positive, 0, 1)
    h, w = cubemap.shape[1], cubemap.shape[2]
    half = jnp.asarray([w / 2.0, h / 2.0], jnp.float32)
    coords = jnp.minimum(
        ((uv + 1.0) * half).astype(jnp.int32),
        jnp.asarray([w - 1, h - 1], jnp.int32),
    )
    return cubemap[face, coords[..., 1], coords[..., 0]]
