"""Batched 3-vector math over (..., 3) lanes.

Replaces Unity.Mathematics float3 SIMD (reference: every Runtime/*.cs file)
with jnp broadcasting over struct-of-arrays; the trailing axis is always the
xyz lane so XLA lays vectors out contiguously and fuses elementwise chains.
"""

from __future__ import annotations

import jax.numpy as jnp

EPSILON = 1e-8


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Row-wise dot product over the trailing xyz axis."""
    return jnp.sum(a * b, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def length_sq(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(a * a, axis=-1)


def length(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(length_sq(a))


def _safe_norm(a: jnp.ndarray, eps: float) -> jnp.ndarray:
    """|a| with an adjoint-safe floor: the sqrt never sees values below
    eps^2, so its backward stays finite even for zero vectors (a plain
    max(|a|, eps) still backprops inf through sqrt(0))."""
    return jnp.sqrt(jnp.maximum(length_sq(a), eps * eps))


def normalize(a: jnp.ndarray, eps: float = EPSILON) -> jnp.ndarray:
    """Safe normalize: a / max(|a|, eps), finite gradients at |a| -> 0
    (important for the differentiable rough-normal constructions)."""
    return a / _safe_norm(a, eps)[..., None]


def normalize_safe(a: jnp.ndarray, eps: float = EPSILON) -> jnp.ndarray:
    """Like Unity normalizesafe: zero vector stays zero
    (reference: CombineJob.cs OutputNormal normalizesafe)."""
    norm = _safe_norm(a, eps)
    out = a / norm[..., None]
    return jnp.where((norm > eps)[..., None], out, jnp.zeros_like(a))


def lerp(a, b, t):
    return a + (b - a) * t


def unlerp(a, b, x):
    return (x - a) / (b - a)


def saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def reflect(d: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Mirror reflection of direction d about normal n."""
    return d - 2.0 * dot(d, n)[..., None] * n


def orthonormal_basis(n: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Branchless Pixar/Frisvad orthonormal basis from a unit normal.

    Reference: Util/Tools.cs:19-28 (GetOrthonormalBasis, from Duff et al.
    "Building an Orthonormal Basis, Revisited").  The copysign select is
    written with jnp.where so it stays vectorized and differentiable.
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    tangent = jnp.stack(
        [1.0 + sign * nx * nx * a, sign * b, -sign * nx], axis=-1
    )
    bitangent = jnp.stack([b, sign + ny * ny * a, -ny], axis=-1)
    return tangent, bitangent


def tangent_to_world(v: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Map a tangent-space direction (y-up convention) into the frame of
    world normal n (reference: Util/Tools.cs:30-46 TangentToWorldSpace)."""
    tangent, bitangent = orthonormal_basis(n)
    return (
        v[..., 0:1] * tangent + v[..., 1:2] * n + v[..., 2:3] * bitangent
    )


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v by unit quaternions q = (x, y, z, w).

    Used for entity-space rects/boxes (reference: Entity.cs rotate(transform,
    normal)); uses the 2-cross formulation t = 2 q_v x v; v' = v + w t + q_v x t.
    """
    qv = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    """Project to the unit sphere.  quat_rotate is a rotation only for
    unit quaternions; every geometry entry point normalizes first so the
    rendered surface is invariant to quaternion scale — which makes
    gradients wrt RAW quat parameters gauge-consistent (the norm
    direction is a null direction, its gradient is exactly 0)."""
    return q / jnp.maximum(
        jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12
    )


def linear_to_gamma(c: jnp.ndarray) -> jnp.ndarray:
    """Linear -> sRGB-approx gamma (reference: Util/Tools.cs:185-189
    LinearToGamma, the max(1.055 x^0.4166 - 0.055, 0) fit).  The tiny floor
    keeps the fractional-power backward finite at 0."""
    return jnp.maximum(
        1.055 * jnp.power(jnp.maximum(c, 1e-12), 0.416666667) - 0.055, 0.0
    )


def gamma_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    return jnp.power((jnp.maximum(c, 0.0) + 0.055) / 1.055, 2.4)


def aces_fitted(c: jnp.ndarray) -> jnp.ndarray:
    """ACES fitted tonemap (reference: Util/Tools.cs:191-238, unused there
    but shipped; exposed as an optional finalize mode)."""
    # sRGB -> ACEScg-ish input transform (Stephen Hill fit)
    a = jnp.stack(
        [
            0.59719 * c[..., 0] + 0.35458 * c[..., 1] + 0.04823 * c[..., 2],
            0.07600 * c[..., 0] + 0.90834 * c[..., 1] + 0.01566 * c[..., 2],
            0.02840 * c[..., 0] + 0.13383 * c[..., 1] + 0.83777 * c[..., 2],
        ],
        axis=-1,
    )
    r = (a * (a + 0.0245786) - 0.000090537) / (
        a * (0.983729 * a + 0.4329510) + 0.238081
    )
    out = jnp.stack(
        [
            1.60475 * r[..., 0] - 0.53108 * r[..., 1] - 0.07367 * r[..., 2],
            -0.10208 * r[..., 0] + 1.10813 * r[..., 1] - 0.00605 * r[..., 2],
            -0.00327 * r[..., 0] - 0.07276 * r[..., 1] + 1.07602 * r[..., 2],
        ],
        axis=-1,
    )
    return jnp.clip(out, 0.0, 1.0)
