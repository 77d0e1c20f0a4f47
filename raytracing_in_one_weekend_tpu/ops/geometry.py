"""Batched ray-primitive intersection ops.

Reference: Runtime/HitTests.cs:7-197 — AABB slab test (Wiche variant),
sphere quadratic, one-sided XY rect, Majercik box, Moller-Trumbore triangle.

TPU-first redesign: instead of one ray vs one entity behind a virtual
dispatch (Entity.cs:105-122), every op here is *all rays vs all primitives
of one type at once*.  The sphere test is factored so its dot products are
(N,3)@(3,S) matmuls that XLA tiles onto the MXU; the remaining ops are
regular VPU broadcasts.  All ops return large-but-finite "miss" distances
(BIG) instead of booleans+earlies, so the nearest-hit reduction is a plain
masked min and everything stays differentiable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytracing_in_one_weekend_tpu.core import math3

BIG = 1e30  # "no hit" distance sentinel
T_MIN = 0.0  # reference FindHits uses tMin=0 (SampleBatchJob.cs:458)


def _matdot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N,3) x (S,3) -> (N,S) pairwise dot as an MXU-friendly contraction.

    Precision is pinned to HIGHEST: on TPU a default-precision f32 matmul
    runs as one bf16 MXU pass, whose 8-bit mantissa is far too coarse for
    hit distances (visible banding on sphere silhouettes).  HIGHEST uses
    the 3-pass bf16 decomposition, giving ~f32 accuracy while still riding
    the MXU.
    """
    return jnp.dot(
        a, b.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


# ---------------------------------------------------------------------------
# AABB (reference: HitTests.cs:9-21, Roman Wiche slab variant)
# ---------------------------------------------------------------------------


def aabb_hit(
    origin: jnp.ndarray,
    inv_direction: jnp.ndarray,
    box_min: jnp.ndarray,
    box_max: jnp.ndarray,
) -> jnp.ndarray:
    """Slab test, broadcast over (..., 3) lanes.

    tMin = max(0, cmax(min(t0, t1))); tMax = cmin(max(t0, t1)); hit iff
    tMin < tMax.  inv_direction must already map 1/0 -> +-inf (the caller
    uses `safe_invert`).
    """
    t0 = (box_min - origin) * inv_direction
    t1 = (box_max - origin) * inv_direction
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    t_near = jnp.maximum(0.0, t_near)
    return t_near < t_far


def safe_invert(direction: jnp.ndarray) -> jnp.ndarray:
    """1/d with 0 -> +inf (reference: SampleBatchJob.cs:409-412 converts
    Burst's 1/0=NaN to INFINITY)."""
    return jnp.where(
        direction == 0.0, jnp.inf, 1.0 / jnp.where(direction == 0.0, 1.0, direction)
    )


# ---------------------------------------------------------------------------
# Spheres (reference: HitTests.cs:23-60) -- the MXU path
# ---------------------------------------------------------------------------


def sphere_hit_all(
    origin: jnp.ndarray,  # (N, 3)
    direction: jnp.ndarray,  # (N, 3)
    time: jnp.ndarray,  # (N,)
    centers: jnp.ndarray,  # (S, 3)
    radii: jnp.ndarray,  # (S,)
    move_offsets: jnp.ndarray | None = None,  # (S, 3) motion-blur offset
    time_ranges: jnp.ndarray | None = None,  # (S, 2)
    t_min: float = T_MIN,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Quadratic sphere test, all rays x all spheres.

    The reference intersects in entity-local space with the translation
    baked into the inverse transform (Entity.cs:91-103); here the center
    (plus the motion-blur offset, Entity.cs:124-127 TransformAtTime) is kept
    in world space and the quadratic's dot products expand into matmuls:

      b      = o.d - d.c       with d.c = D @ C^T  (MXU)
      |o-c|^2 = |o|^2 - 2 o.c + |c|^2  with o.c = O @ C^T  (MXU)

    Returns (t_near (N,S), t_far (N,S)); both BIG where invalid/miss.
    t_far is the exit root used for convex-hull volume walks
    (SampleBatchJob.cs:462-470 exit-hit injection).
    """
    o_dot_d = math3.dot(origin, direction)[:, None]  # (N,1)
    a = math3.length_sq(direction)[:, None]  # (N,1) ~1 for unit dirs
    o_sq = math3.length_sq(origin)[:, None]  # (N,1)

    d_dot_c = _matdot(direction, centers)  # (N,S)
    o_dot_c = _matdot(origin, centers)  # (N,S)
    c_sq = math3.length_sq(centers)[None, :]  # (1,S)

    if move_offsets is not None:
        # w(t) = clamp(unlerp(t0, t1, rayTime), 0, 1)   (Entity.cs:124-127)
        t0 = time_ranges[None, :, 0]
        t1 = time_ranges[None, :, 1]
        denom = jnp.where(t1 == t0, 1.0, t1 - t0)
        w = jnp.clip((time[:, None] - t0) / denom, 0.0, 1.0)  # (N,S)
        d_dot_c = d_dot_c + _matdot(direction, move_offsets) * w
        o_dot_c = o_dot_c + _matdot(origin, move_offsets) * w
        c_sq = (
            c_sq
            + 2.0 * math3.dot(centers, move_offsets)[None, :] * w
            + math3.length_sq(move_offsets)[None, :] * w * w
        )

    b = o_dot_d - d_dot_c  # (N,S)
    c_term = o_sq - 2.0 * o_dot_c + c_sq - (radii * radii)[None, :]
    discriminant = b * b - a * c_term
    has_root = discriminant > 0.0
    # Adjoint-safe sqrt: masked-out lanes must not see sqrt(0), whose
    # backward is inf and poisons the whole gradient via 0*inf = NaN.
    sqrt_disc = jnp.sqrt(jnp.where(has_root, discriminant, 1.0))
    sqrt_disc = jnp.where(has_root, sqrt_disc, 0.0)

    t_near = (-b - sqrt_disc) / a
    t_far = (-b + sqrt_disc) / a
    near_ok = has_root & (t_near > t_min)
    far_ok = has_root & (t_far > t_min)
    # Reference tries the near root then the far root (HitTests.cs:40-56):
    # a ray starting inside the sphere hits the far root.
    t_entry = jnp.where(near_ok, t_near, jnp.where(far_ok, t_far, BIG))
    t_exit = jnp.where(far_ok, t_far, BIG)
    return t_entry, t_exit


def sphere_hit_single(
    origin: jnp.ndarray,  # (N, 3)
    direction: jnp.ndarray,  # (N, 3)
    centers: jnp.ndarray,  # (N, 3) — one (gathered) sphere per ray
    radii: jnp.ndarray,  # (N,)
    t_min: float = T_MIN,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-ray single-sphere quadratic (HitTests.cs:23-60), (N,)-sized.

    The differentiable re-evaluation companion of the Pallas selection
    kernel (ops/pallas_sphere.py): the kernel picks the winner, this
    computes its entry/exit distances with gradients flowing to the
    gathered center/radius.
    """
    oc = origin - centers
    a = math3.length_sq(direction)
    b = math3.dot(oc, direction)
    c = math3.length_sq(oc) - radii * radii
    disc = b * b - a * c
    has_root = disc > 0.0
    sq = jnp.sqrt(jnp.where(has_root, disc, 1.0))
    sq = jnp.where(has_root, sq, 0.0)
    t_near = (-b - sq) / a
    t_far = (-b + sq) / a
    near_ok = has_root & (t_near > t_min)
    far_ok = has_root & (t_far > t_min)
    t_entry = jnp.where(near_ok, t_near, jnp.where(far_ok, t_far, BIG))
    t_exit = jnp.where(far_ok, t_far, BIG)
    return t_entry, t_exit


def sphere_normal_at(
    point: jnp.ndarray,  # (N, 3)
    center: jnp.ndarray,  # (N, 3) effective center of the hit sphere
    radius: jnp.ndarray,  # (N,)
) -> jnp.ndarray:
    """Outward geometric normal (p - c)/r (reference: HitTests.cs:41,52 —
    local-space GetPoint(t)/radius, world-rotated by Entity.cs:65)."""
    return (point - center) / radius[..., None]


def sphere_moved_centers(
    centers: jnp.ndarray,
    move_offsets: jnp.ndarray | None,
    time_ranges: jnp.ndarray | None,
    time: jnp.ndarray,
) -> jnp.ndarray:
    """Effective centers (N,S,3) at each ray's time, or (S,3) when static."""
    if move_offsets is None:
        return centers
    t0 = time_ranges[None, :, 0]
    t1 = time_ranges[None, :, 1]
    denom = jnp.where(t1 == t0, 1.0, t1 - t0)
    w = jnp.clip((time[:, None] - t0) / denom, 0.0, 1.0)  # (N,S)
    return centers[None] + move_offsets[None] * w[..., None]


# ---------------------------------------------------------------------------
# Rects (reference: HitTests.cs:62-78) -- one-sided local-XY rect
# ---------------------------------------------------------------------------


def rect_hit_all(
    origin: jnp.ndarray,  # (N, 3)
    direction: jnp.ndarray,  # (N, 3)
    rot: jnp.ndarray,  # (R, 4) world-from-local quaternion
    pos: jnp.ndarray,  # (R, 3) world translation
    xy_from: jnp.ndarray,  # (R, 2)
    xy_to: jnp.ndarray,  # (R, 2)
    t_min: float = T_MIN,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One-sided axis-aligned rect in entity space.

    The reference transforms the ray to entity space (Entity.cs:91-97) and
    only hits when the local direction faces the plane (dir.z < 0,
    HitTests.cs:69).  Returns (t (N,R), world normals (N,R,3)); the normal
    is the rotated local +Z, constant per rect.
    """
    rot = math3.quat_normalize(rot)  # scale-gauge-free raw-quat grads
    inv_rot = math3.quat_conjugate(rot)  # (R,4)
    o_local = math3.quat_rotate(inv_rot[None], origin[:, None] - pos[None])
    d_local = math3.quat_rotate(inv_rot[None], direction[:, None])  # (N,R,3)

    dz = d_local[..., 2]
    safe_dz = jnp.where(dz == 0.0, 1.0, dz)
    t = -o_local[..., 2] / safe_dz
    xy = o_local[..., :2] + t[..., None] * d_local[..., :2]
    inside = jnp.all((xy >= xy_from[None]) & (xy <= xy_to[None]), axis=-1)
    ok = (dz < 0.0) & (t > t_min) & inside
    t = jnp.where(ok, t, BIG)

    local_n = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    world_n = math3.quat_rotate(rot, jnp.broadcast_to(local_n, rot[..., :3].shape))
    world_n = jnp.broadcast_to(world_n[None], (origin.shape[0],) + world_n.shape)
    return t, world_n


# ---------------------------------------------------------------------------
# Boxes (reference: HitTests.cs:81-113, Majercik et al.)
# ---------------------------------------------------------------------------


def box_hit_all(
    origin: jnp.ndarray,  # (N, 3)
    direction: jnp.ndarray,  # (N, 3)
    rot: jnp.ndarray,  # (B, 4)
    pos: jnp.ndarray,  # (B, 3)
    extents: jnp.ndarray,  # (B, 3) half-sizes
    t_min: float = T_MIN,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Majercik et al. ray-box in entity space, all rays x all boxes.

    Returns (t_entry (N,B), world normal (N,B,3), t_exit (N,B)).  The exit
    distance comes from the standard slab t_far and feeds convex-hull volume
    exit hits (Entity.cs:24 IsConvexHull gates Sphere|Box).
    """
    rot = math3.quat_normalize(rot)  # scale-gauge-free raw-quat grads
    inv_rot = math3.quat_conjugate(rot)
    o = math3.quat_rotate(inv_rot[None], origin[:, None] - pos[None])  # (N,B,3)
    d = math3.quat_rotate(inv_rot[None], direction[:, None])  # (N,B,3)

    # Offset origin by t_min along the ray (reference: HitTests.cs:84).
    o = o + d * t_min

    ext = extents[None]  # (1,B,3)
    inside = jnp.max(jnp.abs(o) / ext, axis=-1) < 1.0
    winding = jnp.where(inside, -1.0, 1.0)  # (N,B)
    sgn = -jnp.sign(d)
    safe_d = jnp.where(d == 0.0, 1e-30, d)
    dist_to_plane = (ext * winding[..., None] * sgn - o) / safe_d  # (N,B,3)

    def _face_test(axis):
        u, v = (axis + 1) % 3, (axis + 2) % 3
        da = dist_to_plane[..., axis]
        pu = o[..., u] + d[..., u] * da
        pv = o[..., v] + d[..., v] * da
        return (
            (da >= 0.0)
            & (jnp.abs(pu) < ext[..., u])
            & (jnp.abs(pv) < ext[..., v])
        )

    test_x = _face_test(0)
    test_y = _face_test(1)
    test_z = _face_test(2)
    any_hit = test_x | test_y | test_z

    t = jnp.where(
        test_x,
        dist_to_plane[..., 0],
        jnp.where(test_y, dist_to_plane[..., 1], dist_to_plane[..., 2]),
    )
    t = t + t_min
    t = jnp.where(any_hit, t, BIG)

    local_n = jnp.stack(
        [
            jnp.where(test_x, sgn[..., 0], 0.0),
            jnp.where(test_y & ~test_x, sgn[..., 1], 0.0),
            jnp.where(test_z & ~test_x & ~test_y, sgn[..., 2], 0.0),
        ],
        axis=-1,
    )
    world_n = math3.quat_rotate(rot[None], local_n)

    # Exit root via plain slab test for the volume walk.
    inv_d = safe_invert(d)
    t0 = (-ext - o) * inv_d
    t1 = (ext - o) * inv_d
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1) + t_min
    t_near_slab = jnp.max(jnp.minimum(t0, t1), axis=-1) + t_min
    exit_ok = (t_far > t_min) & (t_near_slab < t_far)
    t_exit = jnp.where(exit_ok, t_far, BIG)
    return t, world_n, t_exit


def rect_hit_single(
    origin: jnp.ndarray,  # (M, 3)
    direction: jnp.ndarray,  # (M, 3)
    rot: jnp.ndarray,  # (M, 4) — one (gathered) rect per ray
    pos: jnp.ndarray,  # (M, 3)
    xy_from: jnp.ndarray,  # (M, 2)
    xy_to: jnp.ndarray,  # (M, 2)
    t_min: float = T_MIN,
) -> jnp.ndarray:
    """Per-ray single-rect test (HitTests.cs:62-78) for BVH leaf candidates."""
    rot = math3.quat_normalize(rot)
    inv_rot = math3.quat_conjugate(rot)
    o_local = math3.quat_rotate(inv_rot, origin - pos)
    d_local = math3.quat_rotate(inv_rot, direction)
    dz = d_local[..., 2]
    safe_dz = jnp.where(dz == 0.0, 1.0, dz)
    t = -o_local[..., 2] / safe_dz
    xy = o_local[..., :2] + t[..., None] * d_local[..., :2]
    inside = jnp.all((xy >= xy_from) & (xy <= xy_to), axis=-1)
    ok = (dz < 0.0) & (t > t_min) & inside
    return jnp.where(ok, t, BIG)


def box_hit_single(
    origin: jnp.ndarray,  # (M, 3)
    direction: jnp.ndarray,  # (M, 3)
    rot: jnp.ndarray,  # (M, 4) — one (gathered) box per ray
    pos: jnp.ndarray,  # (M, 3)
    extents: jnp.ndarray,  # (M, 3)
    t_min: float = T_MIN,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-ray single-box entry/exit (HitTests.cs:81-113 entry; slab exit)."""
    rot = math3.quat_normalize(rot)
    inv_rot = math3.quat_conjugate(rot)
    o = math3.quat_rotate(inv_rot, origin - pos)
    d = math3.quat_rotate(inv_rot, direction)
    o = o + d * t_min

    inside = jnp.max(jnp.abs(o) / jnp.maximum(extents, 1e-30), axis=-1) < 1.0
    winding = jnp.where(inside, -1.0, 1.0)
    sgn = -jnp.sign(d)
    safe_d = jnp.where(d == 0.0, 1e-30, d)
    dist_to_plane = (extents * winding[..., None] * sgn - o) / safe_d

    def _face_test(axis):
        u, v = (axis + 1) % 3, (axis + 2) % 3
        da = dist_to_plane[..., axis]
        pu = o[..., u] + d[..., u] * da
        pv = o[..., v] + d[..., v] * da
        return (
            (da >= 0.0)
            & (jnp.abs(pu) < extents[..., u])
            & (jnp.abs(pv) < extents[..., v])
        )

    tx, ty, tz = _face_test(0), _face_test(1), _face_test(2)
    any_hit = tx | ty | tz
    t = jnp.where(
        tx,
        dist_to_plane[..., 0],
        jnp.where(ty, dist_to_plane[..., 1], dist_to_plane[..., 2]),
    )
    t = jnp.where(any_hit, t + t_min, BIG)

    inv_d = safe_invert(d)
    t0 = (-extents - o) * inv_d
    t1 = (extents - o) * inv_d
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1) + t_min
    t_near_slab = jnp.max(jnp.minimum(t0, t1), axis=-1) + t_min
    exit_ok = (t_far > t_min) & (t_near_slab < t_far)
    return t, jnp.where(exit_ok, t_far, BIG)


def triangle_hit_single(
    origin: jnp.ndarray,  # (M, 3)
    direction: jnp.ndarray,  # (M, 3)
    edge_a: jnp.ndarray,  # (M, 3) — one (gathered) triangle per ray
    edge_b: jnp.ndarray,  # (M, 3)
    vert0: jnp.ndarray,  # (M, 3)
    t_min: float = T_MIN,
) -> jnp.ndarray:
    """Per-ray single-triangle Moller-Trumbore (HitTests.cs:116-150);
    distance only — the winner's normal/uv are recomputed by
    intersect._shading_attributes."""
    pvec = jnp.cross(direction, edge_a)
    det = math3.dot(edge_b, pvec)
    inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
    tvec = origin - vert0
    u = math3.dot(tvec, pvec) * inv_det
    qvec = jnp.cross(tvec, edge_b)
    v = math3.dot(direction, qvec) * inv_det
    t = math3.dot(edge_a, qvec) * inv_det
    ok = (
        (det != 0.0)
        & (u >= 0.0) & (u <= 1.0)
        & (v >= 0.0) & (u + v <= 1.0)
        & (t > t_min)
    )
    return jnp.where(ok, t, BIG)


# ---------------------------------------------------------------------------
# Triangles (reference: HitTests.cs:116-150, Moller-Trumbore)
# ---------------------------------------------------------------------------


def triangle_hit_all(
    origin: jnp.ndarray,  # (N, 3)
    direction: jnp.ndarray,  # (N, 3)
    edge_a: jnp.ndarray,  # (T, 3)  v2 - v0   (reference Data[0])
    edge_b: jnp.ndarray,  # (T, 3)  v1 - v0   (reference Data[1])
    vert0: jnp.ndarray,  # (T, 3)  v0        (reference Data[2])
    normals: jnp.ndarray,  # (T, 3, 3) per-vertex normals (columns)
    uvs: jnp.ndarray,  # (T, 2, 3) per-vertex texcoords (columns)
    t_min: float = T_MIN,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Moller-Trumbore with barycentric normal/UV interpolation.

    Triangles are pre-baked to world space (Entity.cs:91-97: triangles skip
    the entity transform).  Returns (t (N,T), normal (N,T,3), uv (N,T,2)).
    """
    pvec = jnp.cross(direction[:, None], edge_a[None])  # (N,T,3)
    det = math3.dot(jnp.broadcast_to(edge_b[None], pvec.shape), pvec)  # (N,T)
    safe_det = jnp.where(det == 0.0, 1.0, det)
    inv_det = 1.0 / safe_det

    tvec = origin[:, None] - vert0[None]  # (N,T,3)
    u = math3.dot(tvec, pvec) * inv_det
    qvec = jnp.cross(tvec, edge_b[None])  # (N,T,3)
    v = math3.dot(jnp.broadcast_to(direction[:, None], qvec.shape), qvec) * inv_det
    t = math3.dot(jnp.broadcast_to(edge_a[None], qvec.shape), qvec) * inv_det

    ok = (
        (det != 0.0)
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
    )
    t = jnp.where(ok, t, BIG)

    bary = jnp.stack([1.0 - u - v, u, v], axis=-1)  # (N,T,3)
    normal = jnp.einsum("tij,ntj->nti", normals, bary)
    uv = jnp.einsum("tij,ntj->nti", uvs, bary)
    return t, normal, uv
