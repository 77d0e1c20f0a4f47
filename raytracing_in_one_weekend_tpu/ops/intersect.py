"""Scene-level nearest-hit query over all primitive types.

Replaces the reference's per-ray BVH candidate walk + brute-force test +
distance sort (SampleBatchJob.cs:403-475 FindHitCandidates/FindHits) with a
wavefront "intersect every type, reduce nearest" pass.  For scenes up to a
few thousand primitives this brute-force-but-batched formulation is the
TPU-shaped optimum: the sphere pass rides the MXU, everything else is dense
VPU math with zero divergence, and there is no gather-heavy traversal.
A Pallas BVH-tiled kernel covers the beyond-brute-force regime (ops/pallas).

Volume support: the walk state the reference keeps per ray (current volume
material + sorted exit hits, SampleBatchJob.cs:212-303) is compressed to the
convex-hull case: each hit also reports the *exit* distance of the hit
entity (second sphere root / box far slab), which is exactly the reference's
injected exit hit for IsConvexHull volumes (FindHits, SampleBatchJob.cs:462-470).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from raytracing_in_one_weekend_tpu.core import math3
from raytracing_in_one_weekend_tpu.core.ray import Rays
from raytracing_in_one_weekend_tpu.ops import geometry
from raytracing_in_one_weekend_tpu.scene.scene import EntityKind, MaterialType, Scene

BIG = geometry.BIG


class Hit(NamedTuple):
    t: jnp.ndarray  # (N,) distance, BIG when miss
    hit: jnp.ndarray  # (N,) bool
    point: jnp.ndarray  # (N, 3)
    normal: jnp.ndarray  # (N, 3) geometric, unit
    uv: jnp.ndarray  # (N, 2)
    material: jnp.ndarray  # (N,) int32 (0 when miss; gate on .hit)
    kind: jnp.ndarray  # (N,) int32 EntityKind (-1 when miss)
    index: jnp.ndarray  # (N,) int32 within-kind index
    t_exit: jnp.ndarray  # (N,) exit distance of hit entity (convex), BIG otherwise


def nearest_hit(scene: Scene, rays: Rays, t_min: float = 0.0) -> Hit:
    """All rays vs the whole scene; nearest surface hit per ray.

    With a BVH attached (scene/bvh.attach_bvh) the candidate walk replaces
    the dense all-pairs pass — the analog of the reference's
    FindHitCandidates traversal (SampleBatchJob.cs:403-448).
    """
    if scene.bvh is not None:
        from raytracing_in_one_weekend_tpu.ops import bvh_traverse

        best_t, best_kind, best_index, best_exit = bvh_traverse.bvh_nearest(
            scene, rays, t_min
        )
        hit = best_t < BIG
        point = rays.at(jnp.where(hit, best_t, 0.0))
        normal, uv, material = _shading_attributes(
            scene, rays, point, best_kind, best_index
        )
        return Hit(
            t=best_t, hit=hit, point=point, normal=normal, uv=uv,
            material=material, kind=best_kind, index=best_index,
            t_exit=best_exit,
        )

    n = rays.origin.shape[0]
    best_t = jnp.full((n,), BIG)
    best_kind = jnp.full((n,), -1, jnp.int32)
    best_index = jnp.zeros((n,), jnp.int32)
    best_exit = jnp.full((n,), BIG)

    sph = scene.spheres
    if sph.center.shape[0] > 0:
        from raytracing_in_one_weekend_tpu.ops import pallas_sphere

        if pallas_sphere.use_pallas() and not scene.flags.has_motion:
            # Fused VMEM selection kernel + differentiable (N,)-sized
            # re-evaluation of the winner (see ops/pallas_sphere.py).
            _, idx, _ = pallas_sphere.sphere_select(
                jax.lax.stop_gradient(rays.origin),
                jax.lax.stop_gradient(rays.direction),
                jax.lax.stop_gradient(sph.center),
                jax.lax.stop_gradient(sph.radius),
                t_min=t_min,
            )
            t, t_exit_sel = geometry.sphere_hit_single(
                rays.origin, rays.direction,
                sph.center[idx], sph.radius[idx], t_min,
            )
        else:
            t_entry, t_exit = geometry.sphere_hit_all(
                rays.origin, rays.direction, rays.time,
                sph.center, sph.radius, sph.move_offset, sph.time_range, t_min,
            )
            idx = jnp.argmin(t_entry, axis=1).astype(jnp.int32)
            t = jnp.take_along_axis(t_entry, idx[:, None], axis=1)[:, 0]
            t_exit_sel = jnp.take_along_axis(t_exit, idx[:, None], axis=1)[:, 0]
        closer = t < best_t
        best_t = jnp.where(closer, t, best_t)
        best_kind = jnp.where(closer, EntityKind.SPHERE, best_kind)
        best_index = jnp.where(closer, idx, best_index)
        best_exit = jnp.where(closer, t_exit_sel, best_exit)

    rct = scene.rects
    if rct.rot.shape[0] > 0:
        t_all, _ = geometry.rect_hit_all(
            rays.origin, rays.direction,
            rct.rot, rct.pos, rct.xy_from, rct.xy_to, t_min,
        )
        idx = jnp.argmin(t_all, axis=1).astype(jnp.int32)
        t = jnp.take_along_axis(t_all, idx[:, None], axis=1)[:, 0]
        closer = t < best_t
        best_t = jnp.where(closer, t, best_t)
        best_kind = jnp.where(closer, EntityKind.RECT, best_kind)
        best_index = jnp.where(closer, idx, best_index)
        best_exit = jnp.where(closer, BIG, best_exit)

    box = scene.boxes
    if box.rot.shape[0] > 0:
        t_all, n_all, t_exit = geometry.box_hit_all(
            rays.origin, rays.direction, box.rot, box.pos, box.extents, t_min
        )
        idx = jnp.argmin(t_all, axis=1).astype(jnp.int32)
        t = jnp.take_along_axis(t_all, idx[:, None], axis=1)[:, 0]
        closer = t < best_t
        best_t = jnp.where(closer, t, best_t)
        best_kind = jnp.where(closer, EntityKind.BOX, best_kind)
        best_index = jnp.where(closer, idx, best_index)
        best_exit = jnp.where(
            closer, jnp.take_along_axis(t_exit, idx[:, None], axis=1)[:, 0], best_exit
        )

    tri = scene.triangles
    if tri.vert0.shape[0] > 0:
        from raytracing_in_one_weekend_tpu.ops import pallas_sphere, pallas_triangle

        if pallas_sphere.use_pallas() and pallas_triangle.fits_vmem(
            tri.vert0.shape[0]
        ):
            # Fused VMEM Moller-Trumbore selection + differentiable
            # (N,)-sized re-evaluation of the winner.
            _, idx = pallas_triangle.triangle_select(
                jax.lax.stop_gradient(rays.origin),
                jax.lax.stop_gradient(rays.direction),
                jax.lax.stop_gradient(tri.edge_a),
                jax.lax.stop_gradient(tri.edge_b),
                jax.lax.stop_gradient(tri.vert0),
                t_min=t_min,
            )
            t = geometry.triangle_hit_single(
                rays.origin, rays.direction,
                tri.edge_a[idx], tri.edge_b[idx], tri.vert0[idx], t_min,
            )
        else:
            t_all, _, _ = geometry.triangle_hit_all(
                rays.origin, rays.direction,
                tri.edge_a, tri.edge_b, tri.vert0, tri.normals, tri.uvs,
                t_min,
            )
            idx = jnp.argmin(t_all, axis=1).astype(jnp.int32)
            t = jnp.take_along_axis(t_all, idx[:, None], axis=1)[:, 0]
        closer = t < best_t
        best_t = jnp.where(closer, t, best_t)
        best_kind = jnp.where(closer, EntityKind.TRIANGLE, best_kind)
        best_index = jnp.where(closer, idx, best_index)
        best_exit = jnp.where(closer, BIG, best_exit)

    hit = best_t < BIG
    point = rays.at(jnp.where(hit, best_t, 0.0))
    normal, uv, material = _shading_attributes(
        scene, rays, point, best_kind, best_index
    )
    return Hit(
        t=best_t, hit=hit, point=point, normal=normal, uv=uv,
        material=material, kind=best_kind, index=best_index, t_exit=best_exit,
    )


def _shading_attributes(scene, rays, point, kind, index):
    """Gather normal / uv / material for the winning entity only.

    Recomputing the winner's normal from gathered parameters is far cheaper
    on TPU than materializing per-candidate normals for (N, S) pairs.
    """
    n = point.shape[0]
    normal = jnp.zeros((n, 3))
    uv = jnp.zeros((n, 2))
    material = jnp.zeros((n,), jnp.int32)

    sph = scene.spheres
    if sph.center.shape[0] > 0:
        gi = jnp.clip(index, 0, sph.center.shape[0] - 1)
        centers = sph.center[gi]
        if sph.move_offset is not None:
            t0 = sph.time_range[gi, 0]
            t1 = sph.time_range[gi, 1]
            denom = jnp.where(t1 == t0, 1.0, t1 - t0)
            w = jnp.clip((rays.time - t0) / denom, 0.0, 1.0)
            centers = centers + sph.move_offset[gi] * w[:, None]
        sn = geometry.sphere_normal_at(point, centers, sph.radius[gi])
        is_sph = (kind == EntityKind.SPHERE)[:, None]
        normal = jnp.where(is_sph, sn, normal)
        material = jnp.where(kind == EntityKind.SPHERE, sph.material[gi], material)
        # Shirley Book-2 spherical texcoords from the unit local point
        # (= outward normal): u = (atan2(-z, x) + pi) / 2pi,
        # v = acos(-y) / pi.  DELIBERATE deviation: the reference zeroes
        # sphere texCoord (HitTests.cs:123), which makes image textures
        # on analytic spheres read one texel; like the checker/perlin
        # dead branches, the book behavior is restored here.
        sph_u = (jnp.arctan2(-sn[:, 2], sn[:, 0]) + jnp.pi) / (2.0 * jnp.pi)
        sph_v = jnp.arccos(jnp.clip(-sn[:, 1], -1.0, 1.0)) / jnp.pi
        uv = jnp.where(is_sph[..., : uv.shape[-1]],
                       jnp.stack([sph_u, sph_v], axis=-1), uv)

    rct = scene.rects
    if rct.rot.shape[0] > 0:
        gi = jnp.clip(index, 0, rct.rot.shape[0] - 1)
        local_n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
        rn = math3.quat_rotate(rct.rot[gi], local_n)
        is_rct = (kind == EntityKind.RECT)[:, None]
        normal = jnp.where(is_rct, rn, normal)
        material = jnp.where(kind == EntityKind.RECT, rct.material[gi], material)

    box = scene.boxes
    if box.rot.shape[0] > 0:
        gi = jnp.clip(index, 0, box.rot.shape[0] - 1)
        inv_rot = math3.quat_conjugate(box.rot[gi])
        local_p = math3.quat_rotate(inv_rot, point - box.pos[gi])
        # Face normal from the dominant |p|/extents axis.
        rel = jnp.abs(local_p) / jnp.maximum(box.extents[gi], 1e-12)
        axis = jnp.argmax(rel, axis=-1)
        local_n = jnp.sign(
            jnp.take_along_axis(local_p, axis[:, None], axis=-1)
        ) * jnp.eye(3, dtype=point.dtype)[axis]
        bn = math3.quat_rotate(box.rot[gi], local_n)
        is_box = (kind == EntityKind.BOX)[:, None]
        normal = jnp.where(is_box, bn, normal)
        material = jnp.where(kind == EntityKind.BOX, box.material[gi], material)

    tri = scene.triangles
    if tri.vert0.shape[0] > 0:
        gi = jnp.clip(index, 0, tri.vert0.shape[0] - 1)
        edge_a = tri.edge_a[gi]
        edge_b = tri.edge_b[gi]
        v0 = tri.vert0[gi]
        # Recompute barycentrics of the winner via Moller-Trumbore.
        pvec = jnp.cross(rays.direction, edge_a)
        det = math3.dot(edge_b, pvec)
        inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
        tvec = rays.origin - v0
        u = math3.dot(tvec, pvec) * inv_det
        qvec = jnp.cross(tvec, edge_b)
        v = math3.dot(rays.direction, qvec) * inv_det
        bary = jnp.stack([1.0 - u - v, u, v], axis=-1)
        tn = jnp.einsum("nij,nj->ni", tri.normals[gi], bary)
        tuv = jnp.einsum("nij,nj->ni", tri.uvs[gi], bary)
        is_tri = (kind == EntityKind.TRIANGLE)[:, None]
        normal = jnp.where(is_tri, tn, normal)
        uv = jnp.where(is_tri[..., : uv.shape[-1]], tuv, uv)
        material = jnp.where(kind == EntityKind.TRIANGLE, tri.material[gi], material)

    # World normals are normalized after rotation (Entity.cs:65).
    normal = math3.normalize_safe(normal)
    return normal, uv, material


def point_inside_volume(scene: Scene, point: jnp.ndarray) -> jnp.ndarray:
    """Per-point: index of a containing probabilistic-volume convex entity's
    material, or -1.

    Replaces the reference's backwards-ray DetermineVolumeContainment
    (SampleBatchJob.cs:477-508) with a direct point-in-convex-hull test —
    equivalent for the convex hulls (sphere|box, Entity.cs:24) that volumes
    are restricted to.
    """
    n = point.shape[0]
    inside_mat = jnp.full((n,), -1, jnp.int32)

    sph = scene.spheres
    if sph.center.shape[0] > 0:
        is_vol = scene.materials.type[sph.material] == MaterialType.PROBABILISTIC_VOLUME
        d2 = jnp.sum(
            (point[:, None, :] - sph.center[None, :, :]) ** 2, axis=-1
        )
        inside = (d2 < (sph.radius * sph.radius)[None, :]) & is_vol[None, :]
        any_inside = jnp.any(inside, axis=1)
        first = jnp.argmax(inside, axis=1)
        inside_mat = jnp.where(any_inside, sph.material[first], inside_mat)

    box = scene.boxes
    if box.rot.shape[0] > 0:
        is_vol = scene.materials.type[box.material] == MaterialType.PROBABILISTIC_VOLUME
        # normalize like every other rect/box quat consumer (raw-quat
        # descent drifts off unit norm; an unnormalized conjugate rotate
        # scales local coords by |q|^2 and mis-classifies containment)
        inv_rot = math3.quat_conjugate(math3.quat_normalize(box.rot))
        local = math3.quat_rotate(
            inv_rot[None], point[:, None, :] - box.pos[None]
        )  # (N,B,3)
        inside = (
            jnp.all(jnp.abs(local) < box.extents[None], axis=-1) & is_vol[None, :]
        )
        any_inside = jnp.any(inside, axis=1)
        first = jnp.argmax(inside, axis=1)
        inside_mat = jnp.where(
            any_inside & (inside_mat < 0), box.material[first], inside_mat
        )

    return inside_mat
