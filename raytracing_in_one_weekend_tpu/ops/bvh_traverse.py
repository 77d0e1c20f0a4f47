"""Wavefront BVH traversal.

Reference: the per-pixel iterative BVH walk FindHitCandidates
(Jobs/SampleBatchJob.cs:403-448) — a pointer stack of nodes, AABB slab
tests, leaf entities appended to a candidate list — followed by the
brute-force candidate test in FindHits (:450-475).

TPU-native redesign: one `lax.while_loop` advances the WHOLE wavefront in
lockstep; every ray carries a short index stack (the reference's
HybridPtrStack of BvhNode*, SampleBatchJob.cs:106-109, becomes an (N, CAP)
int32 register file).  Each iteration pops one node per ray: leaf nodes
test their (statically padded) candidate span as one vectorized batch and
fold into the per-ray nearest hit; internal nodes slab-test both children
against [t_min, best_t) and push the surviving ones far-first so the near
child pops first (ordered traversal prunes by shrinking best_t early).
Rays with empty stacks idle; the loop ends when every stack is empty.

Best for large scenes (meshes) where brute-force's O(N*S) dominates; for
hundreds of primitives the dense intersect.nearest_hit usually wins on TPU
— measure, as SURVEY §7 prescribes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytracing_in_one_weekend_tpu.core import math3
from raytracing_in_one_weekend_tpu.core.ray import Rays
from raytracing_in_one_weekend_tpu.ops import geometry
from raytracing_in_one_weekend_tpu.scene.scene import EntityKind

BIG = geometry.BIG


def _aabb_entry(origin, inv_direction, box_min, box_max, t_min, t_max):
    """Slab test returning (hit, entry distance) against [t_min, t_max)."""
    t0 = (box_min - origin) * inv_direction
    t1 = (box_max - origin) * inv_direction
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    t_near = jnp.maximum(t_min, t_near)
    hit = (t_near < t_far) & (t_near < t_max)
    return hit, t_near


def _leaf_candidates_hit(scene, rays, kinds, idxs, t_min):
    """Test (N, L) gathered (kind, index) candidates; (t, t_exit) each."""
    n, l = kinds.shape
    o = jnp.broadcast_to(rays.origin[:, None], (n, l, 3)).reshape(-1, 3)
    d = jnp.broadcast_to(rays.direction[:, None], (n, l, 3)).reshape(-1, 3)
    k = kinds.reshape(-1)
    i = idxs.reshape(-1)

    t = jnp.full((n * l,), BIG)
    t_exit = jnp.full((n * l,), BIG)

    sph = scene.spheres
    if sph.center.shape[0] > 0:
        gi = jnp.clip(i, 0, sph.center.shape[0] - 1)
        centers = sph.center[gi]
        if sph.move_offset is not None:
            time = jnp.broadcast_to(rays.time[:, None], (n, l)).reshape(-1)
            t0r = sph.time_range[gi, 0]
            t1r = sph.time_range[gi, 1]
            denom = jnp.where(t1r == t0r, 1.0, t1r - t0r)
            w = jnp.clip((time - t0r) / denom, 0.0, 1.0)
            centers = centers + sph.move_offset[gi] * w[:, None]
        ts, te = geometry.sphere_hit_single(o, d, centers, sph.radius[gi], t_min)
        is_k = k == EntityKind.SPHERE
        t = jnp.where(is_k, ts, t)
        t_exit = jnp.where(is_k, te, t_exit)

    rct = scene.rects
    if rct.rot.shape[0] > 0:
        gi = jnp.clip(i, 0, rct.rot.shape[0] - 1)
        ts = geometry.rect_hit_single(
            o, d, rct.rot[gi], rct.pos[gi], rct.xy_from[gi], rct.xy_to[gi], t_min
        )
        is_k = k == EntityKind.RECT
        t = jnp.where(is_k, ts, t)

    box = scene.boxes
    if box.rot.shape[0] > 0:
        gi = jnp.clip(i, 0, box.rot.shape[0] - 1)
        ts, te = geometry.box_hit_single(
            o, d, box.rot[gi], box.pos[gi], box.extents[gi], t_min
        )
        is_k = k == EntityKind.BOX
        t = jnp.where(is_k, ts, t)
        t_exit = jnp.where(is_k, te, t_exit)

    tri = scene.triangles
    if tri.vert0.shape[0] > 0:
        gi = jnp.clip(i, 0, tri.vert0.shape[0] - 1)
        ts = geometry.triangle_hit_single(
            o, d, tri.edge_a[gi], tri.edge_b[gi], tri.vert0[gi], t_min
        )
        is_k = k == EntityKind.TRIANGLE
        t = jnp.where(is_k, ts, t)

    t = jnp.where(k >= 0, t, BIG)
    t_exit = jnp.where(k >= 0, t_exit, BIG)
    return t.reshape(n, l), t_exit.reshape(n, l)


def bvh_nearest(
    scene,
    rays: Rays,
    t_min: float = 0.0,
    stack_capacity: int = 24,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Nearest hit of every ray via BVH traversal.

    Returns (t, kind, index, t_exit) in the same convention as
    intersect.nearest_hit (BIG / -1 on miss).
    """
    bvh = scene.bvh
    n = rays.origin.shape[0]
    inv_d = geometry.safe_invert(rays.direction)
    row = jnp.arange(n)

    stack0 = jnp.zeros((n, stack_capacity), jnp.int32)  # root pre-pushed
    state0 = (
        stack0,
        jnp.ones((n,), jnp.int32),  # ptr
        jnp.full((n,), BIG),  # best_t
        jnp.full((n,), -1, jnp.int32),  # best_kind
        jnp.zeros((n,), jnp.int32),  # best_index
        jnp.full((n,), BIG),  # best_exit
    )

    def cond(state):
        return jnp.any(state[1] > 0)

    def body(state):
        stack, ptr, best_t, best_kind, best_index, best_exit = state
        active = ptr > 0
        top = jnp.maximum(ptr - 1, 0)
        node = jnp.where(active, stack[row, top], 0)
        ptr = jnp.where(active, ptr - 1, ptr)

        is_leaf = active & (bvh.leaf_id[node] >= 0)

        # ---- leaf: vectorized candidate test ------------------------------
        lid = jnp.maximum(bvh.leaf_id[node], 0)
        kinds = jnp.where(is_leaf[:, None], bvh.leaf_kind[lid], -1)
        idxs = bvh.leaf_index[lid]
        t_cand, exit_cand = _leaf_candidates_hit(scene, rays, kinds, idxs, t_min)
        j = jnp.argmin(t_cand, axis=1)
        t_leaf = t_cand[row, j]
        closer = is_leaf & (t_leaf < best_t)
        best_t = jnp.where(closer, t_leaf, best_t)
        best_kind = jnp.where(closer, kinds[row, j], best_kind)
        best_index = jnp.where(closer, idxs[row, j], best_index)
        best_exit = jnp.where(closer, exit_cand[row, j], best_exit)

        # ---- internal: ordered child push ----------------------------------
        internal = active & ~is_leaf
        lc = jnp.maximum(bvh.left[node], 0)
        rc = jnp.maximum(bvh.right[node], 0)
        hit_l, tl = _aabb_entry(
            rays.origin, inv_d, bvh.node_min[lc], bvh.node_max[lc], t_min, best_t
        )
        hit_r, tr = _aabb_entry(
            rays.origin, inv_d, bvh.node_min[rc], bvh.node_max[rc], t_min, best_t
        )
        hit_l = internal & hit_l
        hit_r = internal & hit_r
        l_near = tl <= tr
        near = jnp.where(l_near, lc, rc)
        far = jnp.where(l_near, rc, lc)
        hit_near = jnp.where(l_near, hit_l, hit_r)
        hit_far = jnp.where(l_near, hit_r, hit_l)

        # push far first so near pops first
        pos = jnp.minimum(ptr, stack_capacity - 1)
        stack = stack.at[row, pos].set(
            jnp.where(hit_far, far, stack[row, pos])
        )
        ptr = ptr + hit_far.astype(jnp.int32)
        pos = jnp.minimum(ptr, stack_capacity - 1)
        stack = stack.at[row, pos].set(
            jnp.where(hit_near, near, stack[row, pos])
        )
        ptr = ptr + hit_near.astype(jnp.int32)
        ptr = jnp.minimum(ptr, stack_capacity)

        return stack, ptr, best_t, best_kind, best_index, best_exit

    state = jax.lax.while_loop(cond, body, state0)
    _, _, best_t, best_kind, best_index, best_exit = state
    return best_t, best_kind, best_index, best_exit
