"""Host-side BVH build + flatten.

Reference:
  * CreateBvhBuildingEntitiesJob (Unity/BvhNodeData.cs:83-92): wrap each
    entity with its world-space, motion-swept AABB (:23-80).
  * BuildBvhJob / BvhNodeData ctor (Unity/BvhNodeData.cs:109-238):
    recursive top-down build — enclose all, pick the longest axis, sort
    entities by min bound along it, partition at the first entity past the
    spatial midpoint, leaf at maxDepth or small counts; leaf entities are
    copied contiguously so a leaf is a span.
  * BuildRuntimeBvhJob (Runtime/Jobs/BuildRuntimeBvhJob.cs:11-40): flatten
    to a pointer-linked node array with the root at index 0.

TPU-native redesign: pointers become int32 indices; leaf spans are padded
to one static width (the array shape carries the compile-time bound, so
the traversal's inner candidate test is a fixed-size vectorized batch
instead of a dynamic loop).  The build itself runs in NumPy on the host —
geometry compile is control-plane work, exactly like the reference's
editor-side build — with an optional C++ builder (native/) for large
scenes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class BvhArrays(NamedTuple):
    """Flattened BVH; root is node 0.  Leaf spans padded to a static width."""

    node_min: jnp.ndarray  # (M, 3) float32
    node_max: jnp.ndarray  # (M, 3)
    left: jnp.ndarray  # (M,) int32, -1 when leaf
    right: jnp.ndarray  # (M,) int32, -1 when leaf
    leaf_id: jnp.ndarray  # (M,) int32 into leaf tables, -1 when internal
    leaf_kind: jnp.ndarray  # (NL, L) int32 EntityKind, -1 padding
    leaf_index: jnp.ndarray  # (NL, L) int32 within-kind entity index


# -- world-space AABBs (BvhNodeData.cs:23-80) --------------------------------


def entity_aabbs(scene) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(kind, index, aabb_min, aabb_max) for every entity, motion-swept."""
    from raytracing_in_one_weekend_tpu.scene.scene import EntityKind

    kinds, indices, mins, maxs = [], [], [], []

    def add(kind, i, lo, hi):
        kinds.append(int(kind))
        indices.append(i)
        mins.append(lo)
        maxs.append(hi)

    sph = scene.spheres
    centers = np.asarray(sph.center)
    radii = np.abs(np.asarray(sph.radius))
    move = None if sph.move_offset is None else np.asarray(sph.move_offset)
    for i in range(centers.shape[0]):
        lo = centers[i] - radii[i]
        hi = centers[i] + radii[i]
        if move is not None:
            # Motion sweep: union of endpoint AABBs (BvhNodeData.cs:46-56).
            lo = np.minimum(lo, centers[i] + move[i] - radii[i])
            hi = np.maximum(hi, centers[i] + move[i] + radii[i])
        add(EntityKind.SPHERE, i, lo, hi)

    rct = scene.rects
    if rct.rot.shape[0] > 0:
        rot = np.asarray(rct.rot)
        pos = np.asarray(rct.pos)
        xy_from = np.asarray(rct.xy_from)
        xy_to = np.asarray(rct.xy_to)
        for i in range(rot.shape[0]):
            corners = np.array(
                [
                    [xy_from[i, 0], xy_from[i, 1], -1e-3],
                    [xy_to[i, 0], xy_from[i, 1], -1e-3],
                    [xy_from[i, 0], xy_to[i, 1], -1e-3],
                    [xy_to[i, 0], xy_to[i, 1], -1e-3],
                    [xy_from[i, 0], xy_from[i, 1], 1e-3],
                    [xy_to[i, 0], xy_from[i, 1], 1e-3],
                    [xy_from[i, 0], xy_to[i, 1], 1e-3],
                    [xy_to[i, 0], xy_to[i, 1], 1e-3],
                ],
                np.float32,
            )
            world = _quat_rotate_np(rot[i], corners) + pos[i]
            add(EntityKind.RECT, i, world.min(0), world.max(0))

    box = scene.boxes
    if box.rot.shape[0] > 0:
        rot = np.asarray(box.rot)
        pos = np.asarray(box.pos)
        ext = np.asarray(box.extents)
        signs = np.array(
            [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
            np.float32,
        )
        for i in range(rot.shape[0]):
            world = _quat_rotate_np(rot[i], signs * ext[i]) + pos[i]
            add(EntityKind.BOX, i, world.min(0), world.max(0))

    tri = scene.triangles
    if tri.vert0.shape[0] > 0:
        v0 = np.asarray(tri.vert0)
        ea = np.asarray(tri.edge_a)  # v2 - v0
        eb = np.asarray(tri.edge_b)  # v1 - v0
        for i in range(v0.shape[0]):
            verts = np.stack([v0[i], v0[i] + eb[i], v0[i] + ea[i]])
            # Padding along degenerate axes (Triangle.cs:37-50).
            add(EntityKind.TRIANGLE, i, verts.min(0) - 1e-3, verts.max(0) + 1e-3)

    if not kinds:
        raise ValueError("cannot build a BVH for an empty scene")
    return (
        np.asarray(kinds, np.int32),
        np.asarray(indices, np.int32),
        np.stack(mins).astype(np.float32),
        np.stack(maxs).astype(np.float32),
    )


def _quat_rotate_np(q: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Rotate points v (K,3) by quaternion q (x,y,z,w)."""
    xyz, w = q[:3], q[3]
    t = 2.0 * np.cross(xyz, v)
    return v + w * t + np.cross(xyz, t)


# -- recursive build (BvhNodeData.cs:109-238) --------------------------------


def build_bvh(
    kinds: np.ndarray,
    indices: np.ndarray,
    aabb_min: np.ndarray,
    aabb_max: np.ndarray,
    max_depth: int = 16,
    leaf_size: int = 4,
) -> BvhArrays:
    """Longest-axis midpoint-partition build, flattened with root at 0."""
    n = kinds.shape[0]
    order = np.arange(n)

    node_min, node_max = [], []
    left, right, leaf_id = [], [], []
    leaf_entities: list[np.ndarray] = []

    def new_node() -> int:
        node_min.append(None)
        node_max.append(None)
        left.append(-1)
        right.append(-1)
        leaf_id.append(-1)
        return len(left) - 1

    def build(ids: np.ndarray, depth: int) -> int:
        me = new_node()
        lo = aabb_min[ids].min(0)
        hi = aabb_max[ids].max(0)
        node_min[me], node_max[me] = lo, hi

        if depth >= max_depth or ids.shape[0] <= leaf_size:
            leaf_id[me] = len(leaf_entities)
            leaf_entities.append(ids)
            return me

        extent = hi - lo
        axis = int(np.argmax(extent))
        ids = ids[np.argsort(aabb_min[ids, axis], kind="stable")]
        # Partition at the first entity whose min bound passes the spatial
        # midpoint (BvhNodeData.cs:179-199); degenerate distributions fall
        # back to a median split so both children are non-empty.
        mid = lo[axis] + extent[axis] * 0.5
        split = int(np.searchsorted(aabb_min[ids, axis], mid, side="left"))
        if split <= 0 or split >= ids.shape[0]:
            split = ids.shape[0] // 2
        l = build(ids[:split], depth + 1)
        r = build(ids[split:], depth + 1)
        left[me], right[me] = l, r
        return me

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 4 * max_depth + 100))
    try:
        build(order, 0)
    finally:
        sys.setrecursionlimit(old_limit)

    # Pad leaves to one static width (the biggest leaf).
    width = max(ids.shape[0] for ids in leaf_entities)
    nl = len(leaf_entities)
    leaf_kind = np.full((nl, width), -1, np.int32)
    leaf_index = np.zeros((nl, width), np.int32)
    for li, ids in enumerate(leaf_entities):
        leaf_kind[li, : ids.shape[0]] = kinds[ids]
        leaf_index[li, : ids.shape[0]] = indices[ids]

    return BvhArrays(
        node_min=jnp.asarray(np.stack(node_min)),
        node_max=jnp.asarray(np.stack(node_max)),
        left=jnp.asarray(left, jnp.int32),
        right=jnp.asarray(right, jnp.int32),
        leaf_id=jnp.asarray(leaf_id, jnp.int32),
        leaf_kind=jnp.asarray(leaf_kind),
        leaf_index=jnp.asarray(leaf_index),
    )


def attach_bvh(scene, max_depth: int = 16, leaf_size: int = 4, native: bool | None = None):
    """Build a BVH for `scene` and return the scene with it attached.

    native=True forces the C++ builder (native/bvh_builder.cpp), False the
    NumPy one; None auto-selects (C++ when its shared library is built).
    """
    kinds, indices, lo, hi = entity_aabbs(scene)
    if native is not False:
        from raytracing_in_one_weekend_tpu.native import bvh_native

        if bvh_native.available():
            bvh = bvh_native.build_bvh(
                kinds, indices, lo, hi, max_depth=max_depth, leaf_size=leaf_size
            )
            return scene._replace(bvh=bvh)
        if native is True:
            raise RuntimeError(
                "native BVH builder requested but its library is not built"
            )
    bvh = build_bvh(kinds, indices, lo, hi, max_depth=max_depth, leaf_size=leaf_size)
    return scene._replace(bvh=bvh)
