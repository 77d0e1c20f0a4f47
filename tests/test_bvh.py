"""BVH build + traversal tests.

Oracles: structural invariants of the flattened tree (BvhNodeData.cs
semantics) and exact agreement between BVH traversal and the brute-force
nearest-hit pass over every entity kind; native (C++) builder must emit
bit-identical arrays to the NumPy builder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracing_in_one_weekend_tpu.core.ray import Rays
from raytracing_in_one_weekend_tpu.models import book_scenes, testbeds
from raytracing_in_one_weekend_tpu.native import bvh_native
from raytracing_in_one_weekend_tpu.ops import bvh_traverse, intersect
from raytracing_in_one_weekend_tpu.scene import bvh as bvh_mod


def _random_rays(n, key, origin_scale=15.0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    origin = jax.random.uniform(k1, (n, 3), minval=-1.0, maxval=1.0)
    origin = origin * origin_scale + jnp.asarray([0.0, 3.0, 0.0])
    target = jax.random.uniform(k2, (n, 3), minval=-4.0, maxval=4.0)
    direction = target - origin
    direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    return Rays(origin, direction, jnp.zeros((n,)))


class TestBuilder:
    def test_structural_invariants(self):
        scene, _ = book_scenes.cover_scene(grid=6)
        kinds, indices, lo, hi = bvh_mod.entity_aabbs(scene)
        bvh = bvh_mod.build_bvh(kinds, indices, lo, hi, max_depth=12)

        node_min = np.asarray(bvh.node_min)
        node_max = np.asarray(bvh.node_max)
        left = np.asarray(bvh.left)
        right = np.asarray(bvh.right)
        leaf_id = np.asarray(bvh.leaf_id)
        m = left.shape[0]

        # exactly one of (children / leaf) per node
        is_leaf = leaf_id >= 0
        assert np.all((left >= 0) == ~is_leaf)
        assert np.all((right >= 0) == ~is_leaf)

        # children contained in parents
        for me in range(m):
            if is_leaf[me]:
                continue
            for c in (left[me], right[me]):
                assert np.all(node_min[me] <= node_min[c] + 1e-6)
                assert np.all(node_max[me] >= node_max[c] - 1e-6)

        # leaves partition all entities exactly once
        leaf_kind = np.asarray(bvh.leaf_kind)
        leaf_index = np.asarray(bvh.leaf_index)
        seen = set()
        for li in range(leaf_kind.shape[0]):
            for k in range(leaf_kind.shape[1]):
                if leaf_kind[li, k] >= 0:
                    seen.add((int(leaf_kind[li, k]), int(leaf_index[li, k])))
        assert seen == {
            (int(k), int(i)) for k, i in zip(kinds, indices)
        }
        assert len(seen) == kinds.shape[0]

        # root encloses everything
        assert np.all(node_min[0] <= lo.min(0) + 1e-6)
        assert np.all(node_max[0] >= hi.max(0) - 1e-6)

    def test_max_depth_respected(self):
        scene, _ = book_scenes.cover_scene(grid=6)
        kinds, indices, lo, hi = bvh_mod.entity_aabbs(scene)
        bvh = bvh_mod.build_bvh(kinds, indices, lo, hi, max_depth=3)
        left = np.asarray(bvh.left)
        right = np.asarray(bvh.right)

        def depth(node):
            if left[node] < 0:
                return 0
            return 1 + max(depth(left[node]), depth(right[node]))

        assert depth(0) <= 3


class TestTraversalMatchesBruteForce:
    @pytest.mark.parametrize(
        "scene_fn",
        [
            lambda: book_scenes.cover_scene(grid=4),
            book_scenes.cornell_box,
            testbeds.triangle_test,
            lambda: book_scenes.cover_scene(grid=3, motion_blur=True),
        ],
        ids=["spheres", "rects_boxes", "triangles", "motion"],
    )
    def test_nearest_matches(self, scene_fn):
        scene, _ = scene_fn()
        rays = _random_rays(512, key=1)
        if scene.flags.has_motion:
            rays = Rays(
                rays.origin, rays.direction,
                jax.random.uniform(jax.random.PRNGKey(9), (512,)),
            )
        brute = intersect.nearest_hit(scene, rays)

        scene_bvh = bvh_mod.attach_bvh(scene, native=False)
        fast = intersect.nearest_hit(scene_bvh, rays)

        # brute force evaluates the sphere quadratic in the MXU-expanded
        # form, the BVH leaf test in the direct (o-c) form; they agree to
        # f32 conditioning, not bit-exactly.
        np.testing.assert_allclose(
            np.asarray(fast.t), np.asarray(brute.t), rtol=2e-3, atol=1e-3
        )
        hit = np.asarray(brute.hit)
        np.testing.assert_array_equal(np.asarray(fast.hit), hit)
        # same winner where there is a hit (ties can differ on t only)
        same = (np.asarray(fast.kind) == np.asarray(brute.kind)) & (
            np.asarray(fast.index) == np.asarray(brute.index)
        )
        tie = np.isclose(np.asarray(fast.t), np.asarray(brute.t), rtol=2e-3)
        assert np.all(~hit | same | tie)
        np.testing.assert_allclose(
            np.asarray(fast.t_exit)[hit & same],
            np.asarray(brute.t_exit)[hit & same],
            rtol=2e-3, atol=1e-3,
        )

    def test_under_jit(self):
        scene, _ = book_scenes.cover_scene(grid=3)
        scene = bvh_mod.attach_bvh(scene, native=False)
        rays = _random_rays(128, key=2)

        @jax.jit
        def q(scene, rays):
            return intersect.nearest_hit(scene, rays).t

        t = q(scene, rays)
        assert np.isfinite(np.asarray(t)[np.asarray(t) < bvh_traverse.BIG]).all()

    def test_render_image_matches(self):
        from raytracing_in_one_weekend_tpu.core import camera as camera_mod
        from raytracing_in_one_weekend_tpu.render import renderer

        scene, cs = book_scenes.three_spheres()
        cam = camera_mod.make_camera(
            cs.origin, cs.look_at, cs.up, cs.vertical_fov, 1.0,
            focus_distance=cs.focus_distance,
        )
        img_a = renderer.render_image(
            scene, cam, jax.random.PRNGKey(0),
            width=32, height=32, samples_per_pixel=4, trace_depth=6,
        )
        scene_bvh = bvh_mod.attach_bvh(scene, native=False)
        img_b = renderer.render_image(
            scene_bvh, cam, jax.random.PRNGKey(0),
            width=32, height=32, samples_per_pixel=4, trace_depth=6,
        )
        np.testing.assert_allclose(
            np.asarray(img_a.color), np.asarray(img_b.color),
            rtol=1e-4, atol=1e-4,
        )


class TestNativeBuilder:
    def test_native_matches_numpy(self):
        if not bvh_native.available():
            pytest.skip("native toolchain unavailable")
        scene, _ = book_scenes.cover_scene(grid=5)
        kinds, indices, lo, hi = bvh_mod.entity_aabbs(scene)
        a = bvh_mod.build_bvh(kinds, indices, lo, hi, max_depth=14, leaf_size=4)
        b = bvh_native.build_bvh(kinds, indices, lo, hi, max_depth=14, leaf_size=4)
        for fa, fb, name in zip(a, b, a._fields):
            np.testing.assert_array_equal(
                np.asarray(fa), np.asarray(fb), err_msg=name
            )

    def test_attach_bvh_auto(self):
        scene, _ = book_scenes.single_sphere()
        s = bvh_mod.attach_bvh(scene)
        assert s.bvh is not None
