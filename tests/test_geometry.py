"""Unit tests for intersection ops against hand-computed cases.

The math in the reference's HitTests.cs is exactly specified; these vectors
were derived by hand from the same closed forms (SURVEY.md section 4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from raytracing_in_one_weekend_tpu.ops import geometry
from raytracing_in_one_weekend_tpu.scene.scene import axis_angle_quat


def _ray(o, d):
    o = jnp.asarray([o], jnp.float32)
    d = jnp.asarray([d], jnp.float32)
    return o, d / jnp.linalg.norm(d)


class TestSphere:
    def test_head_on_hit(self):
        o, d = _ray((0, 0, 0), (0, 0, -1))
        t_entry, t_exit = geometry.sphere_hit_all(
            o, d, jnp.zeros(1), jnp.asarray([[0.0, 0.0, -2.0]]), jnp.asarray([0.5])
        )
        assert np.isclose(t_entry[0, 0], 1.5, atol=1e-5)
        assert np.isclose(t_exit[0, 0], 2.5, atol=1e-5)

    def test_miss(self):
        o, d = _ray((0, 0, 0), (0, 1, 0))
        t_entry, _ = geometry.sphere_hit_all(
            o, d, jnp.zeros(1), jnp.asarray([[0.0, 0.0, -2.0]]), jnp.asarray([0.5])
        )
        assert t_entry[0, 0] >= geometry.BIG

    def test_inside_sphere_hits_far_root(self):
        o, d = _ray((0, 0, 0), (0, 0, -1))
        t_entry, t_exit = geometry.sphere_hit_all(
            o, d, jnp.zeros(1), jnp.asarray([[0.0, 0.0, 0.0]]), jnp.asarray([2.0])
        )
        assert np.isclose(t_entry[0, 0], 2.0, atol=1e-5)
        assert np.isclose(t_exit[0, 0], 2.0, atol=1e-5)

    def test_tangent_grazing(self):
        o, d = _ray((0, 0.5, 0), (0, 0, -1))
        t_entry, _ = geometry.sphere_hit_all(
            o, d, jnp.zeros(1), jnp.asarray([[0.0, 0.0, -2.0]]), jnp.asarray([0.5])
        )
        # discriminant == 0 -> no hit (reference requires > 0)
        assert t_entry[0, 0] >= geometry.BIG

    def test_motion_blur_center_moves(self):
        centers = jnp.asarray([[0.0, 0.0, -2.0]])
        radii = jnp.asarray([0.5])
        offsets = jnp.asarray([[2.0, 0.0, 0.0]])
        ranges = jnp.asarray([[0.0, 1.0]])
        o, d = _ray((0, 0, 0), (0, 0, -1))
        # time 0: sphere on the axis -> hit
        t0, _ = geometry.sphere_hit_all(
            o, d, jnp.zeros(1), centers, radii, offsets, ranges
        )
        assert t0[0, 0] < geometry.BIG
        # time 1: sphere moved to x=2 -> miss
        t1, _ = geometry.sphere_hit_all(
            o, d, jnp.ones(1), centers, radii, offsets, ranges
        )
        assert t1[0, 0] >= geometry.BIG

    def test_matches_reference_quadratic(self):
        rng = np.random.default_rng(0)
        n, s = 64, 32
        o = rng.normal(size=(n, 3)).astype(np.float32) * 3
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        c = rng.normal(size=(s, 3)).astype(np.float32) * 3
        r = rng.uniform(0.2, 1.5, size=s).astype(np.float32)

        t_entry, _ = geometry.sphere_hit_all(
            jnp.asarray(o), jnp.asarray(d), jnp.zeros(n), jnp.asarray(c), jnp.asarray(r)
        )
        # NumPy oracle: reference HitTests.cs:23-60 quadratic.
        oc = o[:, None] - c[None]  # (n,s,3)
        b = np.sum(oc * d[:, None], -1)
        cc = np.sum(oc * oc, -1) - (r * r)[None]
        disc = b * b - cc
        expect = np.full((n, s), geometry.BIG, np.float32)
        mask = disc > 0
        sq = np.sqrt(np.maximum(disc, 0))
        near = -b - sq
        far = -b + sq
        expect = np.where(mask & (near > 0), near, np.where(mask & (far > 0), far, geometry.BIG))
        np.testing.assert_allclose(np.asarray(t_entry), expect, rtol=2e-4, atol=2e-4)


class TestRect:
    def test_frontal_hit(self):
        o, d = _ray((0.2, 0.3, 1.0), (0, 0, -1))
        t, n = geometry.rect_hit_all(
            o, d,
            jnp.asarray([[0.0, 0.0, 0.0, 1.0]]),
            jnp.asarray([[0.0, 0.0, 0.0]]),
            jnp.asarray([[-0.5, -0.5]]),
            jnp.asarray([[0.5, 0.5]]),
        )
        assert np.isclose(t[0, 0], 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(n[0, 0]), [0, 0, 1], atol=1e-6)

    def test_one_sided(self):
        # Approaching from behind (local dir.z > 0) must miss
        # (reference: HitTests.cs:69 requires Direction.z < 0).
        o, d = _ray((0.0, 0.0, -1.0), (0, 0, 1))
        t, _ = geometry.rect_hit_all(
            o, d,
            jnp.asarray([[0.0, 0.0, 0.0, 1.0]]),
            jnp.asarray([[0.0, 0.0, 0.0]]),
            jnp.asarray([[-0.5, -0.5]]),
            jnp.asarray([[0.5, 0.5]]),
        )
        assert t[0, 0] >= geometry.BIG

    def test_outside_bounds_misses(self):
        o, d = _ray((0.6, 0.0, 1.0), (0, 0, -1))
        t, _ = geometry.rect_hit_all(
            o, d,
            jnp.asarray([[0.0, 0.0, 0.0, 1.0]]),
            jnp.asarray([[0.0, 0.0, 0.0]]),
            jnp.asarray([[-0.5, -0.5]]),
            jnp.asarray([[0.5, 0.5]]),
        )
        assert t[0, 0] >= geometry.BIG

    def test_rotated_rect(self):
        # Rect rotated to face +X; ray along -X hits it.
        q = axis_angle_quat((0, 1, 0), 90.0)
        o, d = _ray((2.0, 0.0, 0.0), (-1, 0, 0))
        t, n = geometry.rect_hit_all(
            o, d,
            jnp.asarray([q]),
            jnp.asarray([[0.0, 0.0, 0.0]]),
            jnp.asarray([[-0.5, -0.5]]),
            jnp.asarray([[0.5, 0.5]]),
        )
        assert np.isclose(t[0, 0], 2.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(n[0, 0]), [1, 0, 0], atol=1e-5)


class TestBox:
    def test_frontal_hit_and_normal(self):
        o, d = _ray((0, 0, 5), (0, 0, -1))
        t, n, t_exit = geometry.box_hit_all(
            o, d,
            jnp.asarray([[0.0, 0.0, 0.0, 1.0]]),
            jnp.asarray([[0.0, 0.0, 0.0]]),
            jnp.asarray([[1.0, 1.0, 1.0]]),
        )
        assert np.isclose(t[0, 0], 4.0, atol=1e-4)
        assert np.isclose(t_exit[0, 0], 6.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(n[0, 0]), [0, 0, 1], atol=1e-5)

    def test_miss(self):
        o, d = _ray((0, 5, 5), (0, 0, -1))
        t, _, _ = geometry.box_hit_all(
            o, d,
            jnp.asarray([[0.0, 0.0, 0.0, 1.0]]),
            jnp.asarray([[0.0, 0.0, 0.0]]),
            jnp.asarray([[1.0, 1.0, 1.0]]),
        )
        assert t[0, 0] >= geometry.BIG

    def test_rotated_box(self):
        q = axis_angle_quat((0, 1, 0), 45.0)
        o, d = _ray((0.3, 0.0, 5.0), (0, 0, -1))
        t, _, _ = geometry.box_hit_all(
            o, d,
            jnp.asarray([q]),
            jnp.asarray([[0.0, 0.0, 0.0]]),
            jnp.asarray([[1.0, 1.0, 1.0]]),
        )
        # NumPy oracle: slab test in local space.
        c, s = np.cos(np.pi / 4), np.sin(np.pi / 4)
        rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])  # world-from-local
        o_l = rot.T @ np.array([0.3, 0.0, 5.0])
        d_l = rot.T @ np.array([0.0, 0.0, -1.0])
        t0 = (-1.0 - o_l) / d_l
        t1 = (1.0 - o_l) / d_l
        expected = np.max(np.minimum(t0, t1))
        assert np.isclose(t[0, 0], expected, atol=1e-3)


class TestTriangle:
    def _tri(self):
        v0 = np.array([0.0, 0.0, 0.0], np.float32)
        v1 = np.array([1.0, 0.0, 0.0], np.float32)
        v2 = np.array([0.0, 1.0, 0.0], np.float32)
        face_n = np.array([0.0, 0.0, 1.0], np.float32)
        normals = np.stack([face_n] * 3, axis=-1)[None]
        uvs = np.stack(
            [np.array([0.0, 0.0]), np.array([1.0, 0.0]), np.array([0.0, 1.0])],
            axis=-1,
        )[None]
        return (
            jnp.asarray((v2 - v0)[None]),
            jnp.asarray((v1 - v0)[None]),
            jnp.asarray(v0[None]),
            jnp.asarray(normals),
            jnp.asarray(uvs),
        )

    def test_hit_with_barycentric_uv(self):
        ea, eb, v0, normals, uvs = self._tri()
        o, d = _ray((0.25, 0.25, 1.0), (0, 0, -1))
        t, n, uv = geometry.triangle_hit_all(o, d, ea, eb, v0, normals, uvs)
        assert np.isclose(t[0, 0], 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(n[0, 0]), [0, 0, 1], atol=1e-6)
        np.testing.assert_allclose(np.asarray(uv[0, 0]), [0.25, 0.25], atol=1e-5)

    def test_outside_misses(self):
        ea, eb, v0, normals, uvs = self._tri()
        o, d = _ray((0.9, 0.9, 1.0), (0, 0, -1))
        t, _, _ = geometry.triangle_hit_all(o, d, ea, eb, v0, normals, uvs)
        assert t[0, 0] >= geometry.BIG

    def test_parallel_ray_misses(self):
        ea, eb, v0, normals, uvs = self._tri()
        o, d = _ray((0.25, 0.25, 1.0), (1, 0, 0))
        t, _, _ = geometry.triangle_hit_all(o, d, ea, eb, v0, normals, uvs)
        assert t[0, 0] >= geometry.BIG


class TestAabb:
    @pytest.mark.parametrize(
        "o,d,expected",
        [
            ((0, 0, 5), (0, 0, -1), True),
            ((0, 5, 5), (0, 0, -1), False),
            ((0, 0, 5), (0, 0, 1), False),  # behind
            ((0, 0, 0), (0, 0, 1), True),  # inside
        ],
    )
    def test_slab(self, o, d, expected):
        o = jnp.asarray(o, jnp.float32)
        d = jnp.asarray(d, jnp.float32)
        inv = geometry.safe_invert(d)
        hit = geometry.aabb_hit(
            o, inv, jnp.asarray([-1.0, -1.0, -1.0]), jnp.asarray([1.0, 1.0, 1.0])
        )
        assert bool(hit) == expected

    def test_axis_parallel_ray(self):
        # direction has zeros: safe_invert must produce inf, not NaN
        # (reference: SampleBatchJob.cs:409-412).
        o = jnp.asarray([0.0, 0.0, 5.0])
        d = jnp.asarray([0.0, 0.0, -1.0])
        inv = geometry.safe_invert(d)
        assert np.all(np.isinf(np.asarray(inv[:2])))


class TestSphereTexcoords:
    """Shirley Book-2 spherical mapping on analytic spheres (deliberate
    deviation from the reference's texCoord=0 at HitTests.cs:123)."""

    def test_uv_at_canonical_points(self):
        from raytracing_in_one_weekend_tpu.core.ray import Rays
        from raytracing_in_one_weekend_tpu.ops import intersect
        from raytracing_in_one_weekend_tpu.scene.scene import SceneBuilder

        b = SceneBuilder()
        b.add_sphere((0.0, 0.0, 0.0), 1.0, b.lambert((1.0, 1.0, 1.0)))
        scene = b.build()
        # rays hitting +x, -x, +y (north pole toward v=1), -y, +z, -z
        origins = jnp.asarray([
            [3.0, 0.0, 0.0], [-3.0, 0.0, 0.0],
            [0.0, 3.0, 0.0], [0.0, -3.0, 0.0],
            [0.0, 0.0, 3.0], [0.0, 0.0, -3.0],
        ])
        dirs = -origins / 3.0
        hit = intersect.nearest_hit(
            scene, Rays(origins, dirs, jnp.zeros(6))
        )
        uv = np.asarray(hit.uv)
        # u = (atan2(-z, x) + pi) / 2pi ; v = acos(-y) / pi
        np.testing.assert_allclose(uv[0], [0.5, 0.5], atol=1e-5)  # +x
        expect_mx_u = uv[1, 0]  # -x: atan2(0,-1)=pi -> u=1 (or 0, same seam)
        assert abs(expect_mx_u - 1.0) < 1e-5 or abs(expect_mx_u) < 1e-5
        np.testing.assert_allclose(uv[2, 1], 1.0, atol=1e-5)  # +y pole
        np.testing.assert_allclose(uv[3, 1], 0.0, atol=1e-5)  # -y pole
        np.testing.assert_allclose(uv[4], [0.25, 0.5], atol=1e-5)  # +z
        np.testing.assert_allclose(uv[5], [0.75, 0.5], atol=1e-5)  # -z
