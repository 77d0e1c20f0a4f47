"""Sampling / camera / math tests with statistical and analytic oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracing_in_one_weekend_tpu.core import camera as camera_mod
from raytracing_in_one_weekend_tpu.core import math3, sampling


def _uniforms(n, seed=0):
    key = jax.random.PRNGKey(seed)
    return jax.random.uniform(key, (2, n))


class TestSampling:
    def test_unit_disk_inside(self):
        u, v = _uniforms(4096)
        pts = sampling.in_unit_disk(u, v)
        r = np.linalg.norm(np.asarray(pts), axis=-1)
        assert np.all(r <= 1.0 + 1e-6)
        # uniform in area -> mean radius = 2/3
        assert np.isclose(r.mean(), 2.0 / 3.0, atol=0.02)

    def test_cosine_hemisphere_distribution(self):
        u, v = _uniforms(8192)
        n = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (8192, 3))
        d = sampling.cosine_hemisphere(u, v, n)
        d = np.asarray(d)
        assert np.all(d[:, 1] >= -1e-6)  # in hemisphere
        np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
        # E[cos theta] = 2/3 for pdf = cos/pi
        assert np.isclose(d[:, 1].mean(), 2.0 / 3.0, atol=0.02)

    def test_uniform_hemisphere(self):
        u, v = _uniforms(8192)
        n = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (8192, 3))
        d = np.asarray(sampling.uniform_hemisphere(u, v, n))
        assert np.all(d[:, 1] >= -1e-6)
        # E[cos theta] = 1/2 for uniform hemisphere
        assert np.isclose(d[:, 1].mean(), 0.5, atol=0.02)

    def test_unit_sphere(self):
        u, v = _uniforms(8192)
        d = np.asarray(sampling.unit_sphere(u, v))
        np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
        assert abs(d.mean(0)).max() < 0.03

    def test_schlick_limits(self):
        # normal incidence on glass: r0 = ((1-1.5)/(1+1.5))^2 = 0.04
        assert np.isclose(float(sampling.schlick(jnp.asarray(1.0), 1.5)), 0.04)
        # grazing: -> 1
        assert np.isclose(float(sampling.schlick(jnp.asarray(0.0), 1.5)), 1.0)

    def test_refract_snell(self):
        v = jnp.asarray([[0.0, -1.0, 0.0]])
        n = jnp.asarray([[0.0, 1.0, 0.0]])
        refracted, ok = sampling.refract(v, n, jnp.asarray([1.0 / 1.5]))
        assert bool(ok[0])
        np.testing.assert_allclose(np.asarray(refracted[0]), [0, -1, 0], atol=1e-6)

        # total internal reflection: shallow angle from dense medium
        angle = np.deg2rad(80.0)
        v = jnp.asarray([[np.sin(angle), -np.cos(angle), 0.0]], jnp.float32)
        _, ok = sampling.refract(v, n, jnp.asarray([1.5]))
        assert not bool(ok[0])

    def test_orthonormal_basis(self):
        rng = np.random.default_rng(3)
        n = rng.normal(size=(256, 3)).astype(np.float32)
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        t, b = math3.orthonormal_basis(jnp.asarray(n))
        t, b = np.asarray(t), np.asarray(b)
        np.testing.assert_allclose(np.sum(t * n, -1), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.sum(b * n, -1), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.sum(t * b, -1), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(t, axis=-1), 1.0, atol=1e-5)


class TestCamera:
    def test_center_ray_points_at_look_at(self):
        cam = camera_mod.make_camera(
            (0, 0, 0), (0, 0, -1), (0, 1, 0), 90.0, 1.0, aperture=0.0
        )
        coords = jnp.asarray([[0.5, 0.5]])
        rays = camera_mod.generate_rays(cam, coords, jax.random.PRNGKey(0))
        np.testing.assert_allclose(
            np.asarray(rays.direction[0]), [0, 0, -1], atol=1e-6
        )

    def test_fov_edges(self):
        # 90-degree vfov: top edge ray has dir.y/|dir.z| = tan(45) = 1
        cam = camera_mod.make_camera(
            (0, 0, 0), (0, 0, -1), (0, 1, 0), 90.0, 1.0
        )
        coords = jnp.asarray([[0.5, 1.0]])
        rays = camera_mod.generate_rays(cam, coords, jax.random.PRNGKey(0))
        d = np.asarray(rays.direction[0])
        assert np.isclose(d[1] / -d[2], 1.0, atol=1e-5)

    def test_aperture_spreads_origins(self):
        cam = camera_mod.make_camera(
            (0, 0, 0), (0, 0, -1), (0, 1, 0), 90.0, 1.0,
            aperture=0.4, focus_distance=1.0,
        )
        coords = jnp.broadcast_to(jnp.asarray([[0.5, 0.5]]), (512, 2))
        rays = camera_mod.generate_rays(cam, coords, jax.random.PRNGKey(1))
        origins = np.asarray(rays.origin)
        assert origins.std(0).max() > 0.01
        assert np.linalg.norm(origins, axis=-1).max() <= 0.2 + 1e-5
        # all rays still converge on the focal point
        focal = origins + np.asarray(rays.direction) * np.asarray(
            # distance where ray crosses the focus plane z=-1
            (-1.0 - origins[:, 2:3]) / np.asarray(rays.direction)[:, 2:3]
        )
        np.testing.assert_allclose(focal[:, :2], 0.0, atol=1e-5)

    def test_times_in_unit_range(self):
        cam = camera_mod.make_camera((0, 0, 0), (0, 0, -1), (0, 1, 0), 90.0, 1.0)
        coords = jnp.broadcast_to(jnp.asarray([[0.5, 0.5]]), (64, 2))
        rays = camera_mod.generate_rays(cam, coords, jax.random.PRNGKey(2))
        t = np.asarray(rays.time)
        assert np.all((t >= 0) & (t < 1))


class TestMath3:
    def test_reflect(self):
        d = jnp.asarray([[1.0, -1.0, 0.0]]) / np.sqrt(2)
        n = jnp.asarray([[0.0, 1.0, 0.0]])
        r = np.asarray(math3.reflect(d, n)[0])
        np.testing.assert_allclose(r, [1 / np.sqrt(2), 1 / np.sqrt(2), 0], atol=1e-6)

    def test_quat_rotate_roundtrip(self):
        from raytracing_in_one_weekend_tpu.scene.scene import axis_angle_quat

        q = jnp.asarray(axis_angle_quat((0, 0, 1), 90.0))
        v = jnp.asarray([1.0, 0.0, 0.0])
        rotated = np.asarray(math3.quat_rotate(q, v))
        np.testing.assert_allclose(rotated, [0, 1, 0], atol=1e-6)
        back = np.asarray(math3.quat_rotate(math3.quat_conjugate(q), jnp.asarray(rotated)))
        np.testing.assert_allclose(back, [1, 0, 0], atol=1e-6)

    def test_gamma_roundtrip(self):
        x = jnp.linspace(0.01, 1.0, 32)
        y = math3.gamma_to_linear(math3.linear_to_gamma(x))
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=5e-3)
