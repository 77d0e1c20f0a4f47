"""Pallas kernel tests (interpret mode, CPU-runnable): the fused sphere
selection kernel must agree with the jnp brute-force oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracing_in_one_weekend_tpu.ops import geometry, pallas_sphere


def _random_case(n=512, s=37, seed=0):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.normal(size=(n, 3)) * 2, jnp.float32)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    c = jnp.asarray(rng.normal(size=(s, 3)) * 2, jnp.float32)
    r = jnp.asarray(rng.uniform(0.4, 1.5, s), jnp.float32)
    return o, d, c, r


class TestSphereSelect:
    def test_matches_bruteforce(self):
        o, d, c, r = _random_case()
        t_k, idx_k, exit_k = pallas_sphere.sphere_select(
            o, d, c, r, interpret=True
        )
        t_all, exit_all = geometry.sphere_hit_all(o, d, jnp.zeros(o.shape[0]), c, r)
        t_ref = jnp.min(t_all, axis=1)
        idx_ref = jnp.argmin(t_all, axis=1)
        hit = np.asarray(t_ref) < 1e29
        assert hit.mean() > 0.2
        np.testing.assert_array_equal(
            np.asarray(idx_k)[hit], np.asarray(idx_ref)[hit]
        )
        np.testing.assert_allclose(
            np.asarray(t_k)[hit], np.asarray(t_ref)[hit], rtol=2e-4, atol=1e-3
        )
        exit_ref = np.take_along_axis(
            np.asarray(exit_all), np.asarray(idx_ref)[:, None], 1
        )[:, 0]
        np.testing.assert_allclose(
            np.asarray(exit_k)[hit], exit_ref[hit], rtol=2e-4, atol=1e-3
        )


class TestSphereSelectFull:
    def test_records_normals_and_exit(self):
        o, d, c, r = _random_case(n=256, s=21, seed=3)
        records = jnp.asarray(
            np.random.default_rng(1).normal(size=(21, 12)), jnp.float32
        )
        t, exit_t, normal, rec = pallas_sphere.sphere_select_full(
            o, d, c, r, records, want_exit=True, interpret=True
        )
        t_all, exit_all = geometry.sphere_hit_all(o, d, jnp.zeros(256), c, r)
        idx_ref = np.asarray(jnp.argmin(t_all, axis=1))
        t_ref = np.asarray(jnp.min(t_all, axis=1))
        hit = t_ref < 1e29

        np.testing.assert_allclose(
            np.asarray(t)[hit], t_ref[hit], rtol=2e-4, atol=1e-3
        )
        # winner records
        np.testing.assert_allclose(
            np.asarray(rec)[hit, :12], np.asarray(records)[idx_ref[hit]],
            rtol=1e-5, atol=1e-5,
        )
        # normals: (p - c_win)/r_win, unit for points on the sphere
        norms = np.linalg.norm(np.asarray(normal)[hit], axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-2)
        # exit distances
        exit_ref = np.take_along_axis(
            np.asarray(exit_all), idx_ref[:, None], 1
        )[:, 0]
        np.testing.assert_allclose(
            np.asarray(exit_t)[hit], exit_ref[hit], rtol=2e-4, atol=1e-3
        )

    def test_inactive_tiles_skipped(self):
        o, d, c, r = _random_case(n=1024, s=5, seed=7)
        records = jnp.ones((5, 12), jnp.float32)
        active = jnp.zeros((1024,), bool)
        t, exit_t, normal, rec = pallas_sphere.sphere_select_full(
            o, d, c, r, records, active=active, interpret=True
        )
        assert np.all(np.asarray(t) >= pallas_sphere.BIG)
        assert np.all(np.asarray(rec)[:, :12] == 0.0)


class TestTriangleSelect:
    """Fused dense triangle selection kernel (ops/pallas_triangle.py),
    interpret mode vs the dense jnp reference."""

    def test_matches_dense_argmin(self):
        from raytracing_in_one_weekend_tpu.models import meshes
        from raytracing_in_one_weekend_tpu.ops import geometry, pallas_triangle

        scene, _ = meshes.mesh_showcase()
        tri = scene.triangles
        k = jax.random.PRNGKey(3)
        n = 512
        o = jax.random.uniform(k, (n, 3), minval=-3, maxval=3) + jnp.asarray(
            [0.0, 2.0, 6.0]
        )
        d = jax.random.normal(jax.random.fold_in(k, 1), (n, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

        t_sel, idx_sel = pallas_triangle.triangle_select(
            o, d, tri.edge_a, tri.edge_b, tri.vert0, interpret=True
        )
        t_all, _, _ = geometry.triangle_hit_all(
            o, d, tri.edge_a, tri.edge_b, tri.vert0, tri.normals, tri.uvs
        )
        idx_ref = jnp.argmin(t_all, axis=1)
        t_ref = jnp.take_along_axis(t_all, idx_ref[:, None], axis=1)[:, 0]
        np.testing.assert_allclose(
            np.asarray(t_sel), np.asarray(t_ref), rtol=2e-3, atol=1e-3
        )
        hit = np.asarray(t_ref) < 1e29
        assert (np.asarray(idx_sel)[hit] == np.asarray(idx_ref)[hit]).all()

    def test_inactive_tiles_skip(self):
        from raytracing_in_one_weekend_tpu.models import meshes
        from raytracing_in_one_weekend_tpu.ops import pallas_triangle

        scene, _ = meshes.mesh_showcase()
        tri = scene.triangles
        n = 300
        o = jnp.zeros((n, 3))
        d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
        t_sel, _ = pallas_triangle.triangle_select(
            o, d, tri.edge_a, tri.edge_b, tri.vert0,
            active=jnp.zeros((n,), jnp.bool_), interpret=True,
        )
        assert (np.asarray(t_sel) >= 1e29).all()

    def test_fits_vmem_bound(self):
        from raytracing_in_one_weekend_tpu.ops import pallas_triangle

        assert pallas_triangle.fits_vmem(900)
        assert not pallas_triangle.fits_vmem(10_000)
