"""Diagnostics / profiling / mesh-source tests.

Reference behaviors: per-pixel RayCount diagnostics + buffer views
(SampleBatchJob.cs:203, Raytracer.cs:239-250), PATH_DEBUGGING polyline
(SampleBatchJob.cs:96-101), ScopedStopwatch (Util/ScopedStopwatch.cs),
mesh entity conversion (AddMeshRuntimeEntitiesJob.cs)."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracing_in_one_weekend_tpu.models import book_scenes, meshes
from raytracing_in_one_weekend_tpu.render import diagnostics, driver
from raytracing_in_one_weekend_tpu.utils import profiling
from raytracing_in_one_weekend_tpu.utils.config import RenderSettings


def _driver(scene, cs, **kw):
    s = dict(width=24, height=24, samples_per_pixel=2, trace_depth=4,
             samples_per_batch_range=(2, 2), adaptive_sampling=False)
    s.update(kw)
    return driver.ProgressiveRenderer(scene, cs, RenderSettings(**s))


class TestPixelRayCounts:
    def test_metrics_carry_per_pixel_rays(self):
        scene, cs = book_scenes.single_sphere()
        r = _driver(scene, cs)
        r.step()
        pr = np.asarray(r.last_metrics.pixel_rays)
        assert pr.shape == (24 * 24,)
        assert pr.sum() == int(r.last_metrics.total_rays)
        # sphere pixels bounce at least twice; all pixels cast >= 1 ray
        assert pr.min() >= 1
        assert pr.max() > pr.min()

    def test_buffer_views(self):
        scene, cs = book_scenes.three_spheres()
        r = _driver(scene, cs)
        r.step()
        for view in diagnostics.VIEWS:
            img = r.diagnostic_image(view)
            assert img.shape == (24, 24, 3)
            assert img.dtype == np.uint8
        with pytest.raises(ValueError):
            r.diagnostic_image("bogus")


class TestPathDebugging:
    def test_center_pixel_polyline(self):
        scene, cs = book_scenes.single_sphere()
        r = _driver(scene, cs)
        r.step()
        path = r.debug_path()
        pts = path["points"]
        assert pts.shape == (r.settings.trace_depth + 1, 3)
        assert np.isfinite(pts).all()
        # center pixel looks at the sphere: first segment ends on it
        d0 = np.linalg.norm(pts[1] - np.asarray([0.0, 0.0, -1.0]))
        assert d0 == pytest.approx(0.5, abs=0.01)
        assert path["active"][0]


class TestProfiling:
    def test_scoped_stopwatch(self):
        with profiling.ScopedStopwatch("test") as sw:
            jnp.zeros(4).block_until_ready()
        assert sw.elapsed > 0

    def test_annotate_and_block_on(self):
        x = jnp.ones(8)
        with profiling.annotate("region"):
            y = x * 2
        with profiling.ScopedStopwatch("b", block_on=y) as sw:
            pass
        assert sw.elapsed >= 0


class TestMeshes:
    def test_icosphere_on_unit_sphere(self):
        v, f, n, _ = meshes.icosphere(1)
        np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
        assert f.shape == (80, 3)
        np.testing.assert_allclose(n, v, atol=1e-6)

    def test_cube_watertight_winding(self):
        v, f, _, _ = meshes.cube()
        # every triangle's outward normal points away from the origin
        tri = v[f]
        nrm = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        centers = tri.mean(axis=1)
        assert np.all(np.sum(nrm * centers, axis=-1) > 0)

    def test_obj_roundtrip(self):
        v, f, n, _ = meshes.icosphere(0)
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "m.obj")
            with open(path, "w") as fh:
                for p in v:
                    fh.write(f"v {p[0]} {p[1]} {p[2]}\n")
                for p in n:
                    fh.write(f"vn {p[0]} {p[1]} {p[2]}\n")
                for a, b, c in f:
                    fh.write(
                        f"f {a+1}//{a+1} {b+1}//{b+1} {c+1}//{c+1}\n"
                    )
            v2, f2, n2, _ = meshes.load_obj(path)
        np.testing.assert_allclose(v2, v, atol=1e-5)
        np.testing.assert_array_equal(f2, f)
        np.testing.assert_allclose(n2, n, atol=1e-5)

    def test_obj_native_matches_python(self):
        # native/obj_loader.cpp vs the pure-Python oracle, on an OBJ
        # exercising quads (fan triangulation), negative indices, and
        # every ref form (v, v/t, v//n, v/t/n)
        from raytracing_in_one_weekend_tpu.native import mesh_native

        if not mesh_native.available():
            import pytest

            pytest.skip("native toolchain unavailable")
        obj = (
            "# comment\n"
            "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nv 0.5 0.5 1\n"
            "vn 0 0 1\nvn 0 1 0\n"
            "vt 0.25 0.75\nvt 0.5 0.5\n"
            "f 1/1/1 2/2/1 3//2 4\n"          # quad -> 2 tris, mixed refs
            "f -1/-1/-2 1 2/1\n"              # negative indices
            "\n"
            "usemtl ignored\n"
        )
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "m.obj")
            with open(path, "w") as fh:
                fh.write(obj)
            got = mesh_native.load_obj(path)
            want = meshes.load_obj_py(path)
        for g, w in zip(got, want):
            if w is None:
                assert g is None
            else:
                np.testing.assert_allclose(g, w, atol=0)
        assert got[1].dtype == want[1].dtype

    def test_obj_malformed_matches_python_semantics(self):
        # malformed refs fail the native parse; load_obj falls back to
        # the Python loader, so end-to-end behavior always equals the
        # oracle's (out-of-range vt -> IndexError, garbage -> ValueError)
        with tempfile.TemporaryDirectory() as d:
            bad_vt = os.path.join(d, "bad_vt.obj")
            with open(bad_vt, "w") as fh:
                fh.write("v 0 0 0\nv 1 0 0\nv 0 1 0\nvt 0 0\nf 1/9 2 3\n")
            try:
                meshes.load_obj(bad_vt)
                assert False, "expected IndexError"
            except IndexError:
                pass
            garbage = os.path.join(d, "garbage.obj")
            with open(garbage, "w") as fh:
                fh.write("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 / 3\n")
            try:
                meshes.load_obj(garbage)
                assert False, "expected ValueError"
            except ValueError:
                pass

    def test_build_morton_sorts_triangle_rows(self):
        # SceneBuilder.build() spatially sorts triangle rows so the
        # kernel packers' TRI_BLOCK chunks stay compact for any append
        # order: interleave triangles from two distant clusters and
        # check build() groups them
        from raytracing_in_one_weekend_tpu.scene.scene import SceneBuilder

        b = SceneBuilder()
        m = b.lambert((0.5, 0.5, 0.5))
        rng = np.random.default_rng(3)
        for i in range(40):
            base = np.array([0.0, 0.0, 0.0] if i % 2 == 0
                            else [100.0, 0.0, 0.0], np.float32)
            v0 = base + rng.uniform(-1, 1, 3).astype(np.float32)
            b.add_triangle(v0, v0 + [0.1, 0, 0], v0 + [0, 0.1, 0], m)
        tri = b.build().triangles
        near_origin = np.asarray(tri.vert0)[:, 0] < 50.0
        flips = int(np.sum(near_origin[1:] != near_origin[:-1]))
        assert flips == 1, f"clusters not contiguous ({flips} flips)"

    def test_add_mesh_bulk_matches_per_face(self):
        # vectorized add_mesh chunk == the per-face add_triangle path
        from raytracing_in_one_weekend_tpu.scene.scene import SceneBuilder

        v, f, n, _ = meshes.icosphere(1)
        uv = np.stack(
            [np.linspace(0, 1, v.shape[0]),
             np.linspace(1, 0, v.shape[0])], axis=-1
        ).astype(np.float32)

        for kwargs in (
            dict(normals=n, uvs=uv, translation=(1.0, -2.0, 3.0), scale=1.7),
            dict(normals=None, uvs=None),
            dict(normals=n, face_normals=True),
        ):
            bulk = SceneBuilder()
            m = bulk.lambert((0.5, 0.5, 0.5))
            bulk.add_mesh(v, f, m, **kwargs)
            ref = SceneBuilder()
            m2 = ref.lambert((0.5, 0.5, 0.5))
            verts = np.asarray(v, np.float32) * float(
                kwargs.get("scale", 1.0)
            ) + np.asarray(kwargs.get("translation", (0, 0, 0)), np.float32)
            use_n = kwargs.get("normals")
            if kwargs.get("face_normals", False):
                use_n = None
            for face in f:
                ref.add_triangle(
                    verts[face[0]], verts[face[1]], verts[face[2]], m2,
                    normals=None if use_n is None
                    else [use_n[i] for i in face],
                    uvs=None if kwargs.get("uvs") is None
                    else [kwargs["uvs"][i] for i in face],
                )
            a, b = bulk.build().triangles, ref.build().triangles
            np.testing.assert_allclose(a.edge_a, b.edge_a, atol=1e-6)
            np.testing.assert_allclose(a.edge_b, b.edge_b, atol=1e-6)
            np.testing.assert_allclose(a.vert0, b.vert0, atol=1e-6)
            np.testing.assert_allclose(a.normals, b.normals, atol=1e-6)
            np.testing.assert_allclose(a.uvs, b.uvs, atol=1e-6)
            np.testing.assert_array_equal(a.material, b.material)

    def test_mesh_showcase_renders_with_bvh(self):
        from raytracing_in_one_weekend_tpu.core import camera as camera_mod
        from raytracing_in_one_weekend_tpu.render import renderer
        from raytracing_in_one_weekend_tpu.scene import bvh as bvh_mod

        scene, cs = meshes.mesh_showcase()
        assert scene.triangles.vert0.shape[0] > 500
        scene = bvh_mod.attach_bvh(scene, native=False)
        cam = camera_mod.make_camera(
            cs.origin, cs.look_at, cs.up, cs.vertical_fov, 1.0,
            focus_distance=cs.focus_distance,
        )
        img = renderer.render_image(
            scene, cam, jax.random.PRNGKey(0),
            width=24, height=24, samples_per_pixel=2, trace_depth=4,
        )
        arr = np.asarray(img.color)
        assert np.isfinite(arr).all() and arr.max() > 0.01
