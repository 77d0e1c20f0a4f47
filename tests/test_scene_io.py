"""Scene-file round-trip (scene/io.py) and legacy Unity .asset import
(scene/unity_legacy.py).

The reference authors scenes as Unity data (live GameObjects plus the
legacy serialized system under Assets/Scenes/Legacy); the TPU build's
declarative JSON format and the legacy importer are its equivalents
(SURVEY.md §2.6).  Legacy tests run only when the reference checkout is
present (read-only fixture data).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracing_in_one_weekend_tpu.models import book_scenes
from raytracing_in_one_weekend_tpu.scene import io as scene_io
from raytracing_in_one_weekend_tpu.scene.scene import SceneBuilder, checker, perlin

LEGACY_DIR = "/root/reference/RaytracingInOneWeekend/Assets/Scenes/Legacy"
needs_reference = pytest.mark.skipif(
    not os.path.isdir(LEGACY_DIR), reason="reference checkout not present"
)


def _rich_builder() -> SceneBuilder:
    """One of everything the format must carry."""
    b = SceneBuilder()
    earth = b.add_image(
        "earth", np.linspace(0, 1, 8 * 16 * 3, dtype=np.float32).reshape(8, 16, 3)
    )
    lam = b.lambert(checker((0.9, 0.9, 0.9), (0.1, 0.3, 0.1), scale=6.0))
    marble = b.lambert(perlin((1.0, 1.0, 1.0), frequency=3.0))
    img = b.lambert(earth)
    glass = b.dielectric(1.5, glossiness=0.8)
    fog = b.volume(0.3, (0.8, 0.8, 0.8))
    light = b.emissive((4.0, 4.0, 4.0))
    b.add_sphere((0, 1, 0), 1.0, lam)
    b.add_sphere((2, 1, 0), 1.0, img, move_offset=(0, 0.5, 0),
                 time_range=(0.0, 1.0))
    b.add_sphere((-2, 1, 0), 1.0, fog)
    b.add_rect((0, 3, 0), (2.0, 1.0), light,
               rotation=(0.0, 0.7071, 0.0, 0.7071))
    b.add_box((0, 0.5, 2), (1, 1, 1), glass,
              rotation=(0.2588, 0.0, 0.0, 0.9659))
    b.add_triangle((0, 0, -2), (1, 0, -2), (0, 1, -2), marble,
                   uvs=[(0, 0), (1, 0), (0, 1)])
    b.set_gradient_sky((0.9, 0.9, 1.0), (0.3, 0.5, 0.9))
    return b


def _assert_scene_equal(a, c):
    la, ta = jax.tree_util.tree_flatten(a)
    lc, tc = jax.tree_util.tree_flatten(c)
    assert ta == tc  # includes SceneFlags (registered static)
    for xa, xc in zip(la, lc):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xc))


class TestSceneJson:
    def test_round_trip_rich_builder(self, tmp_path):
        from raytracing_in_one_weekend_tpu.utils.config import CameraSettings

        b = _rich_builder()
        cam = CameraSettings(
            origin=(1, 2, 3), look_at=(0, 1, 0), vertical_fov=35.0,
            aperture=0.1, focus_distance=4.2,
        )
        path = str(tmp_path / "rich.json")
        scene_io.save_scene(b, path, camera=cam)
        b2, cam2 = scene_io.load_scene(path)
        assert cam2 == cam
        _assert_scene_equal(b.build(), b2.build())

    def test_round_trip_built_scene(self, tmp_path):
        scene, cam = book_scenes.three_spheres()
        path = str(tmp_path / "ts.json")
        scene_io.save_scene(scene, path, camera=cam)
        b2, cam2 = scene_io.load_scene(path)
        assert cam2 == cam
        _assert_scene_equal(scene, b2.build())

    def test_large_mesh_goes_to_sidecar(self, tmp_path):
        from raytracing_in_one_weekend_tpu.models import meshes

        b = SceneBuilder()
        v, f, n, _ = meshes.icosphere(3)  # 1280 faces > TRI_INLINE_MAX
        b.add_mesh(v, f, b.lambert((0.5, 0.5, 0.5)), normals=n)
        path = str(tmp_path / "mesh.json")
        scene_io.save_scene(b, path)
        assert (tmp_path / "mesh.npz").exists()
        b2, _ = scene_io.load_scene(path)
        _assert_scene_equal(b.build(), b2.build())

    def test_shipped_scene_files_build(self):
        shipped = os.path.join(os.path.dirname(__file__), "..", "scenes")
        found = 0
        for name in sorted(os.listdir(shipped)):
            if not name.endswith(".json") or name == "legacy_materials.json":
                continue
            b, cam = scene_io.load_scene(os.path.join(shipped, name))
            scene = b.build()
            assert cam is not None
            total = (
                scene.spheres.center.shape[0] + scene.rects.rot.shape[0]
                + scene.boxes.rot.shape[0] + scene.triangles.vert0.shape[0]
            )
            assert total > 0, name
            found += 1
        assert found >= 3

    def test_rejects_foreign_json(self, tmp_path):
        path = tmp_path / "x.json"
        path.write_text('{"hello": 1}')
        with pytest.raises(ValueError, match="not a rtiw-scene"):
            scene_io.load_scene(str(path))


class TestUnityLegacy:
    def test_euler_quat_matches_axis_angle(self):
        from raytracing_in_one_weekend_tpu.scene import unity_legacy
        from raytracing_in_one_weekend_tpu.scene.scene import axis_angle_quat

        for axis, deg in (((0, 1, 0), 18.0), ((1, 0, 0), -90.0),
                          ((0, 0, 1), 45.0)):
            e = np.asarray(axis, np.float32) * deg
            got = unity_legacy._euler_quat(e)
            want = axis_angle_quat(axis, deg)
            np.testing.assert_allclose(got, want, atol=1e-6)

    def test_euler_quat_order_is_zxy(self):
        # Unity Quaternion.Euler(30, 40, 50) == Ry(40)*Rx(30)*Rz(50)
        from raytracing_in_one_weekend_tpu.scene import unity_legacy
        from raytracing_in_one_weekend_tpu.scene.scene import axis_angle_quat

        def mul(a, b):
            ax, ay, az, aw = a
            bx, by, bz, bw = b
            return np.asarray([
                aw * bx + ax * bw + ay * bz - az * by,
                aw * by - ax * bz + ay * bw + az * bx,
                aw * bz + ax * by - ay * bx + az * bw,
                aw * bw - ax * bx - ay * by - az * bz,
            ])

        got = unity_legacy._euler_quat(np.asarray([30.0, 40.0, 50.0]))
        want = mul(
            mul(axis_angle_quat((0, 1, 0), 40.0),
                axis_angle_quat((1, 0, 0), 30.0)),
            axis_angle_quat((0, 0, 1), 50.0),
        )
        np.testing.assert_allclose(got, want, atol=1e-6)

    @needs_reference
    def test_three_spheres_entities_and_camera(self):
        from raytracing_in_one_weekend_tpu.scene import unity_legacy

        b, cam = unity_legacy.import_legacy_scene(
            os.path.join(LEGACY_DIR, "Three Spheres (Book 1).asset")
        )
        scene = b.build()
        assert scene.spheres.center.shape[0] == 5  # incl. hollow shell
        radii = np.sort(np.asarray(scene.spheres.radius))
        assert radii[0] == -0.45 and radii[-1] == 100.0
        assert cam.vertical_fov == 60.0

    @needs_reference
    def test_cornell_with_material_map(self):
        import json

        from raytracing_in_one_weekend_tpu.scene import unity_legacy
        from raytracing_in_one_weekend_tpu.scene.scene import MaterialType

        map_path = os.path.join(
            os.path.dirname(__file__), "..", "scenes", "legacy_materials.json"
        )
        with open(map_path) as fh:
            material_map = json.load(fh)
        b, cam = unity_legacy.import_legacy_scene(
            os.path.join(LEGACY_DIR, "Cornell Box (Book 2).asset"),
            material_map=material_map,
        )
        scene = b.build()
        # 7 rect entities in the asset; the Front Wall is `enabled: 0`
        assert scene.rects.rot.shape[0] == 6
        assert scene.boxes.rot.shape[0] == 2
        assert scene.flags.has_emissive
        # no gray-lambert fallback: every GUID resolved through the map
        assert int(np.asarray(scene.materials.type).shape[0]) >= 4
        assert not scene.flags.has_volumes
        # the asset predates the skyType field (absent) but stores black
        # gradient colors — radiometrically a dark box either way
        assert (
            int(scene.environment.sky_type) == 0
            or float(np.asarray(scene.environment.sky_top).max()) == 0.0
        )
        assert MaterialType.STANDARD in list(np.asarray(scene.materials.type))

    @needs_reference
    def test_random_groups_generate_cover_class_scene(self):
        from raytracing_in_one_weekend_tpu.scene import unity_legacy

        b, cam = unity_legacy.import_legacy_scene(
            os.path.join(LEGACY_DIR, "Random With Movement (Book 2).asset")
        )
        scene = b.build()
        n = scene.spheres.center.shape[0]
        assert 200 <= n <= 1005  # dart throwing w/ overlap rejection
        assert scene.flags.has_motion  # MovementChance 0.8
        assert scene.flags.has_dielectrics  # 5% glass lottery
        # dart centers stay inside the spread box around the offset
        centers = np.asarray(scene.spheres.center)
        small = centers[np.asarray(scene.spheres.radius) < 1.0]
        assert np.all(np.abs(small[:, 0]) <= 11.5)
        assert np.all(np.abs(small[:, 2]) <= 11.5)

    @needs_reference
    def test_builtin_cube_mesh(self):
        from raytracing_in_one_weekend_tpu.scene import unity_legacy

        b, _ = unity_legacy.import_legacy_scene(
            os.path.join(LEGACY_DIR, "Mesh Cube.asset")
        )
        scene = b.build()
        assert scene.triangles.vert0.shape[0] == 12

    @needs_reference
    def test_bunny_mesh_resolves_via_guid(self):
        from raytracing_in_one_weekend_tpu.scene import unity_legacy

        b, _ = unity_legacy.import_legacy_scene(
            os.path.join(LEGACY_DIR, "Bunny.asset")
        )
        scene = b.build()
        assert scene.triangles.vert0.shape[0] > 1000  # stanford bunny

    @needs_reference
    def test_legacy_renders(self):
        from raytracing_in_one_weekend_tpu.core import camera as camera_mod
        from raytracing_in_one_weekend_tpu.render import renderer
        from raytracing_in_one_weekend_tpu.scene import unity_legacy

        b, cs = unity_legacy.import_legacy_scene(
            os.path.join(LEGACY_DIR, "Diffuse Testbed.asset")
        )
        scene = b.build()
        w = h = 24
        cam = camera_mod.make_camera(
            jnp.asarray(cs.origin), jnp.asarray(cs.look_at),
            jnp.asarray(cs.up), cs.vertical_fov, w / h,
        )
        img = renderer.render_image(
            scene, cam, jax.random.PRNGKey(0), width=w, height=h,
            samples_per_pixel=2, trace_depth=3,
        ).color
        arr = np.asarray(img)
        assert np.isfinite(arr).all() and arr.max() > 0.05
