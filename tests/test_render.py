"""End-to-end render tests: BASELINE.json config-1 style correctness slices.

The reference has no automated tests (SURVEY.md section 4); these adopt the
BASELINE protocol — deterministic small configs, property oracles on the
rendered images.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracing_in_one_weekend_tpu.core import camera as camera_mod
from raytracing_in_one_weekend_tpu.models import book_scenes
from raytracing_in_one_weekend_tpu.render import film, renderer


def _render(scene, cam_settings, width=64, height=64, spp=8, depth=8, seed=0):
    cam = camera_mod.make_camera(
        cam_settings.origin, cam_settings.look_at, cam_settings.up,
        cam_settings.vertical_fov, width / height,
        aperture=cam_settings.aperture,
        focus_distance=cam_settings.focus_distance,
    )
    img = renderer.render_image(
        scene, cam, jax.random.PRNGKey(seed),
        width=width, height=height, samples_per_pixel=spp, trace_depth=depth,
    )
    return img


class TestSingleSphere:
    @pytest.fixture(scope="class")
    def image(self):
        scene, cam = book_scenes.single_sphere()
        return _render(scene, cam, spp=16)

    def test_finite_and_positive(self, image):
        color = np.asarray(image.color)
        assert np.all(np.isfinite(color))
        assert np.all(color >= 0.0)

    def test_sky_gradient_at_top(self, image):
        # Row-major, row 0 is the BOTTOM of the image (v=0); the top rows
        # look above the horizon into the blue-ish gradient sky.
        color = np.asarray(image.color).reshape(64, 64, 3)
        top = color[-4:].mean(axis=(0, 1))
        # gradient sky top color (0.5, 0.7, 1.0): blue dominates red
        assert top[2] > top[0]
        assert top[2] > 0.4

    def test_sphere_darker_than_sky(self, image):
        color = np.asarray(image.color).reshape(64, 64, 3)
        center = color[32, 32]  # on the diffuse sphere
        sky = color[60, 32]
        assert center.sum() < sky.sum()

    def test_normals_aov_unit_or_zero(self, image):
        n = np.asarray(image.normal)
        norms = np.linalg.norm(n, axis=-1)
        assert np.all((norms < 1.0 + 1e-4))
        # center pixel normal points roughly at the camera (+z)
        n2 = n.reshape(64, 64, 3)
        assert n2[32, 32, 2] > 0.9

    def test_albedo_aov(self, image):
        a = np.asarray(image.albedo).reshape(64, 64, 3)
        # diffuse sphere albedo is 0.5 gray
        np.testing.assert_allclose(a[32, 32], 0.5, atol=0.1)


class TestDeterminism:
    def test_same_seed_same_image(self):
        scene, cam = book_scenes.single_sphere()
        img1 = _render(scene, cam, width=32, height=32, spp=4, seed=3)
        img2 = _render(scene, cam, width=32, height=32, spp=4, seed=3)
        np.testing.assert_array_equal(np.asarray(img1.color), np.asarray(img2.color))

    def test_different_seed_different_noise(self):
        scene, cam = book_scenes.single_sphere()
        img1 = _render(scene, cam, width=32, height=32, spp=2, seed=1)
        img2 = _render(scene, cam, width=32, height=32, spp=2, seed=2)
        assert not np.allclose(np.asarray(img1.color), np.asarray(img2.color))


class TestThreeSpheres:
    @pytest.fixture(scope="class")
    def image(self):
        scene, cam = book_scenes.three_spheres()
        return _render(scene, cam, width=96, height=64, spp=24, depth=12)

    def test_renders(self, image):
        color = np.asarray(image.color)
        assert np.all(np.isfinite(color))
        assert color.max() > 0.1

    def test_metal_reflects_ground_tint(self, image):
        color = np.asarray(image.color).reshape(64, 96, 3)
        # Shirley right-handed basis (camera.make_camera): world +x lands on
        # the image's RIGHT (u grows along right = up x forward).
        # Metal sphere at x=+1, gold albedo (0.8, 0.6, 0.2): red dominates blue.
        region = color[24:40, 72:88]
        assert region[..., 0].mean() > region[..., 2].mean()

    def test_glass_transmits(self, image):
        color = np.asarray(image.color).reshape(64, 96, 3)
        # glass sphere at x=-1 (image left) transmits sky/ground: not black
        region = color[24:40, 8:24]
        assert region.mean() > 0.1


class TestVolume:
    def test_fog_sphere_attenuates_sky(self):
        scene, cam = book_scenes.volume_test()
        img = _render(scene, cam, width=48, height=48, spp=24, depth=24)
        color = np.asarray(img.color).reshape(48, 48, 3)
        assert np.all(np.isfinite(color))
        # fog pixel is hazy (neither pure sky nor black)
        fog = color[24, 24]
        assert 0.05 < fog.mean() < 1.5


class TestCornell:
    def test_emissive_lighting(self):
        scene, cam = book_scenes.cornell_box()
        img = _render(scene, cam, width=48, height=48, spp=32, depth=16)
        color = np.asarray(img.color).reshape(48, 48, 3)
        assert np.all(np.isfinite(color))
        # interior is lit by the area light only
        assert color.mean() > 0.005
        # Shirley right-handed basis: world -x (red wall) lands on low
        # columns, +x (green wall) on high ones.
        red_side = color[20:28, 2:8]
        green_side = color[20:28, 40:46]
        assert red_side[..., 0].mean() > red_side[..., 1].mean()
        assert green_side[..., 1].mean() > green_side[..., 0].mean()


class TestAccumulation:
    def test_progressive_batches_match_single_shot_statistically(self):
        scene, cam_settings = book_scenes.single_sphere()
        cam = camera_mod.make_camera(
            cam_settings.origin, cam_settings.look_at, cam_settings.up,
            cam_settings.vertical_fov, 1.0,
            focus_distance=cam_settings.focus_distance,
        )
        key = jax.random.PRNGKey(0)
        acc = film.zero_accumulators(32 * 32)
        for batch in range(4):
            bkey = jax.random.fold_in(key, batch)
            acc, metrics = renderer.render_batch_jit(
                scene, cam, acc, bkey, jnp.asarray(0, jnp.int32),
                width=32, height=32, samples=4, trace_depth=8,
            )
        img_prog = film.combine(acc, 32, 32)
        assert float(metrics.max_sample_count) == 16.0

        img_once = renderer.render_image(
            scene, cam, key, width=32, height=32,
            samples_per_pixel=16, trace_depth=8,
        )
        # Same estimator, different sample streams: images agree to MC noise.
        diff = np.abs(np.asarray(img_prog.color) - np.asarray(img_once.color))
        assert diff.mean() < 0.1

    def test_metrics_ray_counts(self):
        scene, cam_settings = book_scenes.single_sphere()
        cam = camera_mod.make_camera(
            cam_settings.origin, cam_settings.look_at, cam_settings.up,
            cam_settings.vertical_fov, 1.0,
            focus_distance=cam_settings.focus_distance,
        )
        acc = film.zero_accumulators(32 * 32)
        acc, metrics = renderer.render_batch_jit(
            scene, cam, acc, jax.random.PRNGKey(0), jnp.asarray(0, jnp.int32),
            width=32, height=32, samples=2, trace_depth=8,
        )
        # at least one ray per sample per pixel; at most depth rays
        assert int(metrics.total_rays) >= 32 * 32 * 2
        assert int(metrics.total_rays) <= 32 * 32 * 2 * 8


class TestInterlacing:
    def test_row_slicing_and_gap_fill(self):
        scene, cam_settings = book_scenes.single_sphere()
        cam = camera_mod.make_camera(
            cam_settings.origin, cam_settings.look_at, cam_settings.up,
            cam_settings.vertical_fov, 1.0,
            focus_distance=cam_settings.focus_distance,
        )
        acc = film.zero_accumulators(32 * 32)
        acc, _ = renderer.render_batch_jit(
            scene, cam, acc, jax.random.PRNGKey(0), jnp.asarray(0, jnp.int32),
            width=32, height=32, samples=2, trace_depth=8, slice_divider=2,
        )
        counts = np.asarray(acc.sample_count).reshape(32, 32)
        # Even rows sampled (a few pixels may have 0 *valid* samples when
        # both paths exhaust trace depth — reference failed-sample semantics,
        # SampleBatchJob.cs:380-381); odd rows strictly skipped.
        assert counts[0::2].mean() > 1.5
        assert np.all(counts[1::2] == 0)
        img = film.combine(acc, 32, 32, interlacing=2)
        color = np.asarray(img.color).reshape(32, 32, 3)
        # gap-filled odd rows copy from the row below (reference
        # CombineJob.cs:44-50 scans downward in index space)
        assert color[1::2].mean() > 0.01
