"""Progressive driver tests: adaptive sampling, interlacing cycle,
autofocus, checkpoint/resume, denoise hook, CLI.

Reference behaviors covered: Raytracer.cs Update loop (:476-600),
ScheduleSample adaptive/interlace plumbing (:602-816), autofocus raycast
(:608-612), Tools.SpaceFillingSeries (:106-129)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracing_in_one_weekend_tpu.models import book_scenes, testbeds
from raytracing_in_one_weekend_tpu.render import denoise, driver, film, renderer
from raytracing_in_one_weekend_tpu.utils import ordering
from raytracing_in_one_weekend_tpu.utils.config import (
    CameraSettings,
    DenoiseMode,
    RenderSettings,
)


class TestSpaceFillingSeries:
    def test_permutation(self):
        for n in (1, 2, 7, 16):
            series = ordering.space_filling_series(n)
            assert sorted(series) == list(range(n))

    def test_coarse_to_fine(self):
        series = ordering.space_filling_series(8)
        assert series[0] == 0
        assert series[1] == 4  # halfway offset second
        assert set(series[2:4]) == {2, 6}  # quarters next


def _settings(**kw):
    defaults = dict(
        width=32, height=32, samples_per_pixel=4, trace_depth=4,
        samples_per_batch_range=(1, 4), adaptive_sampling=False,
        interlacing=1,
    )
    defaults.update(kw)
    return RenderSettings(**defaults)


class TestProgressiveDriver:
    def test_runs_to_completion(self):
        scene, cs = book_scenes.single_sphere()
        r = driver.ProgressiveRenderer(scene, cs, _settings())
        r.run()
        assert r.complete
        assert r.dispatched_samples_per_pixel >= 4
        # most pixels terminate on sky within depth 4 and count as valid
        assert float(np.median(np.asarray(r.acc.sample_count))) >= 4
        assert r.avg_mrays_per_second > 0
        imgs = r.images()
        assert imgs["color"].shape == (32, 32, 3)
        # sky-dominated scene: upper rows should be bright
        assert float(jnp.mean(imgs["color"][:4].astype(jnp.float32))) > 80

    def test_adaptive_sampling_varies_counts(self):
        scene, cs = book_scenes.three_spheres()
        r = driver.ProgressiveRenderer(
            scene, cs,
            _settings(adaptive_sampling=True, samples_per_batch_range=(1, 4),
                      samples_per_pixel=6),
        )
        r.step()  # first batch: min everywhere (weight unknown)
        # first batch dispatches the range minimum (1) per pixel; valid
        # counts can be 0 where the sample failed (depth exhaustion)
        assert r.history[0].max_samples <= 1.0
        stats = r.step()  # second batch: noise-weighted spread
        assert stats.max_samples >= stats.min_samples
        r.run()
        assert r.complete

    def test_interlacing_cycles_all_slices(self):
        scene, cs = book_scenes.single_sphere()
        r = driver.ProgressiveRenderer(
            scene, cs, _settings(interlacing=4, samples_per_pixel=2),
        )
        # After < interlacing batches the slowest pixel has 0 samples.
        r.step()
        assert r.min_samples_per_pixel == 0
        r.run()
        assert r.complete  # every slice eventually visited
        img = r.images()["color"].astype(jnp.float32)
        # no magenta no-sample rows: every row has brightness
        assert float(jnp.min(jnp.mean(img, axis=(1, 2)))) > 1

    def test_checkpoint_resume_bitwise(self, tmp_path):
        scene, cs = book_scenes.single_sphere()
        s = _settings(samples_per_pixel=6, samples_per_batch_range=(2, 2))
        r1 = driver.ProgressiveRenderer(scene, cs, s, seed=3)
        r1.step()
        path = str(tmp_path / "ckpt.npz")
        r1.checkpoint(path)
        r1.step()

        r2 = driver.ProgressiveRenderer(scene, cs, s, seed=3)
        r2.restore(path)
        r2.step()
        np.testing.assert_array_equal(
            np.asarray(r1.acc.color), np.asarray(r2.acc.color)
        )
        np.testing.assert_array_equal(
            np.asarray(r1.acc.sample_count), np.asarray(r2.acc.sample_count)
        )

    def test_abort_stops(self):
        scene, cs = book_scenes.single_sphere()
        r = driver.ProgressiveRenderer(
            scene, cs, _settings(samples_per_pixel=1000)
        )
        r.run(on_batch=lambda stats: r.abort())
        assert not r.complete
        assert r.batch_index == 1

    def test_autofocus_hits_scene(self):
        scene, _ = book_scenes.single_sphere()
        # camera at origin looking at the sphere at z=-1 (radius .5):
        # autofocus should land on the front surface at t=0.5.
        cs = CameraSettings(
            origin=(0.0, 0.0, 0.0), look_at=(0.0, 0.0, -1.0),
            vertical_fov=90.0, focus_distance=None,
        )
        assert driver.autofocus(scene, cs) == pytest.approx(0.5, abs=1e-3)

    def test_autofocus_miss_falls_back(self):
        scene, _ = book_scenes.single_sphere()
        cs = CameraSettings(
            origin=(0.0, 50.0, 0.0), look_at=(0.0, 51.0, 0.0),
            vertical_fov=90.0, focus_distance=None,
        )
        assert driver.autofocus(scene, cs) == pytest.approx(1.0, abs=1e-4)


class TestDenoise:
    def test_reduces_noise_preserves_edges(self):
        scene, cs = book_scenes.three_spheres()
        s = _settings(width=48, height=48, samples_per_pixel=2,
                      samples_per_batch_range=(2, 2), trace_depth=4)
        r = driver.ProgressiveRenderer(scene, cs, s, seed=1)
        r.run()
        img = r.combined()
        den = denoise.denoise(
            img.color, img.normal, img.albedo, width=48, height=48
        )
        # noise proxy: mean local total variation should drop
        def tv(flat):
            x = flat.reshape(48, 48, 3)
            return float(
                jnp.mean(jnp.abs(x[1:] - x[:-1]))
                + jnp.mean(jnp.abs(x[:, 1:] - x[:, :-1]))
            )
        assert tv(den) < tv(img.color)
        # global energy approximately preserved
        assert float(jnp.mean(den)) == pytest.approx(
            float(jnp.mean(img.color)), rel=0.15
        )

    def test_driver_denoise_mode(self):
        scene, cs = book_scenes.single_sphere()
        r = driver.ProgressiveRenderer(
            scene, cs, _settings(denoise_mode=DenoiseMode.ATROUS)
        )
        r.run()
        assert r.images()["color"].shape == (32, 32, 3)


class TestCli:
    def test_cli_end_to_end(self, tmp_path):
        from raytracing_in_one_weekend_tpu.__main__ import main

        out = str(tmp_path / "out.png")
        ckpt = str(tmp_path / "state.npz")
        rc = main([
            "--scene", "single_sphere", "--width", "24", "--height", "24",
            "--spp", "2", "--depth", "3", "--batch-range", "1", "2",
            "--output", out, "--checkpoint", ckpt, "--save-aovs", "--quiet",
        ])
        assert rc == 0
        assert os.path.getsize(out) > 100
        assert os.path.exists(str(tmp_path / "out_normal.png"))
        assert os.path.exists(ckpt)

    def test_cli_unknown_scene(self):
        from raytracing_in_one_weekend_tpu.__main__ import main

        with pytest.raises(SystemExit):
            main(["--scene", "nope"])


class TestTestbedScenes:
    @pytest.mark.parametrize("name", sorted(testbeds.SCENES))
    def test_builds_and_renders(self, name):
        scene, cs = testbeds.SCENES[name]()
        from raytracing_in_one_weekend_tpu.core import camera as camera_mod

        cam = camera_mod.make_camera(
            cs.origin, cs.look_at, cs.up, cs.vertical_fov, 1.0,
            aperture=cs.aperture,
            focus_distance=cs.focus_distance or 1.0,
        )
        img = renderer.render_image(
            scene, cam, jax.random.PRNGKey(0),
            width=16, height=16, samples_per_pixel=2, trace_depth=4,
        )
        arr = np.asarray(img.color)
        assert np.isfinite(arr).all()
        assert arr.max() > 0.01  # something is visible


class TestBvhAutoAttach:
    def test_mesh_scene_stays_dense_below_memory_bound(self):
        # dense (rays x triangles) beats gather-bound traversal on TPU up
        # to the VMEM/HBM bound (driver auto-BVH note); ~900 tris = dense
        from raytracing_in_one_weekend_tpu.models import meshes

        scene, cs = meshes.mesh_showcase()
        r = driver.ProgressiveRenderer(scene, cs, _settings(width=8, height=8))
        assert r.scene.bvh is None
        r.step()

    def test_explicit_bvh_renders(self):
        from raytracing_in_one_weekend_tpu.models import meshes

        scene, cs = meshes.mesh_showcase()
        r = driver.ProgressiveRenderer(
            scene, cs, _settings(width=8, height=8), use_bvh=True
        )
        assert r.scene.bvh is not None
        r.step()  # renders through the BVH traversal path

    def test_sphere_scene_stays_brute_force(self):
        scene, cs = book_scenes.single_sphere()
        r = driver.ProgressiveRenderer(scene, cs, _settings())
        assert r.scene.bvh is None

    def test_override(self):
        scene, cs = book_scenes.single_sphere()
        r = driver.ProgressiveRenderer(
            scene, cs, _settings(), use_bvh=True
        )
        assert r.scene.bvh is not None


class TestInverseCli:
    def test_optimize_albedo_improves(self, tmp_path):
        from raytracing_in_one_weekend_tpu.__main__ import main

        out = str(tmp_path / "inv.png")
        rc = main([
            "--scene", "three_spheres", "--width", "20", "--height", "20",
            "--spp", "4", "--depth", "4", "--optimize", "albedo",
            "--opt-steps", "15", "--output", out, "--quiet",
        ])
        assert rc == 0  # parameter MAE decreased
        for label in ("target", "init", "final"):
            assert os.path.getsize(str(tmp_path / f"inv_{label}.png")) > 100
