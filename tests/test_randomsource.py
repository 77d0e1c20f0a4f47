"""RandomSource sampler-flavor tests (NoiseColor white/blue/STBN).

Reference behaviors: RandomSource.cs:8-13 NoiseColor switch,
PerPixelNoise.cs:24-44 R2 draw offsets, BlueNoiseData per-frame cycling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracing_in_one_weekend_tpu.core import camera as camera_mod
from raytracing_in_one_weekend_tpu.core import randomsource
from raytracing_in_one_weekend_tpu.models import book_scenes
from raytracing_in_one_weekend_tpu.render import driver, film, renderer
from raytracing_in_one_weekend_tpu.utils.config import NoiseColor, RenderSettings


class TestNoiseState:
    def test_white_has_no_tables(self):
        assert randomsource.make_noise_state(NoiseColor.WHITE) is None

    def test_blue_single_tile(self):
        st = randomsource.make_noise_state(NoiseColor.BLUE)
        assert st.tiles.shape == (1, 64, 64, 4)

    def test_stbn_temporal_tiles(self):
        st = randomsource.make_noise_state(
            NoiseColor.SPATIO_TEMPORAL_BLUE, temporal=4
        )
        assert st.tiles.shape == (4, 64, 64, 4)

    def test_uniforms_in_range_and_vary_per_draw(self):
        st = randomsource.make_noise_state(NoiseColor.BLUE)
        u0 = np.asarray(randomsource.pixel_uniforms(st, 0, 16, 16))
        u1 = np.asarray(randomsource.pixel_uniforms(st, 1, 16, 16))
        assert u0.shape == (256, 4)
        assert (u0 >= 0).all() and (u0 < 1).all()
        assert np.abs(u0 - u1).max() > 0.01  # decorrelated draws
        # deterministic given the draw index
        u0b = np.asarray(randomsource.pixel_uniforms(st, 0, 16, 16))
        np.testing.assert_array_equal(u0, u0b)

    def test_blue_noise_is_high_frequency(self):
        """Neighbor deltas of a blue-noise tile exceed white's on average
        (the defining property: energy pushed to high frequencies)."""
        st = randomsource.make_noise_state(NoiseColor.BLUE)
        tile = np.asarray(st.tiles[0, :, :, 0])
        white = np.random.default_rng(0).random(tile.shape)

        def neighbor_delta(x):
            return np.abs(np.diff(x, axis=0)).mean()

        assert neighbor_delta(tile) > neighbor_delta(white) * 1.2


class TestRenderWithNoiseFlavors:
    @pytest.mark.parametrize(
        "color", [NoiseColor.BLUE, NoiseColor.SPATIO_TEMPORAL_BLUE]
    )
    def test_matches_white_mean(self, color):
        scene, cs = book_scenes.single_sphere()
        w = h = 24
        cam = camera_mod.make_camera(
            cs.origin, cs.look_at, cs.up, cs.vertical_fov, 1.0,
            focus_distance=cs.focus_distance,
        )
        st = randomsource.make_noise_state(color, seed=3)
        acc = film.zero_accumulators(w * h)
        acc, _ = renderer.render_batch(
            scene, cam, acc, jax.random.PRNGKey(0),
            width=w, height=h, samples=8, trace_depth=5,
            noise_color=int(color), noise_state=st,
        )
        acc_w = film.zero_accumulators(w * h)
        acc_w, _ = renderer.render_batch(
            scene, cam, acc_w, jax.random.PRNGKey(0),
            width=w, height=h, samples=8, trace_depth=5,
        )
        a = float(jnp.mean(acc.color))
        b = float(jnp.mean(acc_w.color))
        assert a == pytest.approx(b, rel=0.05)

    def test_driver_with_blue_noise(self):
        scene, cs = book_scenes.single_sphere()
        r = driver.ProgressiveRenderer(
            scene, cs,
            RenderSettings(
                width=16, height=16, samples_per_pixel=2, trace_depth=4,
                samples_per_batch_range=(2, 2), adaptive_sampling=False,
                noise_color=NoiseColor.BLUE,
            ),
        )
        r.run()
        assert r.complete
        img = np.asarray(r.images()["color"])
        assert np.isfinite(img).all()
