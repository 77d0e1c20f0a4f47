"""Sharding tests on the 8-device virtual CPU mesh: sharded renders match
single-device renders bitwise (position-stable key discipline), and the
sharded train step runs with replicated params + psum'd gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from raytracing_in_one_weekend_tpu.core import camera as camera_mod
from raytracing_in_one_weekend_tpu.models import book_scenes
from raytracing_in_one_weekend_tpu.parallel import shard
from raytracing_in_one_weekend_tpu.render import film, renderer

W = H = 32


@pytest.fixture(scope="module")
def setup():
    scene, cs = book_scenes.single_sphere()
    cam = camera_mod.make_camera(
        cs.origin, cs.look_at, cs.up, cs.vertical_fov, W / H,
        focus_distance=cs.focus_distance,
    )
    return scene, cam


def test_eight_devices_available():
    assert len(jax.devices()) == 8


class TestShardedRender:
    def test_matches_single_device_bitwise(self, setup):
        scene, cam = setup
        key = jax.random.PRNGKey(0)

        acc1 = film.zero_accumulators(W * H)
        acc1, m1 = renderer.render_batch_jit(
            scene, cam, acc1, key, jnp.asarray(0, jnp.int32),
            width=W, height=H, samples=4, trace_depth=6,
        )

        mesh = shard.make_mesh()  # 8 tiles x 1 sample group
        acc8 = shard.place_accumulators(mesh, film.zero_accumulators(W * H))
        scene8 = shard.place_scene(mesh, scene)
        acc8, m8 = shard.sharded_render_batch(
            mesh, scene8, cam, acc8, key,
            width=W, height=H, samples=4, trace_depth=6,
        )
        np.testing.assert_array_equal(
            np.asarray(acc1.color), np.asarray(acc8.color)
        )
        np.testing.assert_array_equal(
            np.asarray(acc1.sample_count), np.asarray(acc8.sample_count)
        )
        assert int(m1.total_rays) == int(m8.total_rays)

    def test_output_sharding_is_tiled(self, setup):
        scene, cam = setup
        mesh = shard.make_mesh()
        acc = shard.place_accumulators(mesh, film.zero_accumulators(W * H))
        acc, _ = shard.sharded_render_batch(
            mesh, shard.place_scene(mesh, scene), cam, acc,
            jax.random.PRNGKey(0),
            width=W, height=H, samples=2, trace_depth=4,
        )
        # the accumulator stays sharded over tiles (no silent gather)
        shards = acc.color.addressable_shards
        assert len(shards) == 8
        assert shards[0].data.shape[0] == (W * H) // 8

    def test_sample_axis_parallelism(self, setup):
        scene, cam = setup
        mesh = shard.make_mesh(sample_parallel=2)  # 4 tiles x 2 samples
        assert mesh.shape == {"tiles": 4, "samples": 2}
        acc = shard.place_accumulators(mesh, film.zero_accumulators(W * H))
        acc, metrics = shard.sharded_render_batch(
            mesh, shard.place_scene(mesh, scene), cam, acc,
            jax.random.PRNGKey(1),
            width=W, height=H, samples=4, trace_depth=4,
        )
        counts = np.asarray(acc.sample_count)
        # both sample groups contributed: up to 4 valid samples per pixel
        assert counts.max() == 4.0
        assert float(metrics.max_sample_count) == 4.0


class TestShardedTrain:
    def test_train_step_runs_and_descends(self, setup):
        scene, cam = setup
        mesh = shard.make_mesh()
        target = renderer.render_image(
            scene, cam, jax.random.PRNGKey(9),
            width=W, height=H, samples_per_pixel=8, trace_depth=4,
        ).color

        optimizer = optax.adam(5e-2)
        step = shard.make_sharded_train_step(
            mesh, scene, cam, target, optimizer,
            width=W, height=H, samples_per_pixel=2, trace_depth=4,
        )
        params = {
            "texture_colors": jnp.clip(scene.textures.main_color + 0.25, 0, 1)
        }
        opt_state = optimizer.init(params)
        losses = []
        key = jax.random.PRNGKey(3)
        for i in range(10):
            params, opt_state, loss = step(
                params, opt_state, jax.random.fold_in(key, i)
            )
            losses.append(float(loss))
        assert losses[-1] < losses[0]
