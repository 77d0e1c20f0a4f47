"""Tape-replay differentiable fused path (ops/megatrace_replay).

Oracle 1: the jnp replay of the kernel's tape reproduces the kernel's own
color/count outputs (same PRNG, same branch rules — only float
reassociation differs).
Oracle 2: custom_vjp gradients match finite differences of the primal
(the kernel forward), the same validation gate as tests/test_grad.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracing_in_one_weekend_tpu.core import camera as camera_mod
from raytracing_in_one_weekend_tpu.core import materials
from raytracing_in_one_weekend_tpu.models import book_scenes
from raytracing_in_one_weekend_tpu.ops import megatrace_replay, pallas_megatrace


def _setup(scene_fn, w, h):
    scene, cs = scene_fn()
    camera = camera_mod.make_camera(
        cs.origin, cs.look_at, cs.up, cs.vertical_fov, w / h,
        aperture=cs.aperture, focus_distance=cs.focus_distance,
    )
    packed = materials.pack_materials(scene)
    records = jnp.concatenate(
        [
            packed[scene.spheres.material][:, :11],
            scene.spheres.material[:, None].astype(jnp.float32),
        ],
        axis=1,
    )
    return scene, camera, records


class TestReplayParity:
    @pytest.mark.parametrize("scene_fn", [
        book_scenes.three_spheres, book_scenes.single_sphere,
    ])
    def test_replay_reproduces_kernel(self, scene_fn):
        w = h = 24
        s, d = 4, 6
        scene, camera, records = _setup(scene_fn, w, h)
        assert megatrace_replay.replay_eligible(scene)
        lane_count = jnp.full((w * h,), s, jnp.int32)
        cam_row = pallas_megatrace.pack_camera_row(camera, w, h)
        out = pallas_megatrace.sample_batch(
            lane_count, jnp.zeros((w * h,)), cam_row,
            scene.spheres.center, scene.spheres.radius, records,
            scene.environment.sky_bottom, scene.environment.sky_top,
            jnp.int32(13), samples=s, trace_depth=d,
            has_dielectrics=scene.flags.has_dielectrics, sky_on=True,
            hw_prng=False, want_tape=True, interpret=True,
        )
        csum, cnt = megatrace_replay.replay(
            out["tape"], lane_count, cam_row,
            scene.spheres.center, scene.spheres.radius, records,
            scene.environment.sky_bottom, scene.environment.sky_top,
            jnp.int32(13), samples=s, trace_depth=d,
            has_dielectrics=scene.flags.has_dielectrics, sky_on=True,
        )
        np.testing.assert_allclose(
            np.asarray(cnt), np.asarray(out["count"]), atol=0
        )
        np.testing.assert_allclose(
            np.asarray(csum), np.asarray(out["color"]), rtol=2e-4,
            atol=2e-4,
        )

    def test_gradients_match_finite_differences(self):
        # interior-masked loss (tests/test_grad.py protocol): silhouette
        # boundary terms are excluded, so common-random-number FD
        # differentiates the same smooth estimator the detached-decision
        # VJP computes
        from raytracing_in_one_weekend_tpu.diff import gradcheck

        w = h = 24
        s, d = 4, 4
        scene, camera, records = _setup(book_scenes.single_sphere, w, h)
        lane_count = jnp.full((w * h,), s, jnp.int32)
        cam_row = pallas_megatrace.pack_camera_row(camera, w, h)
        mask = np.zeros((h, w), np.float32)
        mask[9:15, 9:15] = 1.0  # strictly inside the silhouette
        mask = jnp.asarray(mask.reshape(-1))

        def loss(centers):
            out = megatrace_replay.sample_batch_diff(
                lane_count, jnp.zeros((w * h,)), cam_row,
                centers, scene.spheres.radius, records,
                scene.environment.sky_bottom, scene.environment.sky_top,
                jnp.int32(5), samples=s, trace_depth=d,
                has_dielectrics=scene.flags.has_dielectrics, sky_on=True,
                jitter=False, interpret=True,
            )
            img = out["color"] / jnp.maximum(out["count"], 1.0)[:, None]
            sq = jnp.sum(img**2, axis=-1)
            return jnp.sum(sq * mask) / jnp.sum(mask)

        report = gradcheck.check_grads(
            loss, scene.spheres.center, eps=1e-3, rtol=0.15, atol=2e-3
        )
        assert report["cosine"] > 0.99, report
        assert report["rel_err"] < 0.15, report

    def test_radius_gradients_match_finite_differences(self):
        from raytracing_in_one_weekend_tpu.diff import gradcheck

        w = h = 24
        s, d = 4, 4
        scene, camera, records = _setup(book_scenes.single_sphere, w, h)
        lane_count = jnp.full((w * h,), s, jnp.int32)
        cam_row = pallas_megatrace.pack_camera_row(camera, w, h)
        mask = np.zeros((h, w), np.float32)
        mask[9:15, 9:15] = 1.0
        mask = jnp.asarray(mask.reshape(-1))

        def loss(radii):
            out = megatrace_replay.sample_batch_diff(
                lane_count, jnp.zeros((w * h,)), cam_row,
                scene.spheres.center, radii, records,
                scene.environment.sky_bottom, scene.environment.sky_top,
                jnp.int32(5), samples=s, trace_depth=d,
                has_dielectrics=scene.flags.has_dielectrics, sky_on=True,
                jitter=False, interpret=True,
            )
            img = out["color"] / jnp.maximum(out["count"], 1.0)[:, None]
            sq = jnp.sum(img**2, axis=-1)
            return jnp.sum(sq * mask) / jnp.sum(mask)

        report = gradcheck.check_grads(
            loss, scene.spheres.radius, eps=1e-3, rtol=0.15, atol=2e-3
        )
        assert report["cosine"] > 0.99, report

    def test_albedo_gradients_flow(self):
        w = h = 12
        s, d = 2, 4
        scene, camera, records = _setup(book_scenes.single_sphere, w, h)
        lane_count = jnp.full((w * h,), s, jnp.int32)
        cam_row = pallas_megatrace.pack_camera_row(camera, w, h)

        def loss(recs):
            out = megatrace_replay.sample_batch_diff(
                lane_count, jnp.zeros((w * h,)), cam_row,
                scene.spheres.center, scene.spheres.radius, recs,
                scene.environment.sky_bottom, scene.environment.sky_top,
                jnp.int32(3), samples=s, trace_depth=d,
                has_dielectrics=scene.flags.has_dielectrics, sky_on=True,
                interpret=True,
            )
            return jnp.mean(out["color"])

        g = jax.grad(loss)(records)
        # albedo rows (cols 1-3) of some material must have signal
        assert float(jnp.max(jnp.abs(g[:, 1:4]))) > 1e-6
