"""Inverse rendering (BASELINE config 4): recover perturbed parameters by
gradient descent on a rendered target."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from raytracing_in_one_weekend_tpu.core import camera as camera_mod
from raytracing_in_one_weekend_tpu.diff import inverse, params as params_mod
from raytracing_in_one_weekend_tpu.models import book_scenes
from raytracing_in_one_weekend_tpu.render import renderer


def _setup(width=32, height=32):
    scene, cs = book_scenes.single_sphere()
    cam = camera_mod.make_camera(
        cs.origin, cs.look_at, cs.up, cs.vertical_fov, width / height,
        focus_distance=cs.focus_distance,
    )
    return scene, cam


class TestInverseRender:
    def test_recover_albedo(self):
        scene, cam = _setup()
        config = inverse.InverseRenderConfig(
            width=32, height=32, samples_per_pixel=4, trace_depth=4,
            learning_rate=5e-2, steps=40,
        )
        target = renderer.render_image(
            scene, cam, jax.random.PRNGKey(99),
            width=32, height=32, samples_per_pixel=16, trace_depth=4,
        ).color

        true_colors = scene.textures.main_color
        init = {"texture_colors": jnp.clip(true_colors + 0.3, 0.0, 1.0)}
        final, losses = inverse.optimize(scene, cam, target, init, config)

        assert losses[-1] < losses[0] * 0.5
        # the (live) albedo texture rows converge toward the truth
        err0 = float(jnp.abs(init["texture_colors"][1:] - true_colors[1:]).mean())
        err1 = float(
            jnp.abs(final["texture_colors"][1:] - true_colors[1:]).mean()
        )
        assert err1 < err0 * 0.6, (err0, err1)

    @pytest.mark.xfail(
        reason="position loss is silhouette-coverage driven; requires the "
        "boundary (edge-sampling) gradient pass — see test_boundary.py for "
        "the boundary-aware version",
        strict=False,
    )
    def test_recover_sphere_position(self):
        scene, cam = _setup()
        config = inverse.InverseRenderConfig(
            width=32, height=32, samples_per_pixel=4, trace_depth=4,
            learning_rate=5e-3, steps=60,
        )
        target = renderer.render_image(
            scene, cam, jax.random.PRNGKey(5),
            width=32, height=32, samples_per_pixel=16, trace_depth=4,
        ).color

        true_centers = scene.spheres.center
        perturbed = true_centers + jnp.asarray(
            [[0.06, 0.0, 0.0], [0.0, 0.0, 0.0]]
        )
        init = {"sphere_centers": perturbed}
        # Only the small sphere's lateral (x) position is exposed; detached
        # sampling gives unbiased *interior* gradients which recover lateral
        # offsets, while scale-like motions (y/z here) need the silhouette
        # boundary term (see diff/ docs) — frozen in this test.
        mask = {
            "sphere_centers": jnp.asarray([[1.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
        }
        final, losses = inverse.optimize(
            scene, cam, target, init, config, grad_mask=mask
        )

        err0 = float(jnp.abs(perturbed[0, 0] - true_centers[0, 0]))
        err1 = float(jnp.abs(final["sphere_centers"][0, 0] - true_centers[0, 0]))
        assert err1 < err0 * 0.5, (err0, err1)
