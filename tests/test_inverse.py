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

    def test_unbiased_l2_matches_plain_in_expectation(self):
        # E[(X-t)(Y-t)] = (E[X]-t)^2: the two-sample loss averaged over
        # many keys must approach the squared bias, without the +Var(X)
        # term the plain MC L2 carries (the term that drives Cornell-class
        # optimizations into dark-albedo minima — diff/inverse.py)
        scene, cam = _setup()
        cfg = inverse.InverseRenderConfig(
            width=16, height=16, samples_per_pixel=4, trace_depth=3,
            unbiased_l2=True,
        )
        exact = renderer.render_image(
            scene, cam, jax.random.PRNGKey(0), width=16, height=16,
            samples_per_pixel=512, trace_depth=3, differentiable=False,
        ).color
        loss_fn = jax.jit(inverse.make_loss_fn(scene, cam, exact, cfg))
        params = {"texture_colors": scene.textures.main_color}
        vals = [
            float(loss_fn(params, jax.random.PRNGKey(k)))
            for k in range(24)
        ]
        # truth-at-truth squared bias is ~0 (same params as the target);
        # the plain L2 at the same spp measures the pure variance floor
        plain = inverse.make_loss_fn(
            scene, cam, exact, cfg._replace(unbiased_l2=False)
        )
        var_floor = float(
            np.mean([
                float(plain(params, jax.random.PRNGKey(k)))
                for k in range(8)
            ])
        )
        # not exactly 0: the per-pixel sum/valid-count ratio estimator
        # carries O(1/spp) bias of its own at 2 spp, and the 512-spp
        # target is itself noisy — but the Var(X) floor must be gone
        assert abs(np.mean(vals)) < 0.5 * var_floor, (
            np.mean(vals), var_floor,
        )

    def test_project_hook_keeps_params_in_range(self):
        scene, cam = _setup()
        config = inverse.InverseRenderConfig(
            width=16, height=16, samples_per_pixel=2, trace_depth=3,
            learning_rate=0.5, steps=6,  # huge lr to force excursions
        )
        target = jnp.zeros((16 * 16, 3), jnp.float32)  # black target
        init = {"texture_colors": scene.textures.main_color}

        def project(p):
            return {"texture_colors": jnp.clip(p["texture_colors"], 0.0, 1.0)}

        final, _ = inverse.optimize(
            scene, cam, target, init, config, project=project
        )
        c = np.asarray(final["texture_colors"])
        assert c.min() >= 0.0 and c.max() <= 1.0

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
