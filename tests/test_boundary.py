"""Silhouette boundary-gradient tests: with the edge-sampling term,
full-frame geometry gradients match finite differences of the expected
loss, and position inverse rendering actually converges (the boundary-aware
version of the xfailed test in test_inverse.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracing_in_one_weekend_tpu.core import camera as camera_mod
from raytracing_in_one_weekend_tpu.diff import boundary, inverse, params as params_mod
from raytracing_in_one_weekend_tpu.models import book_scenes
from raytracing_in_one_weekend_tpu.render import renderer

W = H = 24
SPP = 64  # high spp so FD measures the expected loss, not sampling noise
DEPTH = 4


@pytest.fixture(scope="module")
def setup():
    scene, cs = book_scenes.single_sphere()
    cam = camera_mod.make_camera(
        cs.origin, cs.look_at, cs.up, cs.vertical_fov, W / H,
        focus_distance=cs.focus_distance,
    )
    target = renderer.render_image(
        scene, cam, jax.random.PRNGKey(5),
        width=W, height=H, samples_per_pixel=SPP, trace_depth=DEPTH,
    ).color

    @jax.jit
    def render(p, k):
        s = params_mod.apply_params(scene, p)
        return renderer.render_image(
            s, cam, k, width=W, height=H,
            samples_per_pixel=SPP, trace_depth=DEPTH,
        ).color

    def image_loss(img):
        return jnp.mean((img - target) ** 2)

    vg = jax.jit(
        boundary.value_and_grad_with_boundary(
            render, image_loss, lambda p: params_mod.apply_params(scene, p),
            cam, W, H,
            boundary.BoundaryConfig(
                samples_per_sphere=512, trace_depth=DEPTH, probe_spp=8
            ),
        )
    )
    return scene, cam, render, image_loss, vg


def _fd(render, image_loss, base_params, name, index, eps, keys):
    """Central FD of the expected loss wrt one scalar, CRN-averaged."""
    out = []
    for k in keys:
        def loss_at(delta):
            p = dict(base_params)
            arr = np.array(p[name], np.float64)
            arr.reshape(-1)[index] += delta
            p[name] = jnp.asarray(arr, jnp.float32)
            return float(image_loss(render(p, k)))

        out.append((loss_at(eps) - loss_at(-eps)) / (2 * eps))
    return float(np.mean(out))


class TestBoundaryGradients:
    @pytest.mark.parametrize("axis", [0, 1, 2])
    def test_center_gradient_fullframe_allclose(self, setup, axis):
        scene, cam, render, image_loss, vg = setup
        base = {
            "sphere_centers": scene.spheres.center
            + jnp.asarray([[0.05, 0.03, 0.04], [0.0, 0.0, 0.0]])
        }
        keys = [jax.random.PRNGKey(i) for i in range(2)]
        ad = np.mean(
            [np.asarray(vg(base, k)[1]["sphere_centers"]) for k in keys], axis=0
        )
        fd = _fd(render, image_loss, base, "sphere_centers", axis, 4e-3, keys)
        # full-frame gradient (silhouette-dominated) must match FD
        assert np.isfinite(ad).all()
        assert np.sign(ad[0, axis]) == np.sign(fd) or abs(fd) < 2e-3
        assert abs(ad[0, axis] - fd) < max(0.35 * abs(fd), 5e-3), (
            ad[0, axis], fd,
        )

    def test_radius_gradient_fullframe(self, setup):
        scene, cam, render, image_loss, vg = setup
        base = {
            "sphere_radii": scene.spheres.radius + jnp.asarray([0.04, 0.0])
        }
        keys = [jax.random.PRNGKey(i) for i in range(2)]
        ad = np.mean(
            [np.asarray(vg(base, k)[1]["sphere_radii"]) for k in keys], axis=0
        )
        fd = _fd(render, image_loss, base, "sphere_radii", 0, 4e-3, keys)
        assert np.isfinite(ad).all()
        assert np.sign(ad[0]) == np.sign(fd)
        assert abs(ad[0] - fd) < max(0.35 * abs(fd), 5e-3), (ad[0], fd)


class TestBoundaryInverse:
    def test_recover_sphere_position_with_boundary(self):
        scene, cs = book_scenes.single_sphere()
        cam = camera_mod.make_camera(
            cs.origin, cs.look_at, cs.up, cs.vertical_fov, 1.0,
            focus_distance=cs.focus_distance,
        )
        config = inverse.InverseRenderConfig(
            width=32, height=32, samples_per_pixel=8, trace_depth=4,
            learning_rate=8e-3, steps=50,
            use_boundary=True, boundary_samples=128,
        )
        target = renderer.render_image(
            scene, cam, jax.random.PRNGKey(5),
            width=32, height=32, samples_per_pixel=32, trace_depth=4,
        ).color

        true_centers = scene.spheres.center
        perturbed = true_centers + jnp.asarray(
            [[0.06, -0.05, 0.05], [0.0, 0.0, 0.0]]
        )
        mask = {
            "sphere_centers": jnp.asarray([[1.0, 1.0, 1.0], [0.0, 0.0, 0.0]])
        }
        final, losses = inverse.optimize(
            scene, cam, target, {"sphere_centers": perturbed},
            config, grad_mask=mask,
        )
        err0 = float(jnp.abs(perturbed[0] - true_centers[0]).max())
        err1 = float(jnp.abs(final["sphere_centers"][0] - true_centers[0]).max())
        assert err1 < err0 * 0.5, (err0, err1, losses[:3], losses[-3:])
