"""Learned denoiser (render/denoise_ml) — the OIDN-slot CNN.

Reference: the OIDN "RT" HDR filter the reference binds via P/Invoke
(DenoiseJobs.cs:11-40) — same color/normal/albedo AOV contract.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracing_in_one_weekend_tpu.render import denoise_ml


def test_identity_at_init():
    """Zero-initialized head => untrained net is the identity, so an
    untrained LEARNED mode can never corrupt an image."""
    p = denoise_ml.init_params(jax.random.PRNGKey(0))
    c = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (32 * 32, 3)))
    n = jax.random.normal(jax.random.PRNGKey(2), (32 * 32, 3))
    a = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (32 * 32, 3)))
    out = denoise_ml.denoise(c, n, a, width=32, height=32, params=p)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(c), rtol=1e-5, atol=1e-5
    )


def test_overfit_tiny_batch():
    """The training step machinery reduces the loss on a tiny synthetic
    problem (noisy = clean + gaussian noise)."""
    import optax

    key = jax.random.PRNGKey(0)
    clean = jnp.abs(jax.random.normal(key, (4, 32, 32, 3))) * 0.5
    noise = 0.3 * jax.random.normal(jax.random.PRNGKey(1), clean.shape)
    noisy = jnp.maximum(clean + noise, 0.0)
    normal = jax.random.normal(jax.random.PRNGKey(2), clean.shape)
    albedo = clean  # a perfectly informative guide

    params = denoise_ml.init_params(jax.random.PRNGKey(3))
    opt = optax.adam(3e-3)
    state = opt.init(params)

    def loss_fn(p):
        pred = denoise_ml.apply(p, noisy, normal, albedo)
        return jnp.mean((pred - clean) ** 2)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss_fn)(p)
        up, s = opt.update(g, s)
        return optax.apply_updates(p, up), s, l

    l0 = float(loss_fn(params))
    for _ in range(150):
        params, state, l = step(params, state)
    assert float(l) < 0.6 * l0, (l0, float(l))


@pytest.mark.skipif(
    not os.path.exists(denoise_ml.WEIGHTS_PATH),
    reason="no shipped denoiser weights",
)
def test_shipped_weights_reduce_noise():
    """The shipped weights must beat the noisy input on a fresh render
    (a seed/size the training script never saw)."""
    from raytracing_in_one_weekend_tpu.core import camera as camera_mod
    from raytracing_in_one_weekend_tpu.models import book_scenes
    from raytracing_in_one_weekend_tpu.render import renderer

    w = h = 48
    scene, cs = book_scenes.three_spheres()
    camera = camera_mod.make_camera(
        cs.origin, cs.look_at, cs.up, cs.vertical_fov, 1.0,
        aperture=cs.aperture, focus_distance=cs.focus_distance,
    )
    clean = renderer.render_image(
        scene, camera, jax.random.PRNGKey(123), width=w, height=h,
        samples_per_pixel=96, trace_depth=5, differentiable=False,
    )
    noisy = renderer.render_image(
        scene, camera, jax.random.PRNGKey(77), width=w, height=h,
        samples_per_pixel=4, trace_depth=5, differentiable=False,
    )
    out = denoise_ml.denoise(
        noisy.color, noisy.normal, noisy.albedo, width=w, height=h
    )
    mse_in = float(jnp.mean((noisy.color - clean.color) ** 2))
    mse_out = float(jnp.mean((out - clean.color) ** 2))
    assert mse_out < 0.8 * mse_in, (mse_in, mse_out)


def test_auto_select_rule():
    # the measured decision rule (denoise_ml.select_mode): dark/emissive
    # images route to the learned net, bright ones to a-trous
    from raytracing_in_one_weekend_tpu.render import denoise_ml
    from raytracing_in_one_weekend_tpu.utils.config import DenoiseMode

    dark = jnp.full((64, 3), 0.05)
    bright = jnp.full((64, 3), 0.6)
    assert denoise_ml.select_mode(dark) == DenoiseMode.LEARNED
    assert denoise_ml.select_mode(bright) == DenoiseMode.ATROUS
    # HDR highlights are clipped before the mean (an emissive scene with
    # a blown-out light is still a dark scene)
    spiky = jnp.full((64, 3), 0.02).at[0].set(1000.0)
    assert denoise_ml.select_mode(spiky) == DenoiseMode.LEARNED


def test_driver_auto_denoise():
    from raytracing_in_one_weekend_tpu.models import book_scenes
    from raytracing_in_one_weekend_tpu.render import driver
    from raytracing_in_one_weekend_tpu.utils.config import (
        DenoiseMode, RenderSettings,
    )

    scene, cs = book_scenes.single_sphere()
    r = driver.ProgressiveRenderer(
        scene, cs,
        RenderSettings(
            width=16, height=16, samples_per_pixel=2, trace_depth=3,
            samples_per_batch_range=(2, 2), adaptive_sampling=False,
            denoise_mode=DenoiseMode.AUTO,
        ),
    )
    r.run()
    img = r.combined()
    assert bool(jnp.all(jnp.isfinite(img.color)))
