"""Inverse rendering: optimize scene parameters from a target image.

BASELINE.json config 4 — "optimize sphere positions/albedo/IOR from target
image".  The optimizer step is one jitted function: render with the current
parameters, L2 loss against the target, backprop through the whole wavefront
integrator, optax update.  On a device mesh the gradient is psum'd across
the pixel-sharded render (see parallel/shard.py), which is the distributed
north star of BASELINE.json.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from raytracing_in_one_weekend_tpu.core import rng
from raytracing_in_one_weekend_tpu.core.camera import Camera
from raytracing_in_one_weekend_tpu.diff import params as params_mod
from raytracing_in_one_weekend_tpu.render import renderer
from raytracing_in_one_weekend_tpu.scene.scene import Scene


class InverseRenderConfig(NamedTuple):
    width: int = 64
    height: int = 64
    samples_per_pixel: int = 8
    trace_depth: int = 6
    learning_rate: float = 2e-2
    steps: int = 100
    # Silhouette boundary gradients (diff/boundary.py) — required for
    # geometry (position/radius) optimization; interior-only gradients
    # cannot see coverage changes.
    use_boundary: bool = False
    boundary_samples: int = 128
    boundary_probe_spp: int = 2  # L_in/L_out probes per edge sample —
    # raise in enclosed indirect-lit scenes (Cornell class) where 2-spp
    # radiance estimates make the edge gradient a random walk
    # Unbiased L2: E[(X-t)(Y-t)] = (E[X]-t)^2 for independent renders
    # X, Y — the plain MC L2 carries a +Var(X) term that rewards
    # variance reduction, so noisy indirect-lit scenes (Cornell class)
    # descend into dark-albedo/bright-light minima.  Costs 2x per step
    # (two renders, each half spp).  Not composed with use_boundary.
    unbiased_l2: bool = False


def make_loss_fn(
    scene_template: Scene,
    camera: Camera,
    target_image: jnp.ndarray,  # (P, 3) linear
    config: InverseRenderConfig,
) -> Callable[[dict[str, Any], jax.Array], jnp.ndarray]:
    def render_color(params: dict[str, Any], key: jax.Array, spp: int):
        scene = params_mod.apply_params(scene_template, params)
        return renderer.render_image(
            scene, camera, key,
            width=config.width, height=config.height,
            samples_per_pixel=spp,
            trace_depth=config.trace_depth,
        ).color

    if config.unbiased_l2:

        def loss_fn(params: dict[str, Any], key: jax.Array) -> jnp.ndarray:
            ka, kb = jax.random.split(key)
            spp = max(1, config.samples_per_pixel // 2)
            ra = render_color(params, ka, spp) - target_image
            rb = render_color(params, kb, spp) - target_image
            return jnp.mean(ra * rb)

    else:

        def loss_fn(params: dict[str, Any], key: jax.Array) -> jnp.ndarray:
            img = render_color(params, key, config.samples_per_pixel)
            return jnp.mean((img - target_image) ** 2)

    return loss_fn


def optimize(
    scene_template: Scene,
    camera: Camera,
    target_image: jnp.ndarray,
    init_params: dict[str, Any],
    config: InverseRenderConfig = InverseRenderConfig(),
    seed: int = 0,
    callback=None,
    grad_mask: dict[str, Any] | None = None,
    project: Callable[[dict[str, Any]], dict[str, Any]] | None = None,
) -> tuple[dict[str, Any], list[float]]:
    """Adam descent on the photometric loss; fresh sample stream per step
    (re-randomized MC gradients avoid overfitting the noise pattern).

    grad_mask: optional pytree matching init_params; gradients are
    multiplied elementwise (1 = optimize, 0 = freeze), the analog of
    selecting which scene objects are exposed to the optimizer.

    project: optional projection applied to the params after each update
    (projected gradient descent) — e.g. clamping albedos to [0, 1] so an
    emission/albedo-ambiguous loss cannot escape into unphysical >1
    albedos that amplify radiance at every bounce.
    """
    optimizer = optax.adam(config.learning_rate)
    opt_state = optimizer.init(init_params)

    if config.use_boundary and config.unbiased_l2:
        raise ValueError(
            "unbiased_l2 is not composed with use_boundary: the boundary "
            "branch builds its own single-render L2 (the silhouette term "
            "needs one g_image); raise samples_per_pixel there instead."
        )
    if config.use_boundary:
        from raytracing_in_one_weekend_tpu.diff import boundary

        def render_fn(params, key):
            scene = params_mod.apply_params(scene_template, params)
            img = renderer.render_image(
                scene, camera, key,
                width=config.width, height=config.height,
                samples_per_pixel=config.samples_per_pixel,
                trace_depth=config.trace_depth,
            )
            return img.color

        adjacency = (
            boundary.build_triangle_adjacency(scene_template)
            if "triangle_vertices" in init_params else None
        )
        value_and_grad = boundary.value_and_grad_with_boundary(
            render_fn,
            lambda img: jnp.mean((img - target_image) ** 2),
            lambda p: params_mod.apply_params(scene_template, p),
            camera, config.width, config.height,
            boundary.BoundaryConfig(
                samples_per_sphere=config.boundary_samples,
                trace_depth=config.trace_depth,
                probe_spp=config.boundary_probe_spp,
            ),
            triangle_adjacency=adjacency,
        )
    else:
        loss_fn = make_loss_fn(scene_template, camera, target_image, config)
        value_and_grad = jax.value_and_grad(loss_fn)

    @jax.jit
    def step(params, opt_state, key):
        loss, grads = value_and_grad(params, key)
        if grad_mask is not None:
            grads = jax.tree.map(lambda g, m: g * m, grads, grad_mask)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if project is not None:
            params = project(params)
        return params, opt_state, loss

    params = init_params
    key = jax.random.PRNGKey(seed)
    losses: list[float] = []
    for i in range(config.steps):
        params, opt_state, loss = step(params, opt_state, rng.batch_key(key, i))
        losses.append(float(loss))
        if callback is not None:
            callback(i, params, float(loss))
    return params, losses
