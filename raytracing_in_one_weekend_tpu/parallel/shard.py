"""Device-mesh sharding of the render pipeline.

The reference's only parallelism is a shared-memory IJobParallelFor over
pixels (Raytracer.cs:730; SURVEY.md section 2.7).  The TPU-native
counterpart is a `jax.sharding.Mesh` with two logical axes:

  * "tiles"   — data parallelism over the pixel grid (the reference's
                pixel-parallel axis, scaled across chips/hosts)
  * "samples" — sample parallelism over samples-per-pixel (the renderer's
                "sequence" axis, SURVEY.md section 5): each group of chips
                renders the full image with a disjoint sample stream and
                accumulators are psum'd across the axis

Scene parameters and the BVH are tiny and replicated; gradients and metric
reductions become XLA collectives (psum over ICI) inserted automatically by
GSPMD from the sharding annotations — no hand-written NCCL analog.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TILE_AXIS = "tiles"
SAMPLE_AXIS = "samples"


def make_mesh(
    devices=None, sample_parallel: int = 1
) -> Mesh:
    """Build a (tiles, samples) mesh over the available devices.

    sample_parallel divides the device count; the remainder becomes the
    pixel-tile axis.  With one device this degenerates gracefully (1x1).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % sample_parallel != 0:
        raise ValueError(
            f"sample_parallel={sample_parallel} must divide device count {n}"
        )
    tiles = n // sample_parallel
    grid = np.asarray(devices).reshape(tiles, sample_parallel)
    return Mesh(grid, (TILE_AXIS, SAMPLE_AXIS))


def pixel_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (pixel) axis sharded over tiles, replicated over samples."""
    return NamedSharding(mesh, P(TILE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def constrain_pixels(mesh: Mesh, tree: Any) -> Any:
    """with_sharding_constraint: every leaf's leading axis over tiles."""
    sharding = pixel_sharding(mesh)

    def _c(x):
        if x.ndim == 0:
            return x
        return jax.lax.with_sharding_constraint(x, sharding)

    return jax.tree.map(_c, tree)


def place_scene(mesh: Mesh, scene):
    """Replicate the scene pytree on every device (the reference's
    'BVH + materials are shared memory' become replicated params)."""
    return jax.device_put(scene, replicated(mesh))


def place_accumulators(mesh: Mesh, acc):
    """Shard the per-pixel accumulators over the tile axis."""
    return jax.device_put(acc, pixel_sharding(mesh))


def padded_pixel_count(pixel_count: int, mesh: Mesh) -> int:
    """Pixels must divide evenly over the tile axis; pad to a multiple."""
    tiles = mesh.shape[TILE_AXIS]
    return int(math.ceil(pixel_count / tiles) * tiles)


# ---------------------------------------------------------------------------
# Sharded render + train steps
# ---------------------------------------------------------------------------


def sharded_render_batch(
    mesh: Mesh,
    scene,
    camera,
    acc,
    key,
    *,
    width: int,
    height: int,
    samples: int,
    trace_depth: int,
    sub_pixel_jitter: bool = True,
):
    """Pixel-tile-sharded progressive batch step.

    The sample loop additionally splits across the mesh's sample axis:
    each sample-group accumulates `samples / sample_axis` samples with an
    independent key, and the per-pixel sums are psum'd — an all-reduce over
    ICI, overlapping with the next tile's compute (XLA schedules it).
    """
    from raytracing_in_one_weekend_tpu.render import film as film_mod
    from raytracing_in_one_weekend_tpu.render import renderer as renderer_mod

    n_sample_groups = mesh.shape[SAMPLE_AXIS]
    if samples % n_sample_groups != 0:
        raise ValueError(
            f"samples={samples} must divide over sample axis {n_sample_groups}"
        )

    def step(scene, camera, acc, key):
        acc = constrain_pixels(mesh, acc)

        if n_sample_groups == 1:
            new_acc, metrics = renderer_mod.render_batch(
                scene, camera, acc, key,
                width=width, height=height, samples=samples,
                trace_depth=trace_depth, sub_pixel_jitter=sub_pixel_jitter,
            )
            return constrain_pixels(mesh, new_acc), metrics

        # sample-axis parallelism: each group renders samples/n with its
        # own key; the delta-accumulators are summed (GSPMD -> psum).
        group_keys = jax.random.split(key, n_sample_groups)
        zero = film_mod.zero_accumulators(width * height)

        def group(gkey):
            delta, gmetrics = renderer_mod.render_batch(
                scene, camera, zero, gkey,
                width=width, height=height,
                samples=samples // n_sample_groups,
                trace_depth=trace_depth, sub_pixel_jitter=sub_pixel_jitter,
            )
            return delta, gmetrics.pixel_rays

        deltas, group_pixel_rays = jax.vmap(group)(group_keys)
        deltas = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(SAMPLE_AXIS, TILE_AXIS))
            ),
            deltas,
        )
        summed = jax.tree.map(lambda x: jnp.sum(x, axis=0), deltas)
        pixel_rays = jnp.sum(group_pixel_rays, axis=0)
        new_acc = film_mod.Accumulators(
            color=acc.color + summed.color,
            sample_count=acc.sample_count + summed.sample_count,
            normal=acc.normal + summed.normal,
            albedo=acc.albedo + summed.albedo,
            weight=acc.weight + summed.weight,
            fallback_normal=jnp.where(
                (acc.sample_count == 0)[:, None],
                summed.fallback_normal, acc.fallback_normal,
            ),
            fallback_albedo=jnp.where(
                (acc.sample_count == 0)[:, None],
                summed.fallback_albedo, acc.fallback_albedo,
            ),
        )
        new_acc = constrain_pixels(mesh, new_acc)
        return new_acc, renderer_mod._reduce_metrics(new_acc, pixel_rays)

    return jax.jit(step, donate_argnums=(2,))(scene, camera, acc, key)


def make_sharded_train_step(
    mesh: Mesh,
    scene_template,
    camera,
    target_image,
    optimizer,
    *,
    width: int,
    height: int,
    samples_per_pixel: int,
    trace_depth: int,
):
    """Jitted, mesh-sharded inverse-rendering train step.

    Scene parameters are replicated; the rendered image and target are
    pixel-sharded; the photometric loss mean and the parameter gradients
    contract over the sharded pixel axis, which GSPMD lowers to psum over
    ICI (the BASELINE 'gradients all-reduced overlapped with the backward
    sweep' north star — XLA's latency-hiding scheduler does the overlap).
    """
    from raytracing_in_one_weekend_tpu.diff import params as params_mod
    from raytracing_in_one_weekend_tpu.render import renderer as renderer_mod

    target_image = jax.device_put(target_image, pixel_sharding(mesh))

    def loss_fn(params, key):
        scene = params_mod.apply_params(scene_template, params)
        img = renderer_mod.render_image(
            scene, camera, key,
            width=width, height=height,
            samples_per_pixel=samples_per_pixel, trace_depth=trace_depth,
        )
        color = constrain_pixels(mesh, img.color)
        return jnp.mean((color - target_image) ** 2)

    @jax.jit
    def train_step(params, opt_state, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return train_step
