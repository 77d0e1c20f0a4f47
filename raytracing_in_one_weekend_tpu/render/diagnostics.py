"""Diagnostics: per-pixel buffer views and path debugging.

Reference:
  * Diagnostics buffer + inspector buffer views rendered through an
    inferno-colormap range shader (Unity/Raytracer.cs:54-64,239-250,
    997-1055; Shaders/Debug/ViewRange.shader:54+), with per-pixel RayCount
    always on and BoundsHitCount / CandidateCount / SampleCountWeight under
    FULL_DIAGNOSTICS (SampleBatchJob.cs:44-51).
  * PATH_DEBUGGING: the full bounce polyline of a chosen pixel recorded by
    the kernel and drawn as editor gizmo lines (SampleBatchJob.cs:53-56,
    96-101,304-307; Raytracer.Editor.cs:126-141).

TPU-native form: buffer views are pure functions over the batch metrics /
accumulators producing colormapped uint8 images; the path debugger re-runs
the bounce loop for a 1-ray wavefront and returns the polyline as arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from raytracing_in_one_weekend_tpu.core import camera as camera_mod
from raytracing_in_one_weekend_tpu.core import materials, rng
from raytracing_in_one_weekend_tpu.ops import intersect
from raytracing_in_one_weekend_tpu.render import film, integrator
from raytracing_in_one_weekend_tpu.utils import image as image_util

VIEWS = ("ray_count", "sample_count", "noise_weight")


def buffer_view(
    view: str,
    acc: film.Accumulators,
    metrics,
    width: int,
    height: int,
) -> np.ndarray:
    """Colormapped (H, W, 3) uint8 diagnostic image (ViewRange analog).

    view: 'ray_count' (last batch per-pixel rays), 'sample_count'
    (accumulated valid samples), 'noise_weight' (adaptive-sampling signal).
    """
    if view == "ray_count":
        values = np.asarray(metrics.pixel_rays, np.float32)
    elif view == "sample_count":
        values = np.asarray(acc.sample_count, np.float32)
    elif view == "noise_weight":
        count = np.maximum(np.asarray(acc.sample_count), 1.0)
        values = np.asarray(acc.weight) / count
    else:
        raise ValueError(f"unknown buffer view {view!r}; one of {VIEWS}")
    colors = image_util.inferno_colormap(values)
    # flat buffers are bottom-up (film.finalize): flip rows for image space
    return (colors.reshape(height, width, 3)[::-1] * 255).astype(np.uint8)


def trace_debug_path(
    scene,
    camera,
    pixel_xy: tuple[int, int],
    width: int,
    height: int,
    key: jax.Array,
    trace_depth: int,
) -> dict[str, np.ndarray]:
    """Record one pixel's bounce polyline (PATH_DEBUGGING analog).

    Returns {'points': (D+1, 3) vertex positions, 'active': (D,) bool mask
    of bounces that were still tracing} — points[i] -> points[i+1] is the
    i-th ray segment while active[i].
    """
    px, py = pixel_xy
    coords = jnp.asarray(
        [[(px + 0.5) / width, (py + 0.5) / height]], jnp.float32
    )
    rays = camera_mod.generate_rays(camera, coords, key)

    if scene.flags.has_volumes:
        inside0 = intersect.point_inside_volume(scene, rays.origin)
    else:
        inside0 = jnp.full((1,), -1, jnp.int32)
    state = integrator.PathState(
        origin=rays.origin,
        direction=rays.direction,
        time=rays.time,
        throughput=jnp.ones((1, 3)),
        radiance=jnp.zeros((1, 3)),
        active=jnp.ones((1,), jnp.bool_),
        valid=jnp.zeros((1,), jnp.bool_),
        inside_volume=inside0,
        aov_normal=jnp.zeros((1, 3)),
        aov_albedo=jnp.zeros((1, 3)),
        got_nonspecular=jnp.zeros((1,), jnp.bool_),
        events=jnp.zeros((1,)),
        logp=jnp.zeros((1,)),
    )
    packed = materials.pack_materials(scene)

    def bounce(state, bounce_index):
        bkey = rng.bounce_key(key, bounce_index)
        new_state = integrator._bounce_once(
            scene, state, bkey, bounce_index, packed, None
        )
        return new_state, (new_state.origin[0], state.active[0])

    _, (origins, actives) = jax.lax.scan(
        bounce, state, jnp.arange(trace_depth)
    )
    points = jnp.concatenate([rays.origin, origins], axis=0)
    return {
        "points": np.asarray(points),
        "active": np.asarray(actives),
    }
