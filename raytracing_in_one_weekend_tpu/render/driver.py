"""Progressive render driver — the control plane.

Reference: the Raytracer MonoBehaviour driver (Unity/Raytracer.cs:73-1508):
its Update() loop (:476-600) drains completed batches, tracks MRays/s,
decides completion, and schedules the next SampleBatchJob; ScheduleSample
(:602-816) builds the camera with an autofocus raycast (:608-612), cycles
the interlace offset (:650-661), and feeds the previous batch's reduced
noise-weight extrema to the adaptive sampler.

TPU-native redesign: the job graph is one donated-accumulator jitted step
(renderer.render_batch_jit); pipelining falls out of JAX async dispatch —
the host enqueues batch N+1 while batch N runs on device (the reference's
self-enqueued extra batch, Raytracer.cs:810-811).  Progressive state
(accumulators + RNG lineage + batch index) is an explicit checkpointable
pytree instead of pooled buffers.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from raytracing_in_one_weekend_tpu.core import camera as camera_mod
from raytracing_in_one_weekend_tpu.core import math3, rng
from raytracing_in_one_weekend_tpu.core.ray import Rays
from raytracing_in_one_weekend_tpu.ops import intersect
from raytracing_in_one_weekend_tpu.render import denoise as denoise_mod
from raytracing_in_one_weekend_tpu.render import film, renderer
from raytracing_in_one_weekend_tpu.scene.scene import Scene
from raytracing_in_one_weekend_tpu.utils import image as image_util
from raytracing_in_one_weekend_tpu.utils import ordering
from raytracing_in_one_weekend_tpu.utils.config import (
    CameraSettings,
    DenoiseMode,
    RenderSettings,
)


def autofocus(scene: Scene, cs: CameraSettings) -> float:
    """Focus distance via a nearest-hit raycast along the camera forward ray.

    Reference: Raytracer.cs:608-612 (HitWorld on the view ray feeding
    focusDistance) over the recursive closest-hit query of
    HitTests.cs:152-196; falls back to |look_at - origin| on a miss.
    """
    if cs.focus_distance is not None:
        return float(cs.focus_distance)
    origin = jnp.asarray([cs.origin], jnp.float32)
    fwd = jnp.asarray([cs.look_at], jnp.float32) - origin
    direction = math3.normalize(fwd)
    hit = intersect.nearest_hit(
        scene, Rays(origin, direction, jnp.zeros((1,)))
    )
    t = float(hit.t[0])
    fallback = float(jnp.linalg.norm(fwd[0]))
    return t if (hit.hit[0] and t < intersect.BIG) else fallback


@dataclasses.dataclass
class BatchStats:
    """Host-side per-batch metrics (Raytracer.cs:106-120 live fields)."""

    batch_index: int
    rays: int
    duration_s: float
    mrays_per_second: float
    min_samples: float
    max_samples: float


class ProgressiveRenderer:
    """Progressive accumulation driver with adaptive sampling, interlacing,
    autofocus, metrics, and checkpoint/resume."""

    def __init__(
        self,
        scene: Scene,
        camera_settings: CameraSettings,
        settings: RenderSettings,
        seed: int = 0,
        use_bvh: bool | None = None,
    ):
        # Auto-BVH only when the scene will actually take the wavefront
        # AND brute force stops being memory-viable there (the dense
        # (rays x triangles) pass OOMs around ~4-5k triangles at 512^2 —
        # measured 40GB requested for 5120).  Fused-kernel scenes need no
        # BVH: triangles sweep dense in VMEM (<= TRI_MAX) or stream
        # per-block from HBM (<= TRI_STREAM_MAX).  Measured on TPU: the
        # gather-heavy wavefront traversal is ~15x SLOWER than the dense
        # VMEM triangle pass at ~1k triangles — lanes are cheap, gathers
        # are not — so the crossover is set by memory, not FLOPs.
        # use_bvh=True/False overrides.
        if use_bvh is None:
            from raytracing_in_one_weekend_tpu.ops import (
                pallas_megatrace,
                pallas_sphere,
            )

            fused = pallas_sphere.use_pallas() and (
                pallas_megatrace.scene_eligible(
                    scene, allow_rect_box=True, allow_volumes=True,
                    allow_motion=True, allow_triangles=True,
                    allow_textures=True, allow_cubemap=True,
                )
            )
            use_bvh = (
                not fused
                and int(scene.triangles.vert0.shape[0]) > 2048
            )
        if use_bvh and scene.bvh is None:
            from raytracing_in_one_weekend_tpu.scene import bvh as bvh_mod

            scene = bvh_mod.attach_bvh(scene, max_depth=settings.max_bvh_depth)
        self.scene = scene
        self.settings = settings
        self.camera_settings = camera_settings
        self.seed = seed
        self.focus_distance = autofocus(scene, camera_settings)
        self.camera = camera_mod.make_camera(
            camera_settings.origin,
            camera_settings.look_at,
            camera_settings.up,
            camera_settings.vertical_fov,
            settings.width / settings.height,
            aperture=camera_settings.aperture,
            focus_distance=self.focus_distance,
        )
        self._interlace_order = ordering.space_filling_series(
            settings.interlacing
        )
        # Sampler flavor tables (RandomSource NoiseColor; None = white).
        from raytracing_in_one_weekend_tpu.core import randomsource

        self.noise_state = randomsource.make_noise_state(
            settings.noise_color, seed=seed + 7
        )
        self.reset()

    # --- progressive state -------------------------------------------------

    def reset(self) -> None:
        """Restart the trace (reference invalidation path,
        Raytracer.cs:482-516)."""
        s = self.settings
        self.acc = film.zero_accumulators(s.pixel_count)
        self.batch_index = 0
        self.weight_extrema = jnp.asarray([0.0, 0.0], jnp.float32)
        self.history: list[BatchStats] = []
        # Dispatched samples per interlace slice; completion is judged on
        # dispatched (not valid) counts so pixels whose samples always fail
        # (depth exhaustion, SampleBatchJob.cs:380-381) cannot stall the
        # trace — the reference likewise advances TotalSamplesPerPixel by
        # the scheduled batch size (Raytracer.cs:537-538).
        self._dispatched = [0] * max(s.interlacing, 1)
        self.last_metrics = None
        self.aborted = False

    @property
    def min_samples_per_pixel(self) -> float:
        """Valid samples of the slowest pixel (Raytracer.cs:537)."""
        if self.batch_index == 0:
            return 0.0
        return self.history[-1].min_samples

    @property
    def dispatched_samples_per_pixel(self) -> int:
        """Samples dispatched for the least-visited interlace slice."""
        return min(self._dispatched)

    @property
    def complete(self) -> bool:
        return (
            self.dispatched_samples_per_pixel
            >= self.settings.samples_per_pixel
        )

    @property
    def avg_mrays_per_second(self) -> float:
        if not self.history:
            return 0.0
        rays = sum(b.rays for b in self.history)
        secs = sum(b.duration_s for b in self.history)
        return rays / max(secs, 1e-9) / 1e6

    def abort(self) -> None:
        """Cooperative cancellation (reference: shared bool polled per pixel,
        SampleBatchJob.cs:61-62; here the host simply stops dispatching)."""
        self.aborted = True

    # --- stepping ------------------------------------------------------------

    def step(self) -> BatchStats:
        """Render one progressive batch (ScheduleSample analog)."""
        s = self.settings
        slice_offset = self._interlace_order[
            self.batch_index % max(s.interlacing, 1)
        ]
        key = rng.batch_key(jax.random.PRNGKey(self.seed), self.batch_index)

        if s.adaptive_sampling:
            sample_range: tuple[int, int] | None = s.samples_per_batch_range
            max_lanes = s.samples_per_batch_range[1]
            extrema = self.weight_extrema
        else:
            sample_range = None
            max_lanes = s.samples_per_batch_range[0]
            extrema = None

        t0 = time.perf_counter()
        self.acc, metrics = renderer.render_batch_jit(
            self.scene,
            self.camera,
            self.acc,
            key,
            jnp.asarray(slice_offset, jnp.int32),
            width=s.width,
            height=s.height,
            samples=max_lanes,
            trace_depth=s.trace_depth,
            sub_pixel_jitter=s.sub_pixel_jitter,
            slice_divider=max(s.interlacing, 1),
            sample_range=sample_range,
            weight_extrema=extrema,
            noise_color=int(s.noise_color),
            noise_state=self.noise_state,
            draw_base=jnp.asarray(self.batch_index * max_lanes, jnp.int32),
        )
        metrics = jax.block_until_ready(metrics)
        duration = time.perf_counter() - t0
        self.last_metrics = metrics

        self.weight_extrema = jnp.stack(
            [metrics.weight_min, metrics.weight_max]
        )
        rays = int(metrics.total_rays)
        stats = BatchStats(
            batch_index=self.batch_index,
            rays=rays,
            duration_s=duration,
            mrays_per_second=rays / max(duration, 1e-9) / 1e6,
            min_samples=float(metrics.min_sample_count),
            max_samples=float(metrics.max_sample_count),
        )
        self.history.append(stats)
        # Adaptive batches guarantee at least the range minimum per pixel.
        self._dispatched[slice_offset] += (
            s.samples_per_batch_range[0] if s.adaptive_sampling else max_lanes
        )
        self.batch_index += 1
        return stats

    def run(
        self,
        max_duration_seconds: float | None = None,
        on_batch: Callable[[BatchStats], None] | None = None,
    ) -> None:
        """Trace to completion (Update-loop analog with stopWhenCompleted /
        maxDurationSeconds semantics, Raytracer.cs:96-100,518-550)."""
        start = time.perf_counter()
        while not self.complete and not self.aborted:
            stats = self.step()
            if on_batch is not None:
                on_batch(stats)
            if (
                max_duration_seconds is not None
                and time.perf_counter() - start >= max_duration_seconds
            ):
                break

    # --- outputs ---------------------------------------------------------------

    def combined(self, debug_mode: bool = False) -> film.CombinedImage:
        s = self.settings
        img = film.combine(
            self.acc, s.width, s.height,
            debug_mode=debug_mode, interlacing=s.interlacing,
        )
        mode = s.denoise_mode
        if mode == DenoiseMode.AUTO:
            from raytracing_in_one_weekend_tpu.render import denoise_ml

            mode = denoise_ml.select_mode(img.color)
        if mode == DenoiseMode.ATROUS:
            img = film.CombinedImage(
                color=denoise_mod.denoise(
                    img.color, img.normal, img.albedo,
                    width=s.width, height=s.height,
                ),
                normal=img.normal,
                albedo=img.albedo,
            )
        elif mode == DenoiseMode.LEARNED:
            from raytracing_in_one_weekend_tpu.render import denoise_ml

            img = film.CombinedImage(
                color=denoise_ml.denoise(
                    img.color, img.normal, img.albedo,
                    width=s.width, height=s.height,
                ),
                normal=img.normal,
                albedo=img.albedo,
            )
        return img

    def images(self, tonemap: str = "gamma") -> dict[str, jnp.ndarray]:
        s = self.settings
        return film.finalize(self.combined(), s.width, s.height, tonemap)

    def save(self, path: str, channel: str = "color") -> None:
        """PNG save (reference: Raytracer.Editor.cs:22-28 front-buffer save,
        auto-save on completion Raytracer.cs:1057-1059)."""
        image_util.write_png(path, np.asarray(self.images()[channel]))

    def diagnostic_image(self, view: str) -> np.ndarray:
        """Colormapped diagnostic buffer view (Raytracer.cs:239-250)."""
        from raytracing_in_one_weekend_tpu.render import diagnostics

        if self.last_metrics is None:
            raise RuntimeError("no batch rendered yet")
        s = self.settings
        return diagnostics.buffer_view(
            view, self.acc, self.last_metrics, s.width, s.height
        )

    def debug_path(
        self, pixel_xy: tuple[int, int] | None = None
    ) -> dict[str, np.ndarray]:
        """Bounce polyline of one pixel (PATH_DEBUGGING; defaults to the
        center pixel like SampleBatchJob.cs:96-101)."""
        from raytracing_in_one_weekend_tpu.render import diagnostics

        s = self.settings
        if pixel_xy is None:
            pixel_xy = (s.width // 2, s.height // 2)
        key = rng.batch_key(
            jax.random.PRNGKey(self.seed), max(self.batch_index - 1, 0)
        )
        return diagnostics.trace_debug_path(
            self.scene, self.camera, pixel_xy, s.width, s.height,
            key, s.trace_depth,
        )

    # --- checkpoint / resume ------------------------------------------------------

    def checkpoint(self, path: str) -> None:
        """Serialize progressive state: accumulators + RNG lineage + batch
        counter (the reference has no checkpoints — its accumulator *is* the
        resume state, SURVEY §5; here it is made durable)."""
        np.savez(
            path,
            seed=self.seed,
            batch_index=self.batch_index,
            interlacing=self.settings.interlacing,
            dispatched=np.asarray(self._dispatched, np.int64),
            weight_extrema=np.asarray(self.weight_extrema),
            **{f"acc_{k}": np.asarray(v) for k, v in self.acc._asdict().items()},
        )

    def restore(self, path: str) -> None:
        data = np.load(path)
        saved_pixels = data["acc_color"].shape[0]
        if saved_pixels != self.settings.pixel_count:
            raise ValueError(
                f"checkpoint {path!r} holds {saved_pixels} pixels but the "
                f"render settings are {self.settings.width}x"
                f"{self.settings.height} ({self.settings.pixel_count}); "
                "resume with the original resolution"
            )
        saved_interlacing = (
            int(data["interlacing"]) if "interlacing" in data
            else len(data["dispatched"])
        )
        if saved_interlacing != max(self.settings.interlacing, 1):
            raise ValueError(
                f"checkpoint {path!r} was written with interlacing="
                f"{saved_interlacing} but the render settings use "
                f"{self.settings.interlacing}; resume with the original "
                "interlacing"
            )
        self.seed = int(data["seed"])
        self.batch_index = int(data["batch_index"])
        self._dispatched = [int(x) for x in data["dispatched"]]
        self.weight_extrema = jnp.asarray(data["weight_extrema"])
        # noise tables derive from the seed; rebuild for the restored one
        from raytracing_in_one_weekend_tpu.core import randomsource

        self.noise_state = randomsource.make_noise_state(
            self.settings.noise_color, seed=self.seed + 7
        )
        self.acc = film.Accumulators(
            **{
                k: jnp.asarray(data[f"acc_{k}"])
                for k in film.Accumulators._fields
            }
        )
        self.history = []
