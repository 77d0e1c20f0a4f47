"""Scaling-efficiency harness.

BASELINE.md config 5: >=85% rays/s scaling efficiency at 1 chip / 1 host /
>=2 hosts on the sharded cover-scene render.  The reference is
single-process shared-memory (SURVEY §2.7) so this subsystem is new to the
TPU build: it measures rays/s of the pixel-tile-sharded batch step over
growing mesh slices and reports efficiency vs linear scaling.

On real hardware run with actual chips; under
XLA_FLAGS=--xla_force_host_platform_device_count=N it validates the
sharding/collective program on virtual CPU devices (numbers are then
compile-correctness evidence, not hardware throughput).

Usage:  python -m raytracing_in_one_weekend_tpu.parallel.scaling
        python -m ... --cpu 8   # force an 8-virtual-CPU-device mesh
                                # (self-pins the platform; the tunnel
                                # sitecustomize overrides XLA_FLAGS env)
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def measure(
    device_counts=(1, 2, 4, 8),
    width: int = 256,
    height: int = 256,
    samples: int = 4,
    trace_depth: int = 6,
    batches: int = 3,
    fused: bool | None = None,
) -> dict:
    """Rays/s per mesh size + efficiency vs the single-device figure.

    fused=None auto-selects: on TPU devices the FUSED megakernel rides
    shard_map (shard.sharded_fused_render_batch — pallas_call has no
    GSPMD rule, so the plain-jit path would gather instead of scale); on
    CPU the wavefront under GSPMD validates the collective program.
    """
    from raytracing_in_one_weekend_tpu.core import camera as camera_mod
    from raytracing_in_one_weekend_tpu.models import book_scenes
    from raytracing_in_one_weekend_tpu.ops import pallas_sphere
    from raytracing_in_one_weekend_tpu.parallel import shard
    from raytracing_in_one_weekend_tpu.render import film

    if fused is None:
        fused = pallas_sphere.use_pallas()

    scene, cs = book_scenes.cover_scene(grid=4)
    camera = camera_mod.make_camera(
        cs.origin, cs.look_at, cs.up, cs.vertical_fov, width / height,
        aperture=cs.aperture, focus_distance=cs.focus_distance,
    )
    all_devices = jax.devices()
    results = {}
    for n in device_counts:
        if n > len(all_devices):
            continue
        mesh = shard.make_mesh(devices=all_devices[:n])
        acc = shard.place_accumulators(
            mesh, film.zero_accumulators(width * height)
        )
        scene_r = shard.place_scene(mesh, scene)
        key = jax.random.PRNGKey(0)

        batch_fn = (
            shard.sharded_fused_render_batch if fused
            else shard.sharded_render_batch
        )
        # warmup/compile
        acc, metrics = batch_fn(
            mesh, scene_r, camera, acc, key,
            width=width, height=height, samples=samples,
            trace_depth=trace_depth,
        )
        jax.block_until_ready(acc)

        per_batch = []
        for i in range(batches):
            t0 = time.perf_counter()
            acc, metrics = batch_fn(
                mesh, scene_r, camera, acc, jax.random.fold_in(key, i + 1),
                width=width, height=height, samples=samples,
                trace_depth=trace_depth,
            )
            jax.block_until_ready(acc)
            rays = int(metrics.total_rays)
            per_batch.append(rays / (time.perf_counter() - t0))
        per_batch.sort()
        results[n] = per_batch[len(per_batch) // 2]

    base = results.get(1)
    report = {
        "rays_per_sec": {str(k): round(v, 1) for k, v in results.items()},
        "efficiency": {
            str(k): round(v / (base * k), 4) if base else None
            for k, v in results.items()
        },
        "device_kind": str(all_devices[0]),
        "path": "fused-shard_map" if fused else "wavefront-gspmd",
    }
    return report


if __name__ == "__main__":
    import sys

    if "--cpu" in sys.argv:
        n = int(sys.argv[sys.argv.index("--cpu") + 1])
        jax.config.update("jax_platforms", "cpu")
        jax.config.update(
            "jax_num_cpu_devices", n
        )
    print(json.dumps(measure()))
