"""Scene-matrix benchmark harness: per-batch median MRays/s per scene.

Reproduces the BENCHMARKS.md table.  Run SOLO on the TPU (concurrent TPU
processes contend ~100x):

    python bench_matrix.py                 # the full matrix
    python bench_matrix.py cornell perlin  # a subset
    python bench_matrix.py --wavefront cornell   # force the wavefront
                                                 # fallback for comparison
    python bench_matrix.py --noise=stbn cover    # sampler flavor
                                                 # (blue | stbn)

Ray counting matches the reference (every bounce of every sample,
SampleBatchJob.cs:203); one line per scene:
    <scene> [fused|wavefront] median: <X> MRays/s
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DEFAULT_SCENES = [
    "cover", "cornell", "three_spheres", "simple_light", "volume",
    "cornell_volumes", "cover_motion", "checkered", "perlin",
    "textured_sphere", "cubemap", "mesh_showcase", "mesh_large",
    "mesh_huge", "final_book2",
]
WIDTH = HEIGHT = 512
SAMPLES, DEPTH, BATCHES = 64, 8, 5  # 64 spp/batch amortizes tile tails (see bench.py)


def measure(name: str, wavefront: bool, noise: str | None = None) -> float:
    from raytracing_in_one_weekend_tpu.core import camera as camera_mod
    from raytracing_in_one_weekend_tpu.core import randomsource
    from raytracing_in_one_weekend_tpu.models import book_scenes, testbeds
    from raytracing_in_one_weekend_tpu.render import film, renderer
    from raytracing_in_one_weekend_tpu.utils.config import NoiseColor

    scenes = {**book_scenes.SCENES, **testbeds.SCENES}
    scene, cs = scenes[name]()
    camera = camera_mod.make_camera(
        cs.origin, cs.look_at, cs.up, cs.vertical_fov, WIDTH / HEIGHT,
        aperture=cs.aperture, focus_distance=cs.focus_distance,
    )
    acc = film.zero_accumulators(WIDTH * HEIGHT)
    key = jax.random.PRNGKey(0)
    kw = dict(width=WIDTH, height=HEIGHT, samples=SAMPLES, trace_depth=DEPTH)
    if noise:
        color = {"blue": NoiseColor.BLUE,
                 "stbn": NoiseColor.SPATIO_TEMPORAL_BLUE}[noise]
        kw.update(
            noise_color=int(color),
            noise_state=randomsource.make_noise_state(color),
        )
    acc, _ = renderer.render_batch_jit(
        scene, camera, acc, key, jnp.asarray(0, jnp.int32), **kw
    )
    jax.block_until_ready(acc)
    per = []
    for i in range(BATCHES):
        t0 = time.perf_counter()
        acc, m = renderer.render_batch_jit(
            scene, camera, acc, jax.random.fold_in(key, i + 1),
            jnp.asarray(0, jnp.int32), **kw,
        )
        rays = int(m.total_rays)  # device sync
        per.append(rays / (time.perf_counter() - t0) / 1e6)
    per.sort()
    return per[len(per) // 2]


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    wavefront = "--wavefront" in sys.argv[1:]
    noise = None
    for a in sys.argv[1:]:
        if a.startswith("--noise"):
            noise = a.split("=", 1)[1] if "=" in a else "stbn"
    if wavefront:
        from raytracing_in_one_weekend_tpu.ops import pallas_megatrace

        pallas_megatrace.scene_eligible = lambda *a, **k: False
    mode = "wavefront" if wavefront else "fused"
    if noise:
        mode += f"+{noise}"
    for name in args or DEFAULT_SCENES:
        mrays = measure(name, wavefront, noise)
        print(f"{name} [{mode}] median: {mrays:.1f} MRays/s", flush=True)


if __name__ == "__main__":
    main()
