"""Command-line render driver.

The reference's UX layer is the Unity editor (Raytracer.Editor.cs buttons,
inspector settings Raytracer.cs:83-100, CompileTimeOptions defines); the
TPU build's equivalent is this CLI: scene selection, render settings,
progressive trace with live MRays/s, PNG outputs, checkpoint/resume.

Usage:  python -m raytracing_in_one_weekend_tpu --scene cover --spp 64
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="raytracing_in_one_weekend_tpu",
        description="TPU-native differentiable path tracer",
    )
    p.add_argument("--scene", default="cover",
                   help="scene name from models.book_scenes / models.testbeds")
    p.add_argument("--scene-file", default=None, metavar="SCENE.json",
                   help="render a declarative scene file (scene/io.py "
                        "format) instead of a registry scene; uses the "
                        "file's camera when it carries one")
    p.add_argument("--import-legacy", default=None, metavar="SCENE.asset",
                   help="render a reference legacy Unity .asset scene "
                        "(scene/unity_legacy.py importer)")
    p.add_argument("--material-map", default=None, metavar="MAP.json",
                   help="GUID -> material spec JSON for --import-legacy "
                        "(the reference repo lacks its material assets)")
    p.add_argument("--export-scene", default=None, metavar="OUT.json",
                   help="write the selected scene (registry or imported) "
                        "as a declarative scene file and exit")
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--spp", type=int, default=64,
                   help="total samples per pixel (slowest pixel)")
    p.add_argument("--depth", type=int, default=35, help="trace depth")
    p.add_argument("--batch-range", type=int, nargs=2, default=(1, 48),
                   metavar=("MIN", "MAX"),
                   help="adaptive samples-per-batch range (the reference "
                        "default is 1-50; bigger batches amortize the "
                        "fused kernel's tile tails — see BENCHMARKS.md)")
    p.add_argument("--no-adaptive", action="store_true")
    p.add_argument("--interlacing", type=int, default=1)
    p.add_argument("--denoise", nargs="?", const="auto",
                   choices=("atrous", "learned", "auto"), default=None,
                   help="AOV-guided denoise of the final image: 'atrous' "
                        "(edge-avoiding wavelet), 'learned' (the "
                        "OIDN-analog U-Net, render/denoise_ml.py), or "
                        "'auto' (per-image selection — the measured "
                        "per-scene winner, render/denoise_ml.select_mode)")
    p.add_argument("--tonemap", choices=("gamma", "aces"), default="gamma")
    p.add_argument("--noise", choices=("white", "blue", "stbn"),
                   default="white",
                   help="sampler flavor for jitter/lens draws "
                        "(RandomSource NoiseColor analog)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-duration", type=float, default=None,
                   help="stop after this many seconds")
    p.add_argument("--output", default="render.png")
    p.add_argument("--preview-every", type=int, default=0, metavar="N",
                   help="write the in-progress image to OUTPUT every N "
                        "batches (the reference's previewAfterBatch live "
                        "blit, Raytracer.cs:804-807,1062-1091 — here a "
                        "progressive PNG refresh)")
    p.add_argument("--save-aovs", action="store_true",
                   help="also save normal/albedo AOV PNGs")
    p.add_argument("--save-diagnostics", action="store_true",
                   help="also save ray-count/sample-count/noise-weight "
                        "buffer views (inferno colormap)")
    p.add_argument("--checkpoint", default=None,
                   help="write progressive state here when stopping")
    p.add_argument("--resume", default=None,
                   help="restore progressive state from this checkpoint")
    p.add_argument("--frames", type=int, default=1,
                   help="render an animation: N frames with the camera "
                        "orbiting look_at (BASELINE config-5 shape)")
    p.add_argument("--orbit-degrees", type=float, default=360.0,
                   help="total orbit sweep across --frames")
    p.add_argument("--optimize", choices=("albedo", "position"), default=None,
                   help="inverse-rendering demo (BASELINE config 4): "
                        "perturb the chosen parameter class, recover it "
                        "from a rendered target image by gradient descent")
    p.add_argument("--opt-steps", type=int, default=60)
    p.add_argument("--quiet", action="store_true")
    return p


def resolve_scene(name: str):
    from raytracing_in_one_weekend_tpu.models import book_scenes, testbeds

    registry = dict(book_scenes.SCENES)
    registry.update(testbeds.SCENES)
    if name not in registry:
        raise SystemExit(
            f"unknown scene {name!r}; available: {', '.join(sorted(registry))}"
        )
    return registry[name]()


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    import numpy as np

    from raytracing_in_one_weekend_tpu.render import driver as driver_mod
    from raytracing_in_one_weekend_tpu.render import film
    from raytracing_in_one_weekend_tpu.utils import image as image_util
    from raytracing_in_one_weekend_tpu.utils.config import (
        DenoiseMode,
        NoiseColor,
        RenderSettings,
    )

    if args.scene_file:
        from raytracing_in_one_weekend_tpu.scene import io as scene_io

        builder, camera_settings = scene_io.load_scene(args.scene_file)
        if camera_settings is None:
            _, camera_settings = resolve_scene(args.scene)
        scene = builder.build()
    elif args.import_legacy:
        import json as _json

        from raytracing_in_one_weekend_tpu.scene import unity_legacy

        material_map = None
        if args.material_map:
            with open(args.material_map) as fh:
                material_map = _json.load(fh)
        builder, camera_settings = unity_legacy.import_legacy_scene(
            args.import_legacy, material_map=material_map
        )
        scene = builder.build()
    else:
        builder = None
        scene, camera_settings = resolve_scene(args.scene)

    if args.export_scene:
        from raytracing_in_one_weekend_tpu.scene import io as scene_io

        scene_io.save_scene(
            builder if builder is not None else scene, args.export_scene,
            camera=camera_settings,
        )
        if not args.quiet:
            print(f"scene written to {args.export_scene}", file=sys.stderr)
        return 0
    settings = RenderSettings(
        width=args.width,
        height=args.height,
        samples_per_pixel=args.spp,
        trace_depth=args.depth,
        samples_per_batch_range=tuple(args.batch_range),
        adaptive_sampling=not args.no_adaptive,
        interlacing=args.interlacing,
        denoise_mode={
            None: DenoiseMode.NONE,
            "atrous": DenoiseMode.ATROUS,
            "learned": DenoiseMode.LEARNED,
            "auto": DenoiseMode.AUTO,
        }[args.denoise],
        noise_color={
            "white": NoiseColor.WHITE,
            "blue": NoiseColor.BLUE,
            "stbn": NoiseColor.SPATIO_TEMPORAL_BLUE,
        }[args.noise],
    )
    if args.optimize:
        return _run_inverse_demo(args, scene, camera_settings, settings)
    if args.frames > 1:
        return _render_animation(args, scene, camera_settings, settings)

    r = driver_mod.ProgressiveRenderer(
        scene, camera_settings, settings, seed=args.seed
    )
    if args.resume:
        r.restore(args.resume)

    def report(stats):
        if not args.quiet:
            print(
                f"batch {stats.batch_index:4d}  "
                f"{stats.mrays_per_second:8.2f} MRays/s  "
                f"samples/pixel [{stats.min_samples:.0f}, "
                f"{stats.max_samples:.0f}]  "
                f"{stats.duration_s * 1e3:.1f} ms",
                file=sys.stderr,
            )
        if (
            args.preview_every > 0
            and stats.batch_index % args.preview_every == 0
        ):
            # progressive preview (previewAfterBatch): refresh OUTPUT with
            # the combined/denoised in-progress image; interlace gap fill
            # covers not-yet-traced rows (film.py:69)
            images = r.images(tonemap=args.tonemap)
            image_util.write_png(args.output, np.asarray(images["color"]))

    r.run(max_duration_seconds=args.max_duration, on_batch=report)

    if args.checkpoint:
        r.checkpoint(args.checkpoint)
    images = r.images(tonemap=args.tonemap)
    image_util.write_png(args.output, np.asarray(images["color"]))
    if args.save_aovs:
        stem = args.output.rsplit(".", 1)[0]
        image_util.write_png(f"{stem}_normal.png", np.asarray(images["normal"]))
        image_util.write_png(f"{stem}_albedo.png", np.asarray(images["albedo"]))
    if args.save_diagnostics and r.last_metrics is not None:
        from raytracing_in_one_weekend_tpu.render import diagnostics

        stem = args.output.rsplit(".", 1)[0]
        for view in diagnostics.VIEWS:
            image_util.write_png(f"{stem}_{view}.png", r.diagnostic_image(view))
    if not args.quiet:
        print(
            f"done: {r.dispatched_samples_per_pixel} spp dispatched "
            f"(slowest pixel {r.min_samples_per_pixel:.0f} valid), "
            f"avg {r.avg_mrays_per_second:.2f} MRays/s -> {args.output}",
            file=sys.stderr,
        )
    return 0


def _run_inverse_demo(args, scene, camera_settings, settings) -> int:
    """Inverse-rendering demo: perturb parameters, recover them from a
    target render by backprop through the path tracer (diff/inverse.py)."""
    import sys as _sys

    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytracing_in_one_weekend_tpu.core import camera as camera_mod
    from raytracing_in_one_weekend_tpu.diff import inverse, params as params_mod
    from raytracing_in_one_weekend_tpu.render import renderer
    from raytracing_in_one_weekend_tpu.utils import image as image_util
    from raytracing_in_one_weekend_tpu.render import driver as driver_mod

    w, h = args.width, args.height
    cam = camera_mod.make_camera(
        camera_settings.origin, camera_settings.look_at, camera_settings.up,
        camera_settings.vertical_fov, w / h,
        aperture=camera_settings.aperture,
        focus_distance=driver_mod.autofocus(scene, camera_settings),
    )
    key = jax.random.PRNGKey(args.seed)
    cfg = inverse.InverseRenderConfig(
        width=w, height=h, samples_per_pixel=max(args.spp, 4),
        trace_depth=args.depth, steps=args.opt_steps,
        use_boundary=args.optimize == "position",
        learning_rate=2e-2 if args.optimize == "albedo" else 1e-2,
    )

    target = renderer.render_image(
        scene, cam, key, width=w, height=h,
        samples_per_pixel=cfg.samples_per_pixel * 4,
        trace_depth=cfg.trace_depth,
    ).color

    name = {
        "albedo": "texture_colors", "position": "sphere_centers"
    }[args.optimize]
    true_params = params_mod.extract_params(scene, (name,))
    noise = 0.25 * jax.random.normal(
        jax.random.fold_in(key, 1), true_params[name].shape
    )
    init = {name: true_params[name] + noise}

    def report(i, params, loss):
        if not args.quiet and i % 10 == 0:
            err = float(jnp.mean(jnp.abs(params[name] - true_params[name])))
            print(f"step {i:4d}  loss {loss:.6f}  param-MAE {err:.4f}",
                  file=_sys.stderr)

    final, losses = inverse.optimize(
        scene, cam, target, init, cfg, seed=args.seed, callback=report
    )

    stem = args.output.rsplit(".", 1)[0]
    for label, p in (("target", None), ("init", init), ("final", final)):
        s = scene if p is None else params_mod.apply_params(scene, p)
        img = renderer.render_image(
            s, cam, key, width=w, height=h,
            samples_per_pixel=cfg.samples_per_pixel * 4,
            trace_depth=cfg.trace_depth,
        )
        from raytracing_in_one_weekend_tpu.render import film

        ldr = film.finalize(img, w, h)["color"]
        image_util.write_png(f"{stem}_{label}.png", np.asarray(ldr))

    err0 = float(jnp.mean(jnp.abs(init[name] - true_params[name])))
    err1 = float(jnp.mean(jnp.abs(final[name] - true_params[name])))
    if not args.quiet:
        print(
            f"recovered {name}: MAE {err0:.4f} -> {err1:.4f}; "
            f"loss {losses[0]:.5f} -> {losses[-1]:.5f} -> {stem}_*.png",
            file=_sys.stderr,
        )
    return 0 if err1 < err0 else 1


def _render_animation(args, scene, camera_settings, settings) -> int:
    """Orbit-camera animation: one progressive trace per frame (the
    reference's CameraControl fly-orbit, Unity/CameraControl.cs:13-116,
    as a batch renderer)."""
    import math
    import sys as _sys

    import numpy as np

    from raytracing_in_one_weekend_tpu.render import driver as driver_mod
    from raytracing_in_one_weekend_tpu.utils import image as image_util
    from raytracing_in_one_weekend_tpu.utils.config import CameraSettings

    stem = args.output.rsplit(".", 1)[0]
    origin = np.asarray(camera_settings.origin, np.float64)
    target = np.asarray(camera_settings.look_at, np.float64)
    rel = origin - target
    for f in range(args.frames):
        angle = math.radians(args.orbit_degrees) * f / args.frames
        c, s = math.cos(angle), math.sin(angle)
        rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        cs_f = CameraSettings(
            origin=tuple(target + rot @ rel),
            look_at=camera_settings.look_at,
            up=camera_settings.up,
            vertical_fov=camera_settings.vertical_fov,
            aperture=camera_settings.aperture,
            focus_distance=camera_settings.focus_distance,
        )
        r = driver_mod.ProgressiveRenderer(
            scene, cs_f, settings, seed=args.seed + f
        )
        r.run(max_duration_seconds=args.max_duration)
        path = f"{stem}_{f:04d}.png"
        r.save(path)
        if not args.quiet:
            print(
                f"frame {f + 1}/{args.frames} -> {path} "
                f"({r.avg_mrays_per_second:.1f} MRays/s)",
                file=_sys.stderr,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
