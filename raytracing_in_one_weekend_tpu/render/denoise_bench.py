"""Denoiser quality benchmark: PSNR/SSIM of noisy vs a-trous vs learned.

The reference ships OIDN + the OptiX denoiser as black boxes
(DenoiseJobs.cs:11-123); this framework fills those slots with the
a-trous filter (render/denoise.py) and the learned U-Net
(render/denoise_ml.py).  This harness measures both like denoisers are
measured: PSNR and SSIM against a converged reference render, across
scenes and spp levels, on tonemapped (gamma) output.

    python -m raytracing_in_one_weekend_tpu.render.denoise_bench
    python -m raytracing_in_one_weekend_tpu.render.denoise_bench \
        size=128 spps=4 scenes=cornell,cover

Prints one table; BENCHMARKS.md records the results.
"""

from __future__ import annotations

import numpy as np

DEFAULT_SCENES = ("cover", "cornell", "three_spheres", "simple_light")


def _to_display(img: np.ndarray) -> np.ndarray:
    """Linear HDR -> clamped gamma-2.2 display space (quality metrics on
    what the viewer sees, the convention denoiser papers use)."""
    return np.clip(np.maximum(img, 0.0) ** (1.0 / 2.2), 0.0, 1.0)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(1.0 / mse))


def ssim(a: np.ndarray, b: np.ndarray, *, win: int = 7) -> float:
    """Mean SSIM over an (H, W, 3) pair in [0, 1] — uniform window,
    standard K1/K2 (Wang et al. 2004)."""
    from numpy.lib.stride_tricks import sliding_window_view

    c1, c2 = 0.01**2, 0.03**2
    vals = []
    for ch in range(a.shape[-1]):
        x = sliding_window_view(a[..., ch], (win, win))
        y = sliding_window_view(b[..., ch], (win, win))
        mx = x.mean(axis=(-1, -2))
        my = y.mean(axis=(-1, -2))
        vx = x.var(axis=(-1, -2))
        vy = y.var(axis=(-1, -2))
        cxy = (x * y).mean(axis=(-1, -2)) - mx * my
        s = ((2 * mx * my + c1) * (2 * cxy + c2)) / (
            (mx**2 + my**2 + c1) * (vx + vy + c2)
        )
        vals.append(s.mean())
    return float(np.mean(vals))


def run(
    *,
    size: int = 256,
    spps: tuple = (4, 16),
    ref_spp: int = 1024,
    trace_depth: int = 6,
    scenes: tuple = DEFAULT_SCENES,
    seed: int = 11,
) -> dict:
    """Render, denoise, measure.  Returns
    {(scene, spp, method): (psnr, ssim)} and prints the table."""
    import jax

    from raytracing_in_one_weekend_tpu.core import camera as camera_mod
    from raytracing_in_one_weekend_tpu.models import book_scenes, testbeds
    from raytracing_in_one_weekend_tpu.render import denoise as atrous
    from raytracing_in_one_weekend_tpu.render import denoise_ml, renderer

    registry = {**book_scenes.SCENES, **testbeds.SCENES}
    params = denoise_ml.load_params()
    results = {}
    for name in scenes:
        scene, cs = registry[name]()
        camera = camera_mod.make_camera(
            cs.origin, cs.look_at, cs.up, cs.vertical_fov, 1.0,
            aperture=cs.aperture, focus_distance=cs.focus_distance,
        )
        ref = renderer.render_image(
            scene, camera, jax.random.PRNGKey(seed),
            width=size, height=size, samples_per_pixel=ref_spp,
            trace_depth=trace_depth, differentiable=False,
        )
        ref_disp = _to_display(
            np.asarray(ref.color).reshape(size, size, 3)
        )
        for spp in spps:
            noisy = renderer.render_image(
                scene, camera, jax.random.PRNGKey(seed + 1),
                width=size, height=size, samples_per_pixel=spp,
                trace_depth=trace_depth, differentiable=False,
            )
            outs = {
                "noisy": noisy.color,
                "atrous": atrous.denoise(
                    noisy.color, noisy.normal, noisy.albedo,
                    width=size, height=size,
                ),
            }
            if params is not None:
                outs["learned"] = denoise_ml.denoise(
                    noisy.color, noisy.normal, noisy.albedo,
                    width=size, height=size, params=params,
                )
            for method, img in outs.items():
                disp = _to_display(
                    np.asarray(img).reshape(size, size, 3)
                )
                results[(name, spp, method)] = (
                    psnr(disp, ref_disp), ssim(disp, ref_disp)
                )
                p, s = results[(name, spp, method)]
                print(
                    f"{name:>14} {spp:>3}spp {method:>8}: "
                    f"PSNR {p:6.2f} dB  SSIM {s:.4f}",
                    flush=True,
                )
    return results


if __name__ == "__main__":
    import sys

    kw = {}
    for a in sys.argv[1:]:
        k, v = a.split("=")
        if k in ("scenes",):
            kw[k] = tuple(v.split(","))
        elif k in ("spps",):
            kw[k] = tuple(int(x) for x in v.split(","))
        else:
            kw[k] = int(v)
    run(**kw)
