"""Render configuration.

TPU-native analog of the reference driver's inspector settings
(reference: Assets/Scripts/Unity/Raytracer.cs:83-100) and its compile-time
defines (Assets/Scripts/Unity/CompileTimeOptions.cs:29-41).  Compile-time
defines become static booleans that specialize the jitted step function.
"""

from __future__ import annotations

import dataclasses
import enum


class NoiseColor(enum.IntEnum):
    """RNG flavor (reference: Runtime/RandomSource.cs:8-13)."""

    WHITE = 0
    BLUE = 1
    SPATIO_TEMPORAL_BLUE = 2


class DenoiseMode(enum.IntEnum):
    """Denoiser selection (reference: Unity/Raytracer.cs denoiseMode).

    The reference binds Intel OIDN / NVidia OptiX native denoisers; the
    TPU build replaces both with on-device AOV-guided filters consuming
    the same color/normal/albedo channels: a hand-derived a-trous
    wavelet filter (render/denoise.py) and a learned U-Net running on
    the MXU (render/denoise_ml.py — the OIDN-analog CNN, trained
    in-repo on self-rendered pairs).
    """

    NONE = 0
    ATROUS = 1
    LEARNED = 2
    AUTO = 3  # per-image selection (render/denoise_ml.select_mode):
    #   the learned net dominates on dark/emissive scenes (+8-10 dB
    #   PSNR on cornell/simple_light), the a-trous filter keeps the
    #   SSIM edge on bright structured scenes — the measured decision
    #   rule picks by mean display luminance


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Static render settings; hashable so it can be a jit static arg.

    Field-for-field parity with the reference driver settings
    (Unity/Raytracer.cs:83-100), minus Unity-display-only knobs:

      * interlacing            -> interlacing (row-sliced progressive batches)
      * maxBvhDepth            -> max_bvh_depth
      * resolutionScaling      -> caller scales width/height
      * samplesPerPixel        -> samples_per_pixel (total, progressive)
      * samplesPerBatchRange   -> samples_per_batch_range (adaptive min/max)
      * traceDepth             -> trace_depth
      * noiseColor             -> noise_color
      * subPixelJitter         -> sub_pixel_jitter
      * stopWhenCompleted / saveWhenCompleted / maxDurationSeconds -> driver
    """

    width: int = 512
    height: int = 512
    samples_per_pixel: int = 64
    trace_depth: int = 35
    samples_per_batch_range: tuple[int, int] = (1, 50)
    adaptive_sampling: bool = True
    interlacing: int = 1
    max_bvh_depth: int = 16
    sub_pixel_jitter: bool = True
    noise_color: NoiseColor = NoiseColor.WHITE
    denoise_mode: DenoiseMode = DenoiseMode.NONE
    # Compile-time defines (CompileTimeOptions.cs) as static jit switches.
    full_diagnostics: bool = False
    path_debugging: bool = False

    def __post_init__(self):
        if self.width <= 0 or self.height <= 0:
            raise ValueError(f"invalid resolution {self.width}x{self.height}")
        if self.samples_per_pixel <= 0:
            raise ValueError("samples_per_pixel must be positive")
        lo, hi = self.samples_per_batch_range
        if lo < 1 or hi < lo:
            raise ValueError(
                f"samples_per_batch_range must satisfy 1 <= min <= max, "
                f"got {self.samples_per_batch_range}"
            )
        if self.interlacing < 1:
            raise ValueError("interlacing must be >= 1")
        if self.trace_depth < 1:
            raise ValueError("trace_depth must be >= 1")

    @property
    def pixel_count(self) -> int:
        return self.width * self.height


@dataclasses.dataclass(frozen=True)
class CameraSettings:
    """Thin-lens camera parameters (reference: Runtime/View.cs:16-36 plus
    Unity/CameraData.cs:8 aperture annotation)."""

    origin: tuple[float, float, float] = (0.0, 0.0, 0.0)
    look_at: tuple[float, float, float] = (0.0, 0.0, -1.0)
    up: tuple[float, float, float] = (0.0, 1.0, 0.0)
    vertical_fov: float = 40.0
    aperture: float = 0.0
    focus_distance: float | None = None  # None = autofocus on look_at
