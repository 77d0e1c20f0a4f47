"""TPU-native differentiable path tracer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
renaudbedard/raytracing-in-one-weekend (a Unity/C#/Burst CPU path tracer
implementing Peter Shirley's "Ray Tracing in One Weekend" series plus
extensions: motion blur, probabilistic volumes, rough dielectrics, textured
emissive materials, BVH acceleration, adaptive sampling, AOV capture and
progressive accumulation).

Design pillars (TPU-first, not a port):
  * Struct-of-arrays scenes as pytrees; rays as (N, 3) lanes.
  * Ray-primitive intersection expressed with batched matmul-friendly
    contractions so the MXU does the heavy lifting.
  * The bounce loop is a `lax.scan` with active-ray masking (wavefront),
    differentiable end to end.
  * Scaling via `jax.sharding.Mesh` + NamedSharding over the pixel grid;
    gradients / metrics are `psum` over the mesh.
  * Hot kernels in Pallas (Mosaic) where XLA fusion is not enough.
"""

__version__ = "0.1.0"

from raytracing_in_one_weekend_tpu.utils.config import RenderSettings  # noqa: F401
