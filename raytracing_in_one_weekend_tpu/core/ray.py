"""Ray bundles as struct-of-arrays pytrees.

Reference: Runtime/Ray.cs:5-21 — origin/direction/time, `GetPoint`, and the
0.001-normal self-intersection offset (`OffsetTowards`, Ray.cs:19).
Here a "Ray" is a whole wavefront: origins (N,3), directions (N,3),
times (N,).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

SELF_INTERSECTION_OFFSET = 1e-3  # reference: Ray.cs:19


class Rays(NamedTuple):
    origin: jnp.ndarray  # (N, 3)
    direction: jnp.ndarray  # (N, 3), normalized
    time: jnp.ndarray  # (N,)

    def at(self, t: jnp.ndarray) -> jnp.ndarray:
        """Point along each ray (reference: Ray.cs GetPoint)."""
        return self.origin + t[..., None] * self.direction

    def offset_towards(self, normal: jnp.ndarray) -> "Rays":
        """Epsilon-offset origins along `normal` to avoid self-intersection
        (reference: Ray.cs:19 OffsetTowards)."""
        return Rays(
            origin=self.origin + SELF_INTERSECTION_OFFSET * normal,
            direction=self.direction,
            time=self.time,
        )
