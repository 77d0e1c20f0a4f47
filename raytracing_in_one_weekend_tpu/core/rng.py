"""Deterministic RNG key discipline.

The reference threads a mutable `RandomSource` facade over white/blue/STBN
noise through every kernel (Runtime/RandomSource.cs:15-151), seeding white
noise per pixel from `(Seed * 0x8C4CA03F) ^ (index * 0x7383ED49)`
(Jobs/SampleBatchJob.cs:80-94).

TPU-native replacement: stateless threefry keys with a fixed fold-in
discipline `(seed) -> batch -> purpose -> bounce`, generating whole-lane
random arrays in one call.  Keys are derived from *logical* positions
(batch index, bounce index, purpose tag), never from device layout, so
renders are bitwise reproducible across shardings.
"""

from __future__ import annotations

import enum

import jax


class Purpose(enum.IntEnum):
    """Stream tags so independent consumers never share bits."""

    PIXEL_JITTER = 0
    LENS = 1
    TIME = 2
    SCATTER_A = 3
    SCATTER_B = 4
    SCATTER_CHOICE = 5
    VOLUME_FREE_PATH = 6
    VOLUME_SCATTER = 7
    DIELECTRIC_CHOICE = 8
    SAMPLE = 9


def batch_key(seed_key: jax.Array, batch_index) -> jax.Array:
    return jax.random.fold_in(seed_key, batch_index)


def sample_key(key: jax.Array, sample_index) -> jax.Array:
    return jax.random.fold_in(key, Purpose.SAMPLE * 131071 + sample_index)


def bounce_key(key: jax.Array, bounce_index) -> jax.Array:
    return jax.random.fold_in(key, bounce_index)


def purpose_key(key: jax.Array, purpose: Purpose) -> jax.Array:
    return jax.random.fold_in(key, int(purpose))
