"""Pallas TPU kernel: fused dense triangle nearest-hit selection.

Reference: the Möller–Trumbore test of HitTests.cs:116-150, run by the
megakernel per candidate.  TPU-native form: all triangles of the scene
live as rows of a VMEM table and every (triangle, ray-tile) pair is tested
in on-chip registers — no (N, T) HBM tensors (the jnp brute pass's cost)
and no gather-per-node traversal (15x slower than dense on TPU; see
render/driver.py auto-BVH note).  Same selection-kernel contract as
ops/pallas_sphere.sphere_select: outputs are detached (t, index); the
integrator re-evaluates the winner in jnp for gradients.

Layout: rays (8, N) component-major (ox..dz, active, lane); triangles
(T_pad, 16): edge_a xyz | edge_b xyz | vert0 xyz | 7 pad.  Padded rows get
degenerate edges (det == 0) so they never hit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30

FORCE_INTERPRET = False  # test hook (see pallas_megatrace.FORCE_INTERPRET)
# Moller-Trumbore keeps ~10 (T_pad, RAY_TILE) f32 temporaries live; tile
# sizes are chosen to stay under the ~16MB VMEM budget.
RAY_TILE = 256
TRI_PAD = 128
MAX_TRI_PAD = 4096  # beyond this the table itself crowds VMEM: use the BVH
TRI_COLS = 16


def fits_vmem(triangle_count: int) -> bool:
    t_pad = -(-triangle_count // TRI_PAD) * TRI_PAD
    return t_pad <= MAX_TRI_PAD


def _kernel(rays_ref, tri_ref, t_ref, idx_ref, *, t_min: float):
    # Whole-tile early-out on the active-mask row (row 6), same contract
    # as pallas_sphere._kernel_full.
    tile_active = jnp.max(rays_ref[6:7, :]) > 0.0

    @pl.when(jnp.logical_not(tile_active))
    def _():
        t_ref[0:1, :] = jnp.full_like(t_ref[0:1, :], BIG)
        idx_ref[0:1, :] = jnp.zeros_like(idx_ref[0:1, :])

    @pl.when(tile_active)
    def _():
        _kernel_body(rays_ref, tri_ref, t_ref, idx_ref, t_min=t_min)


def _kernel_body(rays_ref, tri_ref, t_ref, idx_ref, *, t_min: float):
    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]

    eax = tri_ref[:, 0:1]  # (T, 1)
    eay = tri_ref[:, 1:2]
    eaz = tri_ref[:, 2:3]
    ebx = tri_ref[:, 3:4]
    eby = tri_ref[:, 4:5]
    ebz = tri_ref[:, 5:6]
    v0x = tri_ref[:, 6:7]
    v0y = tri_ref[:, 7:8]
    v0z = tri_ref[:, 8:9]

    # Möller–Trumbore (HitTests.cs:116-150), all (T, RayTile) broadcasts.
    pvx = dy * eaz - dz * eay
    pvy = dz * eax - dx * eaz
    pvz = dx * eay - dy * eax
    det = ebx * pvx + eby * pvy + ebz * pvz
    inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)

    tvx = ox - v0x
    tvy = oy - v0y
    tvz = oz - v0z
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det

    qvx = tvy * ebz - tvz * eby
    qvy = tvz * ebx - tvx * ebz
    qvz = tvx * eby - tvy * ebx
    v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
    t = (eax * qvx + eay * qvy + eaz * qvz) * inv_det

    ok = (
        (det != 0.0)
        & (u >= 0.0) & (u <= 1.0)
        & (v >= 0.0) & ((u + v) <= 1.0)
        & (t > t_min)
    )
    t = jnp.where(ok, t, BIG)

    best_t = jnp.min(t, axis=0, keepdims=True)
    best_idx = jnp.argmin(t, axis=0, keepdims=True).astype(jnp.int32)
    t_ref[0:1, :] = best_t
    idx_ref[0:1, :] = best_idx


@functools.partial(jax.jit, static_argnames=("t_min", "interpret"))
def triangle_select(
    origin: jnp.ndarray,  # (N, 3)
    direction: jnp.ndarray,  # (N, 3)
    edge_a: jnp.ndarray,  # (T, 3)
    edge_b: jnp.ndarray,  # (T, 3)
    vert0: jnp.ndarray,  # (T, 3)
    active: jnp.ndarray | None = None,  # (N,) bool
    t_min: float = 0.0,
    interpret: bool = False,
):
    """Nearest-triangle selection; returns (best_t (N,), best_idx (N,)).
    Selection only (detached) — re-evaluate the winner for gradients."""
    interpret = interpret or FORCE_INTERPRET
    n = origin.shape[0]
    t_count = edge_a.shape[0]
    n_pad = -(-n // RAY_TILE) * RAY_TILE
    t_pad = -(-t_count // TRI_PAD) * TRI_PAD

    rays = jnp.zeros((8, n_pad), jnp.float32)
    rays = rays.at[0:3, :n].set(origin.T)
    rays = rays.at[3:6, :n].set(direction.T)
    if active is None:
        rays = rays.at[6, :n].set(1.0)
    else:
        rays = rays.at[6, :n].set(active.astype(jnp.float32))
    if n_pad != n:
        rays = rays.at[5, n:].set(1.0)

    tri = jnp.zeros((t_pad, TRI_COLS), jnp.float32)  # pad rows: det == 0
    tri = tri.at[:t_count, 0:3].set(edge_a)
    tri = tri.at[:t_count, 3:6].set(edge_b)
    tri = tri.at[:t_count, 6:9].set(vert0)

    grid = (n_pad // RAY_TILE,)
    t, idx = pl.pallas_call(
        functools.partial(_kernel, t_min=t_min),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (8, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (t_pad, TRI_COLS), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ),
        interpret=interpret,
    )(rays, tri)
    return t[0, :n], idx[0, :n]
