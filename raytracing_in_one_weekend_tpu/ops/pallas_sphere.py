"""Pallas TPU kernel: fused brute-force sphere nearest-hit selection.

The jnp path (ops/geometry.sphere_hit_all) materializes (N, S) tensors in
HBM for every bounce — the bandwidth bill dominates the whole render.  This
kernel runs the same quadratic (HitTests.cs:23-60) entirely in VMEM over
(sphere, ray-tile) blocks and writes only three (N,)-sized outputs:

    best_t    — entry distance of the nearest sphere (BIG on miss)
    best_idx  — index of the winning sphere
    exit_t    — exit root of the winner (for convex volume walks)

Differentiability: the kernel's outputs are *selection* results.  The
integrator re-evaluates the winner's quadratic in plain jnp on gathered
(N,)-sized parameters, which IS the differentiable path; the selection
itself is detached (the silhouette term is handled by edge sampling,
diff/boundary.py).  So the kernel needs no custom VJP.

Layout: rays arrive as an (8, N) component-major array (rows ox..dz, time)
so each component is one lane-major row; spheres as (S_pad, 8) with
columns (cx, cy, cz, r^2).  Padded sphere rows carry centers at 1e17 so
their discriminant is negative and they never win.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30

FORCE_INTERPRET = False  # test hook (see pallas_megatrace.FORCE_INTERPRET)
RAY_TILE = 512
SPHERE_PAD = 128  # pad sphere count to a lane multiple
PAD_CENTER = 1e17


def _kernel(rays_ref, sph_ref, t_ref, idx_ref, exit_ref, *, t_min: float):
    ox = rays_ref[0:1, :]  # (1, T)
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]

    cx = sph_ref[:, 0:1]  # (S, 1)
    cy = sph_ref[:, 1:2]
    cz = sph_ref[:, 2:3]
    r2 = sph_ref[:, 3:4]

    a = dx * dx + dy * dy + dz * dz  # (1, T)
    o_dot_d = ox * dx + oy * dy + oz * dz  # (1, T)
    o_sq = ox * ox + oy * oy + oz * oz  # (1, T)
    c_sq = cx * cx + cy * cy + cz * cz  # (S, 1)

    d_dot_c = dx * cx + dy * cy + dz * cz  # (S, T)
    o_dot_c = ox * cx + oy * cy + oz * cz  # (S, T)

    b = o_dot_d - d_dot_c
    c = o_sq - 2.0 * o_dot_c + (c_sq - r2)
    disc = b * b - a * c
    has_root = disc > 0.0
    sq = jnp.sqrt(jnp.where(has_root, disc, 0.0))
    inv_a = 1.0 / a
    t_near = (-b - sq) * inv_a
    t_far = (-b + sq) * inv_a
    near_ok = has_root & (t_near > t_min)
    far_ok = has_root & (t_far > t_min)
    t_entry = jnp.where(near_ok, t_near, jnp.where(far_ok, t_far, BIG))
    t_exit = jnp.where(far_ok, t_far, BIG)

    best_t = jnp.min(t_entry, axis=0, keepdims=True)  # (1, T)
    best_idx = jnp.argmin(t_entry, axis=0, keepdims=True).astype(jnp.int32)

    # exit root of the winner via one-hot contraction (single sphere wins)
    s = t_entry.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (s, t_entry.shape[1]), 0)
    one_hot = row_ids == best_idx
    exit_of_best = jnp.sum(jnp.where(one_hot, t_exit, 0.0), axis=0, keepdims=True)

    t_ref[0:1, :] = best_t
    idx_ref[0:1, :] = best_idx
    exit_ref[0:1, :] = jnp.where(best_t < BIG, exit_of_best, BIG)


@functools.partial(
    jax.jit, static_argnames=("t_min", "interpret")
)
def sphere_select(
    origin: jnp.ndarray,  # (N, 3)
    direction: jnp.ndarray,  # (N, 3)
    centers: jnp.ndarray,  # (S, 3)
    radii: jnp.ndarray,  # (S,)
    t_min: float = 0.0,
    interpret: bool = False,
):
    """Nearest-sphere selection. Returns (best_t, best_idx, exit_t), each
    (N,).  Selection only — recompute the winner's quadratic for gradients.
    """
    interpret = interpret or FORCE_INTERPRET
    n = origin.shape[0]
    s = centers.shape[0]
    n_pad = -(-n // RAY_TILE) * RAY_TILE
    s_pad = -(-s // SPHERE_PAD) * SPHERE_PAD

    rays = jnp.zeros((8, n_pad), jnp.float32)
    rays = rays.at[0:3, :n].set(origin.T)
    rays = rays.at[3:6, :n].set(direction.T)
    # padded ray columns have d=0 -> a=0; guard via a tiny dz
    if n_pad != n:
        rays = rays.at[5, n:].set(1.0)

    sph = jnp.full((s_pad, 8), PAD_CENTER, jnp.float32)
    sph = sph.at[:s, 0:3].set(centers)
    sph = sph.at[:s, 3].set(radii * radii)
    sph = sph.at[s:, 3].set(0.0)

    grid = (n_pad // RAY_TILE,)
    out_shapes = (
        jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
    )
    t, idx, exit_t = pl.pallas_call(
        functools.partial(_kernel, t_min=t_min),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((s_pad, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(rays, sph)
    return t[0, :n], idx[0, :n], exit_t[0, :n]


def use_pallas() -> bool:
    """Kernel dispatch: Pallas on TPU, jnp brute force elsewhere."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except RuntimeError:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# Full-record kernel: selection + one-hot record fetch, zero HBM gathers.
# ---------------------------------------------------------------------------

REC_COLS = 16
GEOM_REC_COLS = 4  # trailing record cols: mat_id?, center xyz, inv_r


def _kernel_full(rays_ref, sph_ref, rec_ref, t_ref, exit_ref, out_rec_ref,
                 *, t_min: float, want_exit: bool):
    # Whole-tile early-out: terminated rays cluster spatially (sky regions
    # die at bounce 1), so entire tiles of the wavefront go inactive — the
    # TPU analog of the reference's per-pixel cancellation-token early-out
    # (SampleBatchJob.cs:61-62).  Row 6 of the ray block carries the active
    # mask; a tile with no active ray writes miss sentinels and skips all
    # intersection math.
    tile_active = jnp.max(rays_ref[6:7, :]) > 0.0

    @pl.when(jnp.logical_not(tile_active))
    def _():
        t_ref[0:1, :] = jnp.full_like(t_ref[0:1, :], BIG)
        exit_ref[0:1, :] = jnp.full_like(exit_ref[0:1, :], BIG)
        out_rec_ref[:, :] = jnp.zeros_like(out_rec_ref[:, :])

    @pl.when(tile_active)
    def _():
        _kernel_full_body(rays_ref, sph_ref, rec_ref, t_ref, exit_ref,
                          out_rec_ref, t_min=t_min, want_exit=want_exit)


def _kernel_full_body(rays_ref, sph_ref, rec_ref, t_ref, exit_ref,
                      out_rec_ref, *, t_min: float, want_exit: bool):
    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]

    cx = sph_ref[:, 0:1]
    cy = sph_ref[:, 1:2]
    cz = sph_ref[:, 2:3]
    c_sq_minus_r2 = sph_ref[:, 3:4]  # |c|^2 - r^2, precomputed per sphere

    a = dx * dx + dy * dy + dz * dz
    o_dot_d = ox * dx + oy * dy + oz * dz
    o_sq = ox * ox + oy * oy + oz * oz

    d_dot_c = dx * cx + dy * cy + dz * cz
    o_dot_c = ox * cx + oy * cy + oz * cz

    b = o_dot_d - d_dot_c
    c = (o_sq - 2.0 * o_dot_c) + c_sq_minus_r2
    disc = b * b - a * c
    has_root = disc > 0.0
    sq = jnp.sqrt(jnp.where(has_root, disc, 0.0))
    inv_a = 1.0 / a
    t_near = (-b - sq) * inv_a
    near_ok = has_root & (t_near > t_min)
    t_far = (-b + sq) * inv_a
    far_ok = has_root & (t_far > t_min)
    t_entry = jnp.where(near_ok, t_near, jnp.where(far_ok, t_far, BIG))

    best_t = jnp.min(t_entry, axis=0, keepdims=True)  # (1, T)
    best_idx = jnp.argmin(t_entry, axis=0, keepdims=True).astype(jnp.int32)

    s = t_entry.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (s, t_entry.shape[1]), 0)
    one_hot_b = row_ids == best_idx

    if want_exit:
        t_exit = jnp.where(far_ok, t_far, BIG)
        exit_of_best = jnp.sum(
            jnp.where(one_hot_b, t_exit, 0.0), axis=0, keepdims=True
        )
        exit_ref[0:1, :] = jnp.where(best_t < BIG, exit_of_best, BIG)
    else:
        exit_ref[0:1, :] = jnp.full_like(exit_ref[0:1, :], BIG)

    # Winner record (material cols + center + 1/r): one (REC, S) @ (S, T)
    # one-hot contraction on the MXU replaces every per-ray HBM gather;
    # the normal is then (p - center) * inv_r, computed N-sized outside.
    one_hot_f = one_hot_b.astype(jnp.float32)
    rec = jax.lax.dot_general(
        rec_ref[:, :], one_hot_f,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (REC, T)

    t_ref[0:1, :] = best_t
    out_rec_ref[:, :] = rec


@functools.partial(
    jax.jit, static_argnames=("t_min", "want_exit", "interpret")
)
def sphere_select_full(
    origin: jnp.ndarray,  # (N, 3)
    direction: jnp.ndarray,  # (N, 3)
    centers: jnp.ndarray,  # (S, 3)
    radii: jnp.ndarray,  # (S,)
    records: jnp.ndarray,  # (S, R<=12) per-sphere payload (material record)
    active: jnp.ndarray | None = None,  # (N,) bool; inactive tiles skipped
    t_min: float = 0.0,
    want_exit: bool = False,
    interpret: bool = False,
):
    """Nearest-sphere selection + winner record + winner geometry, fused.

    Returns (best_t (N,), exit_t (N,), normal (N,3), rec (N,16)):
      rec cols 0..R-1 = winner's `records` row, cols 12..14 = winner
      center, col 15 = winner 1/r.  NON-differentiable (pure selection +
      constants fetch); use the gather path when gradients wrt sphere
      geometry are needed.
    """
    interpret = interpret or FORCE_INTERPRET
    n = origin.shape[0]
    s = centers.shape[0]
    r_cols = records.shape[1]
    assert r_cols <= REC_COLS - GEOM_REC_COLS
    n_pad = -(-n // RAY_TILE) * RAY_TILE
    s_pad = -(-s // SPHERE_PAD) * SPHERE_PAD

    rays = jnp.zeros((8, n_pad), jnp.float32)
    rays = rays.at[0:3, :n].set(origin.T)
    rays = rays.at[3:6, :n].set(direction.T)
    if active is None:
        rays = rays.at[6, :n].set(1.0)
    else:
        rays = rays.at[6, :n].set(active.astype(jnp.float32))
    if n_pad != n:
        rays = rays.at[5, n:].set(1.0)

    sph = jnp.full((s_pad, 8), PAD_CENTER, jnp.float32)
    sph = sph.at[:s, 0:3].set(centers)
    c_sq = jnp.sum(centers * centers, axis=-1)
    sph = sph.at[:s, 3].set(c_sq - radii * radii)
    sph = sph.at[s:, 3].set(jnp.inf)  # pad rows can never hit

    safe_r = jnp.where(radii == 0.0, 1.0, radii)
    rec_t = jnp.zeros((REC_COLS, s_pad), jnp.float32)
    rec_t = rec_t.at[:r_cols, :s].set(records.T)
    rec_t = rec_t.at[12:15, :s].set(centers.T)
    rec_t = rec_t.at[15, :s].set(1.0 / safe_r)

    grid = (n_pad // RAY_TILE,)
    out_shapes = (
        jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((REC_COLS, n_pad), jnp.float32),
    )
    t, exit_t, rec = pl.pallas_call(
        functools.partial(_kernel_full, t_min=t_min, want_exit=want_exit),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((s_pad, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (REC_COLS, s_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec((1, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (REC_COLS, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(rays, sph, rec_t)
    rec = rec[:, :n].T
    t = t[0, :n]
    point = origin + t[:, None] * direction
    normal = (point - rec[:, 12:15]) * rec[:, 15:16]
    return t, exit_t[0, :n], normal, rec
