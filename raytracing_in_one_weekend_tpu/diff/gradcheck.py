"""Finite-difference gradient validation harness.

The BASELINE.json north star: pixel gradients of the differentiable render
must `allclose` central finite differences.  Because the renderer is a Monte
Carlo estimator, both sides are evaluated with *common random numbers*
(identical keys), making the comparison exact along smooth paths; residual
disagreement comes from discrete-event boundaries (which sphere wins the
nearest-hit argmin, lottery flips) and scales with eps.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def finite_difference_grad(
    loss_fn: Callable[[jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    eps: float = 1e-3,
) -> np.ndarray:
    """Central finite differences of a scalar loss wrt every element of x."""
    x = np.asarray(x, np.float64)
    grad = np.zeros_like(x)
    flat = x.reshape(-1)
    gflat = grad.reshape(-1)
    for i in range(flat.size):
        orig = flat[i]
        flat[i] = orig + eps
        up = float(loss_fn(jnp.asarray(x, jnp.float32)))
        flat[i] = orig - eps
        down = float(loss_fn(jnp.asarray(x, jnp.float32)))
        flat[i] = orig
        gflat[i] = (up - down) / (2.0 * eps)
    return grad


def check_grads(
    loss_fn: Callable[[jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    eps: float = 1e-3,
    rtol: float = 0.1,
    atol: float = 1e-3,
) -> dict:
    """Compare jax.grad against central differences; returns a report dict
    with both gradients and the allclose verdict (cosine similarity +
    elementwise tolerance)."""
    ad = np.asarray(jax.grad(loss_fn)(jnp.asarray(x, jnp.float32)), np.float64)
    fd = finite_difference_grad(loss_fn, x, eps)
    denom = np.linalg.norm(ad) * np.linalg.norm(fd)
    cosine = float(np.sum(ad * fd) / denom) if denom > 0 else 1.0
    allclose = bool(np.allclose(ad, fd, rtol=rtol, atol=atol))
    return {
        "autodiff": ad,
        "finite_difference": fd,
        "cosine": cosine,
        "allclose": allclose,
        "max_abs_err": float(np.max(np.abs(ad - fd))) if ad.size else 0.0,
        "rel_err": float(
            np.linalg.norm(ad - fd) / max(np.linalg.norm(fd), 1e-12)
        ),
    }
