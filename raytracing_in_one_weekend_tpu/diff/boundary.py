"""Silhouette boundary gradients via edge sampling (sphere silhouettes).

Detached-sampling autodiff through the wavefront integrator yields unbiased
*interior* gradients but misses the visibility boundary term: moving a
sphere changes which pixels it covers, and that coverage change is exactly
what drives photometric position/radius losses.  This module estimates the
missing term with silhouette edge sampling (the approach of Li et al. 2018,
"Differentiable Monte Carlo Ray Tracing through Edge Sampling", specialized
to analytic sphere silhouettes, which need no edge hierarchy):

  dI_k/dtheta  +=  INT_{silhouette in pixel k}
                     f_k(u) (L_in(u) - L_out(u)) (n_hat . du/dtheta) dsigma

For a sphere (center c, radius r) seen from a pinhole at o, the silhouette
is the analytic circle  p(phi) = c - (r^2/d) w + rho e(phi),  with
w = (c-o)/d, d = |c-o|, rho = r sqrt(1 - r^2/d^2); its image-space curve,
normal and parameter velocities come from autodiff of the projection.
Occlusion is handled automatically: where another object covers the edge,
L_in == L_out and the contribution vanishes.

Usage: `edge_gradients(scene, camera, g_image, ...)` turns the image-space
loss cotangent dloss/dimage into (d_centers, d_radii); combine with the
interior gradients from `jax.vjp` of the renderer (see
`value_and_grad_with_boundary`).  The reference has no analog (it is not
differentiable); this is BASELINE.json north-star machinery.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from raytracing_in_one_weekend_tpu.core import math3, rng
from raytracing_in_one_weekend_tpu.core.camera import Camera
from raytracing_in_one_weekend_tpu.core.ray import Rays
from raytracing_in_one_weekend_tpu.render import integrator
from raytracing_in_one_weekend_tpu.scene.scene import Scene


class BoundaryConfig(NamedTuple):
    samples_per_sphere: int = 128
    trace_depth: int = 4
    probe_spp: int = 2  # radiance probes per edge-sample side
    probe_offset_pixels: float = 0.3  # in/out probe offset, in pixels


def _silhouette_point(center, radius, phi, origin):
    """World-space silhouette point of the sphere at angle phi."""
    to_c = center - origin
    d = math3.length(to_c)
    w = to_c / jnp.maximum(d, 1e-8)
    r2 = radius * radius
    rho = jnp.sqrt(jnp.maximum(r2 * (1.0 - r2 / jnp.maximum(d * d, 1e-12)), 1e-12))
    a, b = math3.orthonormal_basis(w)
    return center - (r2 / jnp.maximum(d, 1e-8)) * w + rho * (
        jnp.cos(phi) * a + jnp.sin(phi) * b
    )


def _project(camera: Camera, p):
    """World point -> normalized image coords (u, v), inverting the View
    ray map (View.cs:38-48): dir ~ lower_left + u*horizontal + v*vertical."""
    direction = p - camera.origin
    x_r = jnp.dot(direction, camera.right)
    y_u = jnp.dot(direction, camera.up)
    z_f = jnp.dot(direction, -camera.forward)
    hw_fd = math3.length(camera.horizontal) / 2.0
    hh_fd = math3.length(camera.vertical) / 2.0
    fd = jnp.dot(camera.lower_left_corner, -camera.forward)
    safe_z = jnp.where(jnp.abs(z_f) < 1e-8, 1e-8, z_f)
    u = (x_r * fd / (safe_z * hw_fd) + 1.0) / 2.0
    v = (y_u * fd / (safe_z * hh_fd) + 1.0) / 2.0
    return jnp.stack([u, v]), z_f


def _image_uv(center, radius, phi, camera: Camera):
    p = _silhouette_point(center, radius, phi, camera.origin)
    uv, z = _project(camera, p)
    return uv, z


def _radiance_at(scene, camera, coords, key, trace_depth):
    """Radiance through image coords (M,2) with a pinhole ray (no lens
    offset, mid-shutter time) — the edge-sample probe rays."""
    m = coords.shape[0]
    direction = (
        camera.lower_left_corner
        + coords[:, 0:1] * camera.horizontal
        + coords[:, 1:2] * camera.vertical
    )
    rays = Rays(
        origin=jnp.broadcast_to(camera.origin, (m, 3)),
        direction=math3.normalize(direction),
        time=jnp.full((m,), 0.5),
    )
    result = integrator.trace(scene, rays, key, trace_depth)
    return result.radiance


def edge_gradients(
    scene: Scene,
    camera: Camera,
    g_image: jnp.ndarray,  # (P, 3) cotangent dloss/dimage
    width: int,
    height: int,
    key: jax.Array,
    config: BoundaryConfig = BoundaryConfig(),
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Boundary contribution to (dloss/d_centers, dloss/d_radii)."""
    scene = jax.tree.map(jax.lax.stop_gradient, scene)
    camera = jax.tree.map(jax.lax.stop_gradient, camera)
    centers = scene.spheres.center
    radii = scene.spheres.radius
    s = centers.shape[0]
    m = config.samples_per_sphere

    phis = (jnp.arange(m, dtype=jnp.float32) + 0.5) * (2.0 * jnp.pi / m)
    # de-correlate strata across spheres and steps
    phis = phis[None, :] + jax.random.uniform(
        rng.purpose_key(key, rng.Purpose.SAMPLE), (s, 1),
        maxval=2.0 * jnp.pi / m,
    )

    def per_sample(c, r, phi):
        uv, z = _image_uv(c, r, phi, camera)
        duv_dphi = jax.jacfwd(lambda p: _image_uv(c, r, p, camera)[0])(phi)
        duv_dc = jax.jacfwd(lambda cc: _image_uv(cc, r, phi, camera)[0])(c)
        duv_dr = jax.jacfwd(lambda rr: _image_uv(c, rr, phi, camera)[0])(r)
        return uv, z, duv_dphi, duv_dc, duv_dr

    per_sphere = jax.vmap(
        lambda c, r, ph: jax.vmap(lambda phi: per_sample(c, r, phi))(ph)
    )
    uv, z, duv_dphi, duv_dc, duv_dr = per_sphere(centers, radii, phis)
    # uv (S,M,2), z (S,M), duv_dphi (S,M,2), duv_dc (S,M,2,3), duv_dr (S,M,2)

    arc = math3.length(duv_dphi)  # |du/dphi|  (S,M)
    tangent = duv_dphi / jnp.maximum(arc, 1e-12)[..., None]
    normal = jnp.stack([tangent[..., 1], -tangent[..., 0]], axis=-1)

    # orient the curve normal outward from the projected sphere center
    center_uv = jax.vmap(lambda c: _project(camera, c)[0])(centers)  # (S,2)
    outward = uv - center_uv[:, None, :]
    flip = jnp.sum(normal * outward, axis=-1) < 0.0
    normal = jnp.where(flip[..., None], -normal, normal)

    # validity: silhouette exists (camera outside), in front, inside image
    d_cam = math3.length(centers - camera.origin)
    has_sil = (d_cam > jnp.abs(radii) + 1e-6)[:, None]
    in_front = z > 1e-6
    in_image = (
        (uv[..., 0] >= 0.0) & (uv[..., 0] < 1.0)
        & (uv[..., 1] >= 0.0) & (uv[..., 1] < 1.0)
    )
    valid = has_sil & in_front & in_image  # (S,M)

    # radiance probes straddling the edge
    delta = config.probe_offset_pixels / jnp.asarray([width, height], jnp.float32)
    flat_in = (uv - normal * delta).reshape(-1, 2)
    flat_out = (uv + normal * delta).reshape(-1, 2)
    l_in = jnp.zeros((s * m, 3))
    l_out = jnp.zeros((s * m, 3))
    for probe in range(config.probe_spp):
        pkey = jax.random.fold_in(key, probe)
        l_in = l_in + _radiance_at(
            scene, camera, flat_in, jax.random.fold_in(pkey, 0), config.trace_depth
        )
        l_out = l_out + _radiance_at(
            scene, camera, flat_out, jax.random.fold_in(pkey, 1), config.trace_depth
        )
    l_diff = (l_in - l_out).reshape(s, m, 3) / config.probe_spp

    # cotangent at the pixel each edge sample lands in
    px = jnp.clip((uv[..., 0] * width).astype(jnp.int32), 0, width - 1)
    py = jnp.clip((uv[..., 1] * height).astype(jnp.int32), 0, height - 1)
    g_pix = g_image[py * width + px]  # (S,M,3)

    # per-sample scalar: (g . L_diff) x arc-length Jacobian x phi measure
    # x pixel-mean filter value (W*H).
    coeff = (
        jnp.sum(g_pix * l_diff, axis=-1)
        * arc
        * (2.0 * jnp.pi / m)
        * (width * height)
    )
    coeff = jnp.where(valid, coeff, 0.0)

    v_dot_n_c = jnp.einsum("smi,smij->smj", normal, duv_dc)  # (S,M,3)
    v_dot_n_r = jnp.sum(normal * duv_dr, axis=-1)  # (S,M)

    d_centers = jnp.sum(coeff[..., None] * v_dot_n_c, axis=1)
    d_radii = jnp.sum(coeff * v_dot_n_r, axis=1)
    return d_centers, d_radii


def value_and_grad_with_boundary(
    render_fn: Callable[[dict[str, Any], jax.Array], jnp.ndarray],
    image_loss_fn: Callable[[jnp.ndarray], jnp.ndarray],
    scene_of_params: Callable[[dict[str, Any]], Scene],
    camera: Camera,
    width: int,
    height: int,
    config: BoundaryConfig = BoundaryConfig(),
):
    """Build value_and_grad(params, key) whose gradients are
    interior (autodiff through the renderer) + silhouette boundary term.

    render_fn(params, key) -> image color (P, 3); image_loss_fn(image) ->
    scalar.  Gradients for parameter entries named 'sphere_centers' /
    'sphere_radii' receive the boundary correction; other entries get the
    interior gradient only (shading parameters have no boundary term).
    """

    def value_and_grad(params, key):
        image, render_vjp = jax.vjp(lambda p: render_fn(p, key), params)
        loss, g_image = jax.value_and_grad(image_loss_fn)(image)
        (grads,) = render_vjp(g_image)

        scene = scene_of_params(params)
        d_centers, d_radii = edge_gradients(
            scene, camera, g_image, width, height,
            jax.random.fold_in(key, 0x0B0D), config,
        )
        if "sphere_centers" in grads:
            grads["sphere_centers"] = grads["sphere_centers"] + d_centers
        if "sphere_radii" in grads:
            grads["sphere_radii"] = grads["sphere_radii"] + d_radii
        return loss, grads

    return value_and_grad
