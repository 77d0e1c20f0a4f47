"""Parameter plumbing for inverse rendering.

Scene pytrees are immutable NamedTuples; these helpers splice optimizable
parameter pytrees (sphere centers/radii, texture colors, material IOR/...)
into a scene template so `jax.grad` differentiates the render with respect
to exactly the chosen parameters.  This replaces nothing in the reference
(it has no adjoint); it is the BASELINE.json north-star machinery.
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp

from raytracing_in_one_weekend_tpu.scene.scene import Scene, soup_vertices


def set_sphere_centers(scene: Scene, centers: jnp.ndarray) -> Scene:
    return scene._replace(spheres=scene.spheres._replace(center=centers))


def set_sphere_radii(scene: Scene, radii: jnp.ndarray) -> Scene:
    return scene._replace(spheres=scene.spheres._replace(radius=radii))


def set_texture_colors(scene: Scene, main_color: jnp.ndarray) -> Scene:
    """Replace the whole texture main-color table (albedos/emissions live
    here for constant textures)."""
    return scene._replace(textures=scene.textures._replace(main_color=main_color))


def set_material_parameters(scene: Scene, parameter: jnp.ndarray) -> Scene:
    """IOR (standard/dielectric) / density (volume) table."""
    return scene._replace(materials=scene.materials._replace(parameter=parameter))


def set_sphere_move_offsets(scene: Scene, move: jnp.ndarray) -> Scene:
    """Motion-blur destination offsets (S, 3) (Entity.cs:124-127
    TransformAtTime); differentiable through both integrators' moved-
    center intersections — optimizable motion recovery."""
    return scene._replace(
        spheres=scene.spheres._replace(move_offset=move)
    )


def set_box_rotations(scene: Scene, rot: jnp.ndarray) -> Scene:
    """Raw world-from-local quaternions (x,y,z,w); consumers normalize
    (math3.quat_normalize), so optimizing the raw coordinates is gauge-
    free — renormalize in a projection hook to keep Adam well-scaled."""
    return scene._replace(boxes=scene.boxes._replace(rot=rot))


def set_box_positions(scene: Scene, pos: jnp.ndarray) -> Scene:
    return scene._replace(boxes=scene.boxes._replace(pos=pos))


def set_box_extents(scene: Scene, extents: jnp.ndarray) -> Scene:
    return scene._replace(boxes=scene.boxes._replace(extents=extents))


def set_rect_rotations(scene: Scene, rot: jnp.ndarray) -> Scene:
    return scene._replace(rects=scene.rects._replace(rot=rot))


def set_rect_positions(scene: Scene, pos: jnp.ndarray) -> Scene:
    return scene._replace(rects=scene.rects._replace(pos=pos))


def set_rect_from(scene: Scene, xy_from: jnp.ndarray) -> Scene:
    return scene._replace(rects=scene.rects._replace(xy_from=xy_from))


def set_rect_to(scene: Scene, xy_to: jnp.ndarray) -> Scene:
    return scene._replace(rects=scene.rects._replace(xy_to=xy_to))


def set_environment_cubemap(scene: Scene, cubemap: jnp.ndarray) -> Scene:
    """HDR environment-map faces (6, H, W, 3) — differentiable through
    the miss-radiance fetch in both integrators (each texel's gradient
    comes from exactly the rays that escaped into it): inverse
    environment lighting."""
    return scene._replace(
        environment=scene.environment._replace(cubemap=cubemap)
    )


def set_texture_atlas(scene: Scene, atlas: jnp.ndarray) -> Scene:
    """Image-texture texel grid (A, H, W, 3) — differentiable through the
    nearest-neighbor lookup (each texel's gradient comes from the rays
    that sampled it), i.e. texture painting by descent."""
    return scene._replace(textures=scene.textures._replace(atlas=atlas))


def set_triangle_normals(scene: Scene, normals: jnp.ndarray) -> Scene:
    """Per-vertex shading normals (T, 3, 3) — component rows, vertex
    COLUMNS (Triangles.normals layout).  Differentiable through the
    barycentric lerp in both integrators, so normals can be a traced
    function of the vertex positions (recompute-normals-each-step mesh
    sculpting) or optimized directly (normal-map style)."""
    return scene._replace(
        triangles=scene.triangles._replace(normals=normals)
    )


def set_triangle_vertices(scene: Scene, verts: jnp.ndarray) -> Scene:
    """Soup vertices (T, 3, 3) in (v0, v1, v2) order, re-packed to the
    edge form (Triangle.cs: edge_a = v2-v0, edge_b = v1-v0).  Geometry
    only — stored per-vertex shading normals/uvs are separate parameters
    and stay fixed (FD through the renderer measures the same thing)."""
    v0, v1, v2 = verts[:, 0], verts[:, 1], verts[:, 2]
    return scene._replace(
        triangles=scene.triangles._replace(
            vert0=v0, edge_b=v1 - v0, edge_a=v2 - v0
        )
    )


_SETTERS: dict[str, Callable[[Scene, jnp.ndarray], Scene]] = {
    "sphere_centers": set_sphere_centers,
    "sphere_radii": set_sphere_radii,
    "sphere_move_offsets": set_sphere_move_offsets,
    "texture_colors": set_texture_colors,
    "material_parameters": set_material_parameters,
    "box_rotations": set_box_rotations,
    "box_positions": set_box_positions,
    "box_extents": set_box_extents,
    "rect_rotations": set_rect_rotations,
    "rect_positions": set_rect_positions,
    "rect_from": set_rect_from,
    "rect_to": set_rect_to,
    "triangle_vertices": set_triangle_vertices,
    "triangle_normals": set_triangle_normals,
    "texture_atlas": set_texture_atlas,
    "environment_cubemap": set_environment_cubemap,
}


def apply_params(scene: Scene, params: dict[str, Any]) -> Scene:
    """Splice a {name: array} parameter dict into the scene template."""
    for name, value in params.items():
        scene = _SETTERS[name](scene, value)
    return scene


def extract_params(scene: Scene, names: tuple[str, ...]) -> dict[str, jnp.ndarray]:
    getters = {
        "sphere_centers": lambda s: s.spheres.center,
        "sphere_radii": lambda s: s.spheres.radius,
        "sphere_move_offsets": lambda s: s.spheres.move_offset,
        "texture_colors": lambda s: s.textures.main_color,
        "material_parameters": lambda s: s.materials.parameter,
        "box_rotations": lambda s: s.boxes.rot,
        "box_positions": lambda s: s.boxes.pos,
        "box_extents": lambda s: s.boxes.extents,
        "rect_rotations": lambda s: s.rects.rot,
        "rect_positions": lambda s: s.rects.pos,
        "rect_from": lambda s: s.rects.xy_from,
        "rect_to": lambda s: s.rects.xy_to,
        "texture_atlas": lambda s: s.textures.atlas,
        "environment_cubemap": lambda s: s.environment.cubemap,
        "triangle_vertices": soup_vertices,
        "triangle_normals": lambda s: s.triangles.normals,
    }
    return {n: getters[n](scene) for n in names}
