"""Scene representation: struct-of-arrays pytrees + host-side builder.

The reference compiles a live Unity scene into flat NativeArrays of tagged-
union `Entity` structs with raw `Material*`/`void*` pointers
(Unity/Raytracer.cs:1185-1304, Runtime/Entity.cs:27-128).  The TPU-native
equivalent: one dense array-set per primitive type (spheres / rects / boxes
/ triangles), a material table, and a texture table, all as jax pytrees.
Pointer indirection becomes integer indices; the tagged-union dispatch
becomes "intersect every type, reduce nearest".

Counts are static (array shapes) so jit specializes per scene topology;
parameters (centers, radii, albedos, IORs, ...) are traced leaves and thus
differentiable/optimizable.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import NamedTuple, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from raytracing_in_one_weekend_tpu.core import noise as noise_mod
from raytracing_in_one_weekend_tpu.core.textures import TextureTable, TextureType

PLASTIC_IOR = 1.5  # reference: Material.cs PlasticIor
METAL_IOR = 1.1  # reference: Material.cs MetalIor ("Copper")


class MaterialType(enum.IntEnum):
    """Reference: Material.cs:9-14."""

    STANDARD = 0
    DIELECTRIC = 1
    PROBABILISTIC_VOLUME = 2


class EntityKind(enum.IntEnum):
    """Reference: Entity.cs:13-20 (None omitted; NONE == -1 hit index)."""

    SPHERE = 0
    RECT = 1
    BOX = 2
    TRIANGLE = 3


class SkyType(enum.IntEnum):
    """Reference: Environment.cs:5-11."""

    NONE = 0
    GRADIENT = 1
    CUBEMAP = 2


class MaterialTable(NamedTuple):
    type: jnp.ndarray  # (M,) int32
    albedo_tex: jnp.ndarray  # (M,) int32
    emission_tex: jnp.ndarray  # (M,) int32
    glossiness_tex: jnp.ndarray  # (M,) int32
    metallic_tex: jnp.ndarray  # (M,) int32
    parameter: jnp.ndarray  # (M,) IOR (standard/dielectric) or density (volume)
    perfect_specular: jnp.ndarray  # (M,) bool, precomputed (Material.cs:181-196)


class Spheres(NamedTuple):
    center: jnp.ndarray  # (S, 3)
    radius: jnp.ndarray  # (S,)
    material: jnp.ndarray  # (S,) int32
    move_offset: Optional[jnp.ndarray]  # (S, 3) or None when no motion blur
    time_range: Optional[jnp.ndarray]  # (S, 2) or None


class Rects(NamedTuple):
    rot: jnp.ndarray  # (R, 4) world-from-local quaternion (x,y,z,w)
    pos: jnp.ndarray  # (R, 3)
    xy_from: jnp.ndarray  # (R, 2)
    xy_to: jnp.ndarray  # (R, 2)
    material: jnp.ndarray  # (R,) int32


class Boxes(NamedTuple):
    rot: jnp.ndarray  # (B, 4)
    pos: jnp.ndarray  # (B, 3)
    extents: jnp.ndarray  # (B, 3) half-sizes
    material: jnp.ndarray  # (B,) int32


class Triangles(NamedTuple):
    edge_a: jnp.ndarray  # (T, 3) v2 - v0
    edge_b: jnp.ndarray  # (T, 3) v1 - v0
    vert0: jnp.ndarray  # (T, 3)
    normals: jnp.ndarray  # (T, 3, 3) per-vertex normals as columns
    uvs: jnp.ndarray  # (T, 2, 3) per-vertex texcoords as columns
    material: jnp.ndarray  # (T,) int32


class Environment(NamedTuple):
    """Reference: Environment.cs:5-18 + Cubemap (Texture.cs:141-211)."""

    sky_type: jnp.ndarray  # () int32
    sky_bottom: jnp.ndarray  # (3,)
    sky_top: jnp.ndarray  # (3,)
    cubemap: Optional[jnp.ndarray]  # (6, H, W, 3) float32 or None


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class SceneFlags:
    """Static (compile-time) scene facts; jit specializes on them, the TPU
    analog of the reference's compile-time defines (CompileTimeOptions.cs).
    The integrator uses them to skip whole subsystems (volume walk, motion
    blur, dielectric branch) for scenes that don't need them."""

    has_volumes: bool = False
    has_dielectrics: bool = False
    has_motion: bool = False
    has_emissive: bool = False
    # any CHECKER / PERLIN / IMAGE texture: forces the full per-ray texture
    # sampling path; constant-only scenes use the packed material records
    has_procedural_textures: bool = False
    # static sky kind (int(SkyType)); jit-specializes the sky branch and
    # gates the fused megakernel (gradient sky evaluates in-kernel)
    sky: int = 1
    # volume material on a non-convex entity (rect/triangle): the convex
    # entry/exit volume walk (Entity.cs:24 IsConvexHull) can't represent
    # it — forces the wavefront path (which also treats those as inert)
    has_nonconvex_volumes: bool = False
    # every moving sphere uses the default (0,1) shutter range: the fused
    # megakernel's motion path assumes w == rayTime and is gated on this
    motion_unit_time: bool = True
    # every procedural (checker/perlin/image) texture sits on the ALBEDO
    # slot of a non-volume material: the fused megakernel evaluates
    # textures only there (emission/glossiness/metallic stay
    # constant-resolved); anything else forces the wavefront path
    procedural_albedo_only: bool = True


class Scene(NamedTuple):
    spheres: Spheres
    rects: Rects
    boxes: Boxes
    triangles: Triangles
    materials: MaterialTable
    textures: TextureTable
    environment: Environment
    flags: SceneFlags = SceneFlags()
    # Optional flattened BVH (scene/bvh.py BvhArrays); attach via
    # bvh.attach_bvh(scene).  None = brute-force nearest-hit.
    bvh: Optional[NamedTuple] = None


# ---------------------------------------------------------------------------
# Builder (host-side, numpy): the analog of the reference's scene compile
# (Raytracer.cs RebuildEntityBuffers) minus Unity.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TextureSpec:
    """Host-side texture description, interned into the TextureTable."""

    type: TextureType = TextureType.NONE
    main_color: tuple = (0.0, 0.0, 0.0)
    secondary_color: tuple = (0.0, 0.0, 0.0)
    parameter: float = 0.0
    scalar_channel: int = 0
    image: Optional[tuple] = None  # hashable key; actual array via add_image


ColorLike = Union[None, float, Sequence[float], TextureSpec]


def soup_vertices(scene: "Scene") -> jnp.ndarray:
    """(T, 3, 3) world vertices (v0, v1, v2) from the edge-form soup
    (Triangle.cs edge form: edge_a = v2-v0, edge_b = v1-v0).  The ONE
    reconstruction shared by diff/boundary (edge sampling) and
    diff/params (the triangle_vertices parameterization) — the inverse of
    params.set_triangle_vertices' re-pack."""
    tri = scene.triangles
    return jnp.stack(
        [tri.vert0, tri.vert0 + tri.edge_b, tri.vert0 + tri.edge_a], axis=1
    )


def constant(color) -> TextureSpec:
    color = np.broadcast_to(np.asarray(color, np.float32), (3,))
    return TextureSpec(TextureType.CONSTANT, tuple(float(c) for c in color))


def constant_scalar(value: float) -> TextureSpec:
    return TextureSpec(TextureType.CONSTANT_SCALAR, parameter=float(value))


def checker(main, secondary, scale: float = 10.0) -> TextureSpec:
    main = tuple(float(c) for c in np.broadcast_to(np.asarray(main, np.float32), (3,)))
    secondary = tuple(
        float(c) for c in np.broadcast_to(np.asarray(secondary, np.float32), (3,))
    )
    return TextureSpec(TextureType.CHECKER, main, secondary, float(scale))


def perlin(main, frequency: float = 1.0) -> TextureSpec:
    main = tuple(float(c) for c in np.broadcast_to(np.asarray(main, np.float32), (3,)))
    return TextureSpec(TextureType.PERLIN, main, parameter=float(frequency))


def _as_texture(value: ColorLike) -> TextureSpec:
    if value is None:
        return TextureSpec()
    if isinstance(value, TextureSpec):
        return value
    arr = np.asarray(value, np.float32)
    if arr.ndim == 0:
        return constant_scalar(float(arr))
    return constant(arr)


def _rotation_to_quat(rotation) -> np.ndarray:
    """Accept None / quaternion (4,) / 3x3 matrix; return (x,y,z,w)."""
    if rotation is None:
        return np.array([0.0, 0.0, 0.0, 1.0], np.float32)
    rotation = np.asarray(rotation, np.float32)
    if rotation.shape == (4,):
        return rotation / np.linalg.norm(rotation)
    if rotation.shape == (3, 3):
        m = rotation
        w = np.sqrt(max(0.0, 1.0 + m[0, 0] + m[1, 1] + m[2, 2])) / 2.0
        if w > 1e-6:
            x = (m[2, 1] - m[1, 2]) / (4 * w)
            y = (m[0, 2] - m[2, 0]) / (4 * w)
            z = (m[1, 0] - m[0, 1]) / (4 * w)
        else:  # pragma: no cover - degenerate 180-degree rotations
            x, y, z = 1.0, 0.0, 0.0
        q = np.array([x, y, z, w], np.float32)
        return q / np.linalg.norm(q)
    raise ValueError(f"unsupported rotation spec: {rotation.shape}")


def axis_angle_quat(axis, degrees: float) -> np.ndarray:
    axis = np.asarray(axis, np.float32)
    axis = axis / np.linalg.norm(axis)
    half = np.deg2rad(degrees) / 2.0
    return np.concatenate([axis * np.sin(half), [np.cos(half)]]).astype(np.float32)


def _morton_perm(centroids: np.ndarray) -> np.ndarray:
    """Stable Z-order (Morton) permutation of points (host NumPy).

    10 bits per axis over the centroid bounding box, interleaved into a
    30-bit code; used by build() to sort triangle rows so consecutive
    TRI_BLOCK chunks cover compact 3D regions (tight per-block AABBs for
    the fused kernel's slab cull) regardless of mesh append order."""
    cen = np.asarray(centroids, np.float64)
    lo = cen.min(axis=0)
    span = np.maximum(cen.max(axis=0) - lo, 1e-12)
    q = np.clip((cen - lo) / span * 1024.0, 0.0, 1023.0).astype(np.uint32)

    def spread(v):  # 10 bits -> every 3rd bit of a 30-bit code
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    code = (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])
    return np.argsort(code, kind="stable")


class SceneBuilder:
    """Imperative scene assembly -> immutable SoA Scene pytree.

    Mirrors the reference's material conversion + entity-buffer rebuild
    (Raytracer.cs:1185-1304) with an explicit API instead of Unity scene
    scraping."""

    def __init__(self):
        self._textures: list[TextureSpec] = [TextureSpec()]  # id 0 = NONE
        self._images: list[np.ndarray] = []
        self._image_keys: dict = {}
        self._materials: list[dict] = []
        self._spheres: list[tuple] = []
        self._rects: list[tuple] = []
        self._boxes: list[tuple] = []
        self._triangles: list[tuple] = []
        self._sky = (SkyType.GRADIENT, (1.0, 1.0, 1.0), (0.5, 0.7, 1.0))
        self._cubemap: Optional[np.ndarray] = None

    # -- textures / images --------------------------------------------------

    def add_image(self, name: str, data: np.ndarray) -> TextureSpec:
        """Register an image texture; all images are padded into one atlas."""
        if name not in self._image_keys:
            self._image_keys[name] = len(self._images)
            self._images.append(np.asarray(data, np.float32))
        return TextureSpec(
            TextureType.IMAGE, (1.0, 1.0, 1.0), image=(name, self._image_keys[name])
        )

    def _intern_texture(self, spec: TextureSpec) -> int:
        for i, existing in enumerate(self._textures):
            if existing == spec:
                return i
        self._textures.append(spec)
        return len(self._textures) - 1

    # -- materials -----------------------------------------------------------

    def _add_material(
        self, mat_type, albedo, emission, glossiness, metallic, parameter
    ) -> int:
        albedo = _as_texture(albedo)
        emission = _as_texture(emission)
        glossiness = _as_texture(glossiness)
        metallic = _as_texture(metallic)
        # IsPerfectSpecular (reference: Material.cs:181-196)
        if mat_type == MaterialType.DIELECTRIC:
            perfect = True
        elif mat_type == MaterialType.STANDARD:
            perfect = (
                metallic.type == TextureType.CONSTANT
                and np.allclose(metallic.main_color, 1.0)
                and glossiness.type == TextureType.CONSTANT
                and np.allclose(glossiness.main_color, 1.0)
            ) or (
                metallic.type == TextureType.CONSTANT_SCALAR
                and metallic.parameter == 1.0
                and glossiness.type == TextureType.CONSTANT_SCALAR
                and glossiness.parameter == 1.0
            )
        else:
            perfect = False
        self._materials.append(
            dict(
                type=int(mat_type),
                albedo=self._intern_texture(albedo),
                emission=self._intern_texture(emission),
                glossiness=self._intern_texture(glossiness),
                metallic=self._intern_texture(metallic),
                parameter=float(parameter),
                perfect_specular=bool(perfect),
            )
        )
        return len(self._materials) - 1

    def standard(
        self, albedo, glossiness=0.0, metallic=0.0, emission=None, ior=PLASTIC_IOR
    ) -> int:
        """Unified Lambert/metal/glossy material (Material.cs:75-119)."""
        return self._add_material(
            MaterialType.STANDARD, albedo, emission, glossiness, metallic, ior
        )

    def lambert(self, albedo, emission=None) -> int:
        return self.standard(albedo, glossiness=0.0, metallic=0.0, emission=emission)

    def metal(self, albedo, glossiness=1.0) -> int:
        """Book 'metal': fully metallic standard material; fuzz = 1-gloss."""
        return self.standard(albedo, glossiness=glossiness, metallic=1.0)

    def dielectric(self, ior: float, glossiness=1.0, albedo=(1.0, 1.0, 1.0)) -> int:
        """Reference: Material.cs:121-161."""
        return self._add_material(
            MaterialType.DIELECTRIC, albedo, None, glossiness, None, ior
        )

    def volume(self, density: float, albedo, emission=None) -> int:
        """Probabilistic (Beer-Lambert) volume (Material.cs:49-65,163-168)."""
        return self._add_material(
            MaterialType.PROBABILISTIC_VOLUME, albedo, emission, None, None, density
        )

    def emissive(self, emission, albedo=(0.0, 0.0, 0.0)) -> int:
        return self.standard(albedo, emission=emission)

    # -- entities ------------------------------------------------------------

    def add_sphere(
        self, center, radius, material: int, move_offset=None, time_range=(0.0, 1.0)
    ):
        self._spheres.append(
            (
                np.asarray(center, np.float32),
                float(radius),
                int(material),
                None if move_offset is None else np.asarray(move_offset, np.float32),
                np.asarray(time_range, np.float32),
            )
        )

    def add_rect(self, center, size, material: int, rotation=None):
        """Axis-aligned local-XY rect, one-sided +Z normal
        (Runtime/EntityTypes/Rect.cs:8-20)."""
        size = np.broadcast_to(np.asarray(size, np.float32), (2,))
        self._rects.append(
            (
                _rotation_to_quat(rotation),
                np.asarray(center, np.float32),
                -size / 2.0,
                size / 2.0,
                int(material),
            )
        )

    def add_box(self, center, size, material: int, rotation=None):
        """Oriented box via half-extents (Runtime/EntityTypes/Box.cs:7-19)."""
        size = np.broadcast_to(np.asarray(size, np.float32), (3,))
        self._boxes.append(
            (
                _rotation_to_quat(rotation),
                np.asarray(center, np.float32),
                size / 2.0,
                int(material),
            )
        )

    def add_triangle(self, v0, v1, v2, material: int, normals=None, uvs=None):
        """World-space triangle in the reference's edge form
        (Runtime/EntityTypes/Triangle.cs:7-51: Data = {v2-v0, v1-v0, v0})."""
        v0 = np.asarray(v0, np.float32)
        v1 = np.asarray(v1, np.float32)
        v2 = np.asarray(v2, np.float32)
        if normals is None:
            face_n = np.cross(v1 - v0, v2 - v0)
            norm = np.linalg.norm(face_n)
            face_n = face_n / (norm if norm > 0 else 1.0)
            normals = np.stack([face_n] * 3, axis=-1)  # (3,3) columns
        else:
            normals = np.stack(
                [np.asarray(n, np.float32) for n in normals], axis=-1
            )
        if uvs is None:
            uvs = np.zeros((2, 3), np.float32)
        else:
            uvs = np.stack([np.asarray(u, np.float32) for u in uvs], axis=-1)
        self._triangles.append((
            (v2 - v0)[None], (v1 - v0)[None], v0[None], normals[None],
            uvs[None], np.full((1,), material, np.int32),
        ))

    def add_mesh(
        self, vertices, faces, material: int, normals=None, uvs=None,
        translation=(0, 0, 0), scale=1.0, face_normals=False,
    ):
        """Triangle soup from an indexed mesh, transform baked into world
        space (reference: Jobs/AddMeshRuntimeEntitiesJob.cs:15-92).

        Vectorized bulk append — one (F, ...) chunk per mesh, not one
        Python-level add_triangle per face (a 100k-face mesh made scene
        build a 100k-iteration host loop)."""
        vertices = np.asarray(vertices, np.float32) * float(scale) + np.asarray(
            translation, np.float32
        )
        faces = np.asarray(faces, np.int64)
        if faces.shape[0] == 0:
            return
        v0 = vertices[faces[:, 0]]
        v1 = vertices[faces[:, 1]]
        v2 = vertices[faces[:, 2]]
        if normals is None or face_normals:
            # face normal per triangle, replicated to the 3 vertex slots
            # (AddMeshRuntimeEntitiesJob.cs:70-78 FaceNormals branch;
            # matches add_triangle's normals=None rule)
            fn = np.cross(v1 - v0, v2 - v0)
            nrm = np.linalg.norm(fn, axis=-1, keepdims=True)
            fn = fn / np.where(nrm > 0, nrm, 1.0)
            tri_normals = np.repeat(fn[:, :, None], 3, axis=2)
        else:
            nsrc = np.asarray(normals, np.float32)
            tri_normals = np.stack(
                [nsrc[faces[:, 0]], nsrc[faces[:, 1]], nsrc[faces[:, 2]]],
                axis=-1,
            )
        if uvs is None:
            tri_uvs = np.zeros((faces.shape[0], 2, 3), np.float32)
        else:
            usrc = np.asarray(uvs, np.float32)
            tri_uvs = np.stack(
                [usrc[faces[:, 0]], usrc[faces[:, 1]], usrc[faces[:, 2]]],
                axis=-1,
            )
        self._triangles.append((
            (v2 - v0).astype(np.float32), (v1 - v0).astype(np.float32),
            v0.astype(np.float32), tri_normals.astype(np.float32),
            tri_uvs.astype(np.float32),
            np.full((faces.shape[0],), material, np.int32),
        ))

    # -- environment -----------------------------------------------------------

    def set_gradient_sky(self, bottom=(1.0, 1.0, 1.0), top=(0.5, 0.7, 1.0)):
        self._sky = (SkyType.GRADIENT, tuple(bottom), tuple(top))

    def set_no_sky(self):
        self._sky = (SkyType.NONE, (0.0, 0.0, 0.0), (0.0, 0.0, 0.0))

    def set_cubemap_sky(self, faces: np.ndarray):
        """faces: (6, H, W, 3) in +x,-x,+y,-y,+z,-z order
        (reference: Texture.cs:141-211 Cubemap)."""
        self._sky = (SkyType.CUBEMAP, (0.0, 0.0, 0.0), (0.0, 0.0, 0.0))
        self._cubemap = np.asarray(faces, np.float32)

    # -- build -----------------------------------------------------------------

    def build(
        self, perlin_seed: int = 1, sort_spheres: bool | None = None
    ) -> Scene:
        """Assemble the runtime Scene.

        sort_spheres: Morton-order the sphere list by center so the
        megakernel's blocked sweep (SPH_BLOCK chunks, engaged above
        SPH_CULL_MIN spheres) gets tight per-block AABBs.  Default None
        auto-sorts exactly when that sweep would engage; pass False to
        preserve insertion order (per-index parameter optimization)."""
        mats = self._materials or [
            dict(type=0, albedo=0, emission=0, glossiness=0, metallic=0,
                 parameter=PLASTIC_IOR, perfect_specular=False)
        ]
        materials = MaterialTable(
            type=jnp.asarray([m["type"] for m in mats], jnp.int32),
            albedo_tex=jnp.asarray([m["albedo"] for m in mats], jnp.int32),
            emission_tex=jnp.asarray([m["emission"] for m in mats], jnp.int32),
            glossiness_tex=jnp.asarray([m["glossiness"] for m in mats], jnp.int32),
            metallic_tex=jnp.asarray([m["metallic"] for m in mats], jnp.int32),
            parameter=jnp.asarray([m["parameter"] for m in mats], jnp.float32),
            perfect_specular=jnp.asarray(
                [m["perfect_specular"] for m in mats], jnp.bool_
            ),
        )

        needs_perlin = any(t.type == TextureType.PERLIN for t in self._textures)
        if self._images:
            max_h = max(im.shape[0] for im in self._images)
            max_w = max(im.shape[1] for im in self._images)
            atlas = np.zeros((len(self._images), max_h, max_w, 3), np.float32)
            for i, im in enumerate(self._images):
                atlas[i, : im.shape[0], : im.shape[1]] = im[..., :3]
            atlas = jnp.asarray(atlas)
        else:
            atlas = None
        textures = TextureTable(
            type=jnp.asarray([int(t.type) for t in self._textures], jnp.int32),
            main_color=jnp.asarray(
                [t.main_color for t in self._textures], jnp.float32
            ),
            secondary_color=jnp.asarray(
                [t.secondary_color for t in self._textures], jnp.float32
            ),
            parameter=jnp.asarray([t.parameter for t in self._textures], jnp.float32),
            scalar_channel=jnp.asarray(
                [t.scalar_channel for t in self._textures], jnp.int32
            ),
            image_index=jnp.asarray(
                [(t.image[1] if t.image else -1) for t in self._textures], jnp.int32
            ),
            atlas=atlas,
            perlin=noise_mod.make_perlin_tables(perlin_seed) if needs_perlin else None,
        )

        has_motion = any(s[3] is not None for s in self._spheres)
        if sort_spheres is None:
            from raytracing_in_one_weekend_tpu.ops import pallas_megatrace

            sort_spheres = (
                len(self._spheres) > pallas_megatrace.SPH_CULL_MIN
            )
        if sort_spheres and self._spheres:
            cen = np.stack([s[0] for s in self._spheres]).astype(np.float64)
            lo = cen.min(axis=0)
            span = np.maximum(cen.max(axis=0) - lo, 1e-30)
            q = np.clip((cen - lo) / span * 1023.0, 0, 1023).astype(
                np.uint32
            )

            def _spread(x):
                x = (x | (x << 16)) & np.uint32(0x030000FF)
                x = (x | (x << 8)) & np.uint32(0x0300F00F)
                x = (x | (x << 4)) & np.uint32(0x030C30C3)
                x = (x | (x << 2)) & np.uint32(0x09249249)
                return x

            key = (
                (_spread(q[:, 0]) << 2)
                | (_spread(q[:, 1]) << 1)
                | _spread(q[:, 2])
            )
            self._spheres = [
                self._spheres[i] for i in np.argsort(key, kind="stable")
            ]
        if self._spheres:
            spheres = Spheres(
                center=jnp.asarray(np.stack([s[0] for s in self._spheres])),
                radius=jnp.asarray([s[1] for s in self._spheres], jnp.float32),
                material=jnp.asarray([s[2] for s in self._spheres], jnp.int32),
                move_offset=(
                    jnp.asarray(
                        np.stack(
                            [
                                s[3] if s[3] is not None else np.zeros(3, np.float32)
                                for s in self._spheres
                            ]
                        )
                    )
                    if has_motion
                    else None
                ),
                time_range=(
                    jnp.asarray(np.stack([s[4] for s in self._spheres]))
                    if has_motion
                    else None
                ),
            )
        else:
            spheres = Spheres(
                center=jnp.zeros((0, 3)), radius=jnp.zeros((0,)),
                material=jnp.zeros((0,), jnp.int32), move_offset=None, time_range=None,
            )

        def _stack(rows, shapes):
            if rows:
                return [jnp.asarray(np.stack([r[i] for r in rows])) for i in range(len(shapes))]
            return [jnp.zeros((0,) + s, jnp.float32) for s in shapes]

        if self._rects:
            rects = Rects(
                rot=jnp.asarray(np.stack([r[0] for r in self._rects])),
                pos=jnp.asarray(np.stack([r[1] for r in self._rects])),
                xy_from=jnp.asarray(np.stack([r[2] for r in self._rects])),
                xy_to=jnp.asarray(np.stack([r[3] for r in self._rects])),
                material=jnp.asarray([r[4] for r in self._rects], jnp.int32),
            )
        else:
            rects = Rects(
                rot=jnp.zeros((0, 4)), pos=jnp.zeros((0, 3)),
                xy_from=jnp.zeros((0, 2)), xy_to=jnp.zeros((0, 2)),
                material=jnp.zeros((0,), jnp.int32),
            )

        if self._boxes:
            boxes = Boxes(
                rot=jnp.asarray(np.stack([b[0] for b in self._boxes])),
                pos=jnp.asarray(np.stack([b[1] for b in self._boxes])),
                extents=jnp.asarray(np.stack([b[2] for b in self._boxes])),
                material=jnp.asarray([b[3] for b in self._boxes], jnp.int32),
            )
        else:
            boxes = Boxes(
                rot=jnp.zeros((0, 4)), pos=jnp.zeros((0, 3)),
                extents=jnp.zeros((0, 3)), material=jnp.zeros((0,), jnp.int32),
            )

        if self._triangles:
            # each entry is a (k, ...) chunk (k=1 for add_triangle, k=F
            # for an add_mesh bulk append)
            edge_a = np.concatenate([t[0] for t in self._triangles])
            edge_b = np.concatenate([t[1] for t in self._triangles])
            vert0 = np.concatenate([t[2] for t in self._triangles])
            normals = np.concatenate([t[3] for t in self._triangles])
            uvs = np.concatenate([t[4] for t in self._triangles])
            material = np.concatenate([t[5] for t in self._triangles])
            # Spatial (Morton) sort by centroid, ONCE at scene compile:
            # the fused kernel's per-TRI_BLOCK AABB cull needs spatially
            # compact row blocks, and sorting here (host NumPy) keeps the
            # per-batch packers (ops/pallas_megatrace.pack_tri_*) pure
            # row-order chunkers — no per-batch device argsort/gathers of
            # up to 262k rows inside the render jit.  Nearest-hit
            # reduction is order-independent, so images are unchanged
            # (modulo equal-t tie-breaks).  The reference gets the same
            # locality from its BVH leaf ordering (BvhNodeData.cs
            # longest-axis splits).
            perm = _morton_perm(vert0 + (edge_a + edge_b) * (1.0 / 3.0))
            triangles = Triangles(
                edge_a=jnp.asarray(edge_a[perm]),
                edge_b=jnp.asarray(edge_b[perm]),
                vert0=jnp.asarray(vert0[perm]),
                normals=jnp.asarray(normals[perm]),
                uvs=jnp.asarray(uvs[perm]),
                material=jnp.asarray(material[perm], jnp.int32),
            )
        else:
            triangles = Triangles(
                edge_a=jnp.zeros((0, 3)), edge_b=jnp.zeros((0, 3)),
                vert0=jnp.zeros((0, 3)), normals=jnp.zeros((0, 3, 3)),
                uvs=jnp.zeros((0, 2, 3)), material=jnp.zeros((0,), jnp.int32),
            )

        sky_type, bottom, top = self._sky
        environment = Environment(
            sky_type=jnp.asarray(int(sky_type), jnp.int32),
            sky_bottom=jnp.asarray(bottom, jnp.float32),
            sky_top=jnp.asarray(top, jnp.float32),
            cubemap=jnp.asarray(self._cubemap) if self._cubemap is not None else None,
        )

        mat_types = [m["type"] for m in mats]
        vol_ids = {
            i for i, t in enumerate(mat_types)
            if t == int(MaterialType.PROBABILISTIC_VOLUME)
        }
        nonconvex_volumes = any(
            r[4] in vol_ids for r in self._rects
        ) or any(
            bool(np.isin(t[5], list(vol_ids)).any())
            for t in self._triangles
        )
        flags = SceneFlags(
            has_volumes=int(MaterialType.PROBABILISTIC_VOLUME) in mat_types,
            has_dielectrics=int(MaterialType.DIELECTRIC) in mat_types,
            has_motion=has_motion,
            has_emissive=any(
                self._textures[m["emission"]].type != TextureType.NONE
                for m in mats
            ),
            has_procedural_textures=any(
                t.type in (TextureType.CHECKER, TextureType.PERLIN,
                           TextureType.IMAGE)
                for t in self._textures
            ),
            sky=int(sky_type),
            has_nonconvex_volumes=nonconvex_volumes,
            # only MOVING spheres constrain the fused motion path;
            # time_range on a static sphere is meaningless
            motion_unit_time=all(
                s[3] is None
                or (float(s[4][0]) == 0.0 and float(s[4][1]) == 1.0)
                for s in self._spheres
            ),
            procedural_albedo_only=all(
                not any(
                    self._textures[m[slot]].type
                    in (TextureType.CHECKER, TextureType.PERLIN,
                        TextureType.IMAGE)
                    for slot in ("emission", "glossiness", "metallic")
                )
                and not (
                    self._textures[m["albedo"]].type
                    in (TextureType.CHECKER, TextureType.PERLIN,
                        TextureType.IMAGE)
                    and m["type"] == int(MaterialType.PROBABILISTIC_VOLUME)
                )
                for m in mats
            ),
        )
        return Scene(
            spheres=spheres, rects=rects, boxes=boxes, triangles=triangles,
            materials=materials, textures=textures, environment=environment,
            flags=flags,
        )
