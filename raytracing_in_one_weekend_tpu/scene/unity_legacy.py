"""Importer for the reference's legacy serialized scenes (.asset YAML).

The reference ships 25 scene descriptions from its pre-Unity-scene data
system under Assets/Scenes/Legacy/*.asset (Diffuse Testbed, Cornell Box,
Final Scene Book 1/2, Bunny, ...), but the loader for them is gone — the
live path scrapes Unity GameObjects instead (Unity/Raytracer.cs:1185-1304)
and the procedural random-scene generator they reference is commented out
(Unity/Raytracer.cs:1355-1506).  This module resurrects that data system
for the TPU build: it parses the Unity-YAML scene assets into a
SceneBuilder + CameraSettings, including the `randomEntityGroups`
procedural generator (dart-throwing and jittered-grid distributions with
the lambert/metal/dielectric/light material lottery, re-implemented from
the commented reference code).

Caveats, all inherent to the reference repo's state:
  * The material .asset files the scenes reference by GUID are absent
    from the reference repo; entities fall back to a gray lambert unless
    a ``material_map`` (GUID -> material spec, see MATERIAL_KINDS) is
    supplied.
  * Cubemap skies reference .exr textures whose binaries are absent
    (only .meta files survive); those scenes fall back to gradient sky.
  * The random generator uses NumPy's RNG, not Unity.Mathematics.Random,
    so layouts are statistically equivalent, not bit-identical.
  * Coordinates import verbatim: the TPU camera (core/camera.py) is the
    orientation-preserving right-handed equivalent of the reference's
    left-handed basis, so identical numbers produce identically-oriented
    images.

Mesh entities resolve their mesh GUID through Unity .meta files to the
.obj sources that DO ship with the reference (stanford-bunny, teapot) and
load through models/meshes.load_obj (the native C++ parser).
"""

from __future__ import annotations

import functools
import os
import re
import warnings
from typing import Callable, Optional, Union

import numpy as np

from raytracing_in_one_weekend_tpu.scene.scene import SceneBuilder
from raytracing_in_one_weekend_tpu.utils.config import CameraSettings

# Legacy serialized entity-type enum.  The runtime enum (Entity.cs:13-20)
# is {None, Sphere, Rect, Box, Triangle}; the serialized data adds Mesh
# (observed: spheres are `type: 1` in every sphere scene, Cornell's walls
# are `type: 2`, its blocks `type: 3`, Triangle Test uses 4, Bunny 5).
TYPE_NONE, TYPE_SPHERE, TYPE_RECT, TYPE_BOX, TYPE_TRIANGLE, TYPE_MESH = (
    range(6)
)

DEFAULT_REFERENCE_ROOT = "/root/reference/RaytracingInOneWeekend/Assets"

MaterialSpec = Union[dict, int]
MaterialMap = Union[dict, Callable[[str, "SceneBuilder"], int], None]


def _vec(d: dict, keys: str = "xyz") -> np.ndarray:
    return np.asarray([float(d[k]) for k in keys], np.float32)


def _color(d: dict) -> tuple:
    return (float(d["r"]), float(d["g"]), float(d["b"]))


def load_unity_yaml(path: str) -> dict:
    """Parse a single-document Unity YAML asset into its MonoBehaviour
    payload dict.  Unity's `%TAG !u!` directive and `--- !u!114 &id`
    object tags are not plain YAML; strip them before yaml.safe_load."""
    import yaml

    with open(path) as fh:
        text = fh.read()
    lines = [
        ("---" if line.startswith("--- !u!") else line)
        for line in text.splitlines()
        if not line.startswith("%")
    ]
    doc = yaml.safe_load("\n".join(lines))
    if not isinstance(doc, dict) or "MonoBehaviour" not in doc:
        raise ValueError(f"{path}: not a Unity MonoBehaviour asset")
    return doc["MonoBehaviour"]


@functools.lru_cache(maxsize=4)
def _guid_table(assets_root: str) -> dict:
    """GUID -> asset path, from the .meta files under ``assets_root``."""
    table: dict[str, str] = {}
    pat = re.compile(r"^guid:\s*([0-9a-f]{32})", re.M)
    for dirpath, _dirnames, filenames in os.walk(assets_root):
        for name in filenames:
            if not name.endswith(".meta"):
                continue
            meta = os.path.join(dirpath, name)
            try:
                with open(meta) as fh:
                    m = pat.search(fh.read(2048))
            except OSError:  # pragma: no cover
                continue
            if m:
                table[m.group(1)] = meta[: -len(".meta")]
    return table


def _euler_quat(deg: np.ndarray) -> np.ndarray:
    """Unity Quaternion.Euler: intrinsic Z-X-Y, i.e. q = Ry(y)Rx(x)Rz(z)
    (degrees).  Returns (x, y, z, w)."""
    hx, hy, hz = np.deg2rad(deg) / 2.0

    def axis_q(c, s, axis):
        q = np.zeros(4, np.float64)
        q[3] = c
        q[axis] = s
        return q

    def mul(a, b):  # Hamilton product, (x,y,z,w)
        ax, ay, az, aw = a
        bx, by, bz, bw = b
        return np.asarray(
            [
                aw * bx + ax * bw + ay * bz - az * by,
                aw * by - ax * bz + ay * bw + az * bx,
                aw * bz + ax * by - ay * bx + az * bw,
                aw * bw - ax * bx - ay * by - az * bz,
            ]
        )

    qy = axis_q(np.cos(hy), np.sin(hy), 1)
    qx = axis_q(np.cos(hx), np.sin(hx), 0)
    qz = axis_q(np.cos(hz), np.sin(hz), 2)
    return mul(mul(qy, qx), qz).astype(np.float32)


def _rotate(q: np.ndarray, v: np.ndarray) -> np.ndarray:
    x, y, z, w = q
    u = np.asarray([x, y, z], np.float64)
    v = np.asarray(v, np.float64)
    return (
        2.0 * np.dot(u, v) * u
        + (w * w - np.dot(u, u)) * v
        + 2.0 * w * np.cross(u, v)
    ).astype(np.float32)


# -- materials ---------------------------------------------------------------

MATERIAL_KINDS = ("lambert", "standard", "metal", "dielectric", "volume",
                  "emissive")


def _add_material_from_spec(b: SceneBuilder, spec: MaterialSpec) -> int:
    """Material spec -> builder material id.  Specs are JSON-able dicts:
    {"kind": "metal", "albedo": [r,g,b], "glossiness": 0.8}; see
    MATERIAL_KINDS and the SceneBuilder factory methods for fields.

    An "image" field names a texture file (absolute, or relative to the
    reference asset root — e.g. "Textures/earthmap.jpg") bound as the
    albedo (the reference's ImageTexture slot, Texture.cs:61-78); it
    falls back to the spec's constant albedo when the file is absent."""
    if isinstance(spec, int):
        return spec
    kind = spec.get("kind", "lambert")
    args = {k: v for k, v in spec.items() if k != "kind"}
    if kind not in MATERIAL_KINDS:
        raise ValueError(f"unknown material kind {kind!r}")
    image_path = args.pop("image", None)
    if image_path is not None:
        from raytracing_in_one_weekend_tpu import assets

        img = assets.load_texture(image_path, max_width=512)
        if img is not None:
            args["albedo"] = b.add_image(image_path, img)
        else:
            warnings.warn(
                f"image texture {image_path!r} not found; using the "
                "spec's constant albedo"
            )
    return getattr(b, kind)(**args)


class _MaterialResolver:
    def __init__(self, b: SceneBuilder, material_map: MaterialMap):
        self._b = b
        self._map = material_map
        self._cache: dict[str, int] = {}
        self.unresolved: list[str] = []

    def __call__(self, guid: Optional[str]) -> int:
        key = guid or "<none>"
        if key in self._cache:
            return self._cache[key]
        mat: Optional[int] = None
        if guid and self._map is not None:
            if callable(self._map):
                got = self._map(guid, self._b)
                mat = None if got is None else int(got)
            elif guid in self._map:
                mat = _add_material_from_spec(self._b, self._map[guid])
        if mat is None:
            self.unresolved.append(key)
            mat = self._b.lambert((0.5, 0.5, 0.5))
        self._cache[key] = mat
        return mat


# -- the random-entity-group generator ---------------------------------------
# Re-implementation of the reference's commented-out legacy generator
# (Unity/Raytracer.cs:1355-1506): material lottery + dart-throwing /
# jittered-grid placement with a sphere overlap test.

def _gradient_endpoints(g: dict) -> tuple[np.ndarray, np.ndarray]:
    """Unity Gradient serialization: key0/key1 are the two color keys the
    generator lerps between (Raytracer.cs:1384-1387)."""
    lo = np.asarray(_color(g["key0"]), np.float32)
    hi = np.asarray(_color(g["key1"]), np.float32)
    return lo, hi


def _group_material(b: SceneBuilder, group: dict, rng) -> int:
    lam = float(group.get("LambertChance", 0.0))
    met = float(group.get("MetalChance", 0.0))
    die = float(group.get("DieletricChance", 0.0))  # sic, reference typo
    lig = float(group.get("LightChance", 0.0))
    total = lam + met + die + lig
    if total <= 0.0:
        return b.lambert((0.5, 0.5, 0.5))
    edges = np.cumsum([lam, met, die, lig]) / total
    r = rng.random()
    if r < edges[0]:
        lo, hi = _gradient_endpoints(group["DiffuseAlbedo"])
        color = lo + rng.random(3).astype(np.float32) * (hi - lo)
        if group.get("DoubleSampleDiffuseAlbedo"):
            color = color * (lo + rng.random(3).astype(np.float32) * (hi - lo))
        return b.lambert(color)
    if r < edges[1]:
        lo, hi = _gradient_endpoints(group["MetalAlbedo"])
        color = lo + rng.random(3).astype(np.float32) * (hi - lo)
        fz = group.get("Fuzz", {"x": 0.0, "y": 0.0})
        fuzz = float(fz["x"]) + rng.random() * (float(fz["y"]) - float(fz["x"]))
        return b.metal(color, glossiness=1.0 - fuzz)
    if r < edges[2]:
        ri = group.get("RefractiveIndex", {"x": 1.5, "y": 1.5})
        ior = float(ri["x"]) + rng.random() * (float(ri["y"]) - float(ri["x"]))
        return b.dielectric(ior)
    lo, hi = _gradient_endpoints(group["Emissive"])
    color = lo + rng.random(3).astype(np.float32) * (hi - lo)
    return b.emissive(color)


class _OverlapTester:
    """Sphere-only overlap rejection (Raytracer.cs:1418-1421); tracks
    every sphere added so far except excludeFromOverlapTest ones."""

    def __init__(self):
        self._centers: list[np.ndarray] = []
        self._radii: list[float] = []

    def add(self, center, radius, exclude=False):
        if not exclude:
            self._centers.append(np.asarray(center, np.float32))
            self._radii.append(float(radius))

    def any_overlap(self, center, radius, min_distance) -> bool:
        if not self._centers:
            return False
        d = np.linalg.norm(
            np.stack(self._centers) - np.asarray(center, np.float32), axis=1
        )
        return bool(
            (d < np.asarray(self._radii) + radius + min_distance).any()
        )


def _emit_group_entity(
    b: SceneBuilder, group: dict, center, radius3, rng, overlap
):
    """GetEntity (Raytracer.cs:1423-1455): group rotation about Offset,
    material lottery, optional movement."""
    q = _euler_quat(_vec(group.get("Rotation", dict(x=0, y=0, z=0))))
    offset = _vec(group.get("Offset", dict(x=0, y=0, z=0)))
    position = _rotate(q, np.asarray(center, np.float32) - offset) + offset
    mat = _group_material(b, group, rng)
    move = None
    if rng.random() < float(group.get("MovementChance", 0.0)):
        mo = [
            group.get(k, {"x": 0.0, "y": 0.0})
            for k in ("MovementXOffset", "MovementYOffset", "MovementZOffset")
        ]
        lo = np.asarray([float(m["x"]) for m in mo], np.float32)
        hi = np.asarray([float(m["y"]) for m in mo], np.float32)
        move = lo + rng.random(3).astype(np.float32) * (hi - lo)

    gtype = int(group.get("Type", TYPE_SPHERE))
    if gtype == TYPE_SPHERE:
        b.add_sphere(position, float(radius3[0]), mat, move_offset=move)
        overlap.add(position, float(radius3[0]))
    elif gtype == TYPE_BOX:
        b.add_box(position, 2.0 * np.asarray(radius3, np.float32), mat,
                  rotation=q)
    elif gtype == TYPE_RECT:
        b.add_rect(position, 2.0 * np.asarray(radius3[:2], np.float32), mat,
                   rotation=q)
    # Triangle groups: TODO in the reference too (Raytracer.cs:1441)


def _expand_random_group(b: SceneBuilder, group: dict, rng, overlap):
    spread = np.asarray(
        [float(group.get(f"Spread{a}", 0.0)) for a in "XYZ"], np.float32
    )
    offset = _vec(group.get("Offset", dict(x=0, y=0, z=0)))
    rlo = float(group.get("Radius", {"x": 1.0})["x"])
    rhi = float(group.get("Radius", {"x": 1.0, "y": 1.0}).get("y", rlo))
    skip_overlap = bool(group.get("SkipOverlapTest", 0))
    min_dist = float(group.get("MinDistance", 0.0))

    if int(group.get("Distribution", 0)) == 0:  # DartThrowing
        for _ in range(int(group.get("TentativeCount", 0))):
            center = offset + (rng.random(3).astype(np.float32) - 0.5) * spread
            radius = rlo + rng.random() * (rhi - rlo)
            if group.get("OffsetByRadius"):
                center = center + radius
            if not skip_overlap and overlap.any_overlap(
                center, radius, min_dist
            ):
                continue
            _emit_group_entity(
                b, group, center, np.full(3, radius, np.float32), rng, overlap
            )
    else:  # JitteredGrid (Raytracer.cs:1478-1503)
        period = np.maximum(
            np.asarray(
                [float(group.get(f"Period{a}", 1.0)) for a in "XYZ"],
                np.float32,
            ),
            1.0,
        )
        cell = period * np.sign(spread)
        var = float(group.get("PositionVariation", 0.0))
        end = offset + spread / 2.0
        end = end + (1.0 - np.abs(np.sign(spread))) * period / 2.0
        svar = [
            group.get(f"ScaleVariation{a}", {"x": 1.0, "y": 1.0})
            for a in "XYZ"
        ]
        i = offset[0] - spread[0] / 2.0
        while i < end[0]:
            j = offset[1] - spread[1] / 2.0
            while j < end[1]:
                k = offset[2] - spread[2] / 2.0
                while k < end[2]:
                    center = (
                        np.asarray([i, j, k], np.float32)
                        + rng.random(3).astype(np.float32) * var * cell
                    )
                    r = rlo + rng.random() * (rhi - rlo)
                    radius3 = r * np.asarray(
                        [
                            float(s["x"])
                            + rng.random() * (float(s["y"]) - float(s["x"]))
                            for s in svar
                        ],
                        np.float32,
                    )
                    if not skip_overlap and overlap.any_overlap(
                        center, float(radius3[0]), min_dist
                    ):
                        k += period[2]
                        continue
                    _emit_group_entity(
                        b, group, center, radius3, rng, overlap
                    )
                    k += period[2]
                j += period[1]
            i += period[0]


# -- the importer -------------------------------------------------------------


def import_legacy_scene(
    path: str,
    material_map: MaterialMap = None,
    assets_root: Optional[str] = None,
) -> tuple[SceneBuilder, CameraSettings]:
    """Import a reference legacy .asset scene.

    ``material_map`` resolves the scene's material GUIDs (the material
    assets themselves are absent from the reference repo): a dict
    GUID -> spec dict ({"kind": "metal", "albedo": [...], ...}) or a
    callable (guid, builder) -> material id / None.  Unresolved GUIDs
    fall back to gray lambert.  ``assets_root`` locates mesh .obj files
    via Unity .meta GUIDs (default: the reference checkout's Assets/).
    """
    from raytracing_in_one_weekend_tpu.models import meshes

    data = load_unity_yaml(path)
    root = assets_root or DEFAULT_REFERENCE_ROOT

    b = SceneBuilder()
    resolve = _MaterialResolver(b, material_map)
    overlap = _OverlapTester()

    for ent in data.get("entities") or []:
        if not ent.get("enabled", 1):
            continue
        etype = int(ent.get("type", TYPE_NONE))
        if etype == TYPE_NONE:
            continue
        mat = resolve((ent.get("material") or {}).get("guid"))
        position = _vec(ent["position"])
        q = _euler_quat(_vec(ent.get("rotation", dict(x=0, y=0, z=0))))
        move = None
        time_range = (0.0, 1.0)
        if ent.get("moving"):
            move = _vec(ent["destinationOffset"])
            tr = ent.get("timeRange", {"x": 0.0, "y": 1.0})
            time_range = (float(tr["x"]), float(tr["y"]))
            if time_range == (0.0, 0.0):
                time_range = (0.0, 1.0)

        if etype == TYPE_SPHERE:
            sd = ent["sphereData"]
            b.add_sphere(position, float(sd["radius"]), mat,
                         move_offset=move, time_range=time_range)
            overlap.add(position, float(sd["radius"]),
                        exclude=bool(sd.get("excludeFromOverlapTest", 0)))
        elif etype == TYPE_RECT:
            size = _vec(ent["rectData"]["size"], "xy")
            b.add_rect(position, size, mat, rotation=q)
        elif etype == TYPE_BOX:
            size = _vec(ent["boxData"]["size"])
            b.add_box(position, size, mat, rotation=q)
        elif etype == TYPE_TRIANGLE:
            td = ent["triangleData"]
            va, vb, vc = (_vec(td[k]) for k in "abc")
            b.add_triangle(
                position + _rotate(q, va),
                position + _rotate(q, vb),
                position + _rotate(q, vc),
                mat,
            )
        elif etype == TYPE_MESH:
            md = ent["meshData"]
            mesh_ref = md.get("mesh") or {}
            guid = mesh_ref.get("guid")
            uvs = None
            if guid == "0000000000000000e000000000000000":
                # Unity built-in primitives by fileID (Cube=10202,
                # Sphere=10207); both are unit-ish: cube 1x1x1, sphere
                # radius 0.5
                file_id = int(mesh_ref.get("fileID", 0))
                if file_id == 10202:
                    verts, faces, normals, uvs = meshes.cube()
                elif file_id == 10207:
                    verts, faces, normals, uvs = meshes.icosphere(3)
                    verts = 0.5 * np.asarray(verts, np.float32)
                else:
                    warnings.warn(
                        f"{path}: unsupported Unity built-in mesh fileID "
                        f"{file_id}; skipped"
                    )
                    continue
            else:
                mesh_path = _guid_table(root).get(guid) if guid else None
                if mesh_path is None or not mesh_path.lower().endswith(
                    ".obj"
                ):
                    warnings.warn(
                        f"{path}: mesh entity GUID {guid!r} does not "
                        f"resolve to an .obj under {root}; skipped"
                    )
                    continue
                # fileID sub-mesh selection needs Unity's import hashes;
                # the whole OBJ is loaded instead (Submesh Test's parts
                # all come from the same teapot.obj)
                verts, faces, normals, uvs = meshes.load_obj(mesh_path)
            q_rows = np.stack(
                [_rotate(q, v) for v in np.eye(3, dtype=np.float32)]
            ).T  # rotation matrix (columns = rotated basis)
            b.add_mesh(
                verts @ q_rows.T, faces, mat,
                normals=None if normals is None else normals @ q_rows.T,
                uvs=uvs,
                translation=position,
                face_normals=bool(md.get("faceNormals", 0)),
            )

    rng = np.random.default_rng(int(data.get("randomSeed", 1)))
    for group in data.get("randomEntityGroups") or []:
        _expand_random_group(b, group, rng, overlap)

    # The legacy serialized sky enum is {GradientSky=0, CubeMap=1} — NOT
    # the runtime Environment.cs order.  Surveyed over all 25 assets:
    # skyType 0 (or absent, for assets predating the field) pairs with
    # stored gradient colors (white/blue on the book scenes, black on the
    # Cornell/simple-light dark boxes); skyType 1 pairs with a skyCubemap
    # GUID on exactly the cubemap scenes (Bunny, Cubemap Testbed, ...).
    sky_type = int(data.get("skyType", 0))
    bot = data.get("skyBottomColor")
    top = data.get("skyTopColor")
    gradient = (
        _color(bot) if bot else (1.0, 1.0, 1.0),
        _color(top) if top else (0.5, 0.7, 1.0),
    )
    if sky_type == 1:
        # cubemap .exr binaries are absent from the reference repo (only
        # .meta survive) — fall back to the asset's stored gradient,
        # caller may set_cubemap_sky
        warnings.warn(
            f"{path}: cubemap sky texture is absent from the reference "
            "repo; using the stored gradient sky"
        )
        b.set_gradient_sky(*gradient)
    else:
        b.set_gradient_sky(*gradient)

    camera = CameraSettings(
        origin=tuple(_vec(data["cameraPosition"])),
        look_at=tuple(_vec(data["cameraTarget"])),
        vertical_fov=float(data.get("cameraFieldOfView", 40.0)),
        aperture=float(data.get("cameraAperture", 0.0)),
    )
    return b, camera
