"""Declarative scene files: save/load SceneBuilder descriptions as JSON.

The reference authors scenes in the Unity editor and compiles them from
live GameObjects (Unity/Raytracer.cs:1185-1304); its earlier data system
serialized scene descriptions to .asset files (Assets/Scenes/Legacy/).
The TPU build's equivalent (SURVEY.md §2.6: "scene from config files
instead of Unity scenes") is this module: a versioned JSON format that
round-trips everything SceneBuilder can express — materials, textures
(constant/checker/perlin/image), spheres (incl. motion blur), rects,
boxes, triangle soup/meshes, gradient/cubemap sky — plus the camera.

Large arrays (image atlases, cubemap faces, triangle soups past an
inline threshold) go to a sidecar ``<scene>.npz`` next to the JSON so
the JSON stays human-editable; small scenes are a single file.

See also scene/unity_legacy.py, which imports the reference's legacy
.asset files into this same SceneBuilder description.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from raytracing_in_one_weekend_tpu.core.textures import TextureType
from raytracing_in_one_weekend_tpu.scene.scene import (
    SceneBuilder,
    SkyType,
    TextureSpec,
)
from raytracing_in_one_weekend_tpu.utils.config import CameraSettings

FORMAT_NAME = "rtiw-scene"
FORMAT_VERSION = 1
# triangle soups up to this many rows inline as JSON lists; bigger go to
# the npz sidecar (a 100k-face mesh as JSON would be tens of MB of text)
TRI_INLINE_MAX = 512


def _floats(x) -> list:
    return np.asarray(x, np.float64).tolist()


def _texture_to_json(spec: TextureSpec) -> dict:
    d: dict = {"type": TextureType(spec.type).name.lower()}
    if spec.type in (TextureType.CONSTANT, TextureType.CHECKER,
                     TextureType.PERLIN, TextureType.IMAGE):
        d["main_color"] = _floats(spec.main_color)
    if spec.type == TextureType.CHECKER:
        d["secondary_color"] = _floats(spec.secondary_color)
    if spec.type in (TextureType.CHECKER, TextureType.PERLIN,
                     TextureType.CONSTANT_SCALAR):
        d["parameter"] = float(spec.parameter)
    if spec.scalar_channel:
        d["scalar_channel"] = int(spec.scalar_channel)
    if spec.image is not None:
        d["image"] = spec.image[0]  # registered image name
    return d


def _texture_from_json(d: dict, image_ids: dict) -> TextureSpec:
    ttype = TextureType[d["type"].upper()]
    image = None
    if ttype == TextureType.IMAGE:
        name = d["image"]
        image = (name, image_ids[name])
    return TextureSpec(
        type=ttype,
        main_color=tuple(d.get("main_color", (0.0, 0.0, 0.0))),
        secondary_color=tuple(d.get("secondary_color", (0.0, 0.0, 0.0))),
        parameter=float(d.get("parameter", 0.0)),
        scalar_channel=int(d.get("scalar_channel", 0)),
        image=image,
    )


def builder_from_scene(scene) -> SceneBuilder:
    """Reverse-compile a BUILT Scene into an equivalent SceneBuilder.

    Lets save_scene export registry scenes (models/*.SCENES return built
    pytrees).  The description is faithful modulo two built-in
    normalizations: triangle rows keep their Morton-sorted order (build()
    re-sorts idempotently) and image textures keep their atlas-padded
    extents (sampling indexes the padded atlas uniformly, so pixels are
    identical).  Perlin permutation tables are re-derived by build()'s
    ``perlin_seed``.
    """
    b = SceneBuilder()

    tex_types = np.asarray(scene.textures.type)
    mains = np.asarray(scene.textures.main_color)
    secs = np.asarray(scene.textures.secondary_color)
    params = np.asarray(scene.textures.parameter)
    chans = np.asarray(scene.textures.scalar_channel)
    img_idx = np.asarray(scene.textures.image_index)
    if scene.textures.atlas is not None:
        for i, face in enumerate(np.asarray(scene.textures.atlas)):
            name = f"image_{i}"
            b._image_keys[name] = i
            b._images.append(np.asarray(face, np.float32))
    b._textures = [
        TextureSpec(
            type=TextureType(int(tex_types[i])),
            main_color=tuple(float(c) for c in mains[i]),
            secondary_color=tuple(float(c) for c in secs[i]),
            parameter=float(params[i]),
            scalar_channel=int(chans[i]),
            image=(
                (f"image_{int(img_idx[i])}", int(img_idx[i]))
                if int(img_idx[i]) >= 0
                else None
            ),
        )
        for i in range(tex_types.shape[0])
    ]

    m = scene.materials
    b._materials = [
        dict(
            type=int(t), albedo=int(a), emission=int(e), glossiness=int(g),
            metallic=int(mt), parameter=float(p), perfect_specular=bool(ps),
        )
        for t, a, e, g, mt, p, ps in zip(
            np.asarray(m.type), np.asarray(m.albedo_tex),
            np.asarray(m.emission_tex), np.asarray(m.glossiness_tex),
            np.asarray(m.metallic_tex), np.asarray(m.parameter),
            np.asarray(m.perfect_specular),
        )
    ]

    s = scene.spheres
    centers = np.asarray(s.center)
    radii = np.asarray(s.radius)
    mats = np.asarray(s.material)
    moves = None if s.move_offset is None else np.asarray(s.move_offset)
    times = None if s.time_range is None else np.asarray(s.time_range)
    for i in range(centers.shape[0]):
        mv = None
        if moves is not None and float(np.abs(moves[i]).max()) > 0.0:
            mv = moves[i]
        b._spheres.append(
            (
                centers[i], float(radii[i]), int(mats[i]), mv,
                (
                    times[i]
                    if times is not None
                    else np.asarray((0.0, 1.0), np.float32)
                ),
            )
        )

    r = scene.rects
    for i in range(np.asarray(r.material).shape[0]):
        b._rects.append(
            (
                np.asarray(r.rot)[i], np.asarray(r.pos)[i],
                np.asarray(r.xy_from)[i], np.asarray(r.xy_to)[i],
                int(np.asarray(r.material)[i]),
            )
        )
    x = scene.boxes
    for i in range(np.asarray(x.material).shape[0]):
        b._boxes.append(
            (
                np.asarray(x.rot)[i], np.asarray(x.pos)[i],
                np.asarray(x.extents)[i], int(np.asarray(x.material)[i]),
            )
        )
    tri = scene.triangles
    if np.asarray(tri.material).shape[0]:
        b._triangles.append(
            (
                np.asarray(tri.edge_a), np.asarray(tri.edge_b),
                np.asarray(tri.vert0), np.asarray(tri.normals),
                np.asarray(tri.uvs),
                np.asarray(tri.material, np.int32),
            )
        )

    sky_type = int(np.asarray(scene.environment.sky_type))
    if sky_type == int(SkyType.GRADIENT):
        b.set_gradient_sky(
            tuple(np.asarray(scene.environment.sky_bottom).tolist()),
            tuple(np.asarray(scene.environment.sky_top).tolist()),
        )
    elif sky_type == int(SkyType.CUBEMAP):
        b.set_cubemap_sky(np.asarray(scene.environment.cubemap))
    else:
        b.set_no_sky()
    return b


def save_scene(
    builder,
    path: str,
    camera: Optional[CameraSettings] = None,
) -> None:
    """Write a SceneBuilder description (and optional camera) to ``path``.
    A built Scene is accepted too (reverse-compiled via
    builder_from_scene).

    Arrays too large to inline are written to ``<path minus .json>.npz``
    and referenced from the JSON by key.
    """
    if not isinstance(builder, SceneBuilder):
        builder = builder_from_scene(builder)
    sidecar: dict[str, np.ndarray] = {}
    stem = path[:-5] if path.endswith(".json") else path
    sidecar_name = os.path.basename(stem) + ".npz"

    image_names = {v: k for k, v in builder._image_keys.items()}
    images = []
    for idx, data in enumerate(builder._images):
        key = f"image_{idx}"
        sidecar[key] = data
        images.append({"name": image_names[idx], "array": key})

    doc: dict = {
        "format": FORMAT_NAME,
        "version": FORMAT_VERSION,
        "textures": [_texture_to_json(t) for t in builder._textures],
        "images": images,
        "materials": [dict(m) for m in builder._materials],
    }

    doc["spheres"] = [
        {
            "center": _floats(c),
            "radius": float(r),
            "material": int(m),
            **(
                {
                    "move_offset": _floats(mv),
                    "time_range": _floats(tr),
                }
                if mv is not None
                else {}
            ),
        }
        for (c, r, m, mv, tr) in builder._spheres
    ]
    doc["rects"] = [
        {
            "rotation": _floats(q),
            "center": _floats(p),
            "from": _floats(f),
            "to": _floats(t),
            "material": int(m),
        }
        for (q, p, f, t, m) in builder._rects
    ]
    doc["boxes"] = [
        {
            "rotation": _floats(q),
            "center": _floats(p),
            "extents": _floats(e),
            "material": int(m),
        }
        for (q, p, e, m) in builder._boxes
    ]

    if builder._triangles:
        edge_a = np.concatenate([t[0] for t in builder._triangles])
        edge_b = np.concatenate([t[1] for t in builder._triangles])
        vert0 = np.concatenate([t[2] for t in builder._triangles])
        normals = np.concatenate([t[3] for t in builder._triangles])
        uvs = np.concatenate([t[4] for t in builder._triangles])
        material = np.concatenate([t[5] for t in builder._triangles])
        if edge_a.shape[0] <= TRI_INLINE_MAX:
            doc["triangles"] = {
                "edge_a": _floats(edge_a),
                "edge_b": _floats(edge_b),
                "vert0": _floats(vert0),
                "normals": _floats(normals),
                "uvs": _floats(uvs),
                "material": np.asarray(material, np.int64).tolist(),
            }
        else:
            for name, arr in (
                ("tri_edge_a", edge_a), ("tri_edge_b", edge_b),
                ("tri_vert0", vert0), ("tri_normals", normals),
                ("tri_uvs", uvs), ("tri_material", material),
            ):
                sidecar[name] = arr
            doc["triangles"] = {"array_prefix": "tri"}

    sky_type, bottom, top = builder._sky
    sky: dict = {"type": SkyType(sky_type).name.lower()}
    if sky_type == SkyType.GRADIENT:
        sky["bottom"] = _floats(bottom)
        sky["top"] = _floats(top)
    elif sky_type == SkyType.CUBEMAP:
        sidecar["cubemap"] = builder._cubemap
        sky["cubemap"] = "cubemap"
    doc["sky"] = sky

    if camera is not None:
        doc["camera"] = {
            "origin": _floats(camera.origin),
            "look_at": _floats(camera.look_at),
            "up": _floats(camera.up),
            "vertical_fov": float(camera.vertical_fov),
            "aperture": float(camera.aperture),
            **(
                {"focus_distance": float(camera.focus_distance)}
                if camera.focus_distance is not None
                else {}
            ),
        }

    if sidecar:
        doc["arrays"] = sidecar_name
        np.savez_compressed(
            os.path.join(os.path.dirname(os.path.abspath(path)),
                         sidecar_name),
            **sidecar,
        )
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)
        fh.write("\n")


def load_scene(path: str) -> tuple[SceneBuilder, Optional[CameraSettings]]:
    """Read a scene JSON (plus npz sidecar); returns the builder (call
    ``.build()``) and the camera, if the file carries one."""
    with open(path) as fh:
        doc = json.load(fh)
    if doc.get("format") != FORMAT_NAME:
        raise ValueError(f"{path}: not a {FORMAT_NAME} file")
    if int(doc.get("version", 0)) > FORMAT_VERSION:
        raise ValueError(
            f"{path}: format version {doc['version']} is newer than "
            f"supported ({FORMAT_VERSION})"
        )
    arrays = {}
    if "arrays" in doc:
        npz_path = os.path.join(
            os.path.dirname(os.path.abspath(path)), doc["arrays"]
        )
        arrays = dict(np.load(npz_path))

    b = SceneBuilder()

    image_ids: dict[str, int] = {}
    for entry in doc.get("images", []):
        name = entry["name"]
        image_ids[name] = len(b._images)
        b._image_keys[name] = image_ids[name]
        b._images.append(np.asarray(arrays[entry["array"]], np.float32))

    b._textures = [
        _texture_from_json(t, image_ids) for t in doc.get("textures", [])
    ] or [TextureSpec()]
    b._materials = [
        dict(
            type=int(m["type"]), albedo=int(m["albedo"]),
            emission=int(m["emission"]), glossiness=int(m["glossiness"]),
            metallic=int(m["metallic"]), parameter=float(m["parameter"]),
            perfect_specular=bool(m["perfect_specular"]),
        )
        for m in doc.get("materials", [])
    ]

    for s in doc.get("spheres", []):
        b._spheres.append(
            (
                np.asarray(s["center"], np.float32),
                float(s["radius"]),
                int(s["material"]),
                (
                    np.asarray(s["move_offset"], np.float32)
                    if "move_offset" in s
                    else None
                ),
                np.asarray(s.get("time_range", (0.0, 1.0)), np.float32),
            )
        )
    for r in doc.get("rects", []):
        b._rects.append(
            (
                np.asarray(r["rotation"], np.float32),
                np.asarray(r["center"], np.float32),
                np.asarray(r["from"], np.float32),
                np.asarray(r["to"], np.float32),
                int(r["material"]),
            )
        )
    for x in doc.get("boxes", []):
        b._boxes.append(
            (
                np.asarray(x["rotation"], np.float32),
                np.asarray(x["center"], np.float32),
                np.asarray(x["extents"], np.float32),
                int(x["material"]),
            )
        )

    tri = doc.get("triangles")
    if tri:
        if "array_prefix" in tri:
            pre = tri["array_prefix"]
            chunk = tuple(
                np.asarray(arrays[f"{pre}_{k}"])
                for k in ("edge_a", "edge_b", "vert0", "normals", "uvs")
            ) + (np.asarray(arrays[f"{pre}_material"], np.int32),)
        else:
            chunk = (
                np.asarray(tri["edge_a"], np.float32),
                np.asarray(tri["edge_b"], np.float32),
                np.asarray(tri["vert0"], np.float32),
                np.asarray(tri["normals"], np.float32),
                np.asarray(tri["uvs"], np.float32),
                np.asarray(tri["material"], np.int32),
            )
        b._triangles.append(chunk)

    sky = doc.get("sky", {"type": "gradient"})
    kind = sky.get("type", "gradient").lower()
    if kind == "gradient":
        b.set_gradient_sky(
            tuple(sky.get("bottom", (1.0, 1.0, 1.0))),
            tuple(sky.get("top", (0.5, 0.7, 1.0))),
        )
    elif kind == "cubemap":
        b.set_cubemap_sky(np.asarray(arrays[sky["cubemap"]], np.float32))
    else:
        b.set_no_sky()

    camera = None
    if "camera" in doc:
        c = doc["camera"]
        camera = CameraSettings(
            origin=tuple(c["origin"]),
            look_at=tuple(c["look_at"]),
            up=tuple(c.get("up", (0.0, 1.0, 0.0))),
            vertical_fov=float(c.get("vertical_fov", 40.0)),
            aperture=float(c.get("aperture", 0.0)),
            focus_distance=(
                float(c["focus_distance"])
                if "focus_distance" in c
                else None
            ),
        )
    return b, camera
