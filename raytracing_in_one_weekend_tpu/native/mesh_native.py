"""ctypes bindings for the native (C++) Wavefront OBJ loader.

Reference slot: the mesh ingestion side of the reference's scene compile
(Unity asset import feeding Jobs/AddMeshRuntimeEntitiesJob.cs:15-92),
bound P/Invoke-style like the reference's native components
(OidnApi.cs:84-168).  Shares librtiw_native.so with the BVH builder
(native/bvh_native.py owns the build-on-demand load).  Pure-Python
fallback + semantic oracle: models/meshes.py::load_obj — the two return
identical arrays (tests/test_meshes.py).
"""

from __future__ import annotations

import ctypes

import numpy as np

from raytracing_in_one_weekend_tpu.native import bvh_native

_registered = False


def _lib() -> ctypes.CDLL | None:
    global _registered
    lib = bvh_native._try_load()
    if lib is None:
        return None
    if not _registered:
        try:
            lib.rtiw_obj_load
        except AttributeError:
            return None  # stale library from before the loader existed
        lib.rtiw_obj_load.restype = ctypes.c_void_p
        lib.rtiw_obj_load.argtypes = [ctypes.c_char_p]
        lib.rtiw_obj_counts.restype = None
        lib.rtiw_obj_counts.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32)
        ]
        lib.rtiw_obj_export.restype = None
        lib.rtiw_obj_export.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.rtiw_obj_free.restype = None
        lib.rtiw_obj_free.argtypes = [ctypes.c_void_p]
        _registered = True
    return lib


def available() -> bool:
    return _lib() is not None


def load_obj(path: str):
    """Native OBJ parse; same return contract as models/meshes.load_obj:
    (vertices (V,3) f32, faces (F,3) i64, normals (V,3) f32 | None,
    uvs (V,2) f32 | None)."""
    lib = _lib()
    if lib is None:
        raise RuntimeError("native OBJ loader unavailable")
    handle = lib.rtiw_obj_load(str(path).encode())
    if not handle:
        import os

        if not os.path.exists(path):
            raise FileNotFoundError(path)
        # malformed refs (out-of-range / non-numeric indices) fail the
        # native parse; models/meshes.load_obj falls back to the Python
        # loader for the readable exception
        raise ValueError(f"native OBJ parse failed: {path}")
    try:
        counts = np.zeros((4,), np.int32)
        lib.rtiw_obj_counts(
            handle, counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        )
        n_v, n_f, has_n, has_uv = (int(x) for x in counts)
        verts = np.zeros((n_v, 3), np.float32)
        faces = np.zeros((n_f, 3), np.int32)
        normals = np.zeros((n_v, 3), np.float32) if has_n else None
        uvs = np.zeros((n_v, 2), np.float32) if has_uv else None

        def fp(a):
            if a is None:
                return ctypes.POINTER(ctypes.c_float)()
            return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

        lib.rtiw_obj_export(
            handle, fp(verts),
            faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            fp(normals), fp(uvs),
        )
    finally:
        lib.rtiw_obj_free(handle)
    return verts, faces.astype(np.int64), normals, uvs
