"""ctypes bindings for the native (C++) BVH builder.

Reference slot: the P/Invoke binding layer the reference uses for its
native components (OidnApi.cs:84-168 style), applied to this framework's
own native runtime piece (native/bvh_builder.cpp).  Pure-Python fallback:
scene/bvh.py:build_bvh (bit-identical output).

The shared library is built on demand with the system toolchain
(`make -C .../native`); if the toolchain or library is unavailable,
available() returns False and callers fall back to NumPy.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "librtiw_native.so")
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_build_attempted = False


def _try_load() -> ctypes.CDLL | None:
    global _lib, _build_attempted
    with _lock:
        if _lib is not None:
            return _lib
        def _stale() -> bool:
            if not os.path.exists(_LIB_PATH):
                return True
            lib_mtime = os.path.getmtime(_LIB_PATH)
            return any(
                os.path.getmtime(os.path.join(_DIR, f)) > lib_mtime
                for f in os.listdir(_DIR)
                if f.endswith(".cpp") or f == "Makefile"
            )

        if _stale():
            if not _build_attempted:
                _build_attempted = True
                try:
                    subprocess.run(
                        ["make", "-C", _DIR],
                        check=True,
                        capture_output=True,
                        timeout=120,
                    )
                except (OSError, subprocess.SubprocessError):
                    pass
            if _stale():
                # rebuild failed (or make produced nothing): NEVER load a
                # stale library — callers consistently fall back to the
                # Python implementations for the whole process lifetime
                return None
        if not os.path.exists(_LIB_PATH):
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.rtiw_bvh_build.restype = ctypes.c_void_p
        lib.rtiw_bvh_build.argtypes = [
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        for name in ("rtiw_bvh_num_nodes", "rtiw_bvh_num_leaves",
                     "rtiw_bvh_leaf_width"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int32
            fn.argtypes = [ctypes.c_void_p]
        lib.rtiw_bvh_export.restype = None
        lib.rtiw_bvh_export.argtypes = [ctypes.c_void_p] + [
            ctypes.POINTER(ctypes.c_float)
        ] * 2 + [ctypes.POINTER(ctypes.c_int32)] * 5
        lib.rtiw_bvh_free.restype = None
        lib.rtiw_bvh_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _try_load() is not None


def build_bvh(
    kinds: np.ndarray,
    indices: np.ndarray,
    aabb_min: np.ndarray,
    aabb_max: np.ndarray,
    max_depth: int = 16,
    leaf_size: int = 4,
):
    """Native build; same signature/output as scene/bvh.py:build_bvh."""
    import jax.numpy as jnp

    from raytracing_in_one_weekend_tpu.scene.bvh import BvhArrays

    lib = _try_load()
    if lib is None:
        raise RuntimeError("native BVH library unavailable")

    kinds = np.ascontiguousarray(kinds, np.int32)
    indices = np.ascontiguousarray(indices, np.int32)
    lo = np.ascontiguousarray(aabb_min, np.float32)
    hi = np.ascontiguousarray(aabb_max, np.float32)
    n = kinds.shape[0]

    def ip(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    def fp(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    handle = lib.rtiw_bvh_build(
        n, ip(kinds), ip(indices), fp(lo), fp(hi), max_depth, leaf_size
    )
    try:
        m = lib.rtiw_bvh_num_nodes(handle)
        nl = lib.rtiw_bvh_num_leaves(handle)
        width = lib.rtiw_bvh_leaf_width(handle)
        node_min = np.empty((m, 3), np.float32)
        node_max = np.empty((m, 3), np.float32)
        left = np.empty((m,), np.int32)
        right = np.empty((m,), np.int32)
        leaf_id = np.empty((m,), np.int32)
        leaf_kind = np.empty((nl, width), np.int32)
        leaf_index = np.empty((nl, width), np.int32)
        lib.rtiw_bvh_export(
            handle, fp(node_min), fp(node_max),
            ip(left), ip(right), ip(leaf_id), ip(leaf_kind), ip(leaf_index),
        )
    finally:
        lib.rtiw_bvh_free(handle)

    return BvhArrays(
        node_min=jnp.asarray(node_min),
        node_max=jnp.asarray(node_max),
        left=jnp.asarray(left),
        right=jnp.asarray(right),
        leaf_id=jnp.asarray(leaf_id),
        leaf_kind=jnp.asarray(leaf_kind),
        leaf_index=jnp.asarray(leaf_index),
    )
