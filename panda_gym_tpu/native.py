"""ctypes bindings for the native runtime components (C++ in native/).

Currently: assetc, the scenario URDF/OBJ -> obstacle-box compiler (native
replacement for PyBullet's C++ asset loaders, see native/assetc/assetc.cpp).
Falls back to the pure-Python tools/compile_scenarios.py implementation when
the shared library hasn't been built (`make -C native`).
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "native",
                         "libassetc.so")
_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.assetc_compile_urdf_scaled.restype = ctypes.POINTER(ctypes.c_double)
    lib.assetc_compile_urdf_scaled.argtypes = [
        ctypes.c_char_p, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.POINTER(ctypes.c_int32)]
    lib.assetc_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
    _lib = lib
    return lib


def have_native() -> bool:
    return _load() is not None


def compile_urdf_boxes(urdf_path: str, base_position=(0.0, 0.0, 0.0),
                       global_scaling: float = 1.0) -> np.ndarray:
    """World AABBs (N, 6: center+half) of a URDF's collision geometries.

    global_scaling follows pybullet loadURDF semantics (scales origins and
    geometry, not base_position) — the scenario manifests pass it
    (e.g. tunnel.json globalScaling 1.4)."""
    lib = _load()
    if lib is None:
        # python fallback
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
        from compile_scenarios import boxes_from_urdf
        return np.asarray(boxes_from_urdf(urdf_path, base_position,
                                          global_scaling=global_scaling),
                          dtype=np.float64).reshape(-1, 6)
    n = ctypes.c_int32(0)
    ptr = lib.assetc_compile_urdf_scaled(
        urdf_path.encode(), *map(float, base_position), float(global_scaling),
        ctypes.byref(n))
    if not ptr or n.value == 0:
        return np.zeros((0, 6))
    out = np.ctypeslib.as_array(ptr, shape=(n.value, 6)).copy()
    lib.assetc_free(ptr)
    return out
