"""ctypes binding to the native C++ runtime (libptnative.so).

The reference's host-side work is C++ (scene assembly Scene.cpp:17-371,
screenshot encoding CudaTracer.cu:795-813); this framework keeps those
components native too. Everything here degrades gracefully: if the shared
library hasn't been built (``make -C native``), the pure-Python
implementations in models/presets.py and utils/image.py are used instead —
they are the test oracles for the native code either way.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "native", "libptnative.so")
_lib: Optional[ctypes.CDLL] = None


def load() -> Optional[ctypes.CDLL]:
    """Load (and memoize) the native library; None if not built."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.ptn_build_scene.restype = ctypes.c_void_p
    lib.ptn_build_scene.argtypes = [ctypes.c_char_p]
    lib.ptn_free_scene.argtypes = [ctypes.c_void_p]
    for fn in ("ptn_num_spheres", "ptn_num_triangles", "ptn_num_materials",
               "ptn_num_area_lights", "ptn_num_point_lights"):
        getattr(lib, fn).restype = ctypes.c_int
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.ptn_get_spheres.argtypes = [ctypes.c_void_p, f32p, i32p]
    lib.ptn_get_triangles.argtypes = [ctypes.c_void_p, f32p, i32p]
    lib.ptn_get_materials.argtypes = [ctypes.c_void_p, f32p, i32p]
    lib.ptn_get_area_lights.argtypes = [ctypes.c_void_p, f32p, f32p, i32p]
    lib.ptn_get_point_lights.argtypes = [ctypes.c_void_p, f32p]
    lib.ptn_tonemap_u8.argtypes = [f32p, ctypes.c_int, ctypes.c_float, u8p]
    lib.ptn_write_tga.restype = ctypes.c_int
    lib.ptn_write_tga.argtypes = [ctypes.c_char_p, u8p, ctypes.c_int, ctypes.c_int]
    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


def build_scene_arrays(preset: str):
    """Native scene build -> dict of numpy arrays (None if lib missing or
    the preset isn't implemented natively)."""
    lib = load()
    if lib is None:
        return None
    h = lib.ptn_build_scene(preset.encode())
    if not h:
        return None
    try:
        S = lib.ptn_num_spheres(h)
        T = lib.ptn_num_triangles(h)
        M = lib.ptn_num_materials(h)
        La = lib.ptn_num_area_lights(h)
        Lp = lib.ptn_num_point_lights(h)
        sph = np.zeros((S, 4), np.float32)
        sph_mat = np.zeros((S,), np.int32)
        tri = np.zeros((T, 18), np.float32)
        tri_mat = np.zeros((T,), np.int32)
        mats = np.zeros((M, 21), np.float32)
        flags = np.zeros((M,), np.int32)
        al_power = np.zeros((La, 3), np.float32)
        al_area = np.zeros((La,), np.float32)
        al_tri0 = np.zeros((La,), np.int32)
        point_lights = np.zeros((Lp, 6), np.float32)
        if S:
            lib.ptn_get_spheres(h, sph, sph_mat)
        if T:
            lib.ptn_get_triangles(h, tri, tri_mat)
        if M:
            lib.ptn_get_materials(h, mats, flags)
        if La:
            lib.ptn_get_area_lights(h, al_power, al_area, al_tri0)
        if Lp:
            lib.ptn_get_point_lights(h, point_lights)
        return {
            "spheres": sph, "sph_mat": sph_mat,
            "triangles": tri, "tri_mat": tri_mat,
            "materials": mats, "flags": flags,
            "al_power": al_power, "al_area": al_area, "al_tri0": al_tri0,
            "point_lights": point_lights,
        }
    finally:
        lib.ptn_free_scene(h)


def tonemap_u8(radiance: np.ndarray, gamma: float = 1.0 / 2.2) -> np.ndarray:
    """Native clamp+gamma+quantize; falls back to numpy."""
    lib = load()
    radiance = np.ascontiguousarray(radiance, np.float32)
    h, w = radiance.shape[:2]
    if lib is None:
        disp = np.clip(radiance, 0.0, 1.0) ** gamma
        return np.clip(255.0 * disp + 0.5, 0, 255).astype(np.uint8)
    out = np.zeros((h, w, 3), np.uint8)
    lib.ptn_tonemap_u8(radiance.reshape(-1), h * w, gamma, out.reshape(-1))
    return out


def write_tga(path: str, rgb_u8: np.ndarray) -> bool:
    """Native TGA writer (reference byte layout); False -> caller should use
    the Python writer."""
    lib = load()
    if lib is None:
        return False
    rgb_u8 = np.ascontiguousarray(rgb_u8, np.uint8)
    h, w = rgb_u8.shape[:2]
    return lib.ptn_write_tga(path.encode(), rgb_u8.reshape(-1), w, h) == 0
