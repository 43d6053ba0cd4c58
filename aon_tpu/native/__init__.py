"""ctypes bindings for the native host-side helpers, with numpy fallbacks.

Builds on demand (``make -C aon_tpu/native``); every entry point silently
falls back to the equivalent numpy implementation when the shared library
is missing, so the framework never hard-depends on the toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_HERE, "libaon_native.so")
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _try_load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed:
        return None
    _load_failed = True  # cleared on success below
    if not os.path.exists(_LIB_PATH):
        if os.environ.get("AON_BUILD_NATIVE", "1") == "1":
            try:
                subprocess.run(
                    ["make", "-C", _HERE, "-s"], check=True, capture_output=True, timeout=120
                )
            except Exception:
                return None
        else:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64 = ctypes.c_int64
    lib.aon_ray_batch_gather.argtypes = [f32p, f32p, f32p, i64, i64p, i64, f32p, f32p, f32p]
    lib.aon_aabb_intersect.argtypes = [f32p, f32p, f32p, i64, u8p, f32p, f32p]
    lib.aon_rgba_blend_white.argtypes = [u8p, i64, f32p]
    lib.aon_generate_rays.argtypes = [f32p, f32p, i64, f32p, f32p]
    _lib = lib
    _load_failed = False
    return lib


def available() -> bool:
    return _try_load() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def ray_batch_gather(
    rays_o: np.ndarray, viewdirs: np.ndarray, rgbs: np.ndarray, idx: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """out[i] = buffers[idx[i]] for the three (n, 3) scene buffers."""
    lib = _try_load()
    if lib is None:
        return rays_o[idx], viewdirs[idx], rgbs[idx]
    idx = np.ascontiguousarray(idx, np.int64)
    b = len(idx)
    out_o = np.empty((b, 3), np.float32)
    out_d = np.empty((b, 3), np.float32)
    out_rgb = np.empty((b, 3), np.float32)
    lib.aon_ray_batch_gather(
        _fp(rays_o), _fp(viewdirs), _fp(rgbs), len(rays_o),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), b,
        _fp(out_o), _fp(out_d), _fp(out_rgb),
    )
    return out_o, out_d, out_rgb


def aabb_intersect(
    bounds: np.ndarray, rays_o: np.ndarray, rays_d: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    lib = _try_load()
    if lib is None:
        from aon_tpu.core.rays import ray_box_intersection

        return ray_box_intersection(bounds, rays_o, rays_d)
    n = len(rays_o)
    bounds = np.ascontiguousarray(bounds, np.float32)
    rays_o = np.ascontiguousarray(rays_o, np.float32)
    rays_d = np.ascontiguousarray(rays_d, np.float32)
    hit = np.empty(n, np.uint8)
    tnear = np.empty(n, np.float32)
    tfar = np.empty(n, np.float32)
    lib.aon_aabb_intersect(
        _fp(bounds), _fp(rays_o), _fp(rays_d), n,
        hit.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), _fp(tnear), _fp(tfar),
    )
    return hit.astype(bool), tnear, tfar


def rgba_blend_white(rgba_u8: np.ndarray) -> np.ndarray:
    """(..., 4) uint8 RGBA -> (..., 3) float32 blended onto white."""
    lib = _try_load()
    flat = np.ascontiguousarray(rgba_u8.reshape(-1, 4), np.uint8)
    if lib is None:
        f = flat.astype(np.float32) / 255.0
        out = f[:, :3] * f[:, 3:] + (1.0 - f[:, 3:])
        return out.reshape(*rgba_u8.shape[:-1], 3)
    out = np.empty((len(flat), 3), np.float32)
    lib.aon_rgba_blend_white(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(flat), _fp(out)
    )
    return out.reshape(*rgba_u8.shape[:-1], 3)


def generate_rays(dirs: np.ndarray, c2w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(n, 3) camera dirs + (3, 4) c2w -> (rays_o, unit viewdirs), both (n, 3)."""
    lib = _try_load()
    dirs = np.ascontiguousarray(dirs.reshape(-1, 3), np.float32)
    c2w = np.ascontiguousarray(c2w, np.float32)
    if lib is None:
        w = dirs @ c2w[:, :3].T
        v = w / np.linalg.norm(w, axis=-1, keepdims=True)
        o = np.broadcast_to(c2w[:, 3], v.shape).copy()
        return o.astype(np.float32), v.astype(np.float32)
    n = len(dirs)
    rays_o = np.empty((n, 3), np.float32)
    viewdirs = np.empty((n, 3), np.float32)
    lib.aon_generate_rays(_fp(dirs), _fp(c2w), n, _fp(rays_o), _fp(viewdirs))
    return rays_o, viewdirs
