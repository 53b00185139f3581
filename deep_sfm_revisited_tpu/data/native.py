"""ctypes bindings for the native data-pipeline kernels.

Loads `native/libdsfm_native.so` (built by `make -C
deep_sfm_revisited_tpu/native`; auto-built on first import when a
compiler is available) and exposes numpy-signature wrappers with pure-
python fallbacks, so the package works without the native library and
accelerates transparently with it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdsfm_native.so")
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except (OSError, subprocess.SubprocessError):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    c_double_p = ctypes.POINTER(ctypes.c_double)
    c_float_p = ctypes.POINTER(ctypes.c_float)
    lib.velodyne_project_depth.argtypes = [
        c_float_p, ctypes.c_int64, c_double_p, c_float_p,
        ctypes.c_int64, ctypes.c_int64,
    ]
    lib.normalize_pad_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, c_float_p, ctypes.c_int64, ctypes.c_int64,
    ]
    lib.depth_u16_to_f32.argtypes = [
        ctypes.POINTER(ctypes.c_uint16), ctypes.c_int64, ctypes.c_int64,
        c_float_p, ctypes.c_int64, ctypes.c_int64,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def velodyne_project_depth(points: np.ndarray, M: np.ndarray,
                           shape) -> np.ndarray:
    """(N, 4) points, (3, 4) combined P@R@T -> (h, w) closest-depth map."""
    h, w = shape
    lib = _load()
    if lib is None:
        return _project_np(points, M, shape)
    pts = np.ascontiguousarray(points, np.float32)
    Mc = np.ascontiguousarray(M, np.float64).reshape(-1)
    out = np.zeros((h, w), np.float32)
    lib.velodyne_project_depth(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(pts),
        Mc.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w,
    )
    return out


def _project_np(points, M, shape):
    h, w = shape
    pts = points[points[:, 0] >= 1e-3]
    cam = (M @ pts.T).T
    z = cam[:, 2]
    ok = z > 0
    u = np.round(cam[ok, 0] / z[ok]).astype(np.int64) - 1
    v = np.round(cam[ok, 1] / z[ok]).astype(np.int64) - 1
    z = z[ok]
    keep = (u >= 0) & (u < w) & (v >= 0) & (v < h)
    u, v, z = u[keep], v[keep], z[keep]
    depth = np.zeros((h, w), np.float32)
    order = np.argsort(-z)
    depth[v[order], u[order]] = z[order]
    return depth


def normalize_pad_u8(img: np.ndarray, out_shape) -> np.ndarray:
    """uint8 (h, w, c) -> float32 [-1, 1] replicate-padded to out_shape."""
    h, w, c = img.shape
    oh, ow = out_shape
    lib = _load()
    if lib is None:
        x = img.astype(np.float32) / 127.5 - 1.0
        return np.pad(x, ((0, oh - h), (0, ow - w), (0, 0)), mode="edge")
    src = np.ascontiguousarray(img, np.uint8)
    out = np.empty((oh, ow, c), np.float32)
    lib.normalize_pad_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), oh, ow,
    )
    return out


def depth_u16_to_f32(img: np.ndarray, out_shape) -> np.ndarray:
    """uint16 (h, w) png payload -> float32 metres, replicate-padded."""
    h, w = img.shape
    oh, ow = out_shape
    lib = _load()
    if lib is None:
        x = img.astype(np.float32) / 256.0
        return np.pad(x, ((0, oh - h), (0, ow - w)), mode="edge")
    src = np.ascontiguousarray(img, np.uint16)
    out = np.empty((oh, ow), np.float32)
    lib.depth_u16_to_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), oh, ow,
    )
    return out
