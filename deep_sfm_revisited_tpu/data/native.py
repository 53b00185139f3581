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


def _make(force: bool = False) -> bool:
    cmd = ["make", "-C", _NATIVE_DIR, "-s"] + (["-B"] if force else [])
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _make():
        return None
    for attempt in range(2):
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            _bind(lib)
            _lib = lib
            return lib
        except OSError:
            return None
        except AttributeError:
            # stale .so from an older source revision: missing symbols.
            # Force a rebuild once; if the toolchain is gone, fall back to
            # the pure-python paths instead of crashing the loaders.
            if attempt == 0 and _make(force=True):
                continue
            return None
    return None


def _bind(lib: ctypes.CDLL) -> None:
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
    c_u8_p = ctypes.POINTER(ctypes.c_uint8)
    c_i64_p = ctypes.POINTER(ctypes.c_int64)
    c_i32_p = ctypes.POINTER(ctypes.c_int32)
    lib.png_probe.restype = ctypes.c_int
    lib.png_probe.argtypes = [
        c_u8_p, ctypes.c_int64, c_i64_p, c_i64_p, c_i32_p, c_i32_p,
    ]
    lib.png_decode_rgb8.restype = ctypes.c_int
    lib.png_decode_rgb8.argtypes = [
        c_u8_p, ctypes.c_int64, c_u8_p, ctypes.c_int64, ctypes.c_int64,
    ]
    lib.png_decode_gray16.restype = ctypes.c_int
    lib.png_decode_gray16.argtypes = [
        c_u8_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_uint16),
        ctypes.c_int64, ctypes.c_int64,
    ]
    lib.png_decode_norm_pad.restype = ctypes.c_int
    lib.png_decode_norm_pad.argtypes = [
        c_u8_p, ctypes.c_int64, c_float_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64,
    ]


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


# ---------------------------------------------------------------------
# libpng decode path (GIL-free; ctypes releases the GIL for the call, so
# BatchLoader worker threads decode concurrently). Each returns None when
# the native library is unavailable, was built without libpng, or the
# stream isn't what the fast path handles — callers fall back to imageio.


def _as_u8_buf(data: bytes):
    buf = np.frombuffer(data, np.uint8)
    return buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf)


def png_probe(data: bytes):
    """(h, w, channels, bit_depth) of a PNG byte stream, or None."""
    lib = _load()
    if lib is None:
        return None
    p, n = _as_u8_buf(data)
    h = ctypes.c_int64()
    w = ctypes.c_int64()
    ch = ctypes.c_int32()
    bd = ctypes.c_int32()
    if lib.png_probe(p, n, ctypes.byref(h), ctypes.byref(w),
                     ctypes.byref(ch), ctypes.byref(bd)) != 0:
        return None
    return h.value, w.value, ch.value, bd.value


def decode_png_rgb8(data: bytes) -> Optional[np.ndarray]:
    """PNG bytes -> (h, w, 3) uint8 (palette/gray/16-bit all folded)."""
    lib = _load()
    meta = png_probe(data)
    if lib is None or meta is None:
        return None
    h, w = meta[0], meta[1]
    out = np.empty((h, w, 3), np.uint8)
    p, n = _as_u8_buf(data)
    if lib.png_decode_rgb8(
            p, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w
    ) != 0:
        return None
    return out


def decode_png_gray16(data: bytes) -> Optional[np.ndarray]:
    """16-bit grayscale PNG bytes -> (h, w) uint16 (host-endian)."""
    lib = _load()
    meta = png_probe(data)
    if lib is None or meta is None or meta[2] != 1 or meta[3] != 16:
        return None
    h, w = meta[0], meta[1]
    out = np.empty((h, w), np.uint16)
    p, n = _as_u8_buf(data)
    if lib.png_decode_gray16(
            p, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), h, w
    ) != 0:
        return None
    return out


def decode_png_norm_pad(data: bytes, pad_multiple: int = 0):
    """Fused PNG decode -> float32 [-1, 1] RGB replicate-padded to the
    next /pad_multiple shape. Returns (img (H, W, 3) f32, (h, w) raw) or
    None. One native pass ≙ imread + Normalize + pad_to_multiple."""
    lib = _load()
    meta = png_probe(data)
    if lib is None or meta is None:
        return None
    h, w = meta[0], meta[1]
    m = max(pad_multiple, 1)
    oh = -(-h // m) * m
    ow = -(-w // m) * m
    out = np.empty((oh, ow, 3), np.float32)
    p, n = _as_u8_buf(data)
    if lib.png_decode_norm_pad(
            p, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            h, w, oh, ow,
    ) != 0:
        return None
    return out, (h, w)
