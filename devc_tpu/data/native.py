"""ctypes bindings for the native C++ data-path kernels (native/*.cpp).

Builds the shared library with g++ on first use (cached under
native/build/). A vectorized numpy fallback keeps everything working when
no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")
_BUILD_DIR = os.path.join(_NATIVE_DIR, "build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libdevc_native.so")
_SRCS = [
    os.path.join(_NATIVE_DIR, "forward_warp.cpp"),
    os.path.join(_NATIVE_DIR, "resize_aa.cpp"),
]
_SRC = _SRCS[0]  # kept for backwards-compat with older builds

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _build() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
        *_SRCS, "-o", _LIB_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        return True
    except Exception:
        # retry without -march/-fopenmp (portability)
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", *_SRCS, "-o", _LIB_PATH],
                check=True, capture_output=True, timeout=180,
            )
            return True
        except Exception:
            return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        stale = not os.path.exists(_LIB_PATH) or any(
            os.path.exists(s)
            and os.path.getmtime(s) > os.path.getmtime(_LIB_PATH)
            for s in _SRCS
        )
        if stale:
            if not _build():
                _lib_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.forward_warp_u8.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_float,
            ]
            lib.forward_warp_u8.restype = None
            lib.resize_aa_u8.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int, ctypes.c_int,
            ]
            lib.resize_aa_u8.restype = None
            _lib = lib
        except (OSError, AttributeError):
            _lib_failed = True
        return _lib


def _bilinear_gather(img: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """clamp-to-edge bilinear lookup; img [H,W] or [H,W,C]; x/y any shape."""
    h, w = img.shape[:2]
    x = np.clip(x, 0, w - 1)
    y = np.clip(y, 0, h - 1)
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    wx = (x - x0)[..., None] if img.ndim == 3 else (x - x0)
    wy = (y - y0)[..., None] if img.ndim == 3 else (y - y0)
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def _forward_warp_numpy(src, u, v, max_iter=5, precision=1e-2):
    """Vectorized fixed-point forward warp (same math as the C++ kernel)."""
    h, w = u.shape
    xr, yr = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    du = np.empty_like(u)
    du[:, :-1] = u[:, 1:] - u[:, :-1]
    du[:, -1] = u[:, -1] - u[:, -2]
    dv = np.empty_like(v)
    dv[:-1, :] = v[1:, :] - v[:-1, :]
    dv[-1, :] = v[-1, :] - v[-2, :]
    i = xr - u / (1.0 + du)
    j = yr - v / (1.0 + dv)
    small = (np.abs(u) < precision) & (np.abs(v) < precision)
    active = ~small
    for _ in range(max_iter):
        inb = (i >= 0) & (i <= w - 1) & (j >= 0) & (j <= h - 1)
        act = active & inb
        ui = _bilinear_gather(u, i, j)
        vi = _bilinear_gather(v, i, j)
        i_next = xr - ui
        j_next = yr - vi
        conv = (np.abs(i - i_next) < precision) & (np.abs(j - j_next) < precision)
        i = np.where(act, i_next, i)
        j = np.where(act, j_next, j)
        active = act & ~conv
    i = np.where(small, xr, i)
    j = np.where(small, yr, j)
    # reflect + clamp
    i = np.abs(i)
    i = np.where(i > w - 1, 2 * (w - 1) - i, i)
    i = np.clip(i, 0, w - 1)
    j = np.abs(j)
    j = np.where(j > h - 1, 2 * (h - 1) - j, j)
    j = np.clip(j, 0, h - 1)
    out = _bilinear_gather(src.astype(np.float32), i, j)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def resize_aa_native(src_u8: np.ndarray, out_hw):
    """Anti-aliased float64 resize of a uint8 HWC image (the reference's
    exact CenterPad resize semantics — see native/resize_aa.cpp and the
    numpy twin transforms.resize_antialiased_np). Returns float64 [oh,ow,c]
    or None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src_u8, dtype=np.uint8)
    squeeze = False
    if src.ndim == 2:
        src = src[..., None]
        squeeze = True
    h, w, c = src.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])
    dst = np.empty((oh, ow, c), np.float64)
    lib.resize_aa_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, c,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        oh, ow,
    )
    return dst[..., 0] if squeeze else dst


def forward_warp(src: np.ndarray, u: np.ndarray, v: np.ndarray,
                 max_iter: int = 5, precision: float = 1e-2) -> np.ndarray:
    """Warp uint8 HWC `src` by forward flow (u horizontal, v vertical).

    Native equivalent of the reference forward_mapping
    (utils/util_distortion.py:523-552). Uses the C++ kernel when available,
    numpy otherwise.
    """
    src = np.ascontiguousarray(src, dtype=np.uint8)
    if src.ndim == 2:
        src = src[..., None]
    h, w, c = src.shape
    u = np.ascontiguousarray(u, dtype=np.float32)
    v = np.ascontiguousarray(v, dtype=np.float32)
    assert u.shape == (h, w) and v.shape == (h, w)

    lib = get_lib()
    if lib is None:
        return _forward_warp_numpy(src, u, v, max_iter, precision)

    dst = np.empty_like(src)
    lib.forward_warp_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        u.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, c, max_iter, precision,
    )
    return dst
