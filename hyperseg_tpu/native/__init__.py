"""ctypes bindings for the native host-side data-path kernels.

Auto-builds host_ops.so with the local toolchain on first import; every entry
point has a numpy fallback so the framework works without a compiler. Use
`available()` to check which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "host_ops.so")
_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or (os.path.getmtime(_SO) <
                                   os.path.getmtime(os.path.join(_DIR, "host_ops.cpp"))):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.rgb_label_to_index.argtypes = [u8p, ctypes.c_int64, u8p, ctypes.c_int,
                                       ctypes.c_uint8, u8p]
    lib.map_labels_u8.argtypes = [u8p, ctypes.c_int64, u8p, ctypes.c_int,
                                  ctypes.c_uint8, u8p]
    lib.normalize_u8_to_f32.argtypes = [u8p, ctypes.c_int64, ctypes.c_int,
                                        f32p, f32p, f32p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _u8(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def rgb_label_to_index(rgb: np.ndarray, colors, fill: int = 255) -> np.ndarray:
    """(H, W, 3) uint8 RGB mask -> (H, W) uint8 class indices."""
    rgb = np.ascontiguousarray(rgb, np.uint8)
    colors = np.ascontiguousarray(colors, np.uint8)
    lib = _load()
    if lib is None:  # numpy fallback (the reference's per-color scan)
        out = np.full(rgb.shape[:2], fill, np.uint8)
        for i, color in enumerate(colors):
            out[np.all(rgb == color, axis=2)] = i
        return out
    out = np.empty(rgb.shape[:2], np.uint8)
    lib.rgb_label_to_index(_u8(rgb), rgb.shape[0] * rgb.shape[1],
                           _u8(colors), len(colors), fill, _u8(out))
    return out


def map_labels(labels: np.ndarray, table, fill: int = 0) -> np.ndarray:
    """uint8 LUT remap: out = table[labels], out-of-range -> fill."""
    labels = np.ascontiguousarray(labels, np.uint8)
    table = np.ascontiguousarray(table, np.uint8)
    lib = _load()
    if lib is None:
        full = np.full(256, fill, np.uint8)
        full[:len(table)] = table
        return full[labels]
    out = np.empty(labels.shape, np.uint8)
    lib.map_labels_u8(_u8(labels), labels.size, _u8(table), len(table),
                      fill, _u8(out))
    return out


def normalize_u8(img: np.ndarray, mean, std) -> np.ndarray:
    """Fused uint8 HWC -> normalized float32 ((x/255 - mean) / std)."""
    img = np.ascontiguousarray(img, np.uint8)
    c = img.shape[-1]
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    lib = _load()
    if lib is None:
        return ((img.astype(np.float32) / 255.0) - mean) / std
    out = np.empty(img.shape, np.float32)
    lib.normalize_u8_to_f32(_u8(img), img.size // c, c,
                            mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                            std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
