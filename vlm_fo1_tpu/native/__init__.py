"""Native (C++) host preprocessing with transparent numpy fallback.

Builds preproc.cpp into a shared object on first import (g++, cached next to
the source) and exposes ctypes wrappers. If the toolchain is unavailable the
callers fall back to the numpy implementations in preprocess/image.py —
outputs are bit-identical (tests enforce it).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "preproc.cpp")
_SO = os.path.join(_DIR, "_preproc.so")

_lib = None


def _build() -> bool:
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 _SRC, "-o", _SO],
                check=True, capture_output=True)
        return True
    except Exception:
        return False


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not _build():
        return None
    lib = ctypes.CDLL(_SO)
    i64 = ctypes.c_int64
    fp = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.qwen_patchify_u8.argtypes = [u8p, i64, i64, i64, i64, i64, fp, fp, fp]
    lib.qwen_patchify_u8.restype = None
    lib.normalize_chw_u8.argtypes = [u8p, i64, i64, fp, fp, fp]
    lib.normalize_chw_u8.restype = None
    lib.qwen_patchify_u8_raw.argtypes = [u8p, i64, i64, i64, i64, i64, u8p]
    lib.qwen_patchify_u8_raw.restype = None
    _lib = lib
    return _lib


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def qwen_patchify_native(img_u8: np.ndarray, patch: int, merge: int,
                         temporal: int, mean: np.ndarray, std: np.ndarray):
    """img_u8: [H, W, 3] uint8 (H, W multiples of patch*merge) ->
    pixel_values [grid_h*grid_w, 3*temporal*patch*patch] float32.
    Returns None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    img_u8 = np.ascontiguousarray(img_u8, np.uint8)
    h, w, _ = img_u8.shape
    grid_h, grid_w = h // patch, w // patch
    out = np.empty((grid_h * grid_w, 3 * temporal * patch * patch), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    inv_std = np.ascontiguousarray(1.0 / np.asarray(std, np.float32))
    lib.qwen_patchify_u8(
        img_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, patch, merge, temporal, _fptr(mean), _fptr(inv_std), _fptr(out))
    return out


def normalize_chw_native(img_u8: np.ndarray, mean: np.ndarray,
                         std: np.ndarray):
    """img_u8 [H, W, 3] uint8 -> [3, H, W] float32, or None w/o toolchain."""
    lib = get_lib()
    if lib is None:
        return None
    img_u8 = np.ascontiguousarray(img_u8, np.uint8)
    h, w, _ = img_u8.shape
    out = np.empty((3, h, w), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    inv_std = np.ascontiguousarray(1.0 / np.asarray(std, np.float32))
    lib.normalize_chw_u8(
        img_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, _fptr(mean), _fptr(inv_std), _fptr(out))
    return out


def qwen_patchify_raw_native(img_u8: np.ndarray, patch: int, merge: int,
                             temporal: int):
    """Raw layout transform for the device-normalize path: [H, W, 3] uint8
    -> uint8 pixel_values [grid_h*grid_w, 3*temporal*patch*patch].
    Returns None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    img_u8 = np.ascontiguousarray(img_u8, np.uint8)
    h, w, _ = img_u8.shape
    grid_h, grid_w = h // patch, w // patch
    out = np.empty((grid_h * grid_w, 3 * temporal * patch * patch), np.uint8)
    lib.qwen_patchify_u8_raw(
        img_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, patch, merge, temporal,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out
