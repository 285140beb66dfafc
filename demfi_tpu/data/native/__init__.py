"""ctypes binding for the native augmentation library.

Compiles augment.cpp with g++ on first use (cached next to the source);
falls back to the numpy path in datasets.py if no toolchain is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "augment.cpp")
_LIB = os.path.join(_HERE, "libdemfi_augment.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
             "-o", _LIB + ".tmp", _SRC],
            check=True, capture_output=True)
        os.replace(_LIB + ".tmp", _LIB)
        return True
    except Exception:
        return False


def get_lib():
    """Return the loaded ctypes library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (os.path.getmtime(_LIB)
                                        < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.demfi_augment_pack.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p]
        lib.demfi_augment_pack_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
        lib.demfi_normalize.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        _lib = lib
        return _lib


def augment_pack(frames_u8: np.ndarray, cy: int, cx: int, ps: int,
                 flip: bool, rot: int) -> np.ndarray:
    """[T,H,W,3] uint8 -> [T,ps,ps,3] float32 [-1,1] with
    crop/flip/rot90(k) fused (native; raises if library unavailable)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native augment library unavailable")
    frames_u8 = np.ascontiguousarray(frames_u8)
    t, h, w, _ = frames_u8.shape
    out = np.empty((t, ps, ps, 3), np.float32)
    lib.demfi_augment_pack(
        frames_u8.ctypes.data, t, h, w, cy, cx, ps, int(flip), rot & 3,
        out.ctypes.data)
    return out


def normalize(frames_u8: np.ndarray) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native augment library unavailable")
    frames_u8 = np.ascontiguousarray(frames_u8)
    out = np.empty(frames_u8.shape, np.float32)
    lib.demfi_normalize(frames_u8.ctypes.data, frames_u8.size,
                        out.ctypes.data)
    return out
