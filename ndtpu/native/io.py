"""ctypes binding for libndtpu_io with build-on-demand and NumPy fallback.

The reference loads its native library with a hardcoded absolute path
(`ndnet/preprocessing/ndt_legacy.py:28`:
``ctypes.cdll.LoadLibrary('/usr/local/lib/libndnet.so')``). Here the .so is
built next to the sources on first use (g++ -O2, no external deps) and the
binding degrades gracefully to the pure-NumPy reader when a toolchain is
unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "ply_io.cc")
_LIB = os.path.join(_HERE, "libndtpu_io.so")

_lock = threading.Lock()
_lib = None
_tried = False


def build_native(force: bool = False) -> bool:
    """Compile libndtpu_io.so. Returns True on success."""
    if os.path.exists(_LIB) and not force:
        return True
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
             _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) and not build_native():
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.ndtpu_ply_open.restype = ctypes.c_void_p
        lib.ndtpu_ply_open.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.ndtpu_ply_read.restype = ctypes.c_int
        lib.ndtpu_ply_read.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_uint16),
        ]
        lib.ndtpu_ply_close.restype = None
        lib.ndtpu_ply_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def native_read_ply(path: str):
    """Returns (points [N,3] float64, classes [N] uint16) or None if the
    native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = ctypes.c_int64()
    cols = ctypes.c_int()
    handle = lib.ndtpu_ply_open(path.encode(), ctypes.byref(n), ctypes.byref(cols))
    if not handle:
        return None
    try:
        points = np.empty((n.value, 3), np.float64)
        classes = np.zeros((n.value,), np.uint16)
        rc = lib.ndtpu_ply_read(
            handle,
            points.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            classes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        )
        if rc != 0:
            return None
        return points, classes
    finally:
        lib.ndtpu_ply_close(handle)
