"""Native (C++) host-side runtime: fast PLY IO.

The reference's native layer (core_legacy/, ~1.7k LoC of C) implements the
NDT math itself — that now lives on-device (ndtpu.core). What remains
host-side and genuinely benefits from native code is the input path: text
PLY parsing, which the reference does line-by-line in Python
(CARLA_Seg.py:115-137). ndtpu.native builds a small C++ library
(libndtpu_io.so) with a multi-threaded PLY parser, bound via ctypes with a
transparent pure-NumPy fallback.
"""
from ndtpu.native.io import native_available, native_read_ply, build_native  # noqa: F401
