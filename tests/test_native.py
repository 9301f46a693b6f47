"""Native library + debug-printer tests (parity with the reference's
Python test suite `ndnet/test/suites/libs.py:6-26`, which checks the .so
loads and `print_matrix` exists and runs)."""
import io

import numpy as np
import pytest


def test_native_library_builds_and_loads():
    from ndtpu.native.io import build_native, native_available

    if not build_native():
        pytest.skip("no C++ toolchain")
    assert native_available()


def test_native_symbols_exist():
    from ndtpu.native import io as nio

    if not nio.native_available():
        pytest.skip("native lib unavailable")
    lib = nio._load()
    for sym in ("ndtpu_ply_open", "ndtpu_ply_read", "ndtpu_ply_close"):
        assert hasattr(lib, sym)


def test_print_matrix_runs():
    from ndtpu.utils.logging import print_matrix

    buf = io.StringIO()
    print_matrix(np.arange(6.0), rows=2, cols=3, file=buf)
    lines = buf.getvalue().strip().splitlines()
    assert len(lines) == 2
    assert lines[0].split()[0] == "0.000000"
