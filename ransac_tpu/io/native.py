"""ctypes bindings for the native fastio library (native/fastio.cpp).

Loads ``native/libfastio.so`` when present (``make -C native``); callers
fall back to the pure-Python csv path otherwise, so the framework never
hard-depends on the native build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfastio.so")

_lib = None


def build(quiet: bool = True) -> bool:
    """Build libfastio.so via make; returns success."""
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=quiet)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load():
    """Load (and lazily cache) the shared library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.fastio_count_rows.argtypes = [ctypes.c_char_p]
    lib.fastio_count_rows.restype = ctypes.c_long
    lib.fastio_read_numeric.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_double]
    lib.fastio_read_numeric.restype = ctypes.c_long
    lib.fastio_read_strings.argtypes = [
        ctypes.c_char_p, ctypes.c_int32, ctypes.c_char_p, ctypes.c_long,
        ctypes.c_int32]
    lib.fastio_read_strings.restype = ctypes.c_long
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def count_rows(path: str) -> int:
    lib = load()
    assert lib is not None
    n = lib.fastio_count_rows(path.encode())
    if n < 0:
        raise IOError(f"fastio: cannot read {path}")
    return int(n)


def read_numeric(path: str, columns: list[int],
                 fill_value: float = 0.0) -> np.ndarray:
    """Parse the given numeric columns -> [rows, len(columns)] float64.
    Empty / non-numeric cells become ``fill_value`` (matching the Python
    ingest's empty->0.0 contract)."""
    lib = load()
    assert lib is not None
    max_rows = count_rows(path) + 1
    cols = np.asarray(columns, np.int32)
    out = np.empty((max_rows, len(columns)), np.float64)
    n = lib.fastio_read_numeric(
        path.encode(), cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(columns), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        max_rows, fill_value)
    if n < 0:
        raise IOError(f"fastio: cannot read {path}")
    return out[:n]


def read_strings(path: str, column: int, width: int = 64) -> list[str]:
    lib = load()
    assert lib is not None
    max_rows = count_rows(path) + 1
    buf = ctypes.create_string_buffer(max_rows * width)
    n = lib.fastio_read_strings(path.encode(), column, buf, max_rows, width)
    if n < 0:
        raise IOError(f"fastio: cannot read {path}")
    raw = buf.raw
    return [raw[i * width:(i + 1) * width].split(b"\0", 1)[0].decode(
        "utf-8", "replace") for i in range(n)]


if __name__ == "__main__":
    import sys

    if "--build" in sys.argv:
        ok = build(quiet=False)
        print("built" if ok else "build failed")
        sys.exit(0 if ok else 1)
