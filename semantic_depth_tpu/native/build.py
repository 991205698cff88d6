"""Build-on-demand for the native runtime library.

Compiles native/*.cpp into one shared object under native/_build/ the first
time it is requested (g++ -O3); subsequent imports dlopen the cached .so.
Thread/process-safe via an atomic rename. Returns None when no toolchain is
available — callers fall back to pure Python.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

_NATIVE_DIR = os.path.dirname(os.path.abspath(__file__))
_BUILD_DIR = os.path.join(_NATIVE_DIR, "_build")
_SOURCES = ["ply_writer.cpp", "ply_reader.cpp"]
_LIB_NAME = "libsemantic_depth_native.so"

_cached: Optional[ctypes.CDLL] = None
_build_failed = False


def _sources_mtime() -> float:
    return max(os.path.getmtime(os.path.join(_NATIVE_DIR, s)) for s in _SOURCES)


def _compile() -> Optional[str]:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    out_path = os.path.join(_BUILD_DIR, _LIB_NAME)
    if os.path.exists(out_path) and os.path.getmtime(out_path) >= _sources_mtime():
        return out_path
    srcs = [os.path.join(_NATIVE_DIR, s) for s in _SOURCES]
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_BUILD_DIR)
    os.close(fd)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", tmp, *srcs]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, out_path)  # atomic
        return out_path
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def get_library() -> Optional[ctypes.CDLL]:
    """The native library, building it if needed; None if unavailable."""
    global _cached, _build_failed
    if _cached is not None:
        return _cached
    if _build_failed:
        return None
    path = _compile()
    if path is None:
        _build_failed = True
        return None
    lib = ctypes.CDLL(path)
    lib.write_ply_ascii.restype = ctypes.c_int
    lib.write_ply_ascii.argtypes = [
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
    ]
    lib.read_ply_rows.restype = ctypes.c_int64
    lib.read_ply_rows.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.c_int32,
    ]
    _cached = lib
    return lib
