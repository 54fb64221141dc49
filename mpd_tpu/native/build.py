"""Build + load the native shared library (g++ -O3, cached by mtime)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "rrt_connect.cpp")
_LIB = os.path.join(_DIR, "_librrt.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def load_library() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    with _lock:
        if _lib is not None:
            return _lib
        if _failed:
            return None
        needs_build = (
            not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        )
        if needs_build and not _build():
            _failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _failed = True
            return None

        D = ctypes.POINTER(ctypes.c_double)
        U8 = ctypes.POINTER(ctypes.c_uint8)
        I = ctypes.c_int
        Dbl = ctypes.c_double

        lib.collision_check_batch.argtypes = [
            D, I, I, D, D,
            D, D, I, D, D, I, I,
            I, Dbl, D, I, D, I, Dbl, Dbl,
            Dbl, U8,
        ]
        lib.collision_check_batch.restype = None

        lib.rrt_connect_plan.argtypes = [
            D, D, I, D, D,
            D, D, I, D, D, I, I,
            I, Dbl, D, I, D, I, Dbl, Dbl,
            Dbl, Dbl, I, Dbl, I, ctypes.c_uint, I,
            D, I, ctypes.POINTER(I),
        ]
        lib.rrt_connect_plan.restype = I
        _lib = lib
        return _lib


def native_available() -> bool:
    return load_library() is not None
