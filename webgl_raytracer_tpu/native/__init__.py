"""Native (C++) runtime components, loaded via ctypes.

The only host-side hot loop worth native treatment in this framework is
the recursive SAH build (SURVEY §2.12): everything else either vectorizes
in numpy or runs on the TPU. The builder compiles on first use with the
system toolchain and caches the shared object next to the source; when no
compiler is available the callers fall back to the pure-Python builder.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "bvh_builder.cpp")
_LIB = os.path.join(_DIR, "_bvh_builder.so")
_lock = threading.Lock()
_lib = None
_failed = False


def _compile() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", _LIB, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def load_bvh_builder():
    """Returns the ctypes library with wrt_build_bvh, or None when native
    compilation is unavailable."""
    global _lib, _failed
    if _lib is not None:
        return _lib
    if _failed:
        return None
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            if not _compile():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _failed = True
            return None
        lib.wrt_build_bvh.restype = ctypes.c_int
        lib.wrt_build_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_longlong,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_longlong),
        ]
        _lib = lib
        return _lib


_DF_SRC = os.path.join(_DIR, "distance_field.cpp")
_DF_LIB = os.path.join(_DIR, "_distance_field.so")
_df_lib = None
_df_failed = False


def load_distance_field():
    """ctypes library with wrt_probe_field / wrt_sphere_field (the SES
    distance-field splats), or None when native compilation is unavailable."""
    global _df_lib, _df_failed
    if _df_lib is not None:
        return _df_lib
    if _df_failed:
        return None
    with _lock:
        if _df_lib is not None or _df_failed:
            return _df_lib
        if not os.path.exists(_DF_LIB) or (
            os.path.getmtime(_DF_LIB) < os.path.getmtime(_DF_SRC)
        ):
            cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                   "-o", _DF_LIB, _DF_SRC]
            try:
                subprocess.run(cmd, check=True, capture_output=True,
                               timeout=120)
            except (subprocess.SubprocessError, FileNotFoundError):
                _df_failed = True
                return None
        try:
            lib = ctypes.CDLL(_DF_LIB)
        except OSError:
            _df_failed = True
            return None
        f32p = ctypes.POINTER(ctypes.c_float)
        i64 = ctypes.c_longlong
        f32 = ctypes.c_float
        lib.wrt_probe_field.restype = None
        lib.wrt_probe_field.argtypes = [
            f32p, i64, f32, f32, f32, f32, f32, f32, i64, i64, i64, f32p]
        lib.wrt_sphere_field.restype = None
        lib.wrt_sphere_field.argtypes = [
            f32p, f32p, i64, f32, f32, f32, f32, f32, i64, i64, i64, f32p]
        _df_lib = lib
        return _df_lib
