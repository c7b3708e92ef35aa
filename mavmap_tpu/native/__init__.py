"""Native (C++) runtime components, loaded via ctypes.

Build happens lazily on first import (g++ -O2 -shared), cached in
native/build/. Everything here has a pure-Python fallback — the Python
implementations are the executable specification, validated by the same
test suite.
"""

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_BUILD = os.path.join(_DIR, "build")
_LIB = None
_TRIED = False


def load_mapstore_lib():
    """Compile (if needed) and load the native map-store library.

    Returns the ctypes CDLL or None if no toolchain is available.
    """
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(_DIR, "mapstore.cc")
    out = os.path.join(_BUILD, "libmapstore.so")
    try:
        if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
            os.makedirs(_BUILD, exist_ok=True)
            subprocess.run(
                ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", src, "-o", out],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(out)
        c = ctypes.c_int64
        p = ctypes.c_void_p
        lib.ms_create.restype = p
        lib.ms_destroy.argtypes = [p]
        lib.ms_add_image.restype = c
        lib.ms_add_image.argtypes = [p, ctypes.c_int32, c]
        lib.ms_num_points2D.restype = c
        lib.ms_num_points2D.argtypes = [p]
        lib.ms_num_points3D.restype = c
        lib.ms_num_points3D.argtypes = [p]
        lib.ms_capacity_points3D.restype = c
        lib.ms_capacity_points3D.argtypes = [p]
        lib.ms_add_correspondence.restype = c
        lib.ms_add_correspondence.argtypes = [p, c, c]
        lib.ms_set_tri.argtypes = [p, c, ctypes.c_uint8]
        lib.ms_get_tri.restype = ctypes.c_uint8
        lib.ms_get_tri.argtypes = [p, c]
        lib.ms_get_valid.restype = ctypes.c_uint8
        lib.ms_get_valid.argtypes = [p, c]
        lib.ms_track_len.restype = ctypes.c_int32
        lib.ms_track_len.argtypes = [p, c]
        lib.ms_point3D_of.restype = c
        lib.ms_point3D_of.argtypes = [p, c]
        lib.ms_delete_point3D.argtypes = [p, c]
        lib.ms_get_track.argtypes = [p, c, ctypes.POINTER(c)]
        lib.ms_export_p2d_point3D.argtypes = [p, ctypes.POINTER(c)]
        lib.ms_export_p3d_flags.argtypes = [
            p, ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.ms_add_correspondences.restype = c
        lib.ms_add_correspondences.argtypes = [
            p, ctypes.POINTER(c), ctypes.POINTER(c), c, ctypes.POINTER(c),
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB
