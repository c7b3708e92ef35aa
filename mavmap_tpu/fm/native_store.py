"""NativeTrackIndex — C++-backed track bookkeeping behind the MapStore API.

Wraps the native map-store core (native/mapstore.cc) for the hot
bookkeeping ops (add_correspondence / merge / dedup). Geometry payloads
(poses, xyz, uv) stay in numpy on the Python side; the native core owns the
correspondence graph. Validated against the pure-Python MapStore by the
shared test suite (tests/test_map_store.py runs both backends).
"""

import ctypes

import numpy as np

from ..native import load_mapstore_lib


class NativeTrackIndex:
    """Correspondence/track graph with native storage."""

    def __init__(self):
        self._lib = load_mapstore_lib()
        if self._lib is None:
            raise RuntimeError("native mapstore library unavailable")
        self._h = self._lib.ms_create()

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.ms_destroy(self._h)
            self._h = None

    def add_image(self, image_id, num_points2D):
        return int(self._lib.ms_add_image(self._h, np.int32(image_id),
                                          np.int64(num_points2D)))

    def add_correspondence(self, a, b):
        return int(self._lib.ms_add_correspondence(self._h, np.int64(a),
                                                   np.int64(b)))

    def add_correspondences(self, a_arr, b_arr):
        a = np.ascontiguousarray(a_arr, np.int64)
        b = np.ascontiguousarray(b_arr, np.int64)
        out = np.empty(len(a), np.int64)
        c = ctypes.POINTER(ctypes.c_int64)
        self._lib.ms_add_correspondences(
            self._h, a.ctypes.data_as(c), b.ctypes.data_as(c),
            np.int64(len(a)), out.ctypes.data_as(c),
        )
        return out

    def point3D_of(self, p2d):
        return int(self._lib.ms_point3D_of(self._h, np.int64(p2d)))

    def track_len(self, pid):
        return int(self._lib.ms_track_len(self._h, np.int64(pid)))

    def track(self, pid):
        n = self.track_len(pid)
        out = np.empty(n, np.int64)
        self._lib.ms_get_track(
            self._h, np.int64(pid),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return out

    def set_tri(self, pid, tri=True):
        self._lib.ms_set_tri(self._h, np.int64(pid), np.uint8(tri))

    def is_tri(self, pid):
        return bool(self._lib.ms_get_tri(self._h, np.int64(pid)))

    def is_valid(self, pid):
        return bool(self._lib.ms_get_valid(self._h, np.int64(pid)))

    def delete_point3D(self, pid):
        self._lib.ms_delete_point3D(self._h, np.int64(pid))

    @property
    def num_points2D(self):
        return int(self._lib.ms_num_points2D(self._h))

    @property
    def num_points3D(self):
        return int(self._lib.ms_num_points3D(self._h))

    @property
    def capacity_points3D(self):
        return int(self._lib.ms_capacity_points3D(self._h))

    def export_point2D_point3D(self):
        n = self.num_points2D
        out = np.empty(n, np.int64)
        self._lib.ms_export_p2d_point3D(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
        )
        return out

    def export_point3D_flags(self):
        n = self.capacity_points3D
        valid = np.empty(n, np.uint8)
        tri = np.empty(n, np.uint8)
        tl = np.empty(n, np.int32)
        self._lib.ms_export_p3d_flags(
            self._h,
            valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            tri.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            tl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return valid.astype(bool), tri.astype(bool), tl
