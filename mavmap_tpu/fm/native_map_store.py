"""NativeMapStore — MapStore with the track graph owned by the C++ core.

Drop-in subclass of the Python MapStore: geometry payloads (poses, xyz,
errors, uv tables) stay numpy; the correspondence/track bookkeeping
(add_correspondence create/extend/merge/dedup) runs in native code
(native/mapstore.cc). Readers see the same numpy arrays — a lazy `_sync`
re-exports the native state (bulk memcpy) before any vectorized read.

Select via MapStore.create(backend="native"|"python"|"auto").
"""

import numpy as np

from .map_store import MapStore
from .native_store import NativeTrackIndex


class NativeMapStore(MapStore):
    def __init__(self, max_cam_params=9):
        super().__init__(max_cam_params)
        self._idx = NativeTrackIndex()
        self._dirty = False
        self._tracks_cache = None

    # -- write path ---------------------------------------------------------

    def add_image(self, camera_id, points2D, points2D_norm=None):
        image_id, p2d = super().add_image(camera_id, points2D, points2D_norm)
        self._idx.add_image(image_id, len(p2d))
        return image_id, p2d

    def add_correspondence(self, p2d_a, p2d_b):
        pid = self._idx.add_correspondence(int(p2d_a), int(p2d_b))
        self._dirty = True
        self._grow_payload(pid)
        return pid

    def add_correspondences_bulk(self, pairs_a, pairs_b):
        pids = self._idx.add_correspondences(pairs_a, pairs_b)
        self._dirty = True
        if len(pids):
            self._grow_payload(int(pids.max()))
        return pids

    def set_point3D(self, point3D_id, xyz, error=None):
        self._grow_payload(point3D_id)
        self.point3D_xyz[point3D_id] = np.asarray(xyz, np.float64)
        self._idx.set_tri(int(point3D_id), True)
        self.point3D_tri[point3D_id] = True
        if error is not None:
            self.point3D_error[point3D_id] = error

    def delete_point3D(self, point3D_id):
        self._idx.delete_point3D(int(point3D_id))
        self._dirty = True

    def _grow_payload(self, pid):
        self.reserve_points3D(pid + 1)

    # -- read path ----------------------------------------------------------

    def _sync(self):
        if not self._dirty:
            return
        self._dirty = False  # first: _grow_payload reads intercepted attrs
        # In-place copy into the view: keeps the capacity-doubling buffer
        # as the single backing store (appends and syncs stay consistent).
        self.point2D_point3D[:] = self._idx.export_point2D_point3D()
        cap = self._idx.capacity_points3D
        self._grow_payload(cap - 1)
        valid, tri, tl = self._idx.export_point3D_flags()
        self.point3D_valid[:cap] = valid
        self.point3D_tri[:cap] = tri
        self.point3D_track_len[:cap] = tl
        self._tracks_cache = None
        self._dirty = False

    @property
    def tracks(self):
        """Materialized {pid: [p2d...]} view (built on demand; for the merge
        / output / checkpoint paths, not the per-frame path)."""
        self._sync()
        if self._tracks_cache is None:
            self._tracks_cache = {
                pid: self._idx.track(pid).tolist()
                for pid in np.where(self.point3D_valid)[0]
            }
        return self._tracks_cache

    @tracks.setter
    def tracks(self, value):
        # Base-class __init__ assigns {}; ignore (native owns the graph).
        if value:
            raise AttributeError("NativeMapStore tracks are native-owned")

    def track_len(self, point3D_id):
        return self._idx.track_len(int(point3D_id))

    def point3D_status(self, point3D_id):
        return (
            self._idx.is_valid(int(point3D_id)),
            self._idx.is_tri(int(point3D_id)),
        )

    def find_tri_points(self, image_id):
        self._sync()
        return super().find_tri_points(image_id)

    def observation_table(self, min_track_len=2, tri_only=True,
                          image_ids=None):
        self._sync()
        return super().observation_table(min_track_len, tri_only, image_ids)

    def sync(self):
        """Refresh the numpy mirrors (point2D_point3D, flags, track lens)
        from the native core. Callers that read those arrays directly must
        sync first; observation_table / find_tri_points / tracks do it
        automatically."""
        self._sync()


def create_map_store(backend="auto", max_cam_params=9):
    """Factory: 'python', 'native', or 'auto' (native if buildable).

    MAVMAP_STORE_BACKEND overrides 'auto' (debug/triage switch)."""
    import os

    if backend == "auto":
        backend = os.environ.get("MAVMAP_STORE_BACKEND", "auto")
    if backend == "python":
        return MapStore(max_cam_params)
    if backend in ("native", "auto"):
        try:
            return NativeMapStore(max_cam_params)
        except Exception:
            if backend == "native":
                raise
            return MapStore(max_cam_params)
    raise ValueError(f"unknown map store backend: {backend}")
