"""Native C++ track index: differential test against the Python MapStore.

The Python MapStore is the executable specification; the native core must
agree op-for-op on randomized workloads.
"""

import numpy as np
import pytest

from mavmap_tpu.fm import MapStore

native = pytest.importorskip("mavmap_tpu.fm.native_store")


@pytest.fixture
def index():
    return native.NativeTrackIndex()


def test_native_basic(index):
    s0 = index.add_image(0, 5)
    s1 = index.add_image(1, 5)
    assert (s0, s1) == (0, 5)
    pid = index.add_correspondence(0, 5)
    assert index.track_len(pid) == 2
    assert index.point3D_of(0) == pid and index.point3D_of(5) == pid
    assert not index.is_tri(pid)
    index.set_tri(pid)
    assert index.is_tri(pid)
    assert index.num_points3D == 1
    index.delete_point3D(pid)
    assert index.num_points3D == 0
    assert index.point3D_of(0) == -1


def test_native_merge_keeps_longer(index):
    for i in range(6):
        index.add_image(i, 4)
    a = index.add_correspondence(0 * 4, 1 * 4)
    index.add_correspondence(1 * 4, 2 * 4)        # len(a) = 3
    b = index.add_correspondence(3 * 4 + 1, 4 * 4 + 1)  # len(b) = 2
    surv = index.add_correspondence(2 * 4, 4 * 4 + 1)
    assert surv == a
    assert not index.is_valid(b)
    assert index.track_len(a) == 5


def test_native_duplicate_image_suppressed(index):
    index.add_image(0, 4)
    index.add_image(1, 4)
    pid = index.add_correspondence(0, 4)
    index.add_correspondence(4, 1)  # image 0 already observes pid
    assert index.track_len(pid) == 2
    assert index.point3D_of(1) == -1


def test_native_differential_random(rng):
    """Randomized differential test: native vs Python spec."""
    py = MapStore()
    nt = native.NativeTrackIndex()
    cam = py.add_camera(1, [100, 100, 50, 50])
    n_img, n_pts = 12, 30
    p2d_ids = []
    for i in range(n_img):
        _, ids = py.add_image(cam, np.zeros((n_pts, 2)))
        nt.add_image(i, n_pts)
        p2d_ids.append(ids)

    for _ in range(800):
        i1, i2 = rng.choice(n_img, 2, replace=False)
        a = p2d_ids[i1][rng.integers(n_pts)]
        b = p2d_ids[i2][rng.integers(n_pts)]
        pa = py.add_correspondence(a, b)
        na = nt.add_correspondence(a, b)
        assert py.track_len(pa) == nt.track_len(na)

    # Full-state agreement.
    assert py.num_points3D == nt.num_points3D
    np.testing.assert_array_equal(py.point2D_point3D, nt.export_point2D_point3D())
    valid, tri, tl = nt.export_point3D_flags()
    assert len(valid) == len(py.point3D_valid)
    np.testing.assert_array_equal(py.point3D_valid, valid)
    np.testing.assert_array_equal(py.point3D_track_len, tl)
    for pid in py.tracks:
        assert sorted(py.tracks[pid]) == sorted(nt.track(pid).tolist())


def test_native_bulk_ingestion(index, rng):
    for i in range(4):
        index.add_image(i, 50)
    a = rng.integers(0, 50, 100)
    b = rng.integers(50, 100, 100)
    pids = index.add_correspondences(a, b)
    assert len(pids) == 100
    assert (pids >= 0).all()
