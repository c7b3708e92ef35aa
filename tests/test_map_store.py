"""MapStore tests mirroring reference fm/feature_management_test.cc:19-303."""

import numpy as np

from mavmap_tpu.fm import MapStore


def _store_with_images(n_images=4, n_pts=6):
    s = MapStore()
    cam = s.add_camera(1, [100.0, 100.0, 50.0, 50.0])
    ids = []
    for i in range(n_images):
        img, p2d = s.add_image(cam, np.random.rand(n_pts, 2))
        ids.append(p2d)
    return s, ids


def test_camera_image_bookkeeping():
    s = MapStore()
    c0 = s.add_camera(1, [100, 100, 50, 50])
    c1 = s.add_camera(2, [90, 90, 40, 40, 0.1, 0.01, 0, 0])
    assert (c0, c1) == (0, 1)
    img0, p2d0 = s.add_image(c0, np.zeros((5, 2)))
    img1, p2d1 = s.add_image(c1, np.zeros((3, 2)))
    assert img0 == 0 and img1 == 1
    assert list(p2d0) == [0, 1, 2, 3, 4]
    assert list(p2d1) == [5, 6, 7]
    assert s.num_cameras == 2 and s.num_images == 2 and s.num_points2D == 8
    s.set_pose(img0, [0.1, 0, 0], [1, 2, 3])
    rv, tv = s.get_pose(img0)
    assert np.allclose(tv, [1, 2, 3])
    assert s.image_registered[img0] and not s.image_registered[img1]


def test_correspondence_creates_track():
    s, ids = _store_with_images()
    pid = s.add_correspondence(ids[0][0], ids[1][0])
    assert s.track_len(pid) == 2
    assert s.point2D_point3D[ids[0][0]] == pid
    assert s.point2D_point3D[ids[1][0]] == pid
    assert not s.point3D_tri[pid]  # untriangulated until set_point3D
    s.set_point3D(pid, [1.0, 2.0, 3.0])
    assert s.point3D_tri[pid]
    assert s.num_points3D == 1


def test_correspondence_extends_track():
    s, ids = _store_with_images()
    pid = s.add_correspondence(ids[0][0], ids[1][0])
    pid2 = s.add_correspondence(ids[1][0], ids[2][0])
    assert pid2 == pid
    assert s.track_len(pid) == 3
    assert s.point2D_point3D[ids[2][0]] == pid


def test_duplicate_image_observation_suppressed():
    # A track may hold at most one observation per image
    # (reference feature_management.h:96-110).
    s, ids = _store_with_images()
    pid = s.add_correspondence(ids[0][0], ids[1][0])
    s.add_correspondence(ids[1][0], ids[0][1])  # image 0 already in track
    assert s.track_len(pid) == 2
    assert s.point2D_point3D[ids[0][1]] == -1


def test_track_merge_keeps_longer():
    # Reference: merging two tracks keeps the longer one.
    s, ids = _store_with_images(n_images=6)
    a = s.add_correspondence(ids[0][0], ids[1][0])
    s.add_correspondence(ids[1][0], ids[2][0])  # len(a) = 3
    b = s.add_correspondence(ids[3][1], ids[4][1])  # len(b) = 2
    assert a != b
    surv = s.add_correspondence(ids[2][0], ids[4][1])  # connect the tracks
    assert surv == a  # longer track survives
    assert not s.point3D_valid[b]
    assert s.track_len(a) == 5
    for p in [ids[0][0], ids[1][0], ids[2][0], ids[3][1], ids[4][1]]:
        assert s.point2D_point3D[p] == a


def test_track_merge_dedups_images():
    s, ids = _store_with_images(n_images=5)
    a = s.add_correspondence(ids[0][0], ids[1][0])
    s.add_correspondence(ids[1][0], ids[2][0])  # a: imgs {0,1,2}
    b = s.add_correspondence(ids[2][1], ids[3][0])  # b: imgs {2,3}
    surv = s.add_correspondence(ids[0][0], ids[3][0])
    assert surv == a
    # img-2 observation of b (ids[2][1]) conflicts with a's img-2 obs -> dropped.
    assert s.point2D_point3D[ids[2][1]] == -1
    assert s.track_len(a) == 4  # imgs {0,1,2,3}


def test_same_track_noop():
    s, ids = _store_with_images()
    a = s.add_correspondence(ids[0][0], ids[1][0])
    surv = s.add_correspondence(ids[0][0], ids[1][0])
    assert surv == a and s.track_len(a) == 2


def test_find_tri_points():
    s, ids = _store_with_images(n_images=3)
    a = s.add_correspondence(ids[0][0], ids[1][0])
    b = s.add_correspondence(ids[0][1], ids[1][1])
    s.set_point3D(a, [1, 2, 3])
    p2d, mask, p3d = s.find_tri_points(1)
    assert mask[0] and not mask[1]  # only track a triangulated
    assert p3d[0] == a and p3d[1] == b
    assert not mask[2:].any()


def test_delete_point3D():
    s, ids = _store_with_images()
    a = s.add_correspondence(ids[0][0], ids[1][0])
    s.set_point3D(a, [1, 2, 3])
    s.delete_point3D(a)
    assert not s.point3D_valid[a]
    assert s.point2D_point3D[ids[0][0]] == -1
    assert s.point2D_point3D[ids[1][0]] == -1
    assert s.num_points3D == 0


def test_observation_table_min_track_len():
    s, ids = _store_with_images(n_images=4)
    a = s.add_correspondence(ids[0][0], ids[1][0])
    s.add_correspondence(ids[1][0], ids[2][0])
    s.set_point3D(a, [0, 0, 5])
    b = s.add_correspondence(ids[0][1], ids[1][1])
    s.set_point3D(b, [1, 0, 5])
    img, pt, xy, xyn = s.observation_table(min_track_len=3)
    assert len(img) == 3
    assert set(pt.tolist()) == {a}
    img, pt, xy, xyn = s.observation_table(min_track_len=2)
    assert len(img) == 5
