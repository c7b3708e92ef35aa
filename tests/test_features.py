"""Feature detector / cache / provider tests."""

import numpy as np
import jax.numpy as jnp

from mavmap_tpu.features import ArrayFeatureProvider, FeatureCache
from mavmap_tpu.features.detector import detect_image
from mavmap_tpu.features.provider import Features
from mavmap_tpu.ops import matching


def _blob_image(rng, H=240, W=320, n=60):
    img = np.zeros((H, W), np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    for _ in range(n):
        cy, cx = rng.uniform(20, H - 20), rng.uniform(20, W - 20)
        s = rng.uniform(2, 5)
        a = rng.uniform(80, 255) * rng.choice([-1, 1])
        img += a * np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s)))
    return np.clip(img - img.min(), 0, 255)


def test_detector_determinism(rng):
    img = _blob_image(rng)
    kp1, d1 = detect_image(img, max_features=256)
    kp2, d2 = detect_image(img, max_features=256)
    assert (kp1 == kp2).all()
    assert (d1 == d2).all()
    assert len(kp1) > 50
    assert np.allclose(np.linalg.norm(d1, axis=1), 1.0, atol=1e-4)


def test_detector_shift_equivariance(rng):
    img = _blob_image(rng)
    shift = (5, 9)
    img2 = np.roll(img, shift, axis=(0, 1))
    kp1, d1 = detect_image(img, max_features=256)
    kp2, d2 = detect_image(img2, max_features=256)
    f1 = Features.from_arrays(kp1, d1, 256)
    f2 = Features.from_arrays(kp2, d2, 256)
    mt, ok = matching.match_brute_force(
        jnp.asarray(f1.descriptors), jnp.asarray(f2.descriptors),
        jnp.asarray(f1.mask), jnp.asarray(f2.mask),
    )
    mt, okn = np.asarray(mt), np.asarray(ok) & f1.mask
    rows = np.where(okn)[0]
    assert len(rows) > 30
    disp = f2.keypoints[mt[rows]] - f1.keypoints[rows]
    good = np.abs(disp - np.array([shift[1], shift[0]])).max(axis=1) < 2.0
    assert good.mean() > 0.75


def test_feature_cache_invalidation(rng, tmp_path):
    img = _blob_image(rng)
    calls = []

    def detector(idx):
        calls.append(idx)
        return detect_image(img, max_features=128)

    cache = FeatureCache(str(tmp_path), {"h": 100}, detector, capacity=256)
    f1 = cache.query(0, "img0")
    f2 = cache.query(0, "img0")
    assert calls == [0]  # second query hit the cache
    assert (f1.keypoints == f2.keypoints).all()

    # Changed params invalidate the cache (reference feature_cache.cc:53-110).
    cache2 = FeatureCache(str(tmp_path), {"h": 200}, detector, capacity=256)
    cache2.query(0, "img0")
    assert calls == [0, 0]


def test_array_provider_padding(rng):
    kp = rng.uniform(0, 100, size=(10, 2)).astype(np.float32)
    d = rng.normal(size=(10, 16)).astype(np.float32)
    prov = ArrayFeatureProvider([(kp, d)], capacity=32)
    f = prov.get(0)
    assert f.keypoints.shape == (32, 2)
    assert f.mask.sum() == 10
    assert f.num == 10


def test_detector_rotation_invariance(rng):
    """Orientation assignment: descriptors must match across a 90-degree
    image rotation (upright mode would fail this)."""
    img = _blob_image(rng, H=256, W=256)
    img2 = np.rot90(img).copy()  # (y, x) -> (W-1-x, y)
    kp1, d1 = detect_image(img, max_features=256)
    kp2, d2 = detect_image(img2, max_features=256)
    f1 = Features.from_arrays(kp1, d1, 256)
    f2 = Features.from_arrays(kp2, d2, 256)
    mt, ok = matching.match_brute_force(
        jnp.asarray(f1.descriptors), jnp.asarray(f2.descriptors),
        jnp.asarray(f1.mask), jnp.asarray(f2.mask),
    )
    mt, okn = np.asarray(mt), np.asarray(ok) & f1.mask
    rows = np.where(okn)[0]
    assert len(rows) > 30
    H = img.shape[0]
    # Ground-truth keypoint mapping under np.rot90.
    exp_x = f1.keypoints[rows, 1]
    exp_y = (H - 1) - f1.keypoints[rows, 0]
    got = f2.keypoints[mt[rows]]
    good = (np.abs(got[:, 0] - exp_x) < 2.0) & (np.abs(got[:, 1] - exp_y) < 2.0)
    assert good.mean() > 0.7


def test_detector_upright_flag(rng):
    img = _blob_image(rng)
    kp1, d1 = detect_image(img, max_features=128, upright=True)
    kp2, d2 = detect_image(img, max_features=128, upright=False)
    assert (kp1 == kp2).all()          # detection unchanged
    assert not np.allclose(d1, d2)     # descriptors differ (rotated frame)


def test_cache_query_dimensions(rng, tmp_path):
    """Dims persisted with the features; query_dimensions answers without
    re-decoding (reference feature_cache.cc:168-195,222-243)."""
    img = _blob_image(rng)
    calls = []

    def det(idx):
        calls.append(idx)
        kp, de = detect_image(img, max_features=64)
        return kp, de, img.shape

    cache = FeatureCache(str(tmp_path), {"v": 1}, detector=det, capacity=64)
    cache.query(0, "img0")
    rows, cols, diag = cache.query_dimensions(0, "img0")
    assert (rows, cols) == img.shape
    assert abs(diag - np.hypot(*img.shape)) < 1e-6
    assert calls == [0]  # no re-extraction

    # Legacy 2-tuple detector: dims unknown, no crash.
    def det2(idx):
        kp, de = detect_image(img, max_features=64)
        return kp, de

    cache2 = FeatureCache(str(tmp_path / "c2"), {"v": 1}, detector=det2,
                          capacity=64)
    cache2.query(0, "img0")
    assert cache2.query_dimensions(0, "img0") == (0, 0, 0.0)
