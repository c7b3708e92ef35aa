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


def test_detector_textureless_floor(rng):
    """Quality floor under rank-based admission (reference AdaptiveSURF's
    bounded /1.5 threshold descent): a textureless half-image must emit NO
    keypoints even with min_per_cell forcing, while the textured half
    fills its cells."""
    img = _blob_image(rng, H=240, W=320)
    img[:, 160:] = 128.0  # right half: perfectly flat
    from mavmap_tpu.features.detector import AdaptiveDetector

    det = AdaptiveDetector(hessian_threshold=100.0, min_per_cell=20,
                           max_features=512, grid_size=(2, 2))
    kp, desc = det.detect(img)
    left = kp[:, 0] < 155.0
    assert left.sum() > 40            # textured half delivers
    # The flat INTERIOR emits nothing (responses there are < the floor);
    # the seam at x=160 is genuine image structure and may fire, with
    # coarse-octave smoothing spreading it up to ~2 top-octave sigmas.
    assert (kp[:, 0] > 210.0).sum() == 0


def test_detector_cross_frame_adaptation(rng):
    """Per-cell thresholds persist and adapt across frames: a low-contrast
    texture that starts below the initial Hessian threshold becomes
    above-threshold after the remembered per-cell threshold walks down
    (/1.5 per frame), growing the above-threshold count."""
    img = _blob_image(rng, H=240, W=320)
    # Crush contrast 5x: DoH responses scale by 1/25 — below the initial
    # threshold but above the quality floor (hessian/1.5^10 ~ 1/57.7).
    img = 128.0 + (img - 128.0) * 0.2
    from mavmap_tpu.features.detector import AdaptiveDetector

    det = AdaptiveDetector(hessian_threshold=5000.0, min_per_cell=10,
                           max_features=512, grid_size=(2, 2))
    det.detect(img)
    thr0 = det.cell_thr.copy()
    for _ in range(6):
        kp, _ = det.detect(img)
    assert (det.cell_thr < thr0).all()   # thresholds adapted down
    # And the stateless path with the adapted thresholds admits more
    # above-threshold maxima than the initial threshold did.
    from mavmap_tpu.features.detector import detect_and_describe
    import jax.numpy as _jnp

    _, _, _, _, c_init = detect_and_describe(
        _jnp.asarray(img, _jnp.float32), hessian_threshold=5000.0,
        max_features=512, grid_size=(2, 2))
    _, _, _, _, c_adapt = detect_and_describe(
        _jnp.asarray(img, _jnp.float32), hessian_threshold=5000.0,
        cell_thresholds=_jnp.asarray(det.cell_thr), min_per_cell=10,
        max_features=512, grid_size=(2, 2))
    assert int(np.asarray(c_adapt).sum()) > int(np.asarray(c_init).sum())


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


def _write_reference_dump(tmp_path, name, kp, desc, resp):
    """Write cv::KeyPoint / cv::Mat dumps exactly as the reference's
    FeatureCache does (feature_cache.cc:125-142): raw 28-byte KeyPoint
    structs behind a size_t byte count; descriptor matrix behind
    (num_bytes, rows, cols, cv_type) headers."""
    n = len(kp)
    raw = np.zeros(n, dtype=[("x", "<f4"), ("y", "<f4"), ("size", "<f4"),
                             ("angle", "<f4"), ("response", "<f4"),
                             ("octave", "<i4"), ("class_id", "<i4")])
    raw["x"], raw["y"] = kp[:, 0], kp[:, 1]
    raw["response"] = resp
    raw["size"] = 9.0
    with open(tmp_path / f"{name}-keypoints.bin", "wb") as f:
        f.write(np.uint64(raw.nbytes).tobytes())
        f.write(raw.tobytes())
    d32 = desc.astype("<f4")
    with open(tmp_path / f"{name}-descriptors.bin", "wb") as f:
        f.write(np.uint64(d32.nbytes).tobytes())
        f.write(np.uint64(d32.shape[0]).tobytes())
        f.write(np.uint64(d32.shape[1]).tobytes())
        f.write(np.int32(5).tobytes())  # CV_32F
        f.write(d32.tobytes())


def test_reference_cache_provider_roundtrip(rng, tmp_path):
    """ReferenceCacheProvider parses the reference's binary cache format
    (feature_cache.cc:125-163) and applies the capacity budget by response."""
    from mavmap_tpu.features import ReferenceCacheProvider

    kp = rng.uniform(0, 500, size=(40, 2)).astype(np.float32)
    desc = rng.normal(size=(40, 64)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    resp = rng.uniform(0.1, 5.0, size=40).astype(np.float32)
    _write_reference_dump(tmp_path, "img7", kp, desc, resp)

    prov = ReferenceCacheProvider(str(tmp_path), ["img7"], capacity=64)
    f = prov.get(0)
    assert f.num == 40
    assert np.allclose(f.keypoints[:40], kp, atol=1e-6)
    assert np.allclose(f.descriptors[:40], desc, atol=1e-6)
    assert prov.descriptor_dim == 64

    # Over-capacity: the strongest-response keypoints survive.
    prov16 = ReferenceCacheProvider(str(tmp_path), ["img7"], capacity=16)
    f16 = prov16.get(0)
    assert f16.num == 16
    want = set(map(tuple, kp[np.argsort(-resp)[:16]]))
    got = set(map(tuple, f16.keypoints[:16]))
    assert got == want
