"""RANSAC + minimal solver tests.

Counterparts of reference estimation_test.cc (planted-outlier similarity),
essential_matrix_test.cc (5-point RANSAC with outliers), p3p_test.cc.
"""

import numpy as np
import jax
import jax.numpy as jnp

from mavmap_tpu.ops import essential as es
from mavmap_tpu.ops import p3p as p3
from mavmap_tpu.ops import similarity as sim
from mavmap_tpu.ops import homography as hom
from mavmap_tpu.ops.ransac import ransac
from mavmap_tpu.ops.rotation import rotmat_from_rvec
from mavmap_tpu.ops import projection as proj


def _two_view_scene(rng, n=60, noise=0.0):
    rvec = rng.normal(size=3) * 0.3
    R = np.asarray(rotmat_from_rvec(jnp.asarray(rvec, jnp.float32)))
    t = rng.normal(size=3)
    t /= np.linalg.norm(t)
    X = rng.normal(size=(n, 3)) * 2 + np.array([0, 0, 6])
    x1 = X[:, :2] / X[:, 2:3]
    Xc = X @ R.T + t
    x2 = Xc[:, :2] / Xc[:, 2:3]
    if noise:
        x1 += rng.normal(size=x1.shape) * noise
        x2 += rng.normal(size=x2.shape) * noise
    return R, t, X, x1, x2


def test_ransac_similarity_with_outliers(rng):
    # Reference estimation_test.cc:19-66 — 1000 samples, 400 outliers.
    rvec = jnp.asarray([0.2, -0.1, 0.4], jnp.float32)
    R = rotmat_from_rvec(rvec)
    s, t = 1.8, np.array([2.0, -1.0, 0.5])
    src = rng.normal(size=(1000, 3))
    dst = s * (src @ np.asarray(R).T) + t
    outliers = rng.permutation(1000)[:400]
    dst[outliers] += rng.normal(size=(400, 3)) * 2 + 1.0

    key = jax.random.PRNGKey(0)
    result = ransac(
        key,
        jnp.asarray(src, jnp.float32),
        jnp.asarray(dst, jnp.float32),
        sim.solve_similarity,
        sim.similarity_residuals,
        sample_size=4,
        num_trials=64,
        threshold=0.01,
    )
    assert bool(result.success)
    inl = np.asarray(result.inlier_mask)
    expected = np.ones(1000, bool)
    expected[outliers] = False
    # All true inliers recovered, no outliers included.
    assert (inl == expected).mean() > 0.995
    T = np.asarray(result.model)
    assert abs(float(sim.similarity_scale(jnp.asarray(T))) - s) < 1e-2


def test_ransac_essential_with_outliers(rng):
    # Reference essential_matrix_test.cc: planted outliers must be flagged.
    R, t, X, x1, x2 = _two_view_scene(rng, n=100)
    out_idx = rng.permutation(100)[:20]
    x2[out_idx] += rng.normal(size=(20, 2)) * 0.1 + 0.05

    key = jax.random.PRNGKey(1)
    result = ransac(
        key,
        jnp.asarray(x1, jnp.float32),
        jnp.asarray(x2, jnp.float32),
        es.solve_essential_5pt,
        es.abs_sampson_residuals,
        sample_size=5,
        num_trials=256,
        threshold=2e-3,
    )
    assert bool(result.success)
    inl = np.asarray(result.inlier_mask)
    expected = np.ones(100, bool)
    expected[out_idx] = False
    assert (inl & ~expected).sum() <= 1  # no (almost no) outliers admitted
    assert (inl & expected).sum() >= 70  # most inliers found


def test_pose_from_essential(rng):
    R, t, X, x1, x2 = _two_view_scene(rng, n=50)
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = jnp.asarray(tx @ R / np.linalg.norm(tx @ R), jnp.float32)
    Rhat, that, ngood = es.pose_from_essential_matrix(
        E,
        jnp.asarray(x1, jnp.float32),
        jnp.asarray(x2, jnp.float32),
        jnp.ones(50, bool),
    )
    assert int(ngood) >= 45
    # t is recovered up to scale.
    that_n = np.asarray(that)
    that_n = that_n / np.linalg.norm(that_n)
    assert min(np.linalg.norm(that_n - t), np.linalg.norm(that_n + t)) < 1e-3
    assert np.abs(np.asarray(Rhat) - R).max() < 1e-3


def test_p3p_recovers_pose(rng):
    # Reference p3p_test.cc:17-72 — sweep ground-truth poses.
    for _ in range(5):
        rvec = rng.normal(size=3) * 0.5
        R = np.asarray(rotmat_from_rvec(jnp.asarray(rvec, jnp.float32)))
        tvec = rng.normal(size=3)
        X = rng.normal(size=(10, 3)) * 2 + np.array([0, 0, 8])
        Xc = X @ R.T + tvec
        if (Xc[:, 2] < 0.5).any():
            tvec = tvec + np.array([0, 0, 1.0 - Xc[:, 2].min()])
            Xc = X @ R.T + tvec
        x = Xc[:, :2] / Xc[:, 2:3]
        models, ok = p3.solve_p3p(
            jnp.asarray(x[:4], jnp.float32), jnp.asarray(X[:4], jnp.float32)
        )
        res = jax.vmap(
            lambda m: p3.p3p_residuals(
                jnp.asarray(x, jnp.float32), jnp.asarray(X, jnp.float32), m
            )
        )(models)
        best = jnp.min(jnp.where(ok[:, None], jnp.max(res, axis=1, keepdims=True), jnp.inf))
        assert float(best) < 1e-3


def test_ransac_p3p_with_outliers(rng):
    rvec = rng.normal(size=3) * 0.4
    R = np.asarray(rotmat_from_rvec(jnp.asarray(rvec, jnp.float32)))
    tvec = rng.normal(size=3) * 0.5
    X = rng.normal(size=(80, 3)) * 2 + np.array([0, 0, 8])
    Xc = X @ R.T + tvec
    x = Xc[:, :2] / Xc[:, 2:3]
    out_idx = rng.permutation(80)[:16]
    x[out_idx] += rng.normal(size=(16, 2)) * 0.05 + 0.02

    key = jax.random.PRNGKey(7)
    result = ransac(
        key,
        jnp.asarray(x, jnp.float32),
        jnp.asarray(X, jnp.float32),
        p3.solve_p3p,
        p3.p3p_residuals,
        sample_size=4,
        num_trials=128,
        threshold=1e-3,
    )
    assert bool(result.success)
    inl = np.asarray(result.inlier_mask)
    expected = np.ones(80, bool)
    expected[out_idx] = False
    assert (inl & ~expected).sum() <= 1
    assert (inl & expected).sum() >= 58
    # Pose accuracy.
    Rt = np.asarray(result.model)
    assert np.abs(Rt[:3, :3] - R).max() < 1e-2
    assert np.abs(Rt[:3, 3] - tvec).max() < 1e-2


def test_ransac_homography_gate(rng):
    # Planar scene: homography explains everything (degenerate for SfM).
    H = np.array([[1.05, 0.1, 0.2], [-0.1, 0.92, -0.1], [0.03, 0.01, 1.0]])
    src = rng.uniform(-1, 1, size=(100, 2))
    ph = np.concatenate([src, np.ones((100, 1))], axis=-1) @ H.T
    dst = ph[:, :2] / ph[:, 2:3]
    key = jax.random.PRNGKey(3)
    result = ransac(
        key,
        jnp.asarray(src, jnp.float32),
        jnp.asarray(dst, jnp.float32),
        hom.solve_homography,
        hom.homography_residuals,
        sample_size=4,
        num_trials=64,
        threshold=1e-3,
    )
    assert bool(result.success)
    assert int(result.num_inliers) >= 95


def test_ransac_valid_mask(rng):
    # Fixed-capacity buffers: invalid rows must never be sampled or counted.
    rvec = jnp.asarray([0.2, -0.1, 0.4], jnp.float32)
    R = rotmat_from_rvec(rvec)
    src = rng.normal(size=(64, 3))
    dst = 1.5 * (src @ np.asarray(R).T) + np.array([1.0, 2.0, 3.0])
    valid = np.zeros(64, bool)
    valid[:40] = True
    dst[40:] = 1e6  # garbage in the padding region

    key = jax.random.PRNGKey(4)
    result = ransac(
        key,
        jnp.asarray(src, jnp.float32),
        jnp.asarray(dst, jnp.float32),
        sim.solve_similarity,
        sim.similarity_residuals,
        sample_size=4,
        num_trials=32,
        threshold=0.01,
        valid_mask=jnp.asarray(valid),
    )
    assert bool(result.success)
    inl = np.asarray(result.inlier_mask)
    assert inl[40:].sum() == 0
    assert inl[:40].sum() >= 39
