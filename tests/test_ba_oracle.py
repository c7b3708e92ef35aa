"""Independent-oracle check of the bundle adjuster.

A small BA problem is solved twice: by our Schur LM (dense and CG paths)
and by scipy.optimize.least_squares over an INDEPENDENT numpy residual
implementation (its own Rodrigues + pinhole projection — nothing shared
with mavmap_tpu). Both must reach the same minimum under the same gauge
(first pose fixed, x-translation of the second fixed), closing the loop
SURVEY §7 asked for ("validate against a scipy/Ceres oracle on small
problems"). Reference cost semantics: bundle_adjustment.cc:449-569.
"""

import numpy as np
import pytest
from scipy.optimize import least_squares

from mavmap_tpu.ba import (BA_POSE_FIXED, BA_POSE_FIXED_X, BAOptions,
                           build_problem, bundle_adjust)


def _rodrigues(rvec):
    """Independent numpy angle-axis -> rotation matrix."""
    th = np.linalg.norm(rvec)
    if th < 1e-12:
        return np.eye(3)
    k = rvec / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def _residuals_np(poses, points, K, obs_i, obs_p, obs_uv):
    """Pixel reprojection residuals, fully independent implementation."""
    out = np.empty((len(obs_i), 2))
    for k, (i, p) in enumerate(zip(obs_i, obs_p)):
        R = _rodrigues(poses[i, :3])
        Xc = R @ points[p] + poses[i, 3:]
        out[k, 0] = K[0] * Xc[0] / Xc[2] + K[2]
        out[k, 1] = K[1] * Xc[1] / Xc[2] + K[3]
    return (out - obs_uv).ravel()


@pytest.fixture
def small_problem(rng):
    I, P = 5, 60
    K = np.array([700.0, 700.0, 400.0, 300.0])
    X = rng.normal(size=(P, 3)) * np.array([3, 3, 1.5]) + np.array([0, 0, 10])
    poses = np.stack([
        np.concatenate([rng.normal(size=3) * 0.03, [i * 0.6, 0.05 * i, 0]])
        for i in range(I)
    ])
    obs_i = np.repeat(np.arange(I), P)
    obs_p = np.tile(np.arange(P), I)
    uv_true = _residuals_np(poses, X, K, obs_i, obs_p,
                            np.zeros((I * P, 2))).reshape(-1, 2)
    obs_uv = uv_true + rng.normal(size=uv_true.shape) * 0.5
    # Perturbed initial guess.
    poses0 = poses + rng.normal(size=poses.shape) * 0.01
    poses0[0] = poses[0]
    poses0[1, 3] = poses[1, 3]  # gauge: fixed + fixed-x rows keep truth
    X0 = X + rng.normal(size=X.shape) * 0.05
    return poses, X, K, poses0, X0, obs_i, obs_p, obs_uv


def _scipy_solve(poses0, X0, K, obs_i, obs_p, obs_uv):
    I, P = len(poses0), len(X0)

    # Free-parameter packing: pose 0 fixed, pose 1 all but tx, rest full.
    def unpack(x):
        poses = poses0.copy()
        k = 0
        poses[1, :3] = x[k:k + 3]; k += 3
        poses[1, 4:] = x[k:k + 2]; k += 2
        for i in range(2, I):
            poses[i] = x[k:k + 6]; k += 6
        pts = x[k:].reshape(P, 3)
        return poses, pts

    def pack(poses, pts):
        segs = [poses[1, :3], poses[1, 4:]]
        segs += [poses[i] for i in range(2, I)]
        segs.append(pts.ravel())
        return np.concatenate(segs)

    def fun(x):
        poses, pts = unpack(x)
        return _residuals_np(poses, pts, K, obs_i, obs_p, obs_uv)

    res = least_squares(fun, pack(poses0, X0), method="trf",
                        xtol=1e-12, ftol=1e-12, gtol=1e-12)
    poses, pts = unpack(res.x)
    return poses, pts, res.cost


@pytest.mark.parametrize("solver", ["dense", "cg"])
def test_ba_matches_scipy_oracle(small_problem, solver):
    poses, X, K, poses0, X0, obs_i, obs_p, obs_uv = small_problem

    sp_poses, sp_pts, sp_cost = _scipy_solve(poses0, X0, K, obs_i, obs_p,
                                             obs_uv)

    kp = np.zeros((1, 9), np.float32)
    kp[0, :4] = K
    prob = build_problem(
        poses0.astype(np.float32), X0.astype(np.float32), kp, [1],
        obs_i, obs_p, np.zeros(len(obs_i), np.int32),
        obs_uv.astype(np.float32),
        pose_states=[BA_POSE_FIXED, BA_POSE_FIXED_X, 0, 0, 0],
        with_pairs=(solver == "dense"),
    )
    opts = BAOptions(max_num_iterations=100, function_tolerance=1e-10,
                     loss_scale_factor=1e6,  # ~quadratic: match scipy linear
                     solver=solver, cg_max_iters=200, cg_tol=1e-6)
    new_poses, new_points, info = bundle_adjust(prob, opts,
                                                num_obs=len(obs_i))
    new_poses = np.asarray(new_poses, np.float64)
    new_points = np.asarray(new_points, np.float64)

    our_cost = 0.5 * np.sum(
        _residuals_np(new_poses, new_points, K, obs_i, obs_p, obs_uv) ** 2
    )
    # Same minimum (scipy runs f64; ours f32 — 2% cost headroom).
    assert our_cost < sp_cost * 1.02, (our_cost, sp_cost)
    # Same gauge -> directly comparable parameters.
    np.testing.assert_allclose(new_poses, sp_poses, atol=5e-3)
    np.testing.assert_allclose(new_points, sp_pts, atol=2e-2)
