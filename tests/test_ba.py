"""Bundle adjustment tests: synthetic forward-model recovery.

The reference has no BA unit tests; these add the missing tier (SURVEY §4):
noise-free problems must converge to ~zero cost and recover ground truth up
to the fixed gauge; robust loss must reject planted outlier observations;
IMU priors must pull rotations toward the prior; GCP-pinned points must not
move.
"""

import numpy as np
import jax.numpy as jnp

from mavmap_tpu.ba import (
    BAOptions,
    BA_POSE_FIXED,
    BA_POSE_FIXED_X,
    build_problem,
    bundle_adjust,
    pose_refinement,
)
from mavmap_tpu.models import camera as cam
from mavmap_tpu.ops.rotation import rotmat_from_rvec


def _make_scene(rng, I=5, P=120, noise=0.0):
    K = np.zeros((1, 9), np.float32)
    K[0, :4] = [700.0, 700.0, 400.0, 300.0]
    X = rng.normal(size=(P, 3)) * np.array([4, 4, 2]) + np.array([0, 0, 12])
    poses = []
    for i in range(I):
        rv = rng.normal(size=3) * 0.05
        tv = np.array([i * 0.8, 0, 0]) + rng.normal(size=3) * 0.05
        poses.append(np.concatenate([rv, tv]))
    poses = np.array(poses, np.float32)

    obs_img, obs_pt, obs_uv = [], [], []
    for i in range(I):
        R = np.asarray(rotmat_from_rvec(jnp.asarray(poses[i, :3])))
        Xc = X @ R.T + poses[i, 3:]
        uv = np.asarray(
            cam.world2image(jnp.asarray(Xc, jnp.float32), cam.PINHOLE, jnp.asarray(K[0]))
        )
        obs_img += [i] * P
        obs_pt += list(range(P))
        obs_uv += list(uv)
    obs_uv = np.array(obs_uv)
    if noise:
        obs_uv = obs_uv + rng.normal(size=obs_uv.shape) * noise
    return K, X, poses, np.array(obs_img), np.array(obs_pt), obs_uv


def test_ba_noise_free_converges(rng):
    K, X, poses_gt, oi, op, uv = _make_scene(rng)
    poses0 = poses_gt.copy()
    poses0[2:] += rng.normal(size=poses0[2:].shape) * 0.01
    X0 = X + rng.normal(size=X.shape) * 0.03
    states = [BA_POSE_FIXED, BA_POSE_FIXED_X] + [0] * (len(poses_gt) - 2)
    prob = build_problem(poses0, X0, K, [cam.PINHOLE], oi, op, np.zeros_like(oi), uv,
                         pose_states=states)
    poses, points, info = bundle_adjust(prob, BAOptions(max_num_iterations=60))
    assert float(info["final_cost"]) < 1e-3
    # Gauge pinned at ground truth (poses 0/1 unperturbed) -> full recovery.
    assert np.abs(np.asarray(poses) - poses_gt).max() < 1e-3
    assert np.abs(np.asarray(points) - X).max() < 1e-2


def test_ba_noisy_reaches_subpixel_rms(rng):
    K, X, poses_gt, oi, op, uv = _make_scene(rng, noise=0.5)
    poses0 = poses_gt + rng.normal(size=poses_gt.shape) * 0.01
    poses0[0] = poses_gt[0]
    poses0[1] = poses_gt[1]
    X0 = X + rng.normal(size=X.shape) * 0.05
    states = [BA_POSE_FIXED, BA_POSE_FIXED_X] + [0] * (len(poses_gt) - 2)
    prob = build_problem(poses0, X0, K, [cam.PINHOLE], oi, op, np.zeros_like(oi), uv,
                         pose_states=states)
    poses, points, info = bundle_adjust(prob, BAOptions(max_num_iterations=40,
                                                        update_point3D_errors=True))
    n_obs = len(oi)
    rms = np.sqrt(2 * float(info["final_cost"]) / (2 * n_obs))
    assert rms < 0.6  # ~noise level
    errs = np.asarray(info["point_errors"])
    assert (errs >= 0).all() and np.median(errs) < 1.5


def test_ba_robust_to_outliers(rng):
    K, X, poses_gt, oi, op, uv = _make_scene(rng)
    out = rng.permutation(len(uv))[: len(uv) // 10]
    uv_bad = uv.copy()
    uv_bad[out] += rng.normal(size=(len(out), 2)) * 60 + 30
    poses0 = poses_gt + rng.normal(size=poses_gt.shape) * 0.005
    poses0[0] = poses_gt[0]
    poses0[1] = poses_gt[1]
    states = [BA_POSE_FIXED, BA_POSE_FIXED_X] + [0] * (len(poses_gt) - 2)
    prob = build_problem(poses_gt.copy(), X.copy(), K, [cam.PINHOLE], oi, op,
                         np.zeros_like(oi), uv_bad, pose_states=states)
    poses, points, info = bundle_adjust(prob, BAOptions(max_num_iterations=40,
                                                        update_point3D_errors=True))
    # Poses stay near GT despite 10% gross outliers (Cauchy loss).
    assert np.abs(np.asarray(poses)[:, :3] - poses_gt[:, :3]).max() < 2e-3
    assert np.abs(np.asarray(poses)[:, 3:] - poses_gt[:, 3:]).max() < 2e-2
    # Outlier observations show up in per-point errors.
    errs = np.asarray(info["point_errors"])
    bad_pts = np.unique(op[out])
    good_pts = np.setdiff1d(np.arange(len(X)), bad_pts)
    assert np.median(errs[bad_pts]) > 5 * max(np.median(errs[good_pts]), 1e-3)


def test_ba_rotation_prior(rng):
    K, X, poses_gt, oi, op, uv = _make_scene(rng, I=4)
    states = [BA_POSE_FIXED, BA_POSE_FIXED_X, 0, 0]
    # Priors = ground truth rotations; start from perturbed rotations with a
    # heavy weight: rotations must end closer to the prior than they started.
    prior = poses_gt[:, :3].copy()
    poses0 = poses_gt.copy()
    poses0[2:, :3] += 0.05
    prob = build_problem(poses0, X.copy(), K, [cam.PINHOLE], oi, op,
                         np.zeros_like(oi), uv, pose_states=states,
                         rot_prior=prior,
                         rot_prior_weight=np.full(4, 100.0, np.float32))
    poses, points, info = bundle_adjust(prob, BAOptions(max_num_iterations=40,
                                                        constrain_rotation=True))
    err0 = np.abs(poses0[2:, :3] - prior[2:]).max()
    err1 = np.abs(np.asarray(poses)[2:, :3] - prior[2:]).max()
    assert err1 < err0 * 0.1


def test_ba_gcp_points_fixed(rng):
    K, X, poses_gt, oi, op, uv = _make_scene(rng, I=4)
    states = [BA_POSE_FIXED, BA_POSE_FIXED_X, 0, 0]
    fixed = np.zeros(len(X), bool)
    fixed[:5] = True
    X0 = X + rng.normal(size=X.shape) * 0.05
    X0[:5] = X[:5]  # GCPs start at their surveyed coords
    prob = build_problem(poses_gt.copy(), X0, K, [cam.PINHOLE], oi, op,
                         np.zeros_like(oi), uv, pose_states=states,
                         point_fixed=fixed)
    poses, points, info = bundle_adjust(prob, BAOptions(max_num_iterations=30))
    # Pinned points must be bit-identical to their (f32) starting values.
    assert np.abs(np.asarray(points)[:5] - X[:5].astype(np.float32)).max() == 0.0
    assert float(info["final_cost"]) < 1e-2


def test_pose_refinement(rng):
    K, X, poses_gt, oi, op, uv = _make_scene(rng, I=1)
    rv, tv, cost = pose_refinement(
        poses_gt[0, :3] + 0.02,
        poses_gt[0, 3:] + 0.1,
        X,
        uv[:len(X)],
        np.ones(len(X), bool),
        K[0],
        cam.PINHOLE,
    )
    assert np.abs(np.asarray(rv) - poses_gt[0, :3]).max() < 1e-5
    assert np.abs(np.asarray(tv) - poses_gt[0, 3:]).max() < 1e-4
    assert float(cost) < 1e-4


def test_ba_opencv_model(rng):
    # Mixed-model support: OPENCV distortion in the BA cost.
    K = np.zeros((1, 9), np.float32)
    K[0, :8] = [700.0, 700.0, 400.0, 300.0, -0.2, 0.05, 0.001, -0.001]
    P = 80
    X = rng.normal(size=(P, 3)) * np.array([3, 3, 1.5]) + np.array([0, 0, 10])
    poses_gt = np.stack([
        np.concatenate([rng.normal(size=3) * 0.03, [i * 0.7, 0, 0] + rng.normal(size=3) * 0.02])
        for i in range(4)
    ]).astype(np.float32)
    obs_img, obs_pt, obs_uv = [], [], []
    for i in range(4):
        R = np.asarray(rotmat_from_rvec(jnp.asarray(poses_gt[i, :3])))
        Xc = X @ R.T + poses_gt[i, 3:]
        uv = np.asarray(cam.world2image(jnp.asarray(Xc, jnp.float32), cam.OPENCV, jnp.asarray(K[0])))
        obs_img += [i] * P
        obs_pt += list(range(P))
        obs_uv += list(uv)
    poses0 = poses_gt.copy()
    poses0[2:] += rng.normal(size=poses0[2:].shape) * 0.01
    X0 = X + rng.normal(size=X.shape) * 0.02
    states = [BA_POSE_FIXED, BA_POSE_FIXED_X, 0, 0]
    prob = build_problem(poses0, X0, K, [cam.OPENCV], np.array(obs_img), np.array(obs_pt),
                         np.zeros(len(obs_img), np.int32), np.array(obs_uv),
                         pose_states=states)
    poses, points, info = bundle_adjust(prob, BAOptions(max_num_iterations=60))
    assert float(info["final_cost"]) < 1e-2
    assert np.abs(np.asarray(poses) - poses_gt).max() < 2e-3


def test_ba_refine_camera_params(rng):
    # Self-calibration: recover perturbed intrinsics (reference
    # refine_camera_params, bundle_adjustment.cc:370-376).
    K_true = np.zeros((1, 9), np.float32)
    K_true[0, :4] = [700.0, 700.0, 400.0, 300.0]
    P = 150
    X = rng.normal(size=(P, 3)) * np.array([4, 4, 2]) + np.array([0, 0, 12])
    poses_gt = np.stack([
        np.concatenate([rng.normal(size=3) * 0.08,
                        [i * 0.8, 0.2 * (i % 2), 0] + rng.normal(size=3) * 0.05])
        for i in range(8)
    ]).astype(np.float32)
    obs_img, obs_pt, obs_uv = [], [], []
    for i in range(8):
        R = np.asarray(rotmat_from_rvec(jnp.asarray(poses_gt[i, :3])))
        Xc = X @ R.T + poses_gt[i, 3:]
        uv = np.asarray(cam.world2image(jnp.asarray(Xc, jnp.float32),
                                        cam.PINHOLE, jnp.asarray(K_true[0])))
        obs_img += [i] * P
        obs_pt += list(range(P))
        obs_uv += list(uv)
    # Start with wrong focal length (2% off) and offset principal point.
    K0 = K_true.copy()
    K0[0, 0] = 714.0
    K0[0, 1] = 689.0
    K0[0, 2] = 396.0
    states = [BA_POSE_FIXED, BA_POSE_FIXED_X] + [0] * 6
    prob = build_problem(poses_gt.copy(), X.copy(), K0, [cam.PINHOLE],
                         np.array(obs_img), np.array(obs_pt),
                         np.zeros(len(obs_img), np.int32), np.array(obs_uv),
                         pose_states=states)
    poses, points, info = bundle_adjust(
        prob, BAOptions(max_num_iterations=60, refine_camera_params=True))
    K_est = info["cam_params"][0]
    assert float(info["final_cost"]) < 1e-1
    assert abs(K_est[0] - 700.0) < 1.0
    assert abs(K_est[1] - 700.0) < 1.0
    assert abs(K_est[2] - 400.0) < 2.0


def test_ba_cg_matches_dense(rng):
    """Matrix-free Schur-CG must reach the same solution as the exact
    dense Schur solve (same LM trajectory up to CG tolerance)."""
    K, X, poses_gt, oi, op, uv = _make_scene(rng, I=6, P=150, noise=0.3)
    poses0 = poses_gt.copy()
    poses0[2:] += rng.normal(size=poses0[2:].shape) * 0.01
    X0 = X + rng.normal(size=X.shape) * 0.05
    states = [BA_POSE_FIXED, BA_POSE_FIXED_X] + [0] * (len(poses_gt) - 2)
    prob = build_problem(poses0, X0, K, [cam.PINHOLE], oi, op,
                         np.zeros_like(oi), uv, pose_states=states)
    pd, xd, infod = bundle_adjust(
        prob, BAOptions(max_num_iterations=25, solver="dense"))
    pc, xc, infoc = bundle_adjust(
        prob, BAOptions(max_num_iterations=25, solver="cg", cg_tol=1e-6))
    assert np.abs(np.asarray(pc) - np.asarray(pd)).max() < 1e-4
    assert np.abs(np.asarray(xc) - np.asarray(xd)).max() < 1e-3
    assert abs(float(infoc["final_cost"]) - float(infod["final_cost"])) < \
        1e-3 * max(1.0, float(infod["final_cost"]))


def test_ba_cg_no_pair_list(rng):
    """A problem built with with_pairs=False (no co-observation pair
    enumeration at all) converges via CG and recovers ground truth."""
    K, X, poses_gt, oi, op, uv = _make_scene(rng, I=5, P=120)
    poses0 = poses_gt.copy()
    poses0[2:] += rng.normal(size=poses0[2:].shape) * 0.01
    X0 = X + rng.normal(size=X.shape) * 0.03
    states = [BA_POSE_FIXED, BA_POSE_FIXED_X] + [0] * (len(poses_gt) - 2)
    prob = build_problem(poses0, X0, K, [cam.PINHOLE], oi, op,
                         np.zeros_like(oi), uv, pose_states=states)
    assert prob.pair_a.shape[0] == 0  # pair lists are gone entirely
    poses, points, info = bundle_adjust(
        prob, BAOptions(max_num_iterations=60, solver="cg"))
    assert float(info["final_cost"]) < 1e-3
    assert np.abs(np.asarray(poses) - poses_gt).max() < 1e-3
    assert np.abs(np.asarray(points) - X).max() < 1e-2


def test_bucketed_problem_matches_unbucketed(rng):
    """Bucketing (padding obs/poses/points) must not change the solution —
    regression test for the img_order padding bug that double-counted the
    last real observation into the padded rows' image block."""
    K, X, poses_gt, oi, op, uv = _make_scene(rng, I=5, P=120, noise=0.3)
    poses0 = poses_gt.copy()
    poses0[2:] += rng.normal(size=poses0[2:].shape) * 0.01
    X0 = X + rng.normal(size=X.shape) * 0.03
    states = [BA_POSE_FIXED, BA_POSE_FIXED_X] + [0] * (len(poses_gt) - 2)
    pa = build_problem(poses0, X0, K, [cam.PINHOLE], oi, op,
                       np.zeros_like(oi), uv, pose_states=states)
    pb = build_problem(poses0, X0, K, [cam.PINHOLE], oi, op,
                       np.zeros_like(oi), uv, pose_states=states, bucket=True)
    o = BAOptions(max_num_iterations=20)
    p1, x1, i1 = bundle_adjust(pa, o)
    p2, x2, i2 = bundle_adjust(pb, o)
    n_poses, n_pts = len(poses_gt), len(X)
    assert np.abs(np.asarray(p2)[:n_poses] - np.asarray(p1)).max() < 1e-4
    assert np.abs(np.asarray(x2)[:n_pts] - np.asarray(x1)).max() < 1e-3

    # Same invariant on the CG path.
    pc = build_problem(poses0, X0, K, [cam.PINHOLE], oi, op,
                       np.zeros_like(oi), uv, pose_states=states,
                       bucket=True)
    p3, x3, i3 = bundle_adjust(pc, BAOptions(max_num_iterations=20,
                                             solver="cg", cg_tol=1e-6))
    assert np.abs(np.asarray(p3)[:n_poses] - np.asarray(p1)).max() < 1e-3


def test_ba_selfcal_cg_matches_dense(rng):
    """Matrix-free selfcal CG == dense selfcal Schur solve."""
    K, X, poses_gt, oi, op, uv = _make_scene(rng, I=6, P=150, noise=0.3)
    K0 = K.copy()
    K0[0, 0] *= 1.02  # perturbed focal to recover
    K0[0, 1] *= 0.985
    poses0 = poses_gt.copy()
    poses0[2:] += rng.normal(size=poses0[2:].shape) * 0.01
    X0 = X + rng.normal(size=X.shape) * 0.05
    states = [BA_POSE_FIXED, BA_POSE_FIXED_X] + [0] * (len(poses_gt) - 2)
    o = dict(max_num_iterations=25, refine_camera_params=True)
    pd_prob = build_problem(poses0, X0, K0, [cam.PINHOLE], oi, op,
                            np.zeros_like(oi), uv, pose_states=states)
    cg_prob = build_problem(poses0, X0, K0, [cam.PINHOLE], oi, op,
                            np.zeros_like(oi), uv, pose_states=states,
                            with_pairs=False)
    pd, xd, infod = bundle_adjust(pd_prob, BAOptions(**o, solver="dense"))
    pc, xc, infoc = bundle_adjust(cg_prob, BAOptions(**o, solver="cg",
                                                     cg_tol=1e-6))
    assert np.abs(np.asarray(pc) - np.asarray(pd)).max() < 1e-3
    kd, kc = infod["cam_params"], infoc["cam_params"]
    assert np.abs(kd - kc).max() < 1e-2
    # Both recover the true focal lengths.
    assert np.abs(kc[0, :2] - K[0, :2]).max() < 2.0
