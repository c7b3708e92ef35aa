"""Measured CPU baselines for BASELINE.md.

The reference itself cannot be built in this container (no Eigen, Ceres,
Boost; OpenCV here is 5.x without the 2.4 nonfree SURF), so this measures
the closest standard CPU stand-ins at MATCHED problem sizes:

1. Bundle adjustment: scipy.optimize.least_squares (TRF + LSMR with
   jacobian sparsity — the canonical SciPy large-scale BA recipe) on the
   same synthetic problems our solver benchmarks use. Reported as wall
   seconds per jacobian evaluation (~ per LM iteration, what Ceres'
   per-iteration report counts).
2. Per-frame matching + pose RANSAC: OpenCV BFMatcher 2-NN both
   directions + ratio + cross-check (the reference's exact recipe,
   feature.cc:52-133) and cv2.solvePnPRansac, at 1024 x 128-dim features.

Run: python benchmarks/ba_cpu_baseline.py
"""

import time

import numpy as np


def _rodrigues_batch(rvecs):
    th = np.linalg.norm(rvecs, axis=1, keepdims=True)
    th = np.maximum(th, 1e-12)
    k = rvecs / th
    K = np.zeros((len(rvecs), 3, 3))
    K[:, 0, 1], K[:, 0, 2] = -k[:, 2], k[:, 1]
    K[:, 1, 0], K[:, 1, 2] = k[:, 2], -k[:, 0]
    K[:, 2, 0], K[:, 2, 1] = -k[:, 1], k[:, 0]
    I = np.eye(3)[None]
    s = np.sin(th)[..., None]
    c = np.cos(th)[..., None]
    return I + s * K + (1 - c) * (K @ K)


def make_problem(rng, I, P, obs_per_img):
    K = np.array([700.0, 700.0, 400.0, 300.0])
    X = rng.normal(size=(P, 3)) * np.array([4, 4, 2]) + np.array([0, 0, 12])
    poses = np.stack([
        np.concatenate([rng.normal(size=3) * 0.05, [i * 0.8, 0, 0]])
        for i in range(I)
    ])
    obs_i = np.repeat(np.arange(I), obs_per_img)
    obs_p = np.concatenate([rng.permutation(P)[:obs_per_img]
                            for _ in range(I)])
    R = _rodrigues_batch(poses[:, :3])
    Xc = np.einsum("oij,oj->oi", R[obs_i], X[obs_p]) + poses[obs_i, 3:]
    uv = np.stack([K[0] * Xc[:, 0] / Xc[:, 2] + K[2],
                   K[1] * Xc[:, 1] / Xc[:, 2] + K[3]], axis=1)
    uv += rng.normal(size=uv.shape) * 0.5
    poses0 = poses + rng.normal(size=poses.shape) * 0.003
    poses0[0] = poses[0]
    X0 = X + rng.normal(size=X.shape) * 0.02
    return K, poses, X, poses0, X0, obs_i, obs_p, uv


def scipy_ba_ms_per_iter(rng, I, P, obs_per_img, max_iters=10):
    from scipy.optimize import least_squares
    from scipy.sparse import lil_matrix

    K, poses, X, poses0, X0, obs_i, obs_p, uv = make_problem(
        rng, I, P, obs_per_img)
    O = len(obs_i)
    n_pose = (I - 1) * 6  # first pose fixed (gauge)

    def unpack(x):
        ps = poses0.copy()
        ps[1:] = x[:n_pose].reshape(I - 1, 6)
        return ps, x[n_pose:].reshape(P, 3)

    def fun(x):
        ps, pts = unpack(x)
        R = _rodrigues_batch(ps[:, :3])
        Xc = np.einsum("oij,oj->oi", R[obs_i], pts[obs_p]) + ps[obs_i, 3:]
        u = np.stack([K[0] * Xc[:, 0] / Xc[:, 2] + K[2],
                      K[1] * Xc[:, 1] / Xc[:, 2] + K[3]], axis=1)
        return (u - uv).ravel()

    # Jacobian sparsity pattern (scipy groups columns via it).
    S = lil_matrix((2 * O, n_pose + 3 * P), dtype=np.int8)
    rows = np.arange(O)
    for d in range(6):
        col = (obs_i - 1) * 6 + d
        ok = obs_i >= 1
        S[2 * rows[ok], col[ok]] = 1
        S[2 * rows[ok] + 1, col[ok]] = 1
    for d in range(3):
        col = n_pose + obs_p * 3 + d
        S[2 * rows, col] = 1
        S[2 * rows + 1, col] = 1

    x0 = np.concatenate([poses0[1:].ravel(), X0.ravel()])
    t0 = time.perf_counter()
    res = least_squares(fun, x0, jac_sparsity=S, method="trf",
                        tr_solver="lsmr", max_nfev=max_iters * 3,
                        xtol=1e-12, ftol=1e-12, gtol=1e-12, verbose=0)
    dt = time.perf_counter() - t0
    return dt, res.njev, dt / max(res.njev, 1), res.cost, O


def opencv_frame_ms(rng, F=1024, D=128, trials=20):
    import cv2

    d1 = rng.normal(size=(F, D)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    perm = rng.permutation(F)
    d2 = (d1[perm] + rng.normal(size=(F, D)).astype(np.float32) * 0.02)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)

    bf = cv2.BFMatcher(cv2.NORM_L2)
    t0 = time.perf_counter()
    for _ in range(trials):
        m12 = bf.knnMatch(d1, d2, k=2)
        m21 = bf.knnMatch(d2, d1, k=2)
        good = {}
        for m, n in m12:
            if m.distance < 0.9 * n.distance:
                good[m.queryIdx] = m.trainIdx
        cnt = 0
        for m, n in m21:
            if m.distance < 0.9 * n.distance and \
                    good.get(m.trainIdx, -1) == m.queryIdx:
                cnt += 1
    match_ms = (time.perf_counter() - t0) / trials * 1e3

    # P3P RANSAC on 1024 2D-3D pairs.
    Kmat = np.array([[700.0, 0, 400], [0, 700.0, 300], [0, 0, 1]])
    X = rng.normal(size=(F, 3)) * np.array([4, 4, 2]) + np.array([0, 0, 12])
    rvec_t = rng.normal(size=3) * 0.05
    tvec_t = np.array([0.5, 0.1, 0.2])
    R, _ = cv2.Rodrigues(rvec_t)
    Xc = X @ R.T + tvec_t
    uv = (Xc / Xc[:, 2:3]) @ Kmat.T
    uv = uv[:, :2] + rng.normal(size=(F, 2)) * 0.5
    uv[: F // 5] += 50  # 20% outliers
    t0 = time.perf_counter()
    for _ in range(trials):
        cv2.solvePnPRansac(X, uv, Kmat, None, iterationsCount=500,
                           reprojectionError=4.0,
                           flags=cv2.SOLVEPNP_P3P)
    pnp_ms = (time.perf_counter() - t0) / trials * 1e3
    return match_ms, pnp_ms


def main():
    rng = np.random.default_rng(0)
    print("== scipy sparse-BA CPU baseline (TRF+LSMR, analytic sparsity) ==")
    for name, I, P, opi in (("local window", 8, 1000, 400),
                            ("global small", 50, 12000, 500),
                            ("global", 200, 50000, 1000)):
        dt, njev, per, cost, O = scipy_ba_ms_per_iter(rng, I, P, opi)
        print(f"  {name:13s} I={I:4d} P={P:6d} O={O:7d}: "
              f"{per*1e3:8.1f} ms/iter ({njev} iters, {dt:.1f}s total)")

    print("== OpenCV per-frame CPU baseline (1024 x 128 features) ==")
    match_ms, pnp_ms = opencv_frame_ms(rng)
    print(f"  BFMatcher 2NN x2 + ratio + cross-check: {match_ms:8.1f} ms")
    print(f"  solvePnPRansac (P3P, 500 trials):       {pnp_ms:8.1f} ms")


if __name__ == "__main__":
    main()
