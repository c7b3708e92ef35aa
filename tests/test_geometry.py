"""Projection / triangulation / homography / similarity tests.

Counterparts of reference triangulation_test.cc, projective_transform_test.cc,
similarity_transform_test.cc — synthetic forward-model fixtures.
"""

import numpy as np
import jax
import jax.numpy as jnp

from mavmap_tpu.ops import projection as proj
from mavmap_tpu.ops import triangulation as tri
from mavmap_tpu.ops import homography as hom
from mavmap_tpu.ops import similarity as sim
from mavmap_tpu.ops.rotation import rotmat_from_rvec


def _random_pose(rng, scale=0.4):
    rvec = jnp.asarray(rng.normal(size=3) * scale, jnp.float32)
    tvec = jnp.asarray(rng.normal(size=3), jnp.float32)
    return rvec, tvec


def test_compose_invert_proj(rng):
    rvec, tvec = _random_pose(rng)
    P = proj.compose_proj_matrix(rvec, tvec)
    Pinv = proj.invert_proj_matrix(P)
    # Composition should be identity.
    R1, t1 = P[:3, :3], P[:3, 3]
    R2, t2 = Pinv[:3, :3], Pinv[:3, 3]
    assert jnp.abs(R1 @ R2 - jnp.eye(3)).max() < 1e-5
    assert jnp.abs(R1 @ t2 + t1).max() < 1e-5


def test_reproj_errors_zero_for_exact(rng):
    rvec, tvec = _random_pose(rng)
    P = proj.compose_proj_matrix(rvec, tvec)
    X = jnp.asarray(rng.normal(size=(50, 3)) * 2 + np.array([0, 0, 8]), jnp.float32)
    x = proj.project_normalized(P, X)
    err = proj.calc_reproj_errors(x, X, P)
    assert err.max() < 1e-5


def test_calc_depth_sign(rng):
    rvec = jnp.zeros(3, jnp.float32)
    tvec = jnp.zeros(3, jnp.float32)
    P = proj.compose_proj_matrix(rvec, tvec)
    X = jnp.asarray([[0, 0, 5.0], [0, 0, -5.0]], jnp.float32)
    d = proj.calc_depth(P, X)
    assert d[0] > 0 and d[1] < 0


def test_triangulation_exact(rng):
    # Reference triangulation_test.cc:16-60: sweep poses, project exact
    # points, assert re-triangulation error is tiny.
    for _ in range(5):
        rvec1, tvec1 = _random_pose(rng, 0.2)
        rvec2, tvec2 = _random_pose(rng, 0.2)
        P1 = proj.compose_proj_matrix(rvec1, tvec1)
        P2 = proj.compose_proj_matrix(rvec2, tvec2)
        X = jnp.asarray(rng.normal(size=(64, 3)) * 2 + np.array([0, 0, 10]), jnp.float32)
        x1 = proj.project_normalized(P1, X)
        x2 = proj.project_normalized(P2, X)
        Xhat = tri.triangulate_points(P1, P2, x1, x2)
        assert jnp.abs(Xhat - X).max() < 1e-2  # f32 DLT
        # Reprojection error should be ~0 even when the 3D error is larger.
        err = proj.calc_reproj_errors(x1, Xhat, P1)
        assert err.max() < 1e-4


def test_triangulation_multiview(rng):
    poses = []
    X = jnp.asarray(rng.normal(size=(1, 3)) + np.array([0, 0, 6]), jnp.float32)
    projs, obs = [], []
    for _ in range(6):
        rvec, tvec = _random_pose(rng, 0.3)
        P = proj.compose_proj_matrix(rvec, tvec)
        projs.append(P)
        obs.append(proj.project_normalized(P, X)[0])
    projs = jnp.stack(projs)
    obs = jnp.stack(obs)
    mask = jnp.asarray([True, True, True, True, False, False])
    Xhat = tri.triangulate_points_multiview(projs, obs, mask)
    assert jnp.abs(Xhat - X[0]).max() < 1e-2


def test_tri_angles(rng):
    # Two cameras looking at a point from a known angle.
    P1 = proj.compose_proj_matrix(jnp.zeros(3), jnp.asarray([1.0, 0, 0]))
    P2 = proj.compose_proj_matrix(jnp.zeros(3), jnp.asarray([-1.0, 0, 0]))
    X = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    ang = tri.calc_tri_angles(P1, P2, X)
    # Camera centers at (-1,0,0), (1,0,0); point at (0,0,1): angle = 90 deg.
    assert abs(float(ang[0]) - np.pi / 2) < 1e-4


def test_homography_recovers_known(rng):
    # Reference projective_transform_test.cc: recover known H from exact pts.
    H = jnp.asarray(
        [[1.1, 0.02, 0.3], [-0.03, 0.95, -0.2], [0.01, -0.02, 1.0]], jnp.float32
    )
    src = jnp.asarray(rng.uniform(-1, 1, size=(20, 2)), jnp.float32)
    ones = jnp.ones((20, 1), jnp.float32)
    ph = jnp.concatenate([src, ones], axis=-1) @ H.T
    dst = ph[:, :2] / ph[:, 2:3]
    models, ok = hom.solve_homography(src[:4], dst[:4])
    assert bool(ok[0])
    res = hom.homography_residuals(src, dst, models[0])
    assert res.max() < 1e-3


def test_similarity_umeyama(rng):
    # Reference similarity_transform_test.cc: recover known 7-DoF transform.
    from mavmap_tpu.ops.rotation import rvec_from_rotmat

    rvec = jnp.asarray([0.2, -0.4, 0.7], jnp.float32)
    R = rotmat_from_rvec(rvec)
    s = 2.3
    t = jnp.asarray([1.0, -2.0, 3.0], jnp.float32)
    src = jnp.asarray(rng.normal(size=(30, 3)), jnp.float32)
    dst = s * (src @ R.T) + t
    T = sim.solve_umeyama(src, dst)
    assert abs(float(sim.similarity_scale(T)) - s) < 1e-3
    assert jnp.abs(sim.similarity_rvec(T) - rvec).max() < 1e-3
    res = sim.similarity_residuals(src, dst, T)
    assert res.max() < 1e-3


def test_similarity_transform_pose(rng):
    # Projection must be invariant under remapping world + pose together.
    from mavmap_tpu.ops import projection as prj

    rvec_c = jnp.asarray(rng.normal(size=3) * 0.3, jnp.float32)
    tvec_c = jnp.asarray(rng.normal(size=3), jnp.float32)
    P = prj.compose_proj_matrix(rvec_c, tvec_c)
    X = jnp.asarray(rng.normal(size=(20, 3)) + np.array([0, 0, 6]), jnp.float32)
    x = prj.project_normalized(P, X)

    T = sim.solve_umeyama(
        jnp.asarray(rng.normal(size=(4, 3)), jnp.float32),
        jnp.asarray(rng.normal(size=(4, 3)), jnp.float32),
    )  # arbitrary similarity
    Xn = sim.transform_points(T, X)
    rvec_n, tvec_n = sim.transform_pose(T, rvec_c, tvec_c)
    Pn = prj.compose_proj_matrix(rvec_n, tvec_n)
    xn = prj.project_normalized(Pn, Xn)
    assert jnp.abs(xn - x).max() < 1e-3
