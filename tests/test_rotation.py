"""Rotation utilities tests (counterpart of reference projection_test.cc)."""

import numpy as np
import jax.numpy as jnp

from mavmap_tpu.ops import rotation as rot


def test_rvec_rotmat_roundtrip(rng):
    # Keep |rvec| < pi: beyond that the angle-axis representation is
    # non-unique and the roundtrip returns the canonical equivalent.
    rvecs = rng.normal(size=(64, 3))
    norms = np.linalg.norm(rvecs, axis=-1, keepdims=True)
    rvecs = rvecs / norms * (norms % 3.0)
    rvecs = jnp.asarray(rvecs, jnp.float32)
    R = rot.rotmat_from_rvec(rvecs)
    # Orthonormality
    eye = jnp.eye(3)
    err = jnp.abs(R @ jnp.swapaxes(R, -1, -2) - eye).max()
    assert err < 1e-5
    back = rot.rvec_from_rotmat(R)
    assert jnp.abs(back - rvecs).max() < 1e-4


def test_rvec_small_angle():
    rvec = jnp.asarray([[1e-9, 0.0, 0.0], [0.0, 0.0, 0.0]], jnp.float32)
    R = rot.rotmat_from_rvec(rvec)
    assert jnp.abs(R - jnp.eye(3)).max() < 1e-6
    back = rot.rvec_from_rotmat(R)
    assert jnp.isfinite(back).all()


def test_rvec_near_pi(rng):
    axis = rng.normal(size=(16, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    angles = np.pi - np.abs(rng.normal(size=(16, 1))) * 1e-3
    rvecs = jnp.asarray(axis * angles, jnp.float32)
    R = rot.rotmat_from_rvec(rvecs)
    back = rot.rvec_from_rotmat(R)
    R2 = rot.rotmat_from_rvec(back)
    # Compare rotations, not rvecs (rvec may flip sign near pi).
    assert jnp.abs(R - R2).max() < 1e-4


def test_euler_roundtrip(rng):
    # Matches reference projection_test.cc:15-28 (euler -> R -> euler).
    rx = rng.uniform(-1.2, 1.2, size=32)
    ry = rng.uniform(-1.2, 1.2, size=32)
    rz = rng.uniform(-3.0, 3.0, size=32)
    R = rot.rotmat_from_euler(
        jnp.asarray(rx, jnp.float32), jnp.asarray(ry, jnp.float32), jnp.asarray(rz, jnp.float32)
    )
    rx2, ry2, rz2 = rot.euler_from_rotmat(R)
    np.testing.assert_allclose(np.asarray(rx2), rx, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ry2), ry, atol=1e-4)
    np.testing.assert_allclose(np.asarray(rz2), rz, atol=1e-4)


def test_euler_convention_is_zyx():
    # R = Rz Ry Rx: for pure yaw, x-axis maps to (cos, sin, 0).
    R = rot.rotmat_from_euler(0.0, 0.0, 0.5)
    v = R @ jnp.asarray([1.0, 0.0, 0.0])
    np.testing.assert_allclose(
        np.asarray(v), [np.cos(0.5), np.sin(0.5), 0.0], atol=1e-6
    )


def test_rvec_from_euler_matches_matrix_route(rng):
    roll, pitch, yaw = 0.3, -0.2, 1.1
    rv = rot.rvec_from_euler(roll, pitch, yaw)
    R1 = rot.rotmat_from_rvec(rv)
    R2 = rot.rotmat_from_euler(roll, pitch, yaw)
    assert jnp.abs(R1 - R2).max() < 1e-5
