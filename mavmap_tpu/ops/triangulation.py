"""Batched DLT triangulation + triangulation angles.

TPU-native counterpart of reference src/base3d/triangulation.{h,cc}. The
reference loops over points with OpenMP (triangulation.cc:53-98); here the
whole batch is one SVD of shape (N, 4, 4) that XLA maps across the chip.

Inputs are *normalized* image coordinates (after `models.image2world`).
"""

import jax.numpy as jnp


def triangulate_points(proj1, proj2, points1, points2):
    """Two-view DLT triangulation (Hartley-Zisserman).

    proj1, proj2: (..., 3, 4); points1, points2: (..., N, 2) normalized coords.
    Returns (..., N, 3) world points.

    Builds the 4x4 homogeneous system [u*P3 - P1; v*P3 - P2] per view and
    takes the right singular vector of the smallest singular value
    (reference triangulation.cc:12-50 builds the equivalent 6x4 cross-product
    system; the 4x4 form spans the same nullspace and is cheaper).
    """
    rows = []
    for proj, pts in ((proj1, points1), (proj2, points2)):
        P1 = proj[..., None, 0, :]  # (..., 1, 4)
        P2 = proj[..., None, 1, :]
        P3 = proj[..., None, 2, :]
        u = pts[..., 0:1]
        v = pts[..., 1:2]
        rows.append(u * P3 - P1)  # (..., N, 4)
        rows.append(v * P3 - P2)
    A = jnp.stack(rows, axis=-2)  # (..., N, 4, 4)
    # Nullspace via SVD of A (4x4, batched). Not eigh of A^T A — squaring
    # the condition number is fatal in f32 for small-parallax pairs.
    _, _, Vt = jnp.linalg.svd(A)
    X = Vt[..., -1, :]  # right singular vector of smallest singular value
    w = X[..., 3:4]
    safe_w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return X[..., :3] / safe_w


def triangulate_points_multiview(projs, points2D, mask):
    """N-view DLT for one track, masked.

    projs: (V, 3, 4); points2D: (V, 2) normalized; mask: (V,) bool of valid
    observations. Returns (3,) world point. Invalid rows are zeroed out of
    the design matrix so the solve stays static-shape.
    """
    P1, P2, P3 = projs[:, 0, :], projs[:, 1, :], projs[:, 2, :]
    u = points2D[:, 0:1]
    v = points2D[:, 1:2]
    rows = jnp.concatenate([u * P3 - P1, v * P3 - P2], axis=0)  # (2V, 4)
    m = jnp.concatenate([mask, mask], axis=0)[:, None].astype(rows.dtype)
    rows = rows * m
    _, _, Vt = jnp.linalg.svd(rows, full_matrices=False)
    X = Vt[-1, :]
    w = X[3]
    safe_w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return X[:3] / safe_w


def calc_tri_angles(proj1, proj2, points3D):
    """Angle at each 3-D point between the rays to the two camera centers.

    Reference triangulation.cc:101-147 (law of cosines). points3D: (..., N, 3)
    -> (..., N) angles in radians.
    """
    R1 = proj1[..., :3, :3]
    t1 = proj1[..., :3, 3]
    R2 = proj2[..., :3, :3]
    t2 = proj2[..., :3, 3]
    c1 = -(jnp.swapaxes(R1, -1, -2) @ t1[..., :, None])[..., 0]
    c2 = -(jnp.swapaxes(R2, -1, -2) @ t2[..., :, None])[..., 0]

    baseline2 = jnp.sum((c1 - c2) ** 2, axis=-1)[..., None]
    ray1 = points3D - c1[..., None, :]
    ray2 = points3D - c2[..., None, :]
    d1_2 = jnp.sum(ray1 * ray1, axis=-1)
    d2_2 = jnp.sum(ray2 * ray2, axis=-1)
    d1 = jnp.sqrt(jnp.maximum(d1_2, 1e-20))
    d2 = jnp.sqrt(jnp.maximum(d2_2, 1e-20))
    cos_angle = (d1_2 + d2_2 - baseline2) / jnp.maximum(2.0 * d1 * d2, 1e-20)
    return jnp.arccos(jnp.clip(cos_angle, -1.0, 1.0))
