"""4-point DLT homography estimation (degeneracy gate for view pairs).

TPU-native counterpart of reference src/base3d/projective_transform.{h,cc}.
Used only to reject image pairs with too little viewpoint change: if too
many matches fit a homography the pair is near-degenerate for two-view
geometry (reference sfm/sequential_mapper.cc:116-158).
"""

import jax.numpy as jnp


def solve_homography(src, dst):
    """Minimal/overdetermined DLT from (S, 2) <-> (S, 2) normalized points.

    Returns ((1, 3, 3) models, (1,) mask) — the RANSAC estimator contract
    (one candidate per sample). Reference projective_transform.cc:12-45.
    """
    S = src.shape[0]
    u, v = src[:, 0], src[:, 1]
    x, y = dst[:, 0], dst[:, 1]
    zero = jnp.zeros_like(u)
    one = jnp.ones_like(u)
    rows1 = jnp.stack([u, v, one, zero, zero, zero, -u * x, -v * x, -x], axis=-1)
    rows2 = jnp.stack([zero, zero, zero, u, v, one, -u * y, -v * y, -y], axis=-1)
    A = jnp.concatenate([rows1, rows2], axis=0)  # (2S, 9)
    AtA = A.T @ A
    eigvals, vecs = jnp.linalg.eigh(AtA)
    h = vecs[:, 0]
    H = h.reshape(3, 3)
    # Normalize by the largest-magnitude entry (H is scale-free).
    H = H / jnp.where(jnp.abs(H[2, 2]) < 1e-12, 1.0, H[2, 2])
    # Degenerate sample -> near-zero smallest gap; mark invalid if the
    # nullspace is not isolated (eig 0 ~ eig 1).
    ok = jnp.isfinite(H).all()
    return H[None], ok[None]


def homography_residuals(src, dst, H):
    """Transfer error ||proj(H src) - dst|| per point, (N,)."""
    ones = jnp.ones_like(src[:, :1])
    ph = jnp.concatenate([src, ones], axis=-1) @ H.T
    w = ph[:, 2:3]
    safe_w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    proj = ph[:, :2] / safe_w
    return jnp.linalg.norm(proj - dst, axis=-1)
