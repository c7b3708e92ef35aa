"""Brute-force descriptor matching as one MXU matmul + fused selection.

TPU-native counterpart of reference src/base2d/feature.cc:52-133
(`match_brute_force`): 2-NN matching in both directions with Lowe ratio
test, symmetric cross-check, and an optional pixel-distance prefilter
(`max_distance_mask_`, feature.cc:23-49). The reference runs OpenCV's
BFMatcher twice; here the squared L2 distance matrix is a single matmul
(||a - b||^2 = ||a||^2 + ||b||^2 - 2 a.b — MXU-friendly), and the 2-NN /
ratio / cross-check logic is a handful of row/column reductions that XLA
fuses into the matmul epilogue.

Fixed-capacity convention: descriptor buffers are padded to a static size
with validity masks; invalid rows never match.
"""

from functools import partial

import jax
import jax.numpy as jnp


def distance_matrix_sq(d1, d2):
    """Squared L2 distances. d1: (N1, D), d2: (N2, D) -> (N1, N2).

    bf16 inputs are fine for SURF-style descriptors; accumulate in f32.
    """
    n1 = jnp.sum(d1.astype(jnp.float32) ** 2, axis=-1)
    n2 = jnp.sum(d2.astype(jnp.float32) ** 2, axis=-1)
    cross = jax.lax.dot_general(
        d1,
        d2,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d = n1[:, None] + n2[None, :] - 2.0 * cross
    return jnp.maximum(d, 0.0)


@partial(jax.jit, static_argnames=("cross_check",))
def match_brute_force(
    d1,
    d2,
    mask1=None,
    mask2=None,
    kp1=None,
    kp2=None,
    ratio=0.9,
    max_distance=None,
    cross_check=True,
):
    """2-NN ratio-test matching with symmetric cross-check.

    d1: (N1, D), d2: (N2, D) descriptors (padded, masked); kp1/kp2 optional
    (N, 2) keypoint coords for the pixel-distance prefilter. Returns
    (matches (N1,) int32 -> index into d2 or -1, valid (N1,) bool).

    Semantics match reference feature.cc:52-133: a pair (i, j) survives if
    j is i's nearest neighbor passing the ratio test in 1->2, i is j's
    nearest neighbor passing the ratio test in 2->1 (cross_check), and the
    keypoints are within max_distance pixels.
    """
    N1, N2 = d1.shape[0], d2.shape[0]
    big = jnp.float32(jnp.inf)
    D = distance_matrix_sq(d1, d2)
    if mask1 is not None:
        D = jnp.where(mask1[:, None], D, big)
    if mask2 is not None:
        D = jnp.where(mask2[None, :], D, big)
    if max_distance is not None and kp1 is not None and kp2 is not None:
        sep = (
            jnp.sum(kp1.astype(jnp.float32) ** 2, axis=-1)[:, None]
            + jnp.sum(kp2.astype(jnp.float32) ** 2, axis=-1)[None, :]
            - 2.0
            * jax.lax.dot_general(
                kp1,
                kp2,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
        D = jnp.where(sep <= max_distance * max_distance, D, big)

    # Row direction 1->2: best + runner-up via masked second pass.
    j_best = jnp.argmin(D, axis=1)  # (N1,)
    d_best = jnp.take_along_axis(D, j_best[:, None], axis=1)[:, 0]
    row_ids = jnp.arange(N2)[None, :]
    D_wo_best = jnp.where(row_ids == j_best[:, None], big, D)
    d_second = jnp.min(D_wo_best, axis=1)

    # Ratio test on L2 distances (reference compares d1 < ratio * d2 on
    # unsquared distances; squared form: d1 < ratio^2 * d2).
    ok = d_best < (ratio * ratio) * d_second
    ok = ok & jnp.isfinite(d_best)

    if cross_check:
        # Column direction 2->1: i must be j's best, with its own ratio test.
        i_best = jnp.argmin(D, axis=0)  # (N2,)
        col_ids = jnp.arange(N1)[:, None]
        D_wo_cbest = jnp.where(col_ids == i_best[None, :], big, D)
        c_second = jnp.min(D_wo_cbest, axis=0)
        c_best = jnp.take_along_axis(D, i_best[None, :], axis=0)[0, :]
        col_ok = c_best < (ratio * ratio) * c_second
        mutual = i_best[j_best] == jnp.arange(N1)
        ok = ok & mutual & col_ok[j_best]

    matches = jnp.where(ok, j_best, -1)
    return matches.astype(jnp.int32), ok


def match_features(
    d1, d2, mask1=None, mask2=None, kp1=None, kp2=None, ratio=0.9,
    max_distance=None, backend="xla",
):
    """Backend dispatch for brute-force matching.

    backend: 'xla' (fused by the XLA compiler, any shape) or 'pallas'
    (hand-fused single-pass kernel, ops/pallas/match.py; ragged shapes
    are tile-padded inside the wrapper, so any N1/N2 works). Semantics
    are identical; tests assert equality.
    """
    if backend == "pallas":
        from .pallas.match import match_brute_force_pallas

        return match_brute_force_pallas(
            d1, d2, mask1, mask2, kp1, kp2, ratio=ratio,
            max_distance=max_distance,
        )
    return match_brute_force(
        d1, d2, mask1, mask2, kp1, kp2, ratio=ratio,
        max_distance=max_distance,
    )


def median_feature_disparity(kp1, kp2, matches, valid):
    """Median keypoint displacement over matches (view-change gate).

    Reference feature.cc:136-151. Invalid entries are excluded by setting
    them to NaN and using nanmedian-free masking: sort with +inf padding.
    """
    kp2_matched = kp2[jnp.maximum(matches, 0)]
    disp = jnp.linalg.norm(kp2_matched - kp1, axis=-1)
    disp = jnp.where(valid, disp, jnp.inf)
    n = jnp.sum(valid)
    sorted_disp = jnp.sort(disp)
    # median over the first n entries (n is traced): index (n-1)//2 and n//2.
    lo = sorted_disp[jnp.maximum((n - 1) // 2, 0)]
    hi = sorted_disp[jnp.maximum(n // 2, 0)]
    med = 0.5 * (lo + hi)
    return jnp.where(n > 0, med, 0.0)
