"""Fused descriptor-matching kernel: tiled L2 distances + 2-NN on-chip.

The descriptor distance matrix is a matmul in disguise
(||a-b||^2 = ||a||^2 + ||b||^2 - 2 a.b) and its 2-NN reduction is the
bandwidth hog: materializing an (N1, N2) f32 matrix in HBM costs
N1*N2*4 bytes of write+read that this kernel never spends — each
(TILE_M, N2) tile lives only in VMEM, feeding the MXU for the cross terms
and the VPU for the running top-2 reduction.

One direction per call (best index + best/second distances per row);
`match_brute_force` composes two calls for the symmetric cross-check like
the reference's two BFMatcher passes (feature.cc:52-133).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 128


def _nn2_kernel(d1_ref, d2_ref, n2sq_ref, best_ref, dist2_ref):
    """One row-tile: distances to ALL of d2, top-2 + argmin per row.

    d1_ref: (TILE_M, D) this tile's query descriptors;
    d2_ref: (N2, D) full database (VMEM-resident across grid steps);
    n2sq_ref: (1, N2) database squared norms;
    best_ref: (TILE_M, 1) int32 argmin;
    dist2_ref: (TILE_M, 2) best/second squared distances (un-offset by
    query norms — callers add ||a||^2 which does not affect ranking).
    """
    d1 = d1_ref[:]
    cross = jax.lax.dot_general(
        d1,
        d2_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TILE_M, N2)
    dist = n2sq_ref[0, :][None, :] - 2.0 * cross

    best = jnp.min(dist, axis=1)
    arg = jnp.argmin(dist, axis=1).astype(jnp.int32)
    n2 = dist.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (dist.shape[0], n2), 1)
    masked = jnp.where(cols == arg[:, None], jnp.inf, dist)
    second = jnp.min(masked, axis=1)

    best_ref[:, 0] = arg
    dist2_ref[:, 0] = best
    dist2_ref[:, 1] = second


@partial(jax.jit, static_argnames=())
def nn2_pallas(d1, d2):
    """(N1, D), (N2, D) -> (argmin (N1,), best (N1,), second (N1,)).

    Distances are squared L2 minus ||d1||^2 (constant per row — ranking,
    ratio tests, and thresholds applied by callers must add n1sq).
    N1 must be a multiple of TILE_M; N2 a multiple of 128.
    """
    N1, D = d1.shape
    N2 = d2.shape[0]
    n2sq = jnp.sum(d2.astype(jnp.float32) ** 2, axis=1)[None, :]

    grid = (N1 // TILE_M,)
    best, dist2 = pl.pallas_call(
        _nn2_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_M, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N2, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_M, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N1, 1), jnp.int32),
            jax.ShapeDtypeStruct((N1, 2), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * N1 * N2 * D,
            bytes_accessed=(N1 * D + N2 * D + N1 * 12) * 4,
            transcendentals=0,
        ),
    )(d1.astype(jnp.float32), d2.astype(jnp.float32), n2sq)
    return best[:, 0], dist2[:, 0], dist2[:, 1]


def match_brute_force_pallas(d1, d2, mask1=None, mask2=None, ratio=0.9):
    """Drop-in fused replacement for ops.matching.match_brute_force
    (without the pixel-distance prefilter; masks handled by offsetting
    invalid rows to +inf-like large distances).

    Requires N1, N2 multiples of 128 (the provider capacity convention).
    """
    N1, D = d1.shape
    N2 = d2.shape[0]
    big = jnp.float32(1e30)

    # Invalid database rows: push far away by inflating their norms.
    if mask2 is not None:
        d2 = jnp.where(mask2[:, None], d2, 1e3)
    j_best, b1, s1 = nn2_pallas(d1, d2)
    # b1, s1 are offset by -||d1||^2: d = ||a||^2 + b. Ratio test on true
    # distances: (n1sq + b1) < r^2 (n1sq + s1).
    n1sq = jnp.sum(d1.astype(jnp.float32) ** 2, axis=1)
    ok = (n1sq + b1) < (ratio * ratio) * (n1sq + s1)
    ok = ok & ((n1sq + b1) < big)
    if mask1 is not None:
        ok = ok & mask1

    # Reverse direction for the cross-check.
    if mask1 is not None:
        d1r = jnp.where(mask1[:, None], d1, 1e3)
    else:
        d1r = d1
    i_best, b2, s2 = nn2_pallas(d2, d1r)
    n2sq_q = jnp.sum(d2.astype(jnp.float32) ** 2, axis=1)
    col_ok = (n2sq_q + b2) < (ratio * ratio) * (n2sq_q + s2)
    mutual = i_best[j_best] == jnp.arange(N1)
    ok = ok & mutual & col_ok[j_best]

    matches = jnp.where(ok, j_best, -1).astype(jnp.int32)
    return matches, ok
