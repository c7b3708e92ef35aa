"""Fused descriptor-matching kernel: one pass, both directions, on-chip.

The descriptor distance matrix is a matmul in disguise
(||a-b||^2 = ||a||^2 + ||b||^2 - 2 a.b) and its 2-NN reduction is the
bandwidth hog: materializing an (N1, N2) f32 matrix in HBM costs
N1*N2*4 bytes of write+read that this kernel never spends — each
(TILE_M, N2) tile lives only in VMEM, feeding the MXU for the cross terms
and the VPU for the running top-2 reductions.

Unlike the reference's two sequential BFMatcher passes
(src/base2d/feature.cc:52-133), ONE pass over the distance tiles produces
the 2-NN statistics of BOTH directions: per-row top-2 falls out of the
tile directly, per-column top-2 is a running (2, N2) reduction carried in
VMEM across the row-tile grid. The optional pixel-distance prefilter
(max_distance_mask_, feature.cc:23-49) is fused in as a second tiny
matmul over the (x, y) keypoint coordinates.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 128
BIG = 1e30  # mask penalty: "infinitely far" while staying finite in f32


def _match_kernel(use_kp, refs):
    if use_kp:
        (d1_ref, rowpen_ref, d2_ref, pen2_ref, kp1_ref, kp2_ref, maxd_ref,
         row_arg_ref, row_d2_ref, col_arg_ref, col_d2_ref) = refs
    else:
        (d1_ref, rowpen_ref, d2_ref, pen2_ref,
         row_arg_ref, row_d2_ref, col_arg_ref, col_d2_ref) = refs

    i = pl.program_id(0)
    d1 = d1_ref[:]
    n1sq = jnp.sum(d1 * d1, axis=1, keepdims=True)  # (TILE_M, 1)
    cross = jax.lax.dot_general(
        d1,
        d2_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TILE_M, N2)
    # pen2 = ||d2||^2 + column mask penalty; clamp like the XLA path
    # (max(d, 0)) — the >=BIG penalties pass through the clamp untouched.
    dist = jnp.maximum(n1sq + pen2_ref[0, :][None, :] - 2.0 * cross, 0.0)
    dist = dist + rowpen_ref[:, 0][:, None]

    if use_kp:
        kp1 = kp1_ref[:]
        kp2 = kp2_ref[:]
        k1sq = jnp.sum(kp1 * kp1, axis=1, keepdims=True)
        k2sq = jnp.sum(kp2 * kp2, axis=1)[None, :]
        kcross = jax.lax.dot_general(
            kp1,
            kp2,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sep = k1sq + k2sq - 2.0 * kcross
        dist = jnp.where(sep <= maxd_ref[0, 0], dist, BIG)

    m, n2 = dist.shape

    # Row direction (d1 -> d2): per-row best/second + argmin.
    r_arg = jnp.argmin(dist, axis=1).astype(jnp.int32)
    r_best = jnp.min(dist, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m, n2), 1)
    r_second = jnp.min(jnp.where(cols == r_arg[:, None], jnp.inf, dist), axis=1)
    row_arg_ref[:, 0] = r_arg
    row_d2_ref[:, 0] = r_best
    row_d2_ref[:, 1] = r_second

    # Column direction (d2 -> d1): this tile's contribution, merged into the
    # running (2, N2) top-2 carried in VMEM across grid steps.
    t_arg_local = jnp.argmin(dist, axis=0).astype(jnp.int32)
    t_best = jnp.min(dist, axis=0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, n2), 0)
    t_second = jnp.min(
        jnp.where(rows == t_arg_local[None, :], jnp.inf, dist), axis=0
    )
    t_arg = i * TILE_M + t_arg_local

    @pl.when(i == 0)
    def _init():
        col_d2_ref[0, :] = t_best
        col_d2_ref[1, :] = t_second
        col_arg_ref[0, :] = t_arg

    @pl.when(i > 0)
    def _merge():
        rb = col_d2_ref[0, :]
        rs = col_d2_ref[1, :]
        ra = col_arg_ref[0, :]
        # Strict < keeps the earlier (lower-index) winner on ties, matching
        # jnp.argmin's first-index semantics.
        col_d2_ref[0, :] = jnp.minimum(rb, t_best)
        col_d2_ref[1, :] = jnp.minimum(jnp.maximum(rb, t_best),
                                       jnp.minimum(rs, t_second))
        col_arg_ref[0, :] = jnp.where(t_best < rb, t_arg, ra)


def _match_pallas_raw(d1, rowpen, d2, pen2, kp1=None, kp2=None,
                      max_distance=None):
    """Both-direction 2-NN over masked, prefiltered distances.

    Returns (row_arg (N1,), row_best, row_second, col_arg (N2,), col_best,
    col_second) — true squared L2 distances (clamped at 0, BIG where
    masked/prefiltered). N1 must be a multiple of TILE_M, N2 of 128.
    """
    N1, D = d1.shape
    N2 = d2.shape[0]
    use_kp = kp1 is not None
    grid = (N1 // TILE_M,)

    in_specs = [
        pl.BlockSpec((TILE_M, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_M, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((N2, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N2), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [d1.astype(jnp.float32), rowpen, d2.astype(jnp.float32), pen2]
    if use_kp:
        in_specs += [
            pl.BlockSpec((TILE_M, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N2, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ]
        args += [
            kp1.astype(jnp.float32),
            kp2.astype(jnp.float32),
            jnp.full((1, 1), jnp.float32(max_distance) ** 2, jnp.float32),
        ]

    flops = 2 * N1 * N2 * D + (2 * N1 * N2 * 2 if use_kp else 0)
    row_arg, row_d2, col_arg, col_d2 = pl.pallas_call(
        lambda *refs: _match_kernel(use_kp, refs),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((TILE_M, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, N2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N1, 1), jnp.int32),
            jax.ShapeDtypeStruct((N1, 2), jnp.float32),
            jax.ShapeDtypeStruct((1, N2), jnp.int32),
            jax.ShapeDtypeStruct((2, N2), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(N1 * D + N2 * D + N1 * 13 + N2 * 13) * 4,
            transcendentals=0,
        ),
    )(*args)
    return (row_arg[:, 0], row_d2[:, 0], row_d2[:, 1],
            col_arg[0, :], col_d2[0, :], col_d2[1, :])


def match_brute_force_pallas(
    d1, d2, mask1=None, mask2=None, kp1=None, kp2=None, ratio=0.9,
    max_distance=None, cross_check=True,
):
    """Fused drop-in for ops.matching.match_brute_force (same semantics:
    2-NN + Lowe ratio both directions, symmetric cross-check, optional
    pixel-distance prefilter). Ragged capacities are padded to the kernel
    tile (N1 -> TILE_M multiple, N2 -> 128 multiple) with masked-out rows/
    columns, so ANY provider capacity takes the Pallas path.
    """
    N1_in, N2_in = d1.shape[0], d2.shape[0]
    M1 = -(-N1_in // TILE_M) * TILE_M
    M2 = -(-N2_in // 128) * 128
    if M1 != N1_in or M2 != N2_in:
        if mask1 is None:
            mask1 = jnp.ones(N1_in, bool)
        if mask2 is None:
            mask2 = jnp.ones(N2_in, bool)
        pad1, pad2 = M1 - N1_in, M2 - N2_in
        d1 = jnp.pad(d1, ((0, pad1), (0, 0)))
        d2 = jnp.pad(d2, ((0, pad2), (0, 0)))
        mask1 = jnp.pad(mask1, (0, pad1))  # False: BIG row penalty
        mask2 = jnp.pad(mask2, (0, pad2))  # False: BIG column penalty
        if kp1 is not None:
            kp1 = jnp.pad(kp1, ((0, pad1), (0, 0)))
        if kp2 is not None:
            kp2 = jnp.pad(kp2, ((0, pad2), (0, 0)))
    N1 = d1.shape[0]
    rowpen = (
        jnp.where(mask1, 0.0, BIG).astype(jnp.float32)[:, None]
        if mask1 is not None else jnp.zeros((N1, 1), jnp.float32)
    )
    n2sq = jnp.sum(d2.astype(jnp.float32) ** 2, axis=1)
    if mask2 is not None:
        n2sq = n2sq + jnp.where(mask2, 0.0, BIG)
    pen2 = n2sq[None, :]

    use_kp = (max_distance is not None and kp1 is not None and kp2 is not None)
    row_arg, r_best, r_second, col_arg, c_best, c_second = _match_pallas_raw(
        d1, rowpen, d2, pen2,
        kp1 if use_kp else None, kp2 if use_kp else None,
        max_distance if use_kp else None,
    )

    r2 = ratio * ratio
    ok = (r_best < r2 * r_second) & (r_best < BIG * 0.1)
    if cross_check:
        mutual = col_arg[row_arg] == jnp.arange(N1)
        col_ok = c_best < r2 * c_second
        ok = ok & mutual & col_ok[row_arg]
    if mask1 is not None:
        ok = ok & mask1
    matches = jnp.where(ok, row_arg, -1).astype(jnp.int32)
    return matches[:N1_in], ok[:N1_in]
