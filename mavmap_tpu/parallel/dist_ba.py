"""Distributed bundle adjustment over a jax.sharding.Mesh.

The TPU-native replacement for the reference's Ceres SPARSE_SCHUR CPU
threading (bundle_adjustment.cc:554-569), following SURVEY §7: shard the
OBSERVATIONS and 3-D POINTS across devices (they dominate problem size),
replicate the camera/pose parameters (small), and reduce the Schur
complement of the camera system with `psum` over the mesh axis — ICI
within a slice, DCN across hosts.

Partitioning is by 3-D point: every observation and every Schur
co-observation pair of a point lives on exactly ONE shard, so the
point-block solves and back-substitution are shard-local and the only
communication per LM iteration is:

    psum(U (I,6,6)), psum(bc (I,6)), psum(S_off (I,I,6,6)), psum(g_red),
    psum(scalar cost)

The whole LM loop (with its accept/reject control flow) runs inside
shard_map — the psum'd cost makes every shard take identical decisions, so
the loop stays collective-consistent without host round-trips.
"""

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ba.core import (
    BAProblem, DENSE_SOLVER_MAX_CAMERAS, _all_residuals,
    _gather_dense_points, _scatter_dense_points,
    _assemble_blocks, _backsub_points, _lm_step_cg,
)
from ..ops.rotation import rotmat_from_rvec


def partition_problem(
    poses, points, cam_params, cam_models,
    obs_image, obs_point, obs_cam, obs_uv,
    num_shards,
    pose_states=None, point_fixed=None,
    rot_prior=None, rot_prior_weight=None,
    with_pairs=True, bucket=False,
):
    """Host-side: split a BA problem into `num_shards` point-disjoint shards.

    Returns a BAProblem whose obs/pair arrays have a leading shard axis and
    whose `points` rows are permuted so each shard owns a contiguous,
    equally-sized block (padded with dummy points). Poses stay replicated.
    `obs_point` indices inside each shard refer to the GLOBAL (permuted)
    point row — points are sharded along their first axis, and XLA keeps
    each block device-local under shard_map.
    """
    from ..ba.core import build_problem

    obs_point = np.asarray(obs_point, np.int64)
    obs_image = np.asarray(obs_image, np.int32)
    obs_cam = np.asarray(obs_cam, np.int32)
    obs_uv = np.asarray(obs_uv, np.float32)
    P_n = len(points)

    # Balance points over shards by observation count: snake assignment
    # over the count-sorted order (0..S-1, S-1..0, ...) — O(P) vectorized;
    # the previous greedy-argmin loop was ~1M numpy argmin calls per
    # global BA at the 117k-point scale, for near-identical balance.
    pid_counts = np.bincount(obs_point, minlength=P_n)
    order = np.argsort(-pid_counts, kind="stable")
    cyc = np.arange(P_n) % (2 * num_shards)
    shard_of_rank = np.where(cyc < num_shards, cyc, 2 * num_shards - 1 - cyc)
    point_shard = np.empty(P_n, np.int32)
    point_shard[order] = shard_of_rank.astype(np.int32)

    # Permute points so each shard owns a contiguous block of equal size.
    counts = np.bincount(point_shard, minlength=num_shards)
    per_shard = int(counts.max()) if P_n else 1
    grouped = np.argsort(point_shard, kind="stable")  # pids grouped by shard
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos_in_shard = np.arange(P_n) - offsets[point_shard[grouped]]
    rows = point_shard[grouped].astype(np.int64) * per_shard + pos_in_shard
    new_index = np.full(P_n, -1, np.int64)
    new_index[grouped] = rows
    new_points = np.zeros((num_shards * per_shard, 3), np.float32)
    new_points[new_index] = points
    new_point_fixed = np.ones(num_shards * per_shard, bool)  # padding fixed
    new_point_fixed[new_index] = (
        point_fixed if point_fixed is not None else False
    )

    # Group observations per shard, padded to a common length. With
    # `bucket` the per-shard obs capacity (and the image/point dims inside
    # build_problem) round up to coarse quanta so repeated pipeline global
    # BAs hit the jit cache instead of recompiling per problem size.
    obs_shard = point_shard[obs_point]
    max_obs = int(np.max(np.bincount(obs_shard, minlength=num_shards)))
    if bucket:
        max_obs = max(((max_obs + 4095) // 4096) * 4096, 4096)

    def build_shard(s):
        sel = np.where(obs_shard == s)[0]
        oi = obs_image[sel]
        op = new_index[obs_point[sel]]
        oc = obs_cam[sel]
        uv = obs_uv[sel]
        return build_problem(
            poses, new_points, cam_params, cam_models, oi, op, oc, uv,
            pose_states=pose_states, point_fixed=new_point_fixed,
            rot_prior=rot_prior, rot_prior_weight=rot_prior_weight,
            obs_capacity=max_obs, with_pairs=with_pairs, bucket=bucket,
        )

    shards = [build_shard(s) for s in range(num_shards)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *shards)
    # Per-shard arrays keep the leading shard axis; replicated fields are
    # identical across shards (poses, cams, masks, priors, points).
    return stacked, new_index, per_shard


def _local_normal_terms(prob: BAProblem, poses, points_d, lam, scale, axis,
                        backend="xla"):
    """Shard-local contributions + psum-reduced camera system pieces
    (dense path: the Schur off-diagonal from per-(point, image)
    aggregation; points are shard-disjoint so each point's whole track —
    and hence its full outer product — is shard-local)."""
    from ..ba.core import _ptblk_agg

    I = poses.shape[0]
    U, Vinv, bp, G, T, g_red = _assemble_blocks(
        prob, poses, points_d, lam, scale, psum_axis=axis, backend=backend
    )

    # G/T are flat (O, 18) row-major 6x3 blocks (ba/colmath.py convention).
    That = _ptblk_agg(prob, T, I, prob.obs_image)
    Ghat = _ptblk_agg(prob, G, I, prob.obs_image)
    S_off = jnp.einsum("pbij,pckj->bcik", That, Ghat)
    S_off = jax.lax.psum(S_off, axis)

    S = jnp.zeros((I, I, 6, 6)).at[jnp.arange(I), jnp.arange(I)].set(U)
    S = S - S_off
    return S, g_red, G, Vinv, bp


def _dist_cost(prob: BAProblem, poses, points_d, scale, axis):
    r = _all_residuals(prob, poses, points_d)
    s = jnp.sum(r * r, axis=-1)
    c2 = scale * scale
    rho = c2 * jnp.log1p(s / c2)
    local = 0.5 * jnp.sum(jnp.where(prob.obs_mask, rho, 0.0))
    total = jax.lax.psum(local, axis)
    R = rotmat_from_rvec(poses[:, :3])
    R0 = rotmat_from_rvec(prob.rot_prior)
    w = prob.rot_prior_weight[:, None, None]
    rr = (w * (R - R0)).reshape(poses.shape[0], 9)
    return total + 0.5 * jnp.sum(rr * rr)


def _dist_lm_loop(prob: BAProblem, scale, lambda_init, max_iters, axis,
                  solver="dense", cg_max_iters=100, cg_tol=1e-3,
                  backend="xla"):
    I = prob.poses.shape[0]

    def lm_step(poses, points, lam, rel_prev):
        if solver == "cg":
            # Matrix-free Schur CG: no pair list, one (I,6)+(I,6,6) psum
            # per matvec — the path that scales past ~1k cameras.
            # Inexact-Newton forcing like the single-device _lm_loop:
            # loose CG while LM progress is large (rel_prev is psum-
            # consistent, so every shard picks the same tolerance).
            cg_tol_eff = jnp.where(
                jnp.float32(cg_tol) < 1e-4,  # strict request: honor it
                jnp.float32(cg_tol),
                jnp.clip(jnp.sqrt(rel_prev) * 0.3, jnp.float32(cg_tol),
                         jnp.float32(3e-2)))
            return _lm_step_cg(prob, poses, points, lam, scale,
                               cg_max_iters, cg_tol_eff, psum_axis=axis,
                               backend=backend)
        S, g_red, G, Vinv, bp = _local_normal_terms(
            prob, poses, points, lam, scale, axis, backend=backend
        )
        free = prob.pose_free.reshape(I * 6)
        Sd = S.transpose(0, 2, 1, 3).reshape(I * 6, I * 6)
        Sd = Sd * free[:, None] * free[None, :] + jnp.diag(1.0 - free)
        gd = g_red.reshape(I * 6) * free
        dc = -jnp.linalg.solve(Sd, gd).reshape(I, 6) * prob.pose_free
        dp = _backsub_points(prob, Vinv, bp, G, dc, backend=backend)
        return dc, dp

    def cond(state):
        _, _, _, it, done, _, _ = state
        return (it < max_iters) & (~done)

    def body(state):
        poses, points_d, lam, it, done, cost, rel_prev = state
        dc, dp = lm_step(poses, points_d, lam, rel_prev)
        new_poses = poses + dc
        new_points = points_d + dp
        new_cost = _dist_cost(prob, new_poses, new_points, scale, axis)
        accept = new_cost < cost
        poses = jnp.where(accept, new_poses, poses)
        points_d = jnp.where(accept, new_points, points_d)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 10.0), 1e-10, 1e8)
        rel = (cost - new_cost) / jnp.maximum(cost, 1e-20)
        done = accept & (rel < 1e-4)
        cost = jnp.where(accept, new_cost, cost)
        rel_prev = jnp.where(accept, jnp.maximum(rel, 1e-20), rel_prev)
        return (poses, points_d, lam, it + 1, done, cost, rel_prev)

    points_d0 = _gather_dense_points(prob, prob.points)
    init_cost = _dist_cost(prob, prob.poses, points_d0, scale, axis)
    state = (prob.poses, points_d0, jnp.float32(lambda_init), 0, False,
             init_cost, jnp.float32(1.0))
    poses, points_d, lam, it, done, cost, _ = jax.lax.while_loop(cond, body,
                                                                 state)
    points = _scatter_dense_points(prob, prob.points, points_d)
    return poses, points, cost, init_cost, it


def dist_bundle_adjust(mesh, stacked_prob: BAProblem, scale=1.0,
                       lambda_init=1e-4, max_iters=20, axis="obs",
                       solver="auto", cg_max_iters=100, cg_tol=1e-3,
                       per_shard=None, backend="auto"):
    """Run the distributed LM loop over `mesh` (1-D, axis name `axis`).

    stacked_prob: BAProblem from `partition_problem` — obs/pair arrays have
    a leading shard axis (sharded over the mesh); poses/points/cams are
    replicated inputs, with `points` rows blocked per shard so each shard
    updates only its own block (combined with psum of zeros elsewhere).
    per_shard: the point-block size partition_problem returned. REQUIRED
    when the problem was built with bucket=True (the points array then
    carries padding rows, so recomputing the block size from its shape
    would shift the ownership ranges and drop solved rows from the psum).
    Returns (poses, points, final_cost, initial_cost, iters).
    """
    n = mesh.devices.size
    if per_shard is None:
        per_shard = (stacked_prob.points.shape[1] // n
                     if stacked_prob.points.ndim == 3
                     else stacked_prob.points.shape[0] // n)
    if solver == "auto":
        ncams = stacked_prob.poses.shape[-2]
        solver = "cg" if ncams >= DENSE_SOLVER_MAX_CAMERAS else "dense"

    if backend == "auto":
        # Pallas segment-reduction kernels when the MESH devices are TPU
        # (the mesh platform, not the default backend, decides where the
        # shard_map executables run).
        backend = ("pallas"
                   if mesh.devices.flatten()[0].platform == "tpu"
                   else "xla")
    fn = _dist_ba_fn(mesh, axis, solver, float(scale), float(lambda_init),
                     int(max_iters), int(cg_max_iters), float(cg_tol),
                     int(per_shard), backend)
    return fn(stacked_prob)


@lru_cache(maxsize=32)
def _dist_ba_fn(mesh, axis, solver, scale, lambda_init, max_iters,
                cg_max_iters, cg_tol, per_shard, backend="xla"):
    """Cached jit(shard_map) wrapper: jit handles shape polymorphism; this
    cache keeps one traced wrapper per (mesh, solver config) so repeated
    pipeline global BAs don't re-trace the whole LM loop."""

    def shard_fn(prob_local):
        # prob_local: leading shard axis of size 1 for per-shard arrays.
        prob_local = jax.tree.map(lambda x: x[0], prob_local)
        poses, points, cost, init_cost, it = _dist_lm_loop(
            prob_local, jnp.float32(scale), lambda_init, max_iters, axis,
            solver=solver, cg_max_iters=cg_max_iters, cg_tol=cg_tol,
            backend=backend,
        )
        # Points: each shard owns rows [rank*per, (rank+1)*per). Zero the
        # others and psum -> full array (then output replicated).
        rank = jax.lax.axis_index(axis)
        rows = jnp.arange(points.shape[0])
        own = (rows >= rank * per_shard) & (rows < (rank + 1) * per_shard)
        points_own = jnp.where(own[:, None], points, 0.0)
        points_full = jax.lax.psum(points_own, axis)
        return poses, points_full, cost, init_cost, it

    spec_tree = BAProblem(*([P(axis)] * len(BAProblem._fields)))
    return jax.jit(jax.shard_map(
        shard_fn, mesh=mesh, in_specs=(spec_tree,),
        out_specs=(P(), P(), P(), P(), P()), check_vma=False,
    ))
