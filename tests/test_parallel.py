"""Multi-device tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from mavmap_tpu.ba import (
    BAOptions,
    BA_POSE_FIXED,
    BA_POSE_FIXED_X,
    build_problem,
    bundle_adjust,
)
from mavmap_tpu.models import camera as cam
from mavmap_tpu.ops.rotation import rotmat_from_rvec
from mavmap_tpu.parallel import (
    dist_bundle_adjust,
    dist_match_pairs,
    partition_problem,
)


def _ba_problem(rng, I=6, P=200, noise=0.3):
    K = np.zeros((1, 9), np.float32)
    K[0, :4] = [700.0, 700.0, 400.0, 300.0]
    X = rng.normal(size=(P, 3)) * np.array([4, 4, 2]) + np.array([0, 0, 12])
    poses = np.stack([
        np.concatenate([rng.normal(size=3) * 0.05,
                        [i * 0.8, 0, 0] + rng.normal(size=3) * 0.05])
        for i in range(I)
    ]).astype(np.float32)
    obs_img, obs_pt, obs_uv = [], [], []
    for i in range(I):
        R = np.asarray(rotmat_from_rvec(jnp.asarray(poses[i, :3])))
        Xc = X @ R.T + poses[i, 3:]
        uv = np.asarray(cam.world2image(jnp.asarray(Xc, jnp.float32),
                                        cam.PINHOLE, jnp.asarray(K[0])))
        obs_img += [i] * P
        obs_pt += list(range(P))
        obs_uv += list(uv)
    obs_uv = np.asarray(obs_uv) + rng.normal(size=(len(obs_img), 2)) * noise
    states = [BA_POSE_FIXED, BA_POSE_FIXED_X] + [0] * (I - 2)
    poses0 = poses.copy()
    poses0[2:] += rng.normal(size=poses0[2:].shape) * 0.01
    X0 = X + rng.normal(size=X.shape) * 0.05
    return (K, poses0, X0, np.array(obs_img), np.array(obs_pt), obs_uv, states)


def test_dist_ba_matches_single_device(rng, cpu_devices):
    K, poses0, X0, obs_img, obs_pt, obs_uv, states = _ba_problem(rng)
    prob = build_problem(poses0, X0, K, [1], obs_img, obs_pt,
                         np.zeros_like(obs_img), obs_uv, pose_states=states)
    p1, x1, info = bundle_adjust(prob, BAOptions(max_num_iterations=15))

    stacked, new_index, per_shard = partition_problem(
        poses0, X0, K, np.array([1], np.int32), obs_img, obs_pt,
        np.zeros_like(obs_img), obs_uv, num_shards=8, pose_states=states)
    mesh = Mesh(np.array(cpu_devices), ("obs",))
    p2, x2, cost, init_cost, iters = dist_bundle_adjust(mesh, stacked,
                                                        max_iters=15)
    assert float(cost) < float(init_cost)
    assert np.abs(np.asarray(p2) - np.asarray(p1)).max() < 1e-4
    x2n = np.asarray(x2)[new_index]
    assert np.abs(x2n - np.asarray(x1)).max() < 1e-3


def test_dist_ba_respects_gauge(rng, cpu_devices):
    K, poses0, X0, obs_img, obs_pt, obs_uv, states = _ba_problem(rng, I=4, P=96)
    stacked, new_index, per_shard = partition_problem(
        poses0, X0, K, np.array([1], np.int32), obs_img, obs_pt,
        np.zeros_like(obs_img), obs_uv, num_shards=4, pose_states=states)
    mesh = Mesh(np.array(cpu_devices[:4]), ("obs",))
    p2, x2, cost, ic, it = dist_bundle_adjust(mesh, stacked, max_iters=10)
    p2 = np.asarray(p2)
    assert np.abs(p2[0] - poses0[0]).max() == 0.0          # FIXED
    assert p2[1, 3] == poses0[1, 3]                        # FIXED_X


def test_dist_match_pairs(rng, cpu_devices):
    mesh = Mesh(np.array(cpu_devices), ("obs",))
    B, F, D = 16, 64, 32
    d1 = rng.normal(size=(B, F, D)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    perm = np.stack([rng.permutation(F) for _ in range(B)])
    d2 = np.take_along_axis(d1, perm[:, :, None], axis=1)
    d2 = d2 + rng.normal(size=d2.shape).astype(np.float32) * 0.01
    matches, valid = dist_match_pairs(
        mesh, jnp.asarray(d1), jnp.asarray(d2),
        jnp.ones((B, F), bool), jnp.ones((B, F), bool),
    )
    matches = np.asarray(matches)
    valid = np.asarray(valid)
    inv = np.argsort(perm, axis=1)
    # matched index should equal inverse permutation where valid
    for b in range(B):
        rows = np.where(valid[b])[0]
        assert len(rows) > F * 0.9
        assert (matches[b, rows] == inv[b][rows]).all()


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(4)


def test_dist_ba_cg_matches_single_device(rng, cpu_devices):
    """Distributed matrix-free Schur-CG (no pair list) matches the exact
    single-device dense solve."""
    K, poses0, X0, obs_img, obs_pt, obs_uv, states = _ba_problem(rng)
    prob = build_problem(poses0, X0, K, [1], obs_img, obs_pt,
                         np.zeros_like(obs_img), obs_uv, pose_states=states)
    p1, x1, info = bundle_adjust(prob, BAOptions(max_num_iterations=15,
                                                 solver="dense"))

    stacked, new_index, per_shard = partition_problem(
        poses0, X0, K, np.array([1], np.int32), obs_img, obs_pt,
        np.zeros_like(obs_img), obs_uv, num_shards=8, pose_states=states,
        with_pairs=False)
    assert stacked.pair_a.shape[-1] == 0
    mesh = Mesh(np.array(cpu_devices), ("obs",))
    p2, x2, cost, init_cost, iters = dist_bundle_adjust(
        mesh, stacked, max_iters=15, solver="cg", cg_tol=1e-6)
    assert float(cost) < float(init_cost)
    assert np.abs(np.asarray(p2) - np.asarray(p1)).max() < 1e-4
    x2n = np.asarray(x2)[new_index]
    assert np.abs(x2n - np.asarray(x1)).max() < 1e-3


def test_multihost_helpers_single_process(rng, cpu_devices):
    """Single-process semantics of the multi-host helpers (multi-process
    behavior uses the same jax APIs; here process_count == 1)."""
    from mavmap_tpu.parallel import (
        init_multihost, global_mesh, host_local_to_global,
        process_shard_bounds,
    )

    pid, n = init_multihost()
    assert pid == 0 and n == 1
    mesh = global_mesh()
    assert mesh.devices.size == len(jax.devices())
    lo, hi = process_shard_bounds(mesh.devices.size * 4, mesh)
    assert (lo, hi) == (0, mesh.devices.size * 4)

    arr = rng.normal(size=(mesh.devices.size * 2, 3)).astype(np.float32)
    garr = host_local_to_global(mesh, arr)
    assert garr.shape == arr.shape
    assert np.allclose(np.asarray(garr), arr)
    # Sharded along the leading axis over the mesh.
    assert len(garr.addressable_shards) == mesh.devices.size


def test_dist_ba_rotation_priors_match_single_device(rng, cpu_devices):
    """IMU rotation priors are replicated data added once after the psum —
    the sharded solve must match the single-device one with priors on."""
    K, poses0, X0, obs_img, obs_pt, obs_uv, states = _ba_problem(rng, I=5, P=120)
    rot_prior = poses0[:, :3] + 0.01
    rw = np.full(5, 10.0, np.float32)
    prob = build_problem(poses0, X0, K, [1], obs_img, obs_pt,
                         np.zeros_like(obs_img), obs_uv, pose_states=states,
                         rot_prior=rot_prior, rot_prior_weight=rw)
    p1, x1, info = bundle_adjust(prob, BAOptions(max_num_iterations=12,
                                                 solver="dense"))
    stacked, new_index, per_shard = partition_problem(
        poses0, X0, K, np.array([1], np.int32), obs_img, obs_pt,
        np.zeros_like(obs_img), obs_uv, num_shards=4, pose_states=states,
        rot_prior=rot_prior, rot_prior_weight=rw, with_pairs=False)
    mesh = Mesh(np.array(cpu_devices[:4]), ("obs",))
    p2, x2, cost, ic, it = dist_bundle_adjust(mesh, stacked, max_iters=12,
                                              solver="cg", cg_tol=1e-6)
    assert np.abs(np.asarray(p2) - np.asarray(p1)).max() < 1e-4
