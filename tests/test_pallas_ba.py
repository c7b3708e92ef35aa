"""Pallas BA segment-accumulation kernels vs the XLA reference path.

Runs in Pallas interpret mode on CPU (compiled mode is exercised on TPU by
benchmarks/ba_assembly_profile.py and bench.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mavmap_tpu.ba import BAOptions, build_problem, bundle_adjust
from mavmap_tpu.ba.core import (
    _assemble_blocks, _gather_dense_points, _lm_step_cg,
)
from mavmap_tpu.ops.pallas.ba_accum import seg_accum_full, seg_accum_sorted


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def test_seg_accum_full_matches_segment_sum(rng):
    O, K, S = 5000, 42, 37
    c = rng.normal(size=(O, K)).astype(np.float32)
    ids = rng.integers(0, S, size=O).astype(np.int32)
    ref = jax.ops.segment_sum(jnp.asarray(c), jnp.asarray(ids), num_segments=S)
    got = seg_accum_full(jnp.asarray(c), jnp.asarray(ids), S, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_seg_accum_full_empty_segments(rng):
    # Segments with no hits must come out exactly zero.
    c = rng.normal(size=(100, 3)).astype(np.float32)
    ids = np.full(100, 5, np.int32)
    got = seg_accum_full(jnp.asarray(c), jnp.asarray(ids), 9, interpret=True)
    assert np.all(np.asarray(got)[[0, 1, 2, 3, 4, 6, 7, 8]] == 0.0)
    np.testing.assert_allclose(np.asarray(got)[5], c.sum(0), rtol=1e-5)


def test_seg_accum_sorted_matches_segment_sum(rng):
    # Random track lengths, gapless sorted ids.
    Pn = 2300
    lens = rng.integers(1, 9, size=Pn)
    ids = np.repeat(np.arange(Pn), lens).astype(np.int32)
    c = rng.normal(size=(len(ids), 12)).astype(np.float32)
    ref = jax.ops.segment_sum(jnp.asarray(c), jnp.asarray(ids),
                              num_segments=Pn + 20)
    got = seg_accum_sorted(jnp.asarray(c), jnp.asarray(ids), Pn + 20,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_seg_accum_sorted_segment_straddles_tiles(rng):
    # One segment spanning several TILE boundaries exercises the carry chain.
    ids = np.concatenate([
        np.zeros(3000, np.int32),
        np.repeat(np.arange(1, 50, dtype=np.int32), 7),
    ])
    c = rng.normal(size=(len(ids), 4)).astype(np.float32)
    ref = jax.ops.segment_sum(jnp.asarray(c), jnp.asarray(ids), num_segments=50)
    got = seg_accum_sorted(jnp.asarray(c), jnp.asarray(ids), 50, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def _make_problem(rng, I=6, P=300, refine=False):
    from benchmarks.ba_scale import make

    poses, X, K, oi, op, uv, states = make(I, P, obs_per_img=120)
    poses0 = poses.copy()
    poses0[2:] += rng.normal(size=poses0[2:].shape).astype(np.float32) * 0.01
    X0 = (X + rng.normal(size=X.shape).astype(np.float32) * 0.05)
    return build_problem(poses0, X0, K, [1], oi, op, np.zeros_like(oi), uv,
                         pose_states=states, with_pairs=False)


def test_assemble_blocks_pallas_matches_xla(rng):
    prob = _make_problem(rng)
    points_d = _gather_dense_points(prob, prob.points)
    lam, scale = jnp.float32(1e-3), jnp.float32(1.0)
    ref = _assemble_blocks(prob, prob.poses, points_d, lam, scale,
                           backend="xla")
    got = _assemble_blocks(prob, prob.poses, points_d, lam, scale,
                           backend="pallas_interpret")
    names = ["U", "Vinv", "bp", "G", "T", "g_red"]
    for n, a, b in zip(names, ref, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-4, err_msg=n)


def test_lm_step_cg_pallas_matches_xla(rng):
    prob = _make_problem(rng)
    points_d = _gather_dense_points(prob, prob.points)
    lam, scale = jnp.float32(1e-3), jnp.float32(1.0)
    dc_ref, dp_ref = _lm_step_cg(prob, prob.poses, points_d, lam, scale,
                                 30, 1e-6, backend="xla")
    dc, dp = _lm_step_cg(prob, prob.poses, points_d, lam, scale,
                         30, 1e-6, backend="pallas_interpret")
    # f32 summation-order noise amplified through 30 CG iterations: compare
    # with an absolute floor matched to the update magnitudes.
    np.testing.assert_allclose(np.asarray(dc), np.asarray(dc_ref),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dp), np.asarray(dp_ref),
                               rtol=1e-2, atol=1e-3)


def test_bundle_adjust_pallas_backend(rng):
    # End-to-end LM with the pallas backend converges to the XLA solution.
    prob = _make_problem(rng)
    opts_x = BAOptions(max_num_iterations=15, backend="xla")
    opts_p = BAOptions(max_num_iterations=15, backend="pallas_interpret")
    poses_x, points_x, info_x = bundle_adjust(prob, opts_x)
    poses_p, points_p, info_p = bundle_adjust(prob, opts_p)
    assert info_p["final_cost"] <= info_x["final_cost"] * 1.05
    # Different summation order perturbs the LM trajectory slightly; both
    # converge (cost check above) to nearly identical poses.
    np.testing.assert_allclose(poses_p, poses_x, rtol=5e-3, atol=1e-3)


def test_bundle_adjust_pallas_selfcal(rng):
    prob = _make_problem(rng)
    opts_x = BAOptions(max_num_iterations=10, refine_camera_params=True,
                       backend="xla", solver="cg")
    opts_p = BAOptions(max_num_iterations=10, refine_camera_params=True,
                       backend="pallas_interpret", solver="cg")
    poses_x, points_x, info_x = bundle_adjust(prob, opts_x)
    poses_p, points_p, info_p = bundle_adjust(prob, opts_p)
    assert info_p["final_cost"] <= info_x["final_cost"] * 1.1
    # The backends reduce in different orders (one-hot matmul vs
    # segment_sum); on this weakly-determined joint problem (few cameras
    # constraining shared intrinsics) 10 LM iterations amplify the f32
    # reduction difference along the near-degenerate direction — costs
    # match tightly (above), parameters to ~0.5%.
    np.testing.assert_allclose(info_p["cam_params"], info_x["cam_params"],
                               rtol=5e-3, atol=1e-2)


def test_seg_accum_full_past_2048_segments(rng):
    """The segment-tiled grid keeps the one-hot MXU path for ANY segment
    count (the old kernel capped at 2048 and 1000+-image BAs fell back to
    XLA scatter-adds)."""
    O, K, S = 9000, 12, 5003  # 3 segment tiles
    c = rng.normal(size=(O, K)).astype(np.float32)
    ids = rng.integers(0, S, size=O).astype(np.int32)
    ref = jax.ops.segment_sum(jnp.asarray(c), jnp.asarray(ids),
                              num_segments=S)
    got = seg_accum_full(jnp.asarray(c), jnp.asarray(ids), S, interpret=True)
    assert got.shape == (S, K)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)
