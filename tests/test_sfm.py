"""End-to-end sequential mapper tests on synthetic UAV scenes.

The missing integration tier of the reference's test strategy (SURVEY §4):
drive the full mapper over a rendered sequence and assert ATE against
ground truth.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mavmap_tpu.ba import BAOptions
from mavmap_tpu.features import ArrayFeatureProvider
from mavmap_tpu.ops.rotation import rotmat_from_rvec
from mavmap_tpu.sfm import SequentialMapper, SequentialMapperOptions
from mavmap_tpu.utils.synthetic import make_uav_scene, render_features, ate_rmse


def _run_sequence(scene, feats, opts=None, init_opts=None, local_ba_window=8):
    cap = int(np.ceil(max(len(k) for k, _ in feats) / 256)) * 256
    prov = ArrayFeatureProvider(feats, capacity=cap)
    m = SequentialMapper(scene.image_cameras, scene.cam_models, scene.cam_params, prov)
    opts = opts or SequentialMapperOptions(
        tri_min_angle=1.0, final_cost_threshold=2.0,
        essential_ransac_trials=256, p3p_ransac_trials=256,
    )
    init_opts = init_opts or SequentialMapperOptions(
        tri_min_angle=4.0, final_cost_threshold=2.0,
        essential_ransac_trials=256, p3p_ransac_trials=256,
    )
    n = len(scene.rvecs)
    assert m.process_initial(0, 1, init_opts)
    last = 1
    for i in range(2, n):
        if m.process(i, last, opts):
            last = i
            reg = sorted(m.image_idx_to_id.keys())
            window = reg[-local_ba_window:]
            if len(window) > 2:
                m.adjust_bundle(window[2:], window[:2],
                                ba_options=BAOptions(max_num_iterations=8))
    m.adjust_global_bundle(BAOptions(max_num_iterations=30))
    return m


def _ate(m, scene):
    from mavmap_tpu.utils.synthetic import mapper_ate

    nreg = int(m.store.image_registered.sum())
    return mapper_ate(m, scene), nreg


@pytest.mark.slow
def test_sequential_mapping_pinhole(rng):
    scene = make_uav_scene(num_images=8, num_points=1200, relief=10.0, seed=1)
    feats, _ = render_features(scene, pixel_noise=0.3, clutter=30, seed=1)
    m = _run_sequence(scene, feats)
    ate, nreg = _ate(m, scene)
    assert nreg == 8
    assert ate < 0.1  # meters, at 30 m altitude
    assert m.store.num_points3D > 200


@pytest.mark.slow
def test_sequential_mapping_opencv_distortion(rng):
    scene = make_uav_scene(num_images=6, num_points=1200, relief=10.0,
                           distortion=[-0.25, 0.07, 0.0005, -0.0005], seed=3)
    feats, _ = render_features(scene, pixel_noise=0.3, clutter=20, seed=3)
    m = _run_sequence(scene, feats)
    ate, nreg = _ate(m, scene)
    assert nreg == 6
    assert ate < 0.15


def test_mapper_rejects_planar_pair(rng):
    # Homography gate: a flat scene must fail two-view init.
    scene = make_uav_scene(num_images=2, num_points=800, relief=0.2, seed=5)
    feats, _ = render_features(scene, pixel_noise=0.2, clutter=10, seed=5)
    cap = int(np.ceil(max(len(k) for k, _ in feats) / 256)) * 256
    prov = ArrayFeatureProvider(feats, capacity=cap)
    m = SequentialMapper(scene.image_cameras, scene.cam_models, scene.cam_params, prov)
    assert not m.process_initial(0, 1, SequentialMapperOptions(
        essential_ransac_trials=128))


def test_mapper_pair_bookkeeping(rng):
    scene = make_uav_scene(num_images=4, num_points=1200, relief=10.0, seed=1)
    feats, _ = render_features(scene, pixel_noise=0.3, seed=1)
    cap = int(np.ceil(max(len(k) for k, _ in feats) / 256)) * 256
    prov = ArrayFeatureProvider(feats, capacity=cap)
    m = SequentialMapper(scene.image_cameras, scene.cam_models, scene.cam_params, prov)
    opts = SequentialMapperOptions(tri_min_angle=1.0, final_cost_threshold=2.0,
                                   essential_ransac_trials=256, p3p_ransac_trials=256)
    assert m.process_initial(0, 1, opts)
    assert m.is_pair_processed(0, 1) and m.is_image_processed(1)
    assert m.process(2, 1, opts)
    # Re-processing a processed pair is a no-op returning True.
    assert m.process(2, 1, opts)
    with pytest.raises(ValueError):
        SequentialMapper(scene.image_cameras, scene.cam_models,
                         scene.cam_params, prov).process(2, 3, opts)


def test_relative_min_disparity_gate(rng):
    """min_disparity < 1 is relative to the frame diagonal (reference
    rel2abs_threshold + query_dimensions); an impossible relative threshold
    must reject the pair, an absolute-pixels one must pass."""
    from mavmap_tpu.utils.synthetic import make_uav_scene, render_features

    scene = make_uav_scene(num_images=3, num_points=800, relief=10.0, seed=3)
    feats, _ = render_features(scene, pixel_noise=0.3, seed=3)
    cap = int(np.ceil(max(len(k) for k, _ in feats) / 256)) * 256
    prov = ArrayFeatureProvider(feats, capacity=cap)

    def mk(min_disp):
        o = SequentialMapperOptions(tri_min_angle=1.0, min_disparity=min_disp,
                                    essential_ransac_trials=256,
                                    p3p_ransac_trials=256)
        m = SequentialMapper(scene.image_cameras, scene.cam_models,
                             scene.cam_params, prov)
        return m.process_initial(0, 1, o)

    assert mk(2.0)        # absolute: 2 px, trivially passes
    assert not mk(0.9)    # relative: 0.9 * diagonal, impossible


def test_two_stage_selfcal_large_problem(rng):
    """Global BA with refine_camera_params on a problem LARGER than
    BAOptions.selfcal_max_obs runs the two-stage path: intrinsics refined
    on an observation subsample, then the full problem with intrinsics
    fixed. Tested with a tiny cap so the split triggers on a small scene;
    intrinsics must move toward truth and ATE must stay sub-centimeter."""
    from dataclasses import replace

    scene = make_uav_scene(num_images=8, num_points=2500, relief=10.0,
                           rows=1, seed=31)
    feats, _ = render_features(scene, pixel_noise=0.3, clutter=10, seed=31)
    m = _run_sequence(scene, feats)
    # Perturb the stored intrinsics, then global selfcal BA with a cap
    # that forces the two-stage split (subsample stride > 1).
    true_f = float(m.store.camera_params[0, 0])
    m.store.camera_params[0, 0] = true_f * 1.01
    m.store.camera_params[0, 1] = true_f * 1.01
    m.cam_params[0, 0] = true_f * 1.01
    m.cam_params[0, 1] = true_f * 1.01
    m._norm_cache.clear()
    m._dev_norm_cache.clear()
    info = m.adjust_global_bundle(
        BAOptions(max_num_iterations=40, refine_camera_params=True,
                  selfcal_max_obs=2000))
    assert info is not None
    got_f = float(m.store.camera_params[0, 0])
    assert abs(got_f - true_f) < abs(true_f * 1.01 - true_f) * 0.5, (
        got_f, true_f)
    ate, nreg = _ate(m, scene)
    assert nreg == 8
    assert ate < 0.02


def test_chained_registration_matches_sequential(rng):
    """process_chain_k (K frames per device call, on-device derived anchor
    state for frames 2..K) must register the full sequence with accuracy
    equivalent to the one-frame-at-a-time path — at K=2 and K=4."""
    scene = make_uav_scene(num_images=12, num_points=2500, relief=10.0,
                           rows=1, seed=33)
    feats, _ = render_features(scene, pixel_noise=0.3, clutter=20, seed=33)
    cap = int(np.ceil(max(len(k) for k, _ in feats) / 256)) * 256
    opts = SequentialMapperOptions(
        tri_min_angle=1.0, final_cost_threshold=2.0,
        essential_ransac_trials=256, p3p_ransac_trials=256)
    init_opts = SequentialMapperOptions(
        tri_min_angle=2.0, essential_ransac_trials=256,
        p3p_ransac_trials=256)

    def build(chain_len):
        prov = ArrayFeatureProvider(feats, capacity=cap)
        m = SequentialMapper(scene.image_cameras, scene.cam_models,
                             scene.cam_params, prov)
        assert m.process_initial(0, 1, init_opts)
        last = 1
        i = 2
        while i < 12:
            chain = list(range(i, min(i + chain_len, 12)))
            if len(chain) >= 2:
                oks = m.process_chain_k(chain, last, opts)
                assert all(oks), oks
                last = chain[-1]
                i = last + 1
            else:
                assert m.process(i, last, opts)
                last = i
                i += 1
            reg = sorted(m.image_idx_to_id.keys())
            window = reg[-8:]
            if len(window) > 2:
                m.adjust_bundle(window[2:], window[:2],
                                ba_options=BAOptions(max_num_iterations=8))
        m.adjust_global_bundle(BAOptions(max_num_iterations=30))
        return m

    m_seq = build(chain_len=1)
    ate_seq, n_seq = _ate(m_seq, scene)
    assert n_seq == 12
    for K in (2, 4):
        m_chn = build(chain_len=K)
        ate_chn, n_chn = _ate(m_chn, scene)
        assert n_chn == 12
        assert ate_chn < 0.02, (K, ate_chn, ate_seq)
        assert ate_chn < max(2.5 * ate_seq, 0.01), (K, ate_chn, ate_seq)


def test_chained_registration_deferred_ba_fresh_anchor(rng):
    """The production chain schedule (bench.py / pipeline): ONE deferred
    window BA per chain, dispatched at the next chain's start and pulled
    with its results. The next chain's anchor pose/points must come from
    the in-flight solve's device buffers (kernels.register_chain_fresh) —
    with stale host anchors this drifts ~3x."""
    scene = make_uav_scene(num_images=14, num_points=2500, relief=10.0,
                           rows=1, seed=34)
    feats, _ = render_features(scene, pixel_noise=0.3, clutter=20, seed=34)
    cap = int(np.ceil(max(len(k) for k, _ in feats) / 256)) * 256
    opts = SequentialMapperOptions(
        tri_min_angle=1.0, final_cost_threshold=2.0,
        essential_ransac_trials=256, p3p_ransac_trials=256)
    init_opts = SequentialMapperOptions(
        tri_min_angle=2.0, essential_ransac_trials=256,
        p3p_ransac_trials=256)
    ba_opts = BAOptions(max_num_iterations=8)

    prov = ArrayFeatureProvider(feats, capacity=cap)
    m = SequentialMapper(scene.image_cameras, scene.cam_models,
                         scene.cam_params, prov)
    assert m.process_initial(0, 1, init_opts)
    last, i = 1, 2
    while i < 14:
        chain = list(range(i, min(i + 4, 14)))
        if len(chain) >= 2:
            oks = m.process_chain_k(chain, last, opts, pad_to=4)
            assert all(oks), oks
            last = chain[-1]
        else:
            assert m.process(chain[0], last, opts)
            last = chain[0]
        i = last + 1
        reg = sorted(m.image_idx_to_id.keys())
        window = reg[-8:]
        if len(window) > 2:
            m.adjust_bundle(window[2:], window[:2], ba_options=ba_opts,
                            async_=True, defer=True)
    m.flush_ba()
    m.adjust_global_bundle(BAOptions(max_num_iterations=30))
    ate, nreg = _ate(m, scene)
    assert nreg == 14
    assert ate < 0.02, ate


def test_imu_frame_pre_alignment(rng):
    """_align_model_to_rot_prior rotates the whole model into the priors'
    frame (reference bundle_adjustment.cc:390-446): after a constrained
    adjust_bundle, the FIRST FIXED image's rotation equals its prior
    exactly, and reprojection geometry is unchanged (pure frame rotation).
    """
    from mavmap_tpu.utils.synthetic import imu_priors

    scene = make_uav_scene(num_images=5, num_points=900, relief=8.0, rows=1,
                           seed=21)
    feats, _ = render_features(scene, pixel_noise=0.2, clutter=8, seed=21)
    m = _run_sequence(scene, feats)
    priors = imu_priors(scene, noise=0.004, seed=21)

    reg = sorted(m.image_idx_to_id.keys())
    m.adjust_bundle(reg[2:], reg[:1], reg[1:2],
                    ba_options=BAOptions(max_num_iterations=10),
                    rot_priors=priors, rot_prior_weight=50.0)

    # The alignment anchors the first fixed image at its prior BEFORE the
    # solve; the solve keeps it fixed, so it must match the prior exactly.
    iid = m.image_idx_to_id[reg[0]]
    R_fix = np.asarray(rotmat_from_rvec(
        jnp.asarray(m.store.image_rvecs[iid], jnp.float32)))
    R_pri = np.asarray(rotmat_from_rvec(jnp.asarray(priors[reg[0]])))
    assert np.abs(R_fix - R_pri).max() < 1e-4

    # Free images land near their priors (absolute, priors' frame).
    for i in reg[2:]:
        R_e = np.asarray(rotmat_from_rvec(jnp.asarray(
            m.store.image_rvecs[m.image_idx_to_id[i]], jnp.float32)))
        R_p = np.asarray(rotmat_from_rvec(jnp.asarray(priors[i])))
        assert np.abs(R_e - R_p).max() < 0.03

    # Frame rotation preserves the reconstruction quality.
    ate, nreg = _ate(m, scene)
    assert nreg == 5
    assert ate < 0.03, ate


def test_speculative_chain_pipelining(rng):
    """chain_dispatch_cont anchors the NEXT chain on the in-flight
    previous chain's device-resident end state (register_chain_cont):
    both chains commit and the trajectory matches the non-pipelined
    chained run."""
    scene = make_uav_scene(num_images=14, num_points=2600, relief=10.0,
                           rows=1, seed=25)
    feats, _ = render_features(scene, pixel_noise=0.3, clutter=24, seed=25)
    cap = int(np.ceil(max(len(k) for k, _ in feats) / 256)) * 256
    opts = SequentialMapperOptions(
        tri_min_angle=1.0, essential_ransac_trials=256, p3p_ransac_trials=256)
    init_opts = SequentialMapperOptions(
        tri_min_angle=2.0, essential_ransac_trials=256, p3p_ransac_trials=256)
    ba_opts = BAOptions(max_num_iterations=6)

    def run(pipelined):
        prov = ArrayFeatureProvider(feats, capacity=cap)
        m = SequentialMapper(scene.image_cameras, scene.cam_models,
                             scene.cam_params, prov)
        assert m.process_initial(0, 1, init_opts)

        def local_ba():
            reg = sorted(m.image_idx_to_id.keys())
            w = reg[-8:]
            if len(w) > 2:
                m.adjust_bundle(w[2:], w[:2], ba_options=ba_opts,
                                async_=True, defer=True)

        CH = 4
        if not pipelined:
            last, i = 1, 2
            while i < 14:
                chain = list(range(i, min(i + CH, 14)))
                oks = m.process_chain_k(chain, last, opts, pad_to=CH)
                assert all(oks), oks
                last = chain[-1]
                local_ba()
                i = last + 1
        else:
            tok = m.chain_dispatch([2, 3, 4, 5], 1, opts, pad_to=CH)
            tok_chain = [2, 3, 4, 5]
            while tok is not None:
                nstart = tok_chain[-1] + 1
                nxt = list(range(nstart, min(nstart + CH, 14)))
                tok_nxt = None
                if len(nxt) >= 2 and len(tok_chain) == CH:
                    tok_nxt = m.chain_dispatch_cont(nxt, tok, opts,
                                                    pad_to=CH)
                oks = m.chain_complete(tok)
                assert all(oks), (tok_chain, oks)
                local_ba()
                tok, tok_chain = tok_nxt, nxt
        m.flush_ba()
        m.adjust_global_bundle(BAOptions(max_num_iterations=30))
        return m

    m_seq = run(False)
    m_pipe = run(True)
    a_seq, n_seq = _ate(m_seq, scene)
    a_pipe, n_pipe = _ate(m_pipe, scene)
    assert n_seq == n_pipe == 14
    assert a_seq < 0.02, a_seq
    assert a_pipe < 0.03, a_pipe  # one extra chain of anchor staleness
