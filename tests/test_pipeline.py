"""Pipeline orchestration tests: loop closure, sub-map restart/merge, GCP,
outputs, CLI. These mirror the reference driver's behaviors (mapper.cc)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from mavmap_tpu.features import ArrayFeatureProvider
from mavmap_tpu.loop import train_voc_tree
from mavmap_tpu.ops.rotation import rotmat_from_rvec
from mavmap_tpu.sfm.pipeline import PipelineOptions, run_pipeline
from mavmap_tpu.utils.io import ControlPoint
from mavmap_tpu.utils.synthetic import ate_rmse, make_uav_scene, render_features


def _provider(feats):
    cap = int(np.ceil(max(len(k) for k, _ in feats) / 256)) * 256
    return ArrayFeatureProvider(feats, capacity=cap)


def _ate_of(m, scene):
    from mavmap_tpu.utils.synthetic import mapper_ate

    return mapper_ate(m, scene)


@pytest.mark.slow
def test_pipeline_submap_restart_and_merge(rng):
    scene = make_uav_scene(num_images=12, num_points=2000, relief=10.0, rows=2, seed=2)
    feats, _ = render_features(scene, pixel_noise=0.3, clutter=20, seed=2)
    # Blackout frame 4 -> chain break -> sub-map restart -> merge.
    kp, de = feats[4]
    bad = rng.normal(size=de.shape).astype(np.float32)
    feats[4] = (kp, bad / np.linalg.norm(bad, axis=-1, keepdims=True))
    prov = _provider(feats)
    desc = np.concatenate([d for _, d in feats])
    tree = train_voc_tree(desc[rng.permutation(len(desc))[:4000]],
                          branching=8, depth=2, iters=3)
    opts = PipelineOptions(verbose=False, max_subsequent_trials=1,
                           tri_min_angle=1.0, init_tri_min_angle=4.0,
                           min_track_len=2, loop_detection_period=100)
    res = run_pipeline(scene.image_cameras, scene.cam_models, scene.cam_params,
                       prov, opts, voc_tree=tree)
    m = res.main_mapper
    assert len(res.mappers) == 1          # merged back into one
    assert m.num_proc_images >= 10        # all but the blackout frame
    assert _ate_of(m, scene) < 0.1


@pytest.mark.slow
def test_pipeline_gcp_georegistration(rng):
    from mavmap_tpu.models import camera as cam

    scene = make_uav_scene(num_images=6, num_points=1500, relief=10.0, rows=1, seed=4)
    feats, _ = render_features(scene, pixel_noise=0.3, clutter=10, seed=4)
    prov = _provider(feats)

    cps = []
    for k in range(5):
        X = np.array([rng.uniform(1, 12), rng.uniform(2, 10), rng.uniform(0, 3)])
        obs = []
        for i in range(6):
            R = np.asarray(rotmat_from_rvec(jnp.asarray(scene.rvecs[i])))
            Xc = R @ X + scene.tvecs[i]
            if Xc[2] < 1:
                continue
            uv = np.asarray(cam.world2image(jnp.asarray(Xc, jnp.float32), 1,
                                            jnp.asarray(scene.cam_params[0])))
            if 0 <= uv[0] < 800 and 0 <= uv[1] < 600:
                obs.append((i, float(uv[0]), float(uv[1])))
        if len(obs) >= 2:
            cps.append(ControlPoint(f"cp{k}", X.copy(), obs, fixed=(k < 4)))
    assert sum(c.fixed for c in cps) >= 3

    # Self-calibration off: 6 images under-constrain the intrinsics and the
    # drift shows up directly in the ABSOLUTE geo-registration error this
    # test asserts (the test targets the GCP machinery, not selfcal).
    opts = PipelineOptions(verbose=False, use_control_points=True,
                           tri_min_angle=1.0, init_tri_min_angle=4.0,
                           min_track_len=2, loop_detection=False,
                           refine_camera_params=False,
                           local_ba_refine_camera_params=False)
    res = run_pipeline(scene.image_cameras, scene.cam_models, scene.cam_params,
                       prov, opts, control_points=cps)
    m = res.main_mapper
    # Absolute (non-aligned) accuracy: geo-registration puts the model in
    # the GCP world frame.
    reg_ids = [iid for iid in range(m.store.num_images)
               if m.store.image_registered[iid]]
    idxs = [m.image_id_to_idx[iid] for iid in reg_ids]
    R = np.asarray(rotmat_from_rvec(jnp.asarray(m.store.image_rvecs[reg_ids], jnp.float32)))
    est = -np.einsum("nij,nj->ni", R.transpose(0, 2, 1), m.store.image_tvecs[reg_ids])
    abs_rmse = np.sqrt(np.mean(np.sum((est - scene.camera_centers()[idxs]) ** 2, -1)))
    assert abs_rmse < 0.1
    assert res.control_point_results is not None
    for cp, est_xyz, tl, resid in res.control_point_results:
        if est_xyz is not None and not cp.fixed:
            assert np.linalg.norm(est_xyz - cp.xyz) < 0.05


@pytest.mark.slow
def test_cli_end_to_end(rng, tmp_path):
    """Drive the CLI against a dataset with precomputed cached features."""
    from mavmap_tpu.cli import main as cli_main

    scene = make_uav_scene(num_images=6, num_points=1500, relief=10.0, rows=1, seed=6)
    feats, _ = render_features(scene, pixel_noise=0.3, clutter=10, seed=6)

    data = tmp_path / "data"
    out = tmp_path / "out"
    cache = tmp_path / "cache"
    data.mkdir(), cache.mkdir()
    lines = ["# imagedata"]
    for i in range(6):
        cam_def = ", 1, PINHOLE, 700.0, 700.0, 400.0, 300.0" if i == 0 else ""
        lines.append(f"img{i}, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0{cam_def}")
    (data / "imagedata.txt").write_text("\n".join(lines) + "\n")

    # Pre-populate the feature cache (detector not exercised here).
    import hashlib, json
    params = {"hessian_threshold": 1000.0, "num_octaves": 4,
              "num_octave_layers": 3, "upright": False,
              "grid_size": (3, 3), "max_features": 1024}
    fp = hashlib.sha256(json.dumps(params, sort_keys=True).encode()).hexdigest()[:16]
    for i, (kp, de) in enumerate(feats):
        np.savez(cache / f"img{i}.npz", keypoints=kp, descriptors=de,
                 fingerprint=fp)

    rc = cli_main([
        "--input-path", str(data), "--output-path", str(out),
        "--cache-path", str(cache), "--max-features", "1024",
        "--min-track-len", "2", "--tri-min-angle", "1.0",
        "--init-tri-min-angle", "4.0", "--quiet",
    ])
    assert rc == 0
    assert (out / "imagedataout.txt").exists()
    assert (out / "points3D.ply").exists()
    assert (out / "cameras.wrl").exists()
    content = (out / "imagedataout.txt").read_text()
    assert content.count("img") == 6  # all registered
    ply = (out / "points3D.ply").read_text().splitlines()
    n_pts = int(ply[2].split()[-1])
    assert n_pts > 100


@pytest.mark.slow
def test_pipeline_multi_camera_rig(rng):
    """BASELINE config: multi-camera rig with OPENCV model, mixed CAM_IDX."""
    from mavmap_tpu.utils.synthetic import make_multi_camera_scene

    scene = make_multi_camera_scene(num_images=8, num_points=2000, relief=10.0,
                                    rows=1, seed=9)
    feats, _ = render_features(scene, pixel_noise=0.3, clutter=10, seed=9)
    prov = _provider(feats)
    opts = PipelineOptions(verbose=False, tri_min_angle=1.0,
                           init_tri_min_angle=4.0, min_track_len=2,
                           loop_detection=False)
    res = run_pipeline(scene.image_cameras, scene.cam_models, scene.cam_params,
                       prov, opts)
    m = res.main_mapper
    assert m.num_proc_images == 8
    assert m.store.num_cameras == 2  # both cameras registered in the store
    assert _ate_of(m, scene) < 0.15


@pytest.mark.slow
def test_pipeline_imu_constrained(rng):
    """BASELINE config: IMU-constrained BA with roll/pitch/yaw priors."""
    from mavmap_tpu.utils.synthetic import imu_priors

    scene = make_uav_scene(num_images=8, num_points=1800, relief=10.0, rows=1,
                           seed=10)
    feats, _ = render_features(scene, pixel_noise=0.4, clutter=15, seed=10)
    prov = _provider(feats)
    priors = imu_priors(scene, noise=0.005, seed=10)
    opts = PipelineOptions(verbose=False, tri_min_angle=1.0,
                           init_tri_min_angle=4.0, min_track_len=2,
                           loop_detection=False, constrain_rotation=True,
                           constrain_rotation_weight=20.0)
    res = run_pipeline(scene.image_cameras, scene.cam_models, scene.cam_params,
                       prov, opts, rot_priors=priors)
    m = res.main_mapper
    assert m.num_proc_images == 8
    assert _ate_of(m, scene) < 0.02
    # ABSOLUTE rotation parity: the IMU-frame pre-alignment
    # (mapper._align_model_to_rot_prior, reference
    # bundle_adjustment.cc:390-446) rotates the whole model into the
    # priors' frame before every constrained BA, so the estimated
    # rotations must match the priors in THEIR frame — not merely up to a
    # gauge rotation. The scene's nadir attitude (Rx(pi) flip) keeps the
    # first pose far from identity, so an unaligned gauge would fail this
    # by O(1).
    import jax.numpy as jnp
    from mavmap_tpu.ops.rotation import rotmat_from_rvec

    reg = sorted(m.image_idx_to_id.keys())
    R_est = np.asarray(rotmat_from_rvec(jnp.asarray(
        np.stack([m.store.image_rvecs[m.image_idx_to_id[i]] for i in reg]),
        jnp.float32)))
    R_pri = np.asarray(rotmat_from_rvec(jnp.asarray(
        np.stack([priors[i] for i in reg]), jnp.float32)))
    R_gt = np.asarray(rotmat_from_rvec(jnp.asarray(scene.rvecs[reg])))
    assert np.abs(R_est - R_pri).max() < 0.02   # priors' (IMU world) frame
    assert np.abs(R_est - R_gt).max() < 0.03    # priors carry 0.005-rad noise


def test_pipeline_debug_dumps(rng, tmp_path):
    """--debug + --debug-path writes per-pair match tables, track-length
    logs and per-step VRML scenes (reference sequential_mapper.cc:61-97,
    817-911 naming scheme)."""
    scene = make_uav_scene(num_images=5, num_points=1200, relief=10.0,
                           rows=1, seed=9)
    feats, _ = render_features(scene, pixel_noise=0.3, clutter=10, seed=9)
    prov = _provider(feats)
    dbg = tmp_path / "dbg"
    opts = PipelineOptions(verbose=False, tri_min_angle=1.0,
                           init_tri_min_angle=4.0, min_track_len=2,
                           loop_detection=False, debug=True,
                           debug_path=str(dbg))
    res = run_pipeline(scene.image_cameras, scene.cam_models,
                       scene.cam_params, prov, opts)
    assert res.main_mapper.num_proc_images >= 4
    names = os.listdir(dbg)
    all_m = [n for n in names if n.endswith("matches-all.txt")]
    inl_m = [n for n in names if n.endswith("matches-inlier.txt")]
    logs = [n for n in names if n.endswith("track-length.log")]
    scenes = [n for n in names if n.endswith("scene.wrl")]
    assert len(all_m) >= 3 and len(inl_m) >= 3
    assert len(logs) >= 2 and len(scenes) >= 2
    # Match table parses and inlier rows are a subset of all rows.
    rows = np.loadtxt(dbg / sorted(all_m)[0], comments="#")
    assert rows.shape[1] == 5 and len(rows) > 10
    # VRML has matching point/color counts.
    txt = (dbg / sorted(scenes)[0]).read_text()
    assert txt.startswith("#VRML V2.0 utf8")
    npts = txt.split("point [\n")[1].split("]")[0].strip().count("\n") + 1
    ncol = txt.split("color [\n")[1].split("]")[0].strip().count("\n") + 1
    assert npts == ncol > 5
    # Track-length log format matches the reference's.
    log = (dbg / sorted(logs)[0]).read_text()
    assert "Point 3D-ID:" in log and "Track-length:" in log


@pytest.mark.slow
def test_cli_from_rendered_images(rng, tmp_path):
    """PIXELS -> POSES: the CLI runs the on-device detector on rendered
    ground-texture images (no precomputed features anywhere) and recovers
    the trajectory. Covers detector + cache + matching + mapper + outputs
    as one system."""
    from PIL import Image
    from mavmap_tpu.cli import main as cli_main
    from mavmap_tpu.utils.synthetic import ate_rmse, render_images

    scene = make_uav_scene(num_images=6, num_points=1500, relief=10.0,
                           rows=1, seed=21)
    imgs = render_images(scene, texture_contrast=0.25, seed=21)
    data = tmp_path / "data"
    out = tmp_path / "out"
    data.mkdir()
    lines = ["# imagedata"]
    for i, im in enumerate(imgs):
        Image.fromarray(im).save(data / f"img{i}.png")
        cam_def = ", 1, PINHOLE, 700.0, 700.0, 400.0, 300.0" if i == 0 else ""
        lines.append(f"img{i}, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0{cam_def}")
    (data / "imagedata.txt").write_text("\n".join(lines) + "\n")

    rc = cli_main([
        "--input-path", str(data), "--output-path", str(out),
        "--max-features", "1024", "--min-track-len", "2",
        "--tri-min-angle", "1.0", "--init-tri-min-angle", "2.0",
        "--ransac-min-inlier-threshold", "15",
        "--surf-hessian-threshold", "1000", "--quiet",
    ])
    assert rc == 0
    content = (out / "imagedataout.txt").read_text().splitlines()
    rows = [l.split(",") for l in content if not l.startswith("#")]
    assert len(rows) >= 5  # at least 5/6 frames registered from pixels
    est = np.array([[float(r[8]), float(r[9]), float(r[10])] for r in rows])
    idxs = [int(r[0].strip()[3:]) for r in rows]
    ate = ate_rmse(est, scene.camera_centers()[idxs])
    assert ate < 1.0  # meters at 30 m altitude, detector noise included


def test_batched_backfill(rng):
    """process_remaining_images registers skipped frames via the batched
    pair kernel (one device call per sweep)."""
    from mavmap_tpu.sfm.pipeline import process_remaining_images

    scene = make_uav_scene(num_images=8, num_points=2000, relief=10.0,
                           rows=1, seed=12)
    feats, _ = render_features(scene, pixel_noise=0.3, clutter=10, seed=12)
    prov = _provider(feats)
    from mavmap_tpu.sfm import SequentialMapper, SequentialMapperOptions

    o = SequentialMapperOptions(tri_min_angle=1.0, min_track_len=2,
                                essential_ransac_trials=256,
                                p3p_ransac_trials=256)
    m = SequentialMapper(scene.image_cameras, scene.cam_models,
                         scene.cam_params, prov)
    # Register only even frames sequentially; back-fill the odd ones.
    assert m.process_initial(0, 2, o)
    assert m.process(4, 2, o) and m.process(6, 4, o)
    opts = PipelineOptions(verbose=False, tri_min_angle=1.0, min_track_len=2)
    n = process_remaining_images(m, 0, 7, opts)
    assert n >= 4  # 1, 3, 5, 7 filled
    assert m.num_proc_images >= 7


def test_cli_from_real_photo_textures(rng, tmp_path):
    """PIXELS -> POSES on REAL photographic content: the terrain texture is
    a collage of real photographs (sklearn/matplotlib sample images) draped
    over a height field; the CLI runs the on-device detector on the
    rendered views and recovers the trajectory. Real image statistics
    (natural gradients, JPEG noise) through detector + matcher + mapper —
    as close to real aerial imagery as a zero-egress container gets."""
    import pytest
    from PIL import Image
    from mavmap_tpu.cli import main as cli_main
    from mavmap_tpu.utils.synthetic import (ate_rmse, render_photo_survey,
                                            sample_photo_paths)

    if not sample_photo_paths():
        pytest.skip("no bundled sample photographs in this environment")
    scene = make_uav_scene(num_images=6, num_points=10, relief=10.0,
                           rows=1, seed=23)
    imgs = render_photo_survey(scene, relief_amp=4.0, seed=23)
    data = tmp_path / "data"
    out = tmp_path / "out"
    data.mkdir()
    lines = ["# imagedata"]
    for i, im in enumerate(imgs):
        Image.fromarray(im).save(data / f"img{i}.png")
        cam_def = ", 1, PINHOLE, 700.0, 700.0, 400.0, 300.0" if i == 0 else ""
        lines.append(f"img{i}, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0{cam_def}")
    (data / "imagedata.txt").write_text("\n".join(lines) + "\n")

    rc = cli_main([
        "--input-path", str(data), "--output-path", str(out),
        "--max-features", "1024", "--min-track-len", "2",
        "--tri-min-angle", "1.0", "--init-tri-min-angle", "2.0",
        "--ransac-min-inlier-threshold", "15",
        "--surf-hessian-threshold", "600", "--quiet",
    ])
    assert rc == 0
    content = (out / "imagedataout.txt").read_text().splitlines()
    rows = [l.split(",") for l in content if not l.startswith("#")]
    assert len(rows) >= 5  # at least 5/6 frames registered from pixels
    est = np.array([[float(r[8]), float(r[9]), float(r[10])] for r in rows])
    idxs = [int(r[0].strip()[3:]) for r in rows]
    ate = ate_rmse(est, scene.camera_centers()[idxs])
    assert ate < 1.0  # meters at 30 m altitude


@pytest.mark.slow
def test_pipeline_parallel_segments(rng):
    """Segment-parallel mapping: S segment mappers run interleaved
    (dispatch/complete pipelining), then the standard post-pass merges the
    overlapping sub-maps into ONE model matching the sequential result."""
    scene = make_uav_scene(num_images=20, num_points=3000, relief=10.0,
                           rows=2, seed=7)
    feats, _ = render_features(scene, pixel_noise=0.3, clutter=20, seed=7)
    prov = _provider(feats)
    opts = PipelineOptions(verbose=False, tri_min_angle=1.0,
                           init_tri_min_angle=4.0, min_track_len=2,
                           parallel_segments=2, loop_detection=False,
                           final_closure_sweeps=0)
    res = run_pipeline(scene.image_cameras, scene.cam_models,
                       scene.cam_params, prov, opts)
    assert len(res.mappers) == 1, [m.num_proc_images for m in res.mappers]
    m = res.main_mapper
    assert m.num_proc_images == 20
    assert _ate_of(m, scene) < 0.02


@pytest.mark.slow
def test_pipeline_mesh_matches_single_device(rng):
    """The distribution PRODUCT path: the same pipeline run with
    mesh_devices=8 (virtual CPU mesh) routes the global BA through
    partition_problem + dist_bundle_adjust and the fan-outs through the
    sharded register/match wrappers, and produces the same model as the
    single-device run (up to collective reduction order)."""
    scene = make_uav_scene(num_images=10, num_points=2000, relief=10.0,
                           rows=1, seed=31)
    feats, _ = render_features(scene, pixel_noise=0.3, clutter=12, seed=31)

    def run(mesh_devices):
        opts = PipelineOptions(verbose=False, tri_min_angle=1.0,
                               init_tri_min_angle=4.0, min_track_len=2,
                               loop_detection=False,
                               mesh_devices=mesh_devices)
        return run_pipeline(scene.image_cameras, scene.cam_models,
                            scene.cam_params, _provider(feats), opts)

    res1 = run(1)
    res8 = run(8)
    m1, m8 = res1.main_mapper, res8.main_mapper
    assert m8.mesh is not None and m8.mesh.devices.size == 8
    assert m1.mesh is None
    assert m1.num_proc_images == m8.num_proc_images == 10

    # The dist global BA actually ran (not the single-device fallback).
    info = m8.adjust_global_bundle()
    assert info and info.get("distributed") == 8

    assert _ate_of(m1, scene) < 0.02
    assert _ate_of(m8, scene) < 0.02
    # Pose parity between the two paths (same PRNG decisions; solves agree
    # up to reduction order + LM trajectory differences).
    reg = sorted(m1.image_idx_to_id.keys())
    c1 = np.stack([_center_of(m1, i) for i in reg])
    c8 = np.stack([_center_of(m8, i) for i in reg])
    span = np.linalg.norm(c1.max(0) - c1.min(0))
    assert np.abs(c1 - c8).max() < 0.01 * span

    # The sharded fan-outs produce the same results as single-device:
    # match-count pre-gate (dist_match_counts) ...
    from mavmap_tpu.sfm.options import SequentialMapperOptions

    so = SequentialMapperOptions()
    cnt1 = m1._batch_match_counts(reg[0], reg[1:6], so)
    cnt8 = m8._batch_match_counts(reg[0], reg[1:6], so)
    np.testing.assert_array_equal(np.asarray(cnt1), np.asarray(cnt8))
    assert cnt1[0] > 50  # adjacent frames really overlap
    # ... and candidate registration (dist_register_view_batch) — results
    # are computed without committing, so comparing is side-effect-free.
    # Keys differ between the two mappers' PRNG streams after different
    # call sequences, so compare gate-level outcomes, not RANSAC bits.
    r1 = m1._batch_register_candidates(reg[2], [reg[0], reg[1]], so)
    r8 = m8._batch_register_candidates(reg[2], [reg[0], reg[1]], so)
    for (a, *_), (b, *_) in zip(r1, r8):
        assert a.num_matches == b.num_matches
        assert a.p3p_success == b.p3p_success
        assert abs(a.num_p3p_inliers - b.num_p3p_inliers) <= \
            0.1 * max(a.num_p3p_inliers, 1)


def _center_of(m, image_idx):
    iid = m.image_idx_to_id[image_idx]
    rv, tv = m.store.get_pose(iid)
    R = np.asarray(rotmat_from_rvec(jnp.asarray(rv, jnp.float32)))
    return -R.T @ tv


@pytest.mark.slow
def test_pipeline_segment_merge_fallback(rng):
    """Unhappy path of the parallel-segments merge: the shared overlap is
    destroyed (blacked-out frames -> neither segment registers it), no voc
    tree is available, and the boundary merge finds <3 common images. The
    adjacency-registration fallback (mapper.merge) widens the overlap
    retroactively and still produces ONE map."""
    scene = make_uav_scene(num_images=14, num_points=2200, relief=10.0,
                           rows=1, seed=33)
    feats, _ = render_features(scene, pixel_noise=0.3, clutter=12, seed=33)
    for i in (4, 5, 6):  # kill most of the [3..6] overlap
        kp, de = feats[i]
        bad = rng.normal(size=de.shape).astype(np.float32)
        feats[i] = (kp, bad / np.linalg.norm(bad, axis=-1, keepdims=True))
    opts = PipelineOptions(verbose=False, tri_min_angle=1.0,
                           init_tri_min_angle=4.0, min_track_len=2,
                           loop_detection=False, parallel_segments=2,
                           segment_overlap=4, max_subsequent_trials=5)
    res = run_pipeline(scene.image_cameras, scene.cam_models,
                       scene.cam_params, _provider(feats), opts)
    assert len(res.mappers) == 1, [m.num_proc_images for m in res.mappers]
    m = res.mappers[0]
    assert m.num_proc_images >= 10  # everything but the blackout frames
    good = [i for i in sorted(m.image_idx_to_id) if i not in (4, 5, 6)]
    from mavmap_tpu.utils.synthetic import mapper_ate
    assert _ate_of(m, scene) < 0.1


@pytest.mark.slow
def test_cli_checkpoint_save_and_resume(rng, tmp_path):
    """--save-map writes a map checkpoint; --load-map restores it, runs
    only the post-pass (back-fill + global BA), and regenerates outputs —
    the resume story the reference lacks (SURVEY §5.4)."""
    from tests.conftest import write_cached_cli_dataset
    from mavmap_tpu.cli import main as cli_main

    scene = make_uav_scene(num_images=6, num_points=1500, relief=10.0,
                           rows=1, seed=36)
    feats, _ = render_features(scene, pixel_noise=0.3, clutter=10, seed=36)
    data, cache = write_cached_cli_dataset(tmp_path, feats, 6)
    out1 = tmp_path / "out1"
    out2 = tmp_path / "out2"
    ckpt = tmp_path / "map.npz"

    base = ["--input-path", str(data), "--cache-path", str(cache),
            "--max-features", "1024", "--min-track-len", "2",
            "--tri-min-angle", "1.0", "--init-tri-min-angle", "4.0",
            "--quiet"]
    rc = cli_main(base + ["--output-path", str(out1),
                          "--save-map", str(ckpt)])
    assert rc == 0 and ckpt.exists()

    rc = cli_main(base + ["--output-path", str(out2),
                          "--load-map", str(ckpt)])
    assert rc == 0
    c1 = (out1 / "imagedataout.txt").read_text().splitlines()
    c2 = (out2 / "imagedataout.txt").read_text().splitlines()
    assert len(c1) == len(c2)
    # Poses survive the round trip (the resume re-runs global BA from the
    # restored state, so allow small drift).
    r1 = np.array([[float(x) for x in l.split(",")[8:11]]
                   for l in c1 if not l.startswith("#")])
    r2 = np.array([[float(x) for x in l.split(",")[8:11]]
                   for l in c2 if not l.startswith("#")])
    assert np.abs(r1 - r2).max() < 0.02


def test_cli_mid_sequence_resume(rng, tmp_path):
    """A run preempted mid-sequence resumes with --load-map and CONTINUES
    sequential mapping (not just back-fill): the resumed model registers
    the full sequence and matches the uninterrupted run's accuracy. The
    loop-retrieval DB rides along in the checkpoint (restore_image path),
    so closures against pre-checkpoint frames need no re-quantization."""
    from tests.conftest import write_cached_cli_dataset
    from mavmap_tpu.cli import main as cli_main
    from mavmap_tpu.loop import train_voc_tree

    N = 12
    scene = make_uav_scene(num_images=N, num_points=2200, relief=10.0,
                           rows=2, seed=37)
    feats, _ = render_features(scene, pixel_noise=0.3, clutter=10, seed=37)
    data, cache = write_cached_cli_dataset(tmp_path, feats, N)
    tree = train_voc_tree(
        np.concatenate([d for _, d in feats])[:4000], branching=8, depth=2,
        seed=0)
    tree_path = tmp_path / "tree.npz"
    tree.save(str(tree_path))
    ckpt = tmp_path / "map.npz"

    base = ["--input-path", str(data), "--cache-path", str(cache),
            "--max-features", "1024", "--min-track-len", "2",
            "--tri-min-angle", "1.0", "--init-tri-min-angle", "4.0",
            "--voc-tree-path", str(tree_path), "--quiet"]

    # Uninterrupted run over all N frames.
    out_full = tmp_path / "out_full"
    assert cli_main(base + ["--output-path", str(out_full)]) == 0

    # "Preempted" run: stops after frame 5, checkpointing the map.
    out1 = tmp_path / "out1"
    assert cli_main(base + ["--output-path", str(out1),
                            "--end-image-idx", "5",
                            "--save-map", str(ckpt)]) == 0

    # Resume continues the sequential loop through frame N-1.
    out2 = tmp_path / "out2"
    assert cli_main(base + ["--output-path", str(out2),
                            "--load-map", str(ckpt)]) == 0

    def centers(out):
        rows = [l.split(",") for l in
                (out / "imagedataout.txt").read_text().splitlines()
                if not l.startswith("#")]
        idxs = [int(r[0].strip()[3:]) for r in rows]  # "imgN"
        c = np.array([[float(x) for x in r[8:11]] for r in rows])
        order = np.argsort(idxs)
        return c[order], np.asarray(idxs)[order]

    c_full, i_full = centers(out_full)
    c_res, i_res = centers(out2)
    assert len(i_res) == len(i_full) == N  # resume registered the rest
    # Both trajectories track the ground truth equally (gauge-aligned ATE).
    gt = scene.camera_centers()
    assert ate_rmse(c_res, gt[i_res]) < 0.03
    assert abs(ate_rmse(c_res, gt[i_res]) - ate_rmse(c_full, gt[i_full])) < 0.02


@pytest.mark.slow
def test_pipeline_chains_option_matches_default(rng):
    """--pipeline-chains (speculative cont-chain dispatch) produces the
    same model as the default synchronous chain loop."""
    scene = make_uav_scene(num_images=12, num_points=2200, relief=10.0,
                           rows=1, seed=41)
    feats, _ = render_features(scene, pixel_noise=0.3, clutter=12, seed=41)

    def run(pipe):
        opts = PipelineOptions(verbose=False, tri_min_angle=1.0,
                               init_tri_min_angle=4.0, min_track_len=2,
                               loop_detection=False, pipeline_chains=pipe)
        return run_pipeline(scene.image_cameras, scene.cam_models,
                            scene.cam_params, _provider(feats), opts)

    m0 = run(False).main_mapper
    m1 = run(True).main_mapper
    assert m0.num_proc_images == m1.num_proc_images == 12
    assert _ate_of(m0, scene) < 0.02
    assert _ate_of(m1, scene) < 0.02


def test_cli_reference_cache_end_to_end(rng, tmp_path):
    """The CLI maps a dataset whose features come from the reference
    mavmap's binary FeatureCache dumps (--reference-cache-path,
    feature_cache.cc:125-163) — no images, no npz cache, no detector."""
    from mavmap_tpu.cli import main as cli_main
    from tests.test_features import _write_reference_dump

    scene = make_uav_scene(num_images=6, num_points=1500, relief=10.0,
                           rows=1, seed=6)
    feats, _ = render_features(scene, pixel_noise=0.3, clutter=10, seed=6)

    data = tmp_path / "data"
    out = tmp_path / "out"
    refcache = tmp_path / "refcache"
    data.mkdir(), refcache.mkdir()
    lines = ["# imagedata"]
    for i in range(6):
        cam_def = ", 1, PINHOLE, 700.0, 700.0, 400.0, 300.0" if i == 0 else ""
        lines.append(f"img{i}, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0{cam_def}")
    (data / "imagedata.txt").write_text("\n".join(lines) + "\n")
    for i, (kp, de) in enumerate(feats):
        _write_reference_dump(refcache, f"img{i}", kp, de,
                              np.linspace(1.0, 2.0, len(kp)))

    rc = cli_main([
        "--input-path", str(data), "--output-path", str(out),
        "--reference-cache-path", str(refcache),
        "--max-features", "1024", "--min-track-len", "2",
        "--tri-min-angle", "1.0", "--init-tri-min-angle", "4.0", "--quiet",
    ])
    assert rc == 0
    rows = [l for l in (out / "imagedataout.txt").read_text().splitlines()
            if not l.startswith("#")]
    assert len(rows) == 6  # all frames registered from reference features
