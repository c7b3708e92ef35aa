"""Timer + checkpoint/resume tests."""

import numpy as np

from mavmap_tpu.features import ArrayFeatureProvider
from mavmap_tpu.sfm import SequentialMapper, SequentialMapperOptions
from mavmap_tpu.utils.checkpoint import load_map, save_map
from mavmap_tpu.utils.synthetic import make_uav_scene, render_features
from mavmap_tpu.utils.timer import StageTimers, Timer


def test_timer():
    t = Timer()
    t.start()
    x = sum(range(10000))
    assert t.elapsed_time() >= 0
    t.pause()
    e = t.elapsed_time()
    assert t.elapsed_time() == e  # paused


def test_stage_timers():
    st = StageTimers()
    with st.stage("a"):
        pass
    with st.stage("a"):
        pass
    with st.stage("b"):
        pass
    assert st.counts["a"] == 2 and st.counts["b"] == 1
    assert "a:" in st.report()


def test_checkpoint_roundtrip(rng, tmp_path):
    scene = make_uav_scene(num_images=4, num_points=1200, relief=10.0, seed=1)
    feats, _ = render_features(scene, pixel_noise=0.3, seed=1)
    cap = int(np.ceil(max(len(k) for k, _ in feats) / 256)) * 256
    prov = ArrayFeatureProvider(feats, capacity=cap)
    opts = SequentialMapperOptions(tri_min_angle=1.0, final_cost_threshold=2.0,
                                   essential_ransac_trials=256,
                                   p3p_ransac_trials=256)
    m = SequentialMapper(scene.image_cameras, scene.cam_models,
                         scene.cam_params, prov)
    assert m.process_initial(0, 1, opts)
    assert m.process(2, 1, opts)

    path = str(tmp_path / "ckpt.npz")
    save_map(m, path)

    m2 = SequentialMapper(scene.image_cameras, scene.cam_models,
                          scene.cam_params, prov)
    load_map(m2, path)
    assert m2.num_proc_images == m.num_proc_images
    assert m2.store.num_points3D == m.store.num_points3D
    assert (m2.store.point3D_xyz == m.store.point3D_xyz).all()
    assert m2.pair_graph == m.pair_graph
    # The restored mapper can continue mapping.
    assert m2.process(3, 2, opts)
    assert m2.num_proc_images == m.num_proc_images + 1
