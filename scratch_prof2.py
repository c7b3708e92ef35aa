"""Scratch: cProfile host-side hot spots of the frame loop on TPU."""
import cProfile, pstats, io, time
import numpy as np
from mavmap_tpu.ba import BAOptions
from mavmap_tpu.features import ArrayFeatureProvider
from mavmap_tpu.sfm import SequentialMapper, SequentialMapperOptions
from mavmap_tpu.utils.synthetic import make_uav_scene, render_features

NUM_IMAGES = 30
scene = make_uav_scene(num_images=NUM_IMAGES, num_points=4000, relief=10.0, rows=2, seed=11)
feats, _ = render_features(scene, pixel_noise=0.3, clutter=64, seed=11)
cap = 1024
feats = [(k[:cap], d[:cap]) for k, d in feats]
prov = ArrayFeatureProvider(feats, capacity=cap)
opts = SequentialMapperOptions(tri_min_angle=1.0, final_cost_threshold=2.0,
                               essential_ransac_trials=512, p3p_ransac_trials=512)
init_opts = SequentialMapperOptions(tri_min_angle=4.0, final_cost_threshold=2.0,
                                    essential_ransac_trials=512, p3p_ransac_trials=512)
ba_opts = BAOptions(max_num_iterations=10)

def run(seed):
    m = SequentialMapper(scene.image_cameras, scene.cam_models, scene.cam_params, prov, seed=seed)
    assert m.process_initial(0, 1, init_opts)
    last = 1
    for i in range(2, NUM_IMAGES):
        if m.process(i, last, opts):
            last = i
            reg = sorted(m.image_idx_to_id.keys())
            window = reg[-8:]
            if len(window) > 2:
                m.adjust_bundle(window[2:], window[:2], ba_options=ba_opts, async_=True)
    m.flush_ba()
    return m

run(0)  # warmup
pr = cProfile.Profile()
pr.enable()
t0 = time.time()
run(1)
el = time.time() - t0
pr.disable()
print(f"total {el:.2f}s")
s = io.StringIO()
ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
ps.print_stats(35)
print("\n".join(s.getvalue().splitlines()[:60]))
