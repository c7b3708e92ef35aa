import time
import numpy as np
from mavmap_tpu.features import ArrayFeatureProvider
from mavmap_tpu.loop import train_voc_tree
from mavmap_tpu.sfm.pipeline import PipelineOptions, run_pipeline
from mavmap_tpu.utils.synthetic import make_uav_scene, render_features, mapper_ate

scene = make_uav_scene(num_images=300, num_points=25000, relief=10.0, rows=6, seed=13)
feats, _ = render_features(scene, pixel_noise=0.3, clutter=32, seed=13)
cap = 1024
feats = [(k[:cap], d[:cap]) for k, d in feats]
prov = ArrayFeatureProvider(feats, capacity=cap)
desc = np.concatenate([d for _, d in feats[::10]])
rng = np.random.default_rng(0)
tree = train_voc_tree(desc[rng.permutation(len(desc))[:8000]], branching=8, depth=2, iters=3)
opts = PipelineOptions(verbose=False, tri_min_angle=1.0, init_tri_min_angle=4.0,
                       min_track_len=2, loop_detection_period=20)
t0 = time.time()
res = run_pipeline(scene.image_cameras, scene.cam_models, scene.cam_params,
                   prov, opts, voc_tree=tree)
m = res.main_mapper
print(f"pathological 300: {m.num_proc_images}/300 in {time.time()-t0:.1f}s "
      f"maps={len(res.mappers)} ATE={mapper_ate(m, scene):.3f}", flush=True)
