"""Scratch: instrumented 300-image run — find the per-frame scaling knee."""
import time
import numpy as np
from mavmap_tpu.features import ArrayFeatureProvider
from mavmap_tpu.loop import train_voc_tree
from mavmap_tpu.sfm.pipeline import PipelineOptions, run_pipeline
from mavmap_tpu.sfm.mapper import SequentialMapper
from mavmap_tpu.utils.synthetic import make_uav_scene, render_features

N = 300
t0 = time.time()
scene = make_uav_scene(num_images=N, num_points=25000, relief=10.0, rows=6, seed=13)
feats, _ = render_features(scene, pixel_noise=0.3, clutter=32, seed=13)
cap = 1024
feats = [(k[:cap], d[:cap]) for k, d in feats]
prov = ArrayFeatureProvider(feats, capacity=cap)
desc = np.concatenate([d for _, d in feats[::10]])
rng = np.random.default_rng(0)
tree = train_voc_tree(desc[rng.permutation(len(desc))[:8000]], branching=8, depth=2, iters=3)
print(f"scene+features in {time.time()-t0:.0f}s", flush=True)

orig_process = SequentialMapper.process
orig_detect = SequentialMapper.detect_loop
orig_ab = SequentialMapper.adjust_bundle
stats = {"t_last": time.time(), "n": 0}

def process(self, *a, **k):
    t = time.time(); out = orig_process(self, *a, **k)
    stats["n"] += 1
    if stats["n"] % 25 == 0:
        now = time.time()
        print(f"frame#{stats['n']}: process {now-t:.2f}s, "
              f"25-frame wall {now-stats['t_last']:.1f}s", flush=True)
        stats["t_last"] = now
    return out

def detect_loop(self, *a, **k):
    t = time.time(); out = orig_detect(self, *a, **k)
    print(f"  detect_loop: {time.time()-t:.2f}s ({out} closures)", flush=True)
    return out

SequentialMapper.process = process
SequentialMapper.detect_loop = detect_loop

opts = PipelineOptions(verbose=False, tri_min_angle=1.0, init_tri_min_angle=4.0,
                       min_track_len=2, loop_detection_period=20)
t0 = time.time()
res = run_pipeline(scene.image_cameras, scene.cam_models, scene.cam_params,
                   prov, opts, voc_tree=tree)
print(f"TOTAL {time.time()-t0:.1f}s registered={res.main_mapper.num_proc_images}", flush=True)
