import numpy as np, time, jax
from mavmap_tpu.ba import BAOptions
from mavmap_tpu.features import ArrayFeatureProvider
from mavmap_tpu.sfm import SequentialMapper, SequentialMapperOptions
from mavmap_tpu.utils.synthetic import make_uav_scene, render_features

scene = make_uav_scene(num_images=14, num_points=4000, relief=10.0, rows=2, seed=11)
feats, _ = render_features(scene, pixel_noise=0.3, clutter=64, seed=11)
cap = 1024
feats = [(k[:cap], d[:cap]) for k, d in feats]
prov = ArrayFeatureProvider(feats, capacity=cap)
opts = SequentialMapperOptions(tri_min_angle=1.0, final_cost_threshold=2.0,
                               essential_ransac_trials=512, p3p_ransac_trials=512)
init_opts = SequentialMapperOptions(tri_min_angle=4.0, final_cost_threshold=2.0)
ba_opts = BAOptions(max_num_iterations=10)

import mavmap_tpu.sfm.mapper as M
import mavmap_tpu.ba.core as B

t_reg, t_ba_build, t_ba_solve, t_commit = [], [], [], []
orig_build = B.build_problem
def timed_build(*a, **k):
    t0=time.time(); r = orig_build(*a, **k); t_ba_build.append(time.time()-t0); return r
B.build_problem = timed_build
import mavmap_tpu.sfm.mapper
mavmap_tpu.sfm.mapper.__dict__  # noqa

def run(n):
    m = SequentialMapper(scene.image_cameras, scene.cam_models, scene.cam_params, prov, seed=1)
    m.process_initial(0, 1, init_opts)
    last = 1
    for i in range(2, n):
        t0=time.time()
        ok = m.process(i, last, opts)
        t_reg.append(time.time()-t0)
        if ok:
            last = i
            reg = sorted(m.image_idx_to_id.keys())
            w = reg[-8:]
            if len(w) > 2:
                t0=time.time()
                info = m.adjust_bundle(w[2:], w[:2], ba_options=ba_opts)
                t_ba_solve.append(time.time()-t0)
    return m

run(14)  # warmup
for l in (t_reg, t_ba_build, t_ba_solve): l.clear()
t0=time.time()
run(14)
total = time.time()-t0
print(f'total {total:.1f}s for 12 frames')
print(f'process():      {np.sum(t_reg):.2f}s  mean {np.mean(t_reg)*1000:.0f}ms')
print(f'ba build_problem: {np.sum(t_ba_build):.2f}s mean {np.mean(t_ba_build)*1000:.0f}ms')
print(f'adjust_bundle total: {np.sum(t_ba_solve):.2f}s mean {np.mean(t_ba_solve)*1000:.0f}ms')
