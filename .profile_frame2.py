"""Coarse per-phase timing of the DEFERRED frame loop on TPU."""
import time
import numpy as np
import jax

from mavmap_tpu.ba import BAOptions
from mavmap_tpu.features import ArrayFeatureProvider
from mavmap_tpu.sfm import SequentialMapper, SequentialMapperOptions
from mavmap_tpu.utils.synthetic import make_uav_scene, render_features

NUM = 30
scene = make_uav_scene(num_images=NUM, num_points=4000, relief=10.0, rows=2, seed=11)
feats, _ = render_features(scene, pixel_noise=0.3, clutter=64, seed=11)
cap = 1024
feats = [(k[:cap], d[:cap]) for k, d in feats]
prov = ArrayFeatureProvider(feats, capacity=cap)
opts = SequentialMapperOptions(tri_min_angle=1.0, final_cost_threshold=2.0)
init_opts = SequentialMapperOptions(tri_min_angle=4.0, final_cost_threshold=2.0)
ba_opts = BAOptions(max_num_iterations=10)

T = {"process": 0.0, "ba_defer": 0.0, "misc": 0.0}

# Fine-grained timers inside process via monkeypatching device_get.
orig_get = jax.device_get
pull_t = [0.0]


def timed_get(x):
    t0 = time.perf_counter()
    r = orig_get(x)
    pull_t[0] += time.perf_counter() - t0
    return r


def run(seed, collect):
    m = SequentialMapper(scene.image_cameras, scene.cam_models,
                         scene.cam_params, prov, seed=seed)
    assert m.process_initial(0, 1, init_opts)
    last = 1
    for i in range(2, NUM):
        t0 = time.perf_counter()
        ok = m.process(i, last, opts)
        t1 = time.perf_counter()
        if ok:
            last = i
            reg = sorted(m.image_idx_to_id.keys())
            window = reg[-8:]
            if len(window) > 2:
                m.adjust_bundle(window[2:], window[:2], ba_options=ba_opts,
                                async_=True, defer=True)
        t2 = time.perf_counter()
        if collect:
            T["process"] += t1 - t0
            T["ba_defer"] += t2 - t1
    m.flush_ba()
    return m


run(0, False)
jax.device_get = timed_get
import mavmap_tpu.sfm.mapper as mapmod
mapmod.jax.device_get = timed_get
t0 = time.perf_counter()
m = run(1, True)
total = time.perf_counter() - t0
jax.device_get = orig_get
mapmod.jax.device_get = orig_get
n = NUM - 2
print(f"total {total:.3f}s  {total/n*1000:.1f} ms/frame  ({m.num_proc_images} reg)")
for k, v in T.items():
    print(f"  {k:10s} {v/n*1000:7.2f} ms/frame")
print(f"  pull (within process): {pull_t[0]/n*1000:7.2f} ms/frame")
