"""Scratch: per-frame wall-time decomposition of the sequential mapper on TPU."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from mavmap_tpu.ba import BAOptions
from mavmap_tpu.features import ArrayFeatureProvider
from mavmap_tpu.sfm import SequentialMapper, SequentialMapperOptions
from mavmap_tpu.utils.synthetic import make_uav_scene, render_features

NUM_IMAGES = 30
scene = make_uav_scene(num_images=NUM_IMAGES, num_points=4000, relief=10.0,
                       rows=2, seed=11)
feats, _ = render_features(scene, pixel_noise=0.3, clutter=64, seed=11)
cap = 1024
feats = [(k[:cap], d[:cap]) for k, d in feats]
prov = ArrayFeatureProvider(feats, capacity=cap)

opts = SequentialMapperOptions(
    tri_min_angle=1.0, final_cost_threshold=2.0,
    essential_ransac_trials=512, p3p_ransac_trials=512,
)
init_opts = SequentialMapperOptions(
    tri_min_angle=4.0, final_cost_threshold=2.0,
    essential_ransac_trials=512, p3p_ransac_trials=512,
)
ba_opts = BAOptions(max_num_iterations=10)

import mavmap_tpu.sfm.mapper as mapper_mod
from mavmap_tpu.sfm.kernels import register_view, unpack_register

# Wrap register_view to time device dispatch+transfer separately.
timings = {"kernel": [], "unpack": [], "commit": [], "ba": [], "feat": [], "total": []}

orig_process = SequentialMapper.process


def run(seed, record=False):
    m = SequentialMapper(scene.image_cameras, scene.cam_models,
                         scene.cam_params, prov, seed=seed)
    assert m.process_initial(0, 1, init_opts)
    last = 1
    for i in range(2, NUM_IMAGES):
        t0 = time.time()
        ok = m.process(i, last, opts)
        t1 = time.time()
        if ok:
            last = i
            reg = sorted(m.image_idx_to_id.keys())
            window = reg[-8:]
            if len(window) > 2:
                m.adjust_bundle(window[2:], window[:2], ba_options=ba_opts,
                                async_=True)
        t2 = time.time()
        if record:
            timings["total"].append(t1 - t0)
            timings["ba"].append(t2 - t1)
    m.flush_ba()
    return m


# Instrument process() internals via a monkeypatched register_view.
import mavmap_tpu.sfm.mapper as M

orig_rv = M.register_view
orig_unpack = M.unpack_register


def timed_rv(*a, **k):
    t0 = time.time()
    out = orig_rv(*a, **k)
    out = jax.block_until_ready(out)
    timings["kernel"].append(time.time() - t0)
    return out


def timed_unpack(rows, scalars):
    t0 = time.time()
    r = orig_unpack(rows, scalars)
    timings["unpack"].append(time.time() - t0)
    return r


run(0)  # warmup / compile

M.register_view = timed_rv
M.unpack_register = timed_unpack
t0 = time.time()
m = run(1, record=True)
total = time.time() - t0

n = m.num_proc_images
print(f"registered {n} in {total:.2f}s -> {n/total:.2f} fps")
for k, v in timings.items():
    if v:
        print(f"{k:8s} n={len(v):3d} mean={np.mean(v)*1000:7.1f}ms "
              f"total={np.sum(v):6.2f}s")
other = total - sum(np.sum(v) for k, v in timings.items() if k in ("total", "ba"))
print(f"outside process/ba: {other:.2f}s")
