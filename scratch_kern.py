"""Scratch: register_view / two_view_init device-time breakdown on TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from mavmap_tpu.features import ArrayFeatureProvider
from mavmap_tpu.sfm import SequentialMapper, SequentialMapperOptions
from mavmap_tpu.sfm.kernels import register_view, two_view_init
from mavmap_tpu.utils.synthetic import make_uav_scene, render_features

scene = make_uav_scene(num_images=4, num_points=4000, relief=10.0, rows=2, seed=11)
feats, _ = render_features(scene, pixel_noise=0.3, clutter=64, seed=11)
cap = 1024
feats = [(k[:cap], d[:cap]) for k, d in feats]
prov = ArrayFeatureProvider(feats, capacity=cap)
opts = SequentialMapperOptions(tri_min_angle=1.0, final_cost_threshold=2.0,
                               essential_ransac_trials=512, p3p_ransac_trials=512)
m = SequentialMapper(scene.image_cameras, scene.cam_models, scene.cam_params, prov)
assert m.process_initial(0, 1, opts)

kpp, dp_, mp_, npn = m._device_features(1)
kpc, dc_, mc_, ncn = m._device_features(2)
F = cap
xyz = jnp.zeros((F, 3), jnp.float32)
has_tri = jnp.ones((F,), bool)
stable = jnp.ones((F,), bool)
rv, tv = m.store.get_pose(m.image_idx_to_id[1])
args = (m._next_key(), kpp, dp_, mp_, npn, kpc, dc_, mc_, ncn,
        xyz, has_tri, stable,
        jnp.asarray(rv, jnp.float32), jnp.asarray(tv, jnp.float32),
        jnp.asarray(m.cam_params[0]), jnp.asarray(m.cam_models[0]),
        jnp.float32(0.9), jnp.float32(1e9), jnp.float32(0.005))

out = jax.block_until_ready(register_view(*args, p3p_trials=512))
# Timed: dispatch+execute, amortized over a chain of 20 calls (queue depth
# hides RTT), vs single blocking calls.
t0 = time.time()
outs = [register_view(*args, p3p_trials=512) for _ in range(20)]
jax.block_until_ready(outs)
chain = (time.time() - t0) / 20 * 1000
t0 = time.time()
for _ in range(10):
    jax.block_until_ready(register_view(*args, p3p_trials=512))
single = (time.time() - t0) / 10 * 1000
print(f"register_view: chained {chain:.1f} ms, blocking {single:.1f} ms "
      f"(diff ~= RTT+dispatch)")

# Also time the AOT-cost pieces: trials sweep.
for trials in (128, 256, 512):
    o = jax.block_until_ready(register_view(*args, p3p_trials=trials))
    t0 = time.time()
    outs = [register_view(*args, p3p_trials=trials) for _ in range(20)]
    jax.block_until_ready(outs)
    print(f"p3p_trials={trials}: chained {(time.time()-t0)/20*1000:.1f} ms")
