"""Decompose the 74 ms/frame pull: RTT floor, register kernel, local BA."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from mavmap_tpu.ba import BAOptions
from mavmap_tpu.features import ArrayFeatureProvider
from mavmap_tpu.sfm import SequentialMapper, SequentialMapperOptions
from mavmap_tpu.sfm.kernels import register_view
from mavmap_tpu.utils.synthetic import make_uav_scene, render_features

NUM = 12
scene = make_uav_scene(num_images=NUM, num_points=4000, relief=10.0, rows=2, seed=11)
feats, _ = render_features(scene, pixel_noise=0.3, clutter=64, seed=11)
cap = 1024
feats = [(k[:cap], d[:cap]) for k, d in feats]
prov = ArrayFeatureProvider(feats, capacity=cap)
opts = SequentialMapperOptions(tri_min_angle=1.0, final_cost_threshold=2.0)
init_opts = SequentialMapperOptions(tri_min_angle=4.0, final_cost_threshold=2.0)

m = SequentialMapper(scene.image_cameras, scene.cam_models,
                     scene.cam_params, prov, seed=0)
assert m.process_initial(0, 1, init_opts)
for i in range(2, 8):
    assert m.process(i, i - 1, opts)

# RTT floor: blocking pull of a tiny array.
x = jnp.zeros(4)
jax.block_until_ready(x)
t0 = time.perf_counter()
for _ in range(20):
    y = jnp.sum(x) + 1.0
    jax.device_get(y)
print(f"RTT floor (tiny op + pull): {(time.perf_counter()-t0)/20*1e3:.2f} ms")

# register_view alone: blocking per call.
kpp, dp_, mp_, npn = m._device_features(6)
kpc, dc_, mc_, ncn = m._device_features(7)
nt = m._norm_threshold(opts.ransac_max_reproj_error, 7)
prev_p2d, has_tri, stable, xyz, rv, tv = m._prev_track_state(6, opts)
ci = m.image_cameras[7]
args = (kpp, dp_, mp_, npn, kpc, dc_, mc_, ncn,
        jnp.asarray(xyz), jnp.asarray(has_tri), jnp.asarray(stable),
        jnp.asarray(rv, jnp.float32), jnp.asarray(tv, jnp.float32),
        jnp.asarray(m.cam_params[ci]), jnp.asarray(m.cam_models[ci]),
        jnp.float32(0.9), jnp.float32(1e9), jnp.float32(nt))
r = register_view(m._next_key(), *args, p3p_trials=512, matcher="pallas")
jax.block_until_ready(r)
for tag, trials in (("512", 512), ("256", 256)):
    r = register_view(m._next_key(), *args, p3p_trials=trials, matcher="pallas")
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(10):
        r = register_view(m._next_key(), *args, p3p_trials=trials,
                          matcher="pallas")
        jax.device_get(r)
    print(f"register_view p3p={tag} blocking: "
          f"{(time.perf_counter()-t0)/10*1e3:.2f} ms")

# pipelined (no pull between dispatches) -> pure device throughput
t0 = time.perf_counter()
for _ in range(10):
    r = register_view(m._next_key(), *args, p3p_trials=512, matcher="pallas")
jax.block_until_ready(r)
print(f"register_view pipelined: {(time.perf_counter()-t0)/10*1e3:.2f} ms")

# local BA (8-window, 10 iters) as the mapper dispatches it.
reg = sorted(m.image_idx_to_id.keys())
window = reg[-8:]
ba_opts = BAOptions(max_num_iterations=10)
info = m.adjust_bundle(window[2:], window[:2], ba_options=ba_opts)
t0 = time.perf_counter()
for _ in range(5):
    info = m.adjust_bundle(window[2:], window[:2], ba_options=ba_opts)
dt = (time.perf_counter() - t0) / 5
print(f"local BA blocking: {dt*1e3:.2f} ms ({info['iterations']} iters)")

# BA dispatch cost only (async)
t0 = time.perf_counter()
for _ in range(5):
    m.adjust_bundle(window[2:], window[:2], ba_options=ba_opts, async_=True)
    m.flush_ba()
print(f"local BA async dispatch+flush: {(time.perf_counter()-t0)/5*1e3:.2f} ms")
