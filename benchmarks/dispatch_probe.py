"""Isolate what makes a window-BA async dispatch cost ~100 ms on the
remote TPU: argument transfers (fresh host arrays each call) vs dispatch
overhead (same device-resident problem re-dispatched)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from mavmap_tpu.ba import BAOptions, build_problem, bundle_adjust_async
from mavmap_tpu.models import camera as cam
from mavmap_tpu.ops.rotation import rotmat_from_rvec

rng = np.random.default_rng(0)
I, P = 10, 1500
K = np.zeros((1, 9), np.float32)
K[0, :4] = [700.0, 700.0, 400.0, 300.0]
X = rng.normal(size=(P, 3)) * np.array([4, 4, 2]) + np.array([0, 0, 12])
poses = np.stack([
    np.concatenate([rng.normal(size=3) * 0.05, [i * 0.8, 0, 0]])
    for i in range(I)
]).astype(np.float32)
oi, op, uv = [], [], []
for i in range(I):
    R = np.asarray(rotmat_from_rvec(jnp.asarray(poses[i, :3])))
    Xc = X @ R.T + poses[i, 3:]
    u = np.asarray(cam.world2image(jnp.asarray(Xc, jnp.float32), 1,
                                   jnp.asarray(K[0])))
    sel = rng.permutation(P)[:600]
    oi += [i] * 600
    op += list(sel)
    uv += list(u[sel])
oi, op, uv = np.array(oi), np.array(op), np.array(uv, np.float32)
opts = BAOptions(max_num_iterations=10, refine_camera_params=True)


def make_prob():
    return build_problem(poses, X.astype(np.float32), K, [1], oi, op,
                         np.zeros(len(oi), np.int32), uv,
                         pose_states=[1, 2] + [0] * (I - 2), bucket=True)


# Warm: compile once.
h = bundle_adjust_async(make_prob(), opts, num_obs=len(oi))
jax.block_until_ready(h.fut)

prob_dev = jax.device_put(make_prob())
jax.block_until_ready(prob_dev)

for tag, mk in (("fresh-host-arrays", make_prob),
                ("device-resident", lambda: prob_dev)):
    ts = []
    for _ in range(6):
        p = mk()
        t0 = time.perf_counter()
        h = bundle_adjust_async(p, opts, num_obs=len(oi))
        ts.append((time.perf_counter() - t0) * 1000)
        jax.block_until_ready(h.fut)
    print(f"{tag:20s} dispatch {np.median(ts):7.1f} ms  (runs: "
          + " ".join(f"{t:.0f}" for t in ts) + ")")

# And the build itself:
ts = []
for _ in range(6):
    t0 = time.perf_counter()
    p = make_prob()
    ts.append((time.perf_counter() - t0) * 1000)
print(f"{'build_problem':20s} host    {np.median(ts):7.1f} ms")
