"""Measure device-side time of the two per-chain programs: the window
selfcal BA solve and the K-frame chain kernel."""

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
I, P, PER = 10, 2000, 700
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
    sel = rng.permutation(P)[:PER]
    oi += [i] * PER
    op += list(sel)
    uv += list(u[sel])
oi, op, uv = np.array(oi), np.array(op), np.array(uv, np.float32)


def probe_solve(iters, selfcal):
    opts = BAOptions(max_num_iterations=iters, refine_camera_params=selfcal,
                     function_tolerance=0.0)  # run ALL iters
    prob = build_problem(poses, X.astype(np.float32), K, [1], oi, op,
                         np.zeros(len(oi), np.int32), uv,
                         pose_states=[1, 2] + [0] * (I - 2), bucket=True,
                         host=True)
    h = bundle_adjust_async(prob, opts, num_obs=len(oi))
    jax.block_until_ready(h.fut)  # compile
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        h = bundle_adjust_async(prob, opts, num_obs=len(oi))
        jax.block_until_ready(h.fut)
        ts.append((time.perf_counter() - t0) * 1000)
    tag = "selfcal" if selfcal else "plain"
    print(f"window solve {tag:8s} {iters:2d} iters: {np.median(ts):7.1f} ms"
          f"  ({np.median(ts)/iters:.1f} ms/iter)", flush=True)


for selfcal in (True, False):
    for iters in (2, 6, 10):
        probe_solve(iters, selfcal)

# Chain kernel: use the register_chain packed entry on synthetic features.
from mavmap_tpu.sfm.kernels import register_chain

F, D, CH = 1024, 128, 6
desc = rng.normal(size=(F, D)).astype(np.float32)
desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
kp = rng.uniform(0, 800, size=(F, 2)).astype(np.float32)
nrm = (kp - 400.0) / 700.0
feat = (jnp.asarray(kp), jnp.asarray(desc), jnp.ones(F, bool),
        jnp.asarray(nrm))
feats = tuple(feat for _ in range(CH))
track = np.zeros((F, 7), np.float32)
track[:, :3] = rng.normal(size=(F, 3)) * 3 + [0, 0, 10]
track[:, 3] = 1.0
track[:, 4] = 1.0
track[:, 5] = 3.0
track[:, 6] = -1.0
scal = np.zeros(12 + 12 * CH, np.float32)
scal[6] = 0.9
scal[7] = 1e9
scal[8] = 0.017
scal[9] = 3
per = scal[12:].reshape(CH, 12)
per[:, 0] = 0.005
per[:, 1] = 0.005
per[:, 2] = 1
per[:, 3:12] = K[0]
base_key = jax.random.PRNGKey(0)

for matcher in ("pallas", "xla"):
    out = register_chain(base_key, *feat, feats, track, scal,
                         matcher=matcher)
    jax.block_until_ready(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = register_chain(base_key, *feat, feats, track, scal,
                             matcher=matcher)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) * 1000)
    print(f"chain kernel K={CH} matcher={matcher}: {np.median(ts):7.1f} ms"
          f"  ({np.median(ts)/CH:.1f} ms/frame)", flush=True)


# Batched-across-segments variants: vmap the chain kernel and the packed
# selfcal solve over a leading segment axis S — measures whether
# multi-segment batching can buy device throughput (the chip is heavily
# underutilized at F=1024 / window-problem sizes).
from functools import partial as _partial
from mavmap_tpu.ba.core import _lm_loop_packed, pack_problem
from mavmap_tpu.sfm.kernels import _register_chain_impl

S = 4
feat_b = tuple(jax.tree.map(lambda x: jnp.stack([x] * S), f) for f in feats)
anchor_b = jax.tree.map(lambda x: jnp.stack([x] * S), feat)
track_b = np.stack([track] * S)
scal_b = np.stack([scal] * S)
keys_b = jax.random.split(jax.random.PRNGKey(1), S)


@_partial(jax.jit, static_argnames=("p3p_trials", "hom_trials",
                                    "refine_iters", "matcher"))
def chain_batch(keys, anchor, feats_k, track_state, scal,
                p3p_trials=512, hom_trials=128, refine_iters=30,
                matcher="xla"):
    def one(key, anc, fk, ts, sc):
        return _register_chain_impl(key, *anc, fk, ts, sc, None, None,
                                    False, p3p_trials, hom_trials,
                                    refine_iters, matcher)
    return jax.vmap(one)(keys, anchor, feats_k, track_state, scal)


for matcher in ("xla",):
    out = chain_batch(keys_b, anchor_b, feat_b, track_b, scal_b,
                      matcher=matcher)
    jax.block_until_ready(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = chain_batch(keys_b, anchor_b, feat_b, track_b, scal_b,
                          matcher=matcher)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) * 1000)
    print(f"chain kernel S={S} K={CH} batched ({matcher}): "
          f"{np.median(ts):7.1f} ms ({np.median(ts)/(S*CH):.1f} ms/frame)",
          flush=True)

opts6 = BAOptions(max_num_iterations=6, refine_camera_params=True,
                  function_tolerance=0.0)
prob = build_problem(poses, X.astype(np.float32), K, [1], oi, op,
                     np.zeros(len(oi), np.int32), uv,
                     pose_states=[1, 2] + [0] * (I - 2), bucket=True,
                     host=True)
packed = pack_problem(prob)
packed_b = tuple(np.stack([a] * S) for a in packed)


@jax.jit
def solve_batch(*bufs):
    def one(*b):
        return _lm_loop_packed(
            *b, scale=1.0, lambda_init=1e-4, lambda_up=10.0,
            lambda_down=0.5, function_tolerance=0.0, max_iters=6,
            solver="dense", cg_max_iters=100, cg_tol=1e-3,
            backend="xla", selfcal=True)
    return jax.vmap(one)(*bufs)


out = solve_batch(*packed_b)
jax.block_until_ready(out)
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    out = solve_batch(*packed_b)
    jax.block_until_ready(out)
    ts.append((time.perf_counter() - t0) * 1000)
print(f"window solve selfcal S={S} batched, 6 iters: {np.median(ts):7.1f} ms"
      f" ({np.median(ts)/S:.1f} ms/segment)", flush=True)
