import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=8"
import numpy as np, jax, time
jax.config.update('jax_default_device', jax.devices('cpu')[0])
import jax.numpy as jnp
from jax.sharding import Mesh
from mavmap_tpu.ba import build_problem, bundle_adjust, BAOptions, BA_POSE_FIXED, BA_POSE_FIXED_X
from mavmap_tpu.parallel import partition_problem, dist_bundle_adjust
from mavmap_tpu.models import camera as cam
from mavmap_tpu.ops.rotation import rotmat_from_rvec

rng = np.random.default_rng(0)
I, P = 8, 400
K = np.zeros((1,9), np.float32); K[0,:4] = [700.,700.,400.,300.]
X = rng.normal(size=(P,3))*np.array([4,4,2]) + np.array([0,0,12])
poses_gt = np.stack([np.concatenate([rng.normal(size=3)*0.05, [i*0.8,0,0]+rng.normal(size=3)*0.05]) for i in range(I)]).astype(np.float32)
obs_img, obs_pt, obs_uv = [], [], []
for i in range(I):
    R = np.asarray(rotmat_from_rvec(jnp.asarray(poses_gt[i,:3])))
    Xc = X @ R.T + poses_gt[i,3:]
    uv = np.asarray(cam.world2image(jnp.asarray(Xc, jnp.float32), cam.PINHOLE, jnp.asarray(K[0])))
    obs_img += [i]*P; obs_pt += list(range(P)); obs_uv += list(uv)
obs_img = np.array(obs_img); obs_pt = np.array(obs_pt); obs_uv = np.array(obs_uv) + rng.normal(size=(len(obs_img),2))*0.3
poses0 = poses_gt.copy(); poses0[2:] += rng.normal(size=poses0[2:].shape)*0.01
X0 = X + rng.normal(size=X.shape)*0.05
states = [BA_POSE_FIXED, BA_POSE_FIXED_X] + [0]*(I-2)

# single-device reference
prob = build_problem(poses0, X0, K, [1], obs_img, obs_pt, np.zeros_like(obs_img), obs_uv, pose_states=states)
t0=time.time()
p1, x1, info = bundle_adjust(prob, BAOptions(max_num_iterations=20))
print(f'single: cost {float(info["initial_cost"]):.2f} -> {float(info["final_cost"]):.2f} ({time.time()-t0:.1f}s)')

# distributed over 8 CPU shards
stacked, new_index, per_shard = partition_problem(
    poses0, X0, K, np.array([1], np.int32), obs_img, obs_pt, np.zeros_like(obs_img), obs_uv,
    num_shards=8, pose_states=states)
mesh = Mesh(np.array(jax.devices('cpu')), ('obs',))
t0=time.time()
p2, x2, cost, init_cost, iters = dist_bundle_adjust(mesh, stacked, max_iters=20)
print(f'dist:   cost {float(init_cost):.2f} -> {float(cost):.2f} iters={int(iters)} ({time.time()-t0:.1f}s)')
print('pose agreement max diff:', float(jnp.abs(p2 - p1).max()))
# compare points through permutation
x2n = np.asarray(x2)[new_index]
print('point agreement max diff:', np.abs(x2n - np.asarray(x1)).max())
