import numpy as np, jax, jax.numpy as jnp, time
jax.config.update('jax_default_device', jax.devices('cpu')[0])
from mavmap_tpu.ba import build_problem, bundle_adjust, BAOptions, BA_POSE_FIXED, BA_POSE_FIXED_X, pose_refinement
from mavmap_tpu.ops.rotation import rotmat_from_rvec
from mavmap_tpu.models import camera as cam

rng = np.random.default_rng(0)
I, P = 6, 200
K = [700., 700., 400., 300.]
kp = np.zeros((1,9), np.float32); kp[0,:4] = K
X = rng.normal(size=(P,3))*np.array([4,4,2]) + np.array([0,0,12])
poses_gt = []
for i in range(I):
    rv = rng.normal(size=3)*0.05
    tv = np.array([i*0.8, 0, 0]) + rng.normal(size=3)*0.05
    poses_gt.append(np.concatenate([rv, tv]))
poses_gt = np.array(poses_gt, np.float32)

obs_img, obs_pt, obs_uv = [], [], []
for i in range(I):
    R = np.asarray(rotmat_from_rvec(jnp.asarray(poses_gt[i,:3])))
    Xc = X @ R.T + poses_gt[i,3:]
    uv = np.asarray(cam.world2image(jnp.asarray(Xc, jnp.float32), cam.PINHOLE, jnp.asarray(kp[0])))
    for p in range(P):
        obs_img.append(i); obs_pt.append(p); obs_uv.append(uv[p])
obs_img = np.array(obs_img); obs_pt = np.array(obs_pt); obs_uv = np.array(obs_uv)
# add pixel noise
obs_uv_noisy = obs_uv + rng.normal(size=obs_uv.shape)*0.5

# perturb initial guess
poses0 = poses_gt + rng.normal(size=poses_gt.shape)*np.array([0.01]*3+[0.05]*3)
X0 = X + rng.normal(size=X.shape)*0.05
pose_states = [BA_POSE_FIXED, BA_POSE_FIXED_X] + [0]*(I-2)
poses0[0] = poses_gt[0]  # fixed pose must start at truth for gauge

prob = build_problem(poses0, X0, kp, [cam.PINHOLE], obs_img, obs_pt,
                     np.zeros_like(obs_img), obs_uv_noisy, pose_states=pose_states)
t0=time.time()
poses, points, info = bundle_adjust(prob, BAOptions(max_num_iterations=50))
print(f'iters={int(info["iterations"])} cost {float(info["initial_cost"]):.1f} -> {float(info["final_cost"]):.2f}  ({time.time()-t0:.1f}s)')
rms = np.sqrt(2*float(info['final_cost'])/ (len(obs_img)*2))
print('approx rms px:', rms)
# pose error vs gt
pe = np.abs(np.asarray(poses) - poses_gt)
print('pose err max (rvec, tvec):', pe[:,:3].max(), pe[:,3:].max())
# noise-free run should go to ~0
prob2 = build_problem(poses0, X0, kp, [cam.PINHOLE], obs_img, obs_pt,
                      np.zeros_like(obs_img), obs_uv, pose_states=pose_states)
poses2, points2, info2 = bundle_adjust(prob2, BAOptions(max_num_iterations=60))
print(f'noise-free: cost {float(info2["initial_cost"]):.1f} -> {float(info2["final_cost"]):.3e}, iters={int(info2["iterations"])}')
pe2 = np.abs(np.asarray(poses2) - poses_gt)
print('noise-free pose err max:', pe2[:,:3].max(), pe2[:,3:].max())

# pose refinement
rv, tv, cost = pose_refinement(poses0[3,:3]+0.02, poses0[3,3:]+0.1, X, obs_uv[3*P:(4)*P], np.ones(P,bool), kp[0], cam.PINHOLE)
print('pose_refine err:', np.abs(np.asarray(rv)-poses_gt[3,:3]).max(), np.abs(np.asarray(tv)-poses_gt[3,3:]).max(), 'cost', float(cost))
