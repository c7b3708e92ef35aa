"""End-to-end sample through the public mavmap_tpu API:
synthetic two-view scene -> 5-point RANSAC -> pose recovery -> triangulation
-> register 3rd view via P3P RANSAC -> map store bookkeeping."""
import sys, time
import numpy as np, jax, jax.numpy as jnp
if 'cpu' in sys.argv:
    jax.config.update('jax_default_device', jax.devices('cpu')[0])

from mavmap_tpu.models import camera as cam
from mavmap_tpu.ops import essential, p3p, triangulation, projection
from mavmap_tpu.ops.ransac import ransac
from mavmap_tpu.ops.rotation import rotmat_from_rvec, rvec_from_rotmat
from mavmap_tpu.fm import MapStore

rng = np.random.default_rng(9)
# --- synthetic scene: 3 cameras, 120 points, pinhole intrinsics
K_params = cam.pad_params([800., 800., 400., 300.])
X = rng.normal(size=(120, 3)) * np.array([3, 3, 1.5]) + np.array([0, 0, 10])
poses = []
for i in range(3):
    rv = rng.normal(size=3) * 0.1
    tv = np.array([i * 1.0, 0, 0]) + rng.normal(size=3) * 0.05
    poses.append((rv, tv))

def project(rv, tv):
    R = np.asarray(rotmat_from_rvec(jnp.asarray(rv, jnp.float32)))
    Xc = X @ R.T + tv
    uvn = Xc[:, :2] / Xc[:, 2:3]
    uv_px = np.asarray(cam.world2image(jnp.asarray(Xc, jnp.float32), cam.PINHOLE, K_params))
    return uvn, uv_px

obs = [project(*p) for p in poses]
# add 15% outliers in view 1
uvn1 = obs[1][0].copy()
out_idx = rng.permutation(120)[:18]
uvn1[out_idx] += rng.normal(size=(18,2))*0.08 + 0.03

t0 = time.time()
# --- two-view init: 5-point RANSAC
key = jax.random.PRNGKey(0)
res = ransac(key, jnp.asarray(obs[0][0], jnp.float32), jnp.asarray(uvn1, jnp.float32),
             essential.solve_essential_5pt, essential.abs_sampson_residuals,
             sample_size=5, num_trials=256, threshold=2e-3)
print(f'[E-RANSAC] success={bool(res.success)} inliers={int(res.num_inliers)}/120 ({time.time()-t0:.1f}s incl compile)')
assert bool(res.success) and int(res.num_inliers) >= 85

R2, t2, ngood = essential.pose_from_essential_matrix(
    res.model, jnp.asarray(obs[0][0], jnp.float32), jnp.asarray(uvn1, jnp.float32), res.inlier_mask)
print(f'[pose] cheirality good={int(ngood)}')

# compare with GT relative pose
R0 = np.asarray(rotmat_from_rvec(jnp.asarray(poses[0][0], jnp.float32)))
R1 = np.asarray(rotmat_from_rvec(jnp.asarray(poses[1][0], jnp.float32)))
R_rel = R1 @ R0.T
rot_err = np.abs(np.asarray(R2) - R_rel).max()
t_rel = poses[1][1] - R_rel @ poses[0][1] ; t_rel0 = (R1 @ (np.zeros(3)) + poses[1][1]) # careful
# relative translation direction: t_21 = t1 - R_rel t0
t_dir = t_rel / np.linalg.norm(t_rel)
that = np.array(t2); that = that / np.linalg.norm(that)
t_err = min(np.linalg.norm(that - t_dir), np.linalg.norm(that + t_dir))
print(f'[pose] rot_err={rot_err:.2e} t_dir_err={t_err:.2e}')
assert rot_err < 5e-3 and t_err < 5e-3

# --- triangulate inliers from view 0,1 with estimated poses (cam0 = identity frame)
P1 = jnp.concatenate([jnp.eye(3, dtype=jnp.float32), jnp.zeros((3,1), jnp.float32)], axis=1)
P2 = jnp.concatenate([R2, t2[:, None]], axis=1)
Xhat = triangulation.triangulate_points(P1, P2, jnp.asarray(obs[0][0], jnp.float32), jnp.asarray(uvn1, jnp.float32))
err1 = projection.calc_reproj_errors(jnp.asarray(obs[0][0], jnp.float32), Xhat, P1)
inl = np.asarray(res.inlier_mask)
print(f'[tri] mean reproj err (inliers) = {float(jnp.mean(jnp.where(res.inlier_mask, err1, 0))):.2e}')
assert float(jnp.max(jnp.where(res.inlier_mask, err1, 0))) < 1e-3

# --- register view 2 via P3P RANSAC against triangulated points (in cam0 frame)
res3 = ransac(jax.random.PRNGKey(5), jnp.asarray(obs[2][0], jnp.float32), Xhat,
              p3p.solve_p3p, p3p.p3p_residuals, sample_size=4, num_trials=256,
              threshold=2e-3, valid_mask=res.inlier_mask)
print(f'[P3P-RANSAC] success={bool(res3.success)} inliers={int(res3.num_inliers)}')
assert bool(res3.success) and int(res3.num_inliers) >= 80

# --- map store bookkeeping
s = MapStore()
c = s.add_camera(cam.PINHOLE, [800, 800, 400, 300])
im0, p0 = s.add_image(c, obs[0][1]); im1, p1_ = s.add_image(c, obs[1][1]); im2, p2_ = s.add_image(c, obs[2][1])
for i in np.where(inl)[0]:
    pid = s.add_correspondence(p0[i], p1_[i])
    s.set_point3D(pid, np.asarray(Xhat)[i])
    s.add_correspondence(p1_[i], p2_[i])
print(f'[map] points3D={s.num_points3D} obs_table={len(s.observation_table()[0])}')
assert s.num_points3D == inl.sum()
print('E2E OK', f'total {time.time()-t0:.1f}s')
