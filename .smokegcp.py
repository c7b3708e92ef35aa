import numpy as np, jax, time
jax.config.update('jax_default_device', jax.devices('cpu')[0])
import jax.numpy as jnp
from mavmap_tpu.utils.synthetic import make_uav_scene, render_features
from mavmap_tpu.utils.io import ControlPoint
from mavmap_tpu.features import ArrayFeatureProvider
from mavmap_tpu.sfm.pipeline import run_pipeline, PipelineOptions
from mavmap_tpu.models import camera as cam
from mavmap_tpu.ops.rotation import rotmat_from_rvec

t0=time.time()
scene = make_uav_scene(num_images=8, num_points=2000, relief=10.0, rows=1, seed=4)
feats, _ = render_features(scene, pixel_noise=0.3, clutter=20, seed=4)
prov = ArrayFeatureProvider(feats, capacity=int(np.ceil(max(len(k) for k,_ in feats)/256))*256)

# control points: 5 fixed + 2 variable, observed where visible
rng = np.random.default_rng(7)
cps = []
gcp_world = []
for k in range(7):
    X = np.array([rng.uniform(0, 18), rng.uniform(0, 10), rng.uniform(0, 3)])
    obs = []
    for i in range(8):
        R = np.asarray(rotmat_from_rvec(jnp.asarray(scene.rvecs[i])))
        Xc = R @ X + scene.tvecs[i]
        if Xc[2] < 1: continue
        uv = np.asarray(cam.world2image(jnp.asarray(Xc, jnp.float32), 1, jnp.asarray(scene.cam_params[0])))
        if 0 <= uv[0] < 800 and 0 <= uv[1] < 600:
            obs.append((i, float(uv[0]), float(uv[1])))
    if len(obs) >= 2:
        cps.append(ControlPoint(name=f'cp{k}', xyz=X.copy(), points2D=obs, fixed=(k < 5)))
        gcp_world.append(X)
print('control points:', len(cps), 'fixed:', sum(c.fixed for c in cps))

opts = PipelineOptions(verbose=False, use_control_points=True, tri_min_angle=1.0,
                       init_tri_min_angle=4.0, min_track_len=2, loop_detection=False)
res = run_pipeline(scene.image_cameras, scene.cam_models, scene.cam_params, prov, opts,
                   control_points=cps)
m = res.main_mapper
print(f'registered={m.num_proc_images}/8 +{time.time()-t0:.1f}s')
# after geo-registration: camera centers should match GT world ABSOLUTELY
reg_ids = [iid for iid in range(m.store.num_images) if m.store.image_registered[iid]]
idxs = [m.image_id_to_idx[iid] for iid in reg_ids]
R = np.asarray(rotmat_from_rvec(jnp.asarray(m.store.image_rvecs[reg_ids], jnp.float32)))
est_C = -np.einsum('nij,nj->ni', R.transpose(0,2,1), m.store.image_tvecs[reg_ids])
gt_C = scene.camera_centers()[idxs]
abs_err = np.sqrt(np.mean(np.sum((est_C - gt_C)**2, axis=-1)))
print('ABSOLUTE camera center RMSE after geo-registration:', abs_err)
for cp, est, tl, res_ in res.control_point_results:
    if est is not None and not cp.fixed:
        print(f'variable {cp.name}: est {est} gt {cp.xyz} err {np.linalg.norm(est-cp.xyz):.4f}')
