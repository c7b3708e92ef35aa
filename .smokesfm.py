import numpy as np, jax, time
jax.config.update('jax_default_device', jax.devices('cpu')[0])
from mavmap_tpu.utils.synthetic import make_uav_scene, render_features, ate_rmse
from mavmap_tpu.features import ArrayFeatureProvider
from mavmap_tpu.sfm import SequentialMapper, SequentialMapperOptions
from mavmap_tpu.ba import BAOptions

t0=time.time()
scene = make_uav_scene(num_images=10, num_points=1500, relief=10.0, seed=1)
feats, gt_ids = render_features(scene, pixel_noise=0.3, clutter=30, seed=1)
cap = max(len(k) for k,_ in feats)
cap = int(np.ceil(cap/256))*256
prov = ArrayFeatureProvider(feats, capacity=cap)
print('capacity:', cap, 'features/img:', [len(k) for k,_ in feats][:5], f'+{time.time()-t0:.1f}s')

m = SequentialMapper(scene.image_cameras, scene.cam_models, scene.cam_params, prov)
opts = SequentialMapperOptions(min_track_len=2, tri_min_angle=1.0, final_cost_threshold=2.0,
                               essential_ransac_trials=256, p3p_ransac_trials=256)
init_opts = SequentialMapperOptions(min_track_len=2, tri_min_angle=4.0, final_cost_threshold=2.0,
                               essential_ransac_trials=256, p3p_ransac_trials=256)
ok = m.process_initial(0, 1, init_opts)
print(f'process_initial: {ok} points3D={m.store.num_points3D} +{time.time()-t0:.1f}s')
assert ok
for i in range(2, 10):
    ok = m.process(i, i-1, opts, debug=True)
    print(f'process {i}: {ok} pts={m.store.num_points3D} +{time.time()-t0:.1f}s')
    if ok and i >= 3:
        # local BA over sliding window of up to 8
        reg = [m.image_id_to_idx[iid] for iid in range(m.store.num_images) if m.store.image_registered[iid]]
        window = reg[-8:]
        fixed = window[:2]; free = window[2:]
        info = m.adjust_bundle(free, fixed, ba_options=BAOptions(max_num_iterations=10))
        if info: print(f'  local BA cost {float(info["initial_cost"]):.1f} -> {float(info["final_cost"]):.1f}')
info = m.adjust_global_bundle(BAOptions(max_num_iterations=30))
print(f'global BA: {float(info["initial_cost"]):.1f} -> {float(info["final_cost"]):.1f} +{time.time()-t0:.1f}s')

# ATE
reg_ids = [iid for iid in range(m.store.num_images) if m.store.image_registered[iid]]
idxs = [m.image_id_to_idx[iid] for iid in reg_ids]
import jax.numpy as jnp
from mavmap_tpu.ops.rotation import rotmat_from_rvec
R = np.asarray(rotmat_from_rvec(jnp.asarray(m.store.image_rvecs[reg_ids], jnp.float32)))
est_C = -np.einsum('nij,nj->ni', R.transpose(0,2,1), m.store.image_tvecs[reg_ids])
gt_C = scene.camera_centers()[idxs]
print('registered:', len(reg_ids), '/10  ATE:', ate_rmse(est_C, gt_C), f'+{time.time()-t0:.1f}s')
