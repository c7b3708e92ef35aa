import numpy as np, jax, time
jax.config.update('jax_default_device', jax.devices('cpu')[0])
from mavmap_tpu.utils.synthetic import make_uav_scene, render_features, ate_rmse
from mavmap_tpu.features import ArrayFeatureProvider
from mavmap_tpu.sfm.pipeline import run_pipeline, PipelineOptions
from mavmap_tpu.loop import train_voc_tree

t0=time.time()
scene = make_uav_scene(num_images=16, num_points=2500, relief=10.0, rows=2, seed=2)
feats, gt_ids = render_features(scene, pixel_noise=0.3, clutter=30, seed=2)
# blackout frames 6,7: random descriptors (unmatchable)
rng = np.random.default_rng(5)
for b in (6, 7):
    kp, de = feats[b]
    de2 = rng.normal(size=de.shape).astype(np.float32)
    de2 /= np.linalg.norm(de2, axis=-1, keepdims=True)
    feats[b] = (kp, de2)
cap = int(np.ceil(max(len(k) for k,_ in feats)/256))*256
prov = ArrayFeatureProvider(feats, capacity=cap)
all_desc = np.concatenate([d for _, d in feats], axis=0)
tree = train_voc_tree(all_desc[rng.permutation(len(all_desc))[:5000]], branching=8, depth=3, iters=4)
opts = PipelineOptions(verbose=True, loop_detection_period=100, max_subsequent_trials=2,
                       tri_min_angle=1.0, init_tri_min_angle=4.0, min_track_len=2)
res = run_pipeline(scene.image_cameras, scene.cam_models, scene.cam_params, prov, opts, voc_tree=tree)
m = res.main_mapper
print(f'mappers={len(res.mappers)} main registered={m.num_proc_images}/16 +{time.time()-t0:.1f}s')
import jax.numpy as jnp
from mavmap_tpu.ops.rotation import rotmat_from_rvec
reg_ids = [iid for iid in range(m.store.num_images) if m.store.image_registered[iid]]
idxs = sorted(m.image_id_to_idx[iid] for iid in reg_ids)
print('registered idxs:', idxs)
R = np.asarray(rotmat_from_rvec(jnp.asarray(m.store.image_rvecs[reg_ids], jnp.float32)))
est_C = -np.einsum('nij,nj->ni', R.transpose(0,2,1), m.store.image_tvecs[reg_ids])
gt_C = scene.camera_centers()[[m.image_id_to_idx[iid] for iid in reg_ids]]
print('ATE:', ate_rmse(est_C, gt_C))
