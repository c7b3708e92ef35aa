"""Long-sequence end-to-end validation: 100 images, loop closures, global BA."""
import sys, numpy as np, time, jax
if 'cpu' in sys.argv:
    jax.config.update('jax_platforms', 'cpu')
from mavmap_tpu.utils.synthetic import make_uav_scene, render_features, ate_rmse
from mavmap_tpu.features import ArrayFeatureProvider
from mavmap_tpu.sfm.pipeline import run_pipeline, PipelineOptions
from mavmap_tpu.loop import train_voc_tree
import jax.numpy as jnp
from mavmap_tpu.ops.rotation import rotmat_from_rvec

t0 = time.time()
print('imports done, devices:', jax.devices(), flush=True)
scene = make_uav_scene(num_images=100, num_points=12000, relief=10.0, rows=4,
                       overlap_step=2.0, extent=80.0, seed=21)
feats, _ = render_features(scene, pixel_noise=0.3, clutter=64, seed=21)
feats = [(k[:1024], d[:1024]) for k, d in feats]
prov = ArrayFeatureProvider(feats, capacity=1024)
desc = np.concatenate([d for _, d in feats])
tree = train_voc_tree(desc[np.random.default_rng(0).permutation(len(desc))[:20000]],
                      branching=8, depth=3, iters=4)
print(f'setup +{time.time()-t0:.0f}s', flush=True)
opts = PipelineOptions(verbose=False, tri_min_angle=1.0, init_tri_min_angle=4.0,
                       min_track_len=2, loop_detection_period=20)
t1 = time.time()
res = run_pipeline(scene.image_cameras, scene.cam_models, scene.cam_params,
                   prov, opts, voc_tree=tree)
elapsed = time.time()-t1
m = res.main_mapper
reg_ids = [iid for iid in range(m.store.num_images) if m.store.image_registered[iid]]
idxs = [m.image_id_to_idx[iid] for iid in reg_ids]
R = np.asarray(rotmat_from_rvec(jnp.asarray(m.store.image_rvecs[reg_ids], jnp.float32)))
est = -np.einsum('nij,nj->ni', R.transpose(0,2,1), m.store.image_tvecs[reg_ids])
ate = ate_rmse(est, scene.camera_centers()[idxs])
print(f'registered {m.num_proc_images}/100 in {elapsed:.1f}s = {m.num_proc_images/elapsed:.2f} fps | '
      f'points {m.store.num_points3D} | ATE {ate:.4f} m | mappers {len(res.mappers)}', flush=True)
