import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_default_device', jax.devices('cpu')[0])
from mavmap_tpu.utils.synthetic import make_uav_scene, render_features
from mavmap_tpu.features import ArrayFeatureProvider
from mavmap_tpu.sfm import SequentialMapper, SequentialMapperOptions
from mavmap_tpu.sfm.kernels import two_view_init

scene = make_uav_scene(num_images=10, num_points=1500, seed=1)
feats, gt_ids = render_features(scene, pixel_noise=0.3, clutter=30, seed=1)
cap = 512
prov = ArrayFeatureProvider(feats, capacity=cap)
m = SequentialMapper(scene.image_cameras, scene.cam_models, scene.cam_params, prov)
f1, f2 = prov.get(0), prov.get(1)
n1, n2 = m._normalized(0), m._normalized(1)
nt = m._norm_threshold(4.0, 0)
r = two_view_init(jax.random.PRNGKey(0),
    jnp.asarray(f1.keypoints), jnp.asarray(f1.descriptors), jnp.asarray(f1.mask), jnp.asarray(n1),
    jnp.asarray(f2.keypoints), jnp.asarray(f2.descriptors), jnp.asarray(f2.mask), jnp.asarray(n2),
    jnp.float32(0.9), jnp.float32(1e9), jnp.float32(nt), essential_trials=256)
print('num_matches', int(r.num_matches))
print('med_disparity', float(r.med_disparity))
print('hom_inliers', int(r.num_hom_inliers))
print('e_inliers', int(r.num_e_inliers))
print('z_component', float(r.z_component))
print('mean_tri_angle', float(r.mean_tri_angle))
print('norm thresh', nt)
# match correctness vs gt ids
mt = np.asarray(r.matches); ok = np.asarray(r.match_valid)
g1, g2 = gt_ids[0], gt_ids[1]
correct = sum(1 for i in np.where(ok)[0] if g1[i] >= 0 and g1[i] == g2[mt[i]])
print('correct matches:', correct, '/', ok.sum())
