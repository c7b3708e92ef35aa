"""Pipelined per-component timing of register_view's internals on TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from mavmap_tpu.features import ArrayFeatureProvider
from mavmap_tpu.sfm import SequentialMapper, SequentialMapperOptions
from mavmap_tpu.ops import homography, p3p, matching, triangulation, projection
from mavmap_tpu.ops.ransac import ransac
from mavmap_tpu.ops.rotation import rvec_from_rotmat
from mavmap_tpu.ba.core import _pose_refine_loop
from mavmap_tpu.utils.synthetic import make_uav_scene, render_features

scene = make_uav_scene(num_images=10, num_points=4000, relief=10.0, rows=2, seed=11)
feats, _ = render_features(scene, pixel_noise=0.3, clutter=64, seed=11)
cap = 1024
feats = [(k[:cap], d[:cap]) for k, d in feats]
prov = ArrayFeatureProvider(feats, capacity=cap)
opts = SequentialMapperOptions(tri_min_angle=1.0, final_cost_threshold=2.0)
init_opts = SequentialMapperOptions(tri_min_angle=4.0)
m = SequentialMapper(scene.image_cameras, scene.cam_models, scene.cam_params,
                     prov, seed=0)
assert m.process_initial(0, 1, init_opts)
for i in range(2, 8):
    assert m.process(i, i - 1, opts)

kpp, dp_, mp_, npn = m._device_features(6)
kpc, dc_, mc_, ncn = m._device_features(7)
nt = jnp.float32(m._norm_threshold(4.0, 7))
_, has_tri, stable, xyz, rv, tv = m._prev_track_state(6, opts)
xyz = jnp.asarray(xyz); has_tri = jnp.asarray(has_tri); stable = jnp.asarray(stable)
rv = jnp.asarray(rv, jnp.float32); tv = jnp.asarray(tv, jnp.float32)
ci = m.image_cameras[7]
kparams = jnp.asarray(m.cam_params[ci]); code = jnp.asarray(m.cam_models[ci])
key = jax.random.PRNGKey(0)


@jax.jit
def f_match(dp_, dc_, mp_, mc_, kpp, kpc):
    mt, ok = matching.match_features(dp_, dc_, mp_, mc_, kpp, kpc,
                                     max_distance=1e9, backend="pallas")
    return mt, ok, matching.median_feature_disparity(kpp, kpc, mt, ok)


mt, ok, _ = f_match(dp_, dc_, mp_, mc_, kpp, kpc)
j = jnp.maximum(mt, 0)
x_prev = npn
x_curr = ncn[j]
kp_curr_m = kpc[j]


@jax.jit
def f_hom(key, x_prev, x_curr, ok):
    return ransac(key, x_prev, x_curr, homography.solve_homography,
                  homography.homography_residuals, sample_size=4,
                  num_trials=128, threshold=nt, valid_mask=ok).num_inliers


@jax.jit
def f_p3p(key, x_curr, xyz, st):
    r = ransac(key, x_curr, xyz, p3p.solve_p3p, p3p.p3p_residuals,
               sample_size=4, num_trials=512, threshold=nt, valid_mask=st)
    return r.model, r.inlier_mask, r.num_inliers


st = ok & stable & has_tri
model, inl, ninl = f_p3p(key, x_curr, xyz, st)


@partial(jax.jit, static_argnames=("iters",))
def f_refine(model, xyz, kp_curr_m, inl, iters=30):
    rvec0 = rvec_from_rotmat(model[:3, :3])
    pose0 = jnp.concatenate([rvec0, model[:3, 3]])
    return _pose_refine_loop(pose0, xyz, kp_curr_m, inl, kparams, code,
                             jnp.float32(1.0), iters)


@jax.jit
def f_tri(pose, x_prev, x_curr, xyz):
    rvec, tvec = pose[:3], pose[3:]
    proj_curr = projection.compose_proj_matrix(rvec, tvec)
    proj_prev = projection.compose_proj_matrix(rv, tv)
    te = projection.calc_reproj_errors(x_curr, xyz, proj_curr)
    Xn = triangulation.triangulate_points(proj_prev, proj_curr, x_prev, x_curr)
    e1 = projection.calc_reproj_errors(x_prev, Xn, proj_prev)
    e2 = projection.calc_reproj_errors(x_curr, Xn, proj_curr)
    an = triangulation.calc_tri_angles(proj_prev, proj_curr, Xn)
    return te, Xn, e1, e2, an


pose, cost = f_refine(model, xyz, kp_curr_m, inl)

runs = {
    "match(pallas)": lambda: f_match(dp_, dc_, mp_, mc_, kpp, kpc),
    "hom_ransac128": lambda: f_hom(key, x_prev, x_curr, ok),
    "p3p_ransac512": lambda: f_p3p(key, x_curr, xyz, st),
    "refine30": lambda: f_refine(model, xyz, kp_curr_m, inl),
    "refine10": lambda: f_refine(model, xyz, kp_curr_m, inl, iters=10),
    "tri+errors": lambda: f_tri(pose, x_prev, x_curr, xyz),
}
for name, f in runs.items():
    jax.block_until_ready(f())
    t0 = time.perf_counter()
    for _ in range(20):
        r = f()
    jax.block_until_ready(r)
    print(f"{name:16s} {(time.perf_counter()-t0)/20*1e3:7.2f} ms")
