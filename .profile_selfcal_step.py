"""Piece-wise timing of the selfcal LM step internals on TPU."""
import time
import numpy as np, jax, jax.numpy as jnp
from mavmap_tpu.features import ArrayFeatureProvider
from mavmap_tpu.sfm import SequentialMapper, SequentialMapperOptions
from mavmap_tpu.ba import BAOptions, build_problem
from mavmap_tpu.ba import core as bc
from mavmap_tpu.ba import colmath as _cmcheck  # noqa
from mavmap_tpu.utils.synthetic import make_uav_scene, render_features

N, ROWS = 40, 2
scene = make_uav_scene(num_images=N, num_points=120*N, relief=10.0, rows=ROWS,
                       extent=None, seed=13)
feats, _ = render_features(scene, pixel_noise=0.3, clutter=32, seed=13)
feats = [(k[:1024], d[:1024]) for k, d in feats]
prov = ArrayFeatureProvider(feats, capacity=1024)
opts = SequentialMapperOptions(tri_min_angle=1.0, final_cost_threshold=2.0)
m = SequentialMapper(scene.image_cameras, scene.cam_models, scene.cam_params,
                     prov, seed=0)
assert m.process_initial(0, 1, SequentialMapperOptions(tri_min_angle=4.0))
for i in range(2, 30):
    assert m.process(i, i-1, opts)
reg = sorted(m.image_idx_to_id.keys())
window = reg[-8:]
sel_ids = [m.image_idx_to_id[i] for i in window]
obs_img_raw, obs_pt_raw, obs_xy, _ = m.store.observation_table(
    min_track_len=2, image_ids=sel_ids)
row_of_id = np.full(m.store.num_images, -1, np.int32)
for k, iid in enumerate(sel_ids):
    row_of_id[iid] = k
obs_rows = row_of_id[obs_img_raw]
keep = obs_rows >= 0
pids, obs_point = np.unique(obs_pt_raw[keep], return_inverse=True)
poses = np.concatenate([m.store.image_rvecs[sel_ids],
                        m.store.image_tvecs[sel_ids]], axis=1).astype(np.float32)
prob = build_problem(poses, m.store.point3D_xyz[pids].astype(np.float32),
                     m.store.camera_params.astype(np.float32),
                     m.store.camera_models,
                     obs_rows[keep], obs_point.astype(np.int32),
                     m.store.image_cameras[obs_img_raw[keep]].astype(np.int32),
                     obs_xy[keep], pose_states=[1, 2] + [0]*6, bucket=True)
prob = jax.device_put(prob)
cf = bc._selfcal_cam_free(prob)
lam = jnp.float32(1e-4)
sc = jnp.float32(1.0)
pts_d = bc._gather_dense_points(prob, prob.points)
from mavmap_tpu.ba import colmath as cm

backend = "pallas"
I = prob.poses.shape[0]
C = prob.cam_params.shape[0]
B = I + C


def asm(prob, poses, pts, cams):
    return bc._assemble_selfcal_blocks(prob, poses, pts, cams, cf, lam, sc,
                                       backend=backend)


@jax.jit
def f_asm(prob, poses, pts, cams):
    out = asm(prob, poses, pts, cams)
    return jnp.sum(out[8])


@jax.jit
def f_H(prob, poses, pts, cams):
    (Ecols, blk, w, *_r) = asm(prob, poses, pts, cams)
    h_ids, h_vals = [], []
    for a in range(2):
        for b in range(2):
            h_vals.append(cm.stack_cols_wide(
                cm.jtwj_cols(Ecols[a], Ecols[b], w)).reshape(-1, 9, 9))
            h_ids.append(blk[:, a] * B + blk[:, b])
    H = bc._seg_ids(jnp.concatenate(h_ids), jnp.concatenate(h_vals),
                    B * B, backend)
    return jnp.sum(H)


@jax.jit
def f_Soff(prob, poses, pts, cams):
    (Ecols, blk, w, Vinv, bp, Gcols, Tcols, *_r) = asm(prob, poses, pts, cams)
    G2 = [cm.stack_cols_wide(Gcols[a]) for a in range(2)]
    T2 = [cm.stack_cols_wide(Tcols[a]) for a in range(2)]
    s_ids, s_vals = [], []
    for a in range(2):
        Ta = T2[a][prob.pair_a].reshape(-1, 9, 3)
        for b in range(2):
            Gb = G2[b][prob.pair_b].reshape(-1, 9, 3)
            contrib = jnp.einsum("qij,qkj->qik", Ta, Gb)
            contrib = jnp.where(prob.pair_mask[:, None, None], contrib, 0.0)
            s_ids.append(blk[prob.pair_a, a] * B + blk[prob.pair_b, b])
            s_vals.append(contrib)
    S_off = bc._seg_ids(jnp.concatenate(s_ids), jnp.concatenate(s_vals),
                        B * B, backend)
    return jnp.sum(S_off)


@jax.jit
def f_full(prob, poses, pts, cams):
    dc, dp, dk = bc._lm_step_selfcal(prob, poses, pts, cams, cf, lam, sc,
                                     backend=backend)
    return jnp.sum(dc) + jnp.sum(dp) + jnp.sum(dk)


args = (prob, prob.poses, pts_d, prob.cam_params)
for name, f in (("assembly", f_asm), ("asm+H", f_H), ("asm+Soff", f_Soff),
                ("full step", f_full)):
    r = f(*args); jax.device_get(r)
    t0 = time.perf_counter()
    for _ in range(20):
        r = f(*args)
    jax.device_get(r)
    print(f"{name:10s} {(time.perf_counter()-t0)/20*1e3:7.2f} ms", flush=True)
