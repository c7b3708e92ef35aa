"""Fine-grained timing of the deferred+async-copy frame loop on TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from mavmap_tpu.ba import BAOptions
from mavmap_tpu.features import ArrayFeatureProvider
from mavmap_tpu.sfm import SequentialMapper, SequentialMapperOptions
from mavmap_tpu.sfm.kernels import register_view, unpack_register
from mavmap_tpu.utils.synthetic import make_uav_scene, render_features

NUM = 30
scene = make_uav_scene(num_images=NUM, num_points=4000, relief=10.0, rows=2, seed=11)
feats, _ = render_features(scene, pixel_noise=0.3, clutter=64, seed=11)
cap = 1024
feats = [(k[:cap], d[:cap]) for k, d in feats]
prov = ArrayFeatureProvider(feats, capacity=cap)
opts = SequentialMapperOptions(tri_min_angle=1.0, final_cost_threshold=2.0)
init_opts = SequentialMapperOptions(tri_min_angle=4.0, final_cost_threshold=2.0)
ba_opts = BAOptions(max_num_iterations=10)

T = {k: 0.0 for k in ("state", "reg_dispatch", "copy_async", "ba_dispatch",
                      "pull", "apply_ba", "commit", "ba_build")}


def run(seed, collect):
    m = SequentialMapper(scene.image_cameras, scene.cam_models,
                         scene.cam_params, prov, seed=seed)
    assert m.process_initial(0, 1, init_opts)
    last = 1
    for i in range(2, NUM):
        t0 = time.perf_counter()
        kpp, dp_, mp_, npn = m._device_features(last)
        kpc, dc_, mc_, ncn = m._device_features(i)
        nt = m._norm_threshold(opts.ransac_max_reproj_error, i)
        tri_nt = m._norm_threshold(opts.tri_max_reproj_error, i)
        prev_p2d, has_tri, stable, xyz, prev_rvec, prev_tvec = (
            m._prev_track_state(last, opts))
        ci = m.image_cameras[i]
        t1 = time.perf_counter()
        r = register_view(
            m._next_key(), kpp, dp_, mp_, npn, kpc, dc_, mc_, ncn,
            jnp.asarray(xyz), jnp.asarray(has_tri), jnp.asarray(stable),
            jnp.asarray(prev_rvec, jnp.float32), jnp.asarray(prev_tvec, jnp.float32),
            jnp.asarray(m.cam_params[ci]), jnp.asarray(m.cam_models[ci]),
            jnp.float32(opts.match_max_ratio), jnp.float32(1e9),
            jnp.float32(nt), p3p_trials=opts.p3p_ransac_trials,
            matcher="pallas")
        t2 = time.perf_counter()
        m._copy_async(r)
        t3 = time.perf_counter()
        newly = m._dispatch_deferred_ba()
        t4 = time.perf_counter()
        pending = getattr(m, "_pending_ba", None)
        if pending is not None:
            packed, ba_vals = jax.device_get((r, pending[2].fut))
        else:
            packed, ba_vals = jax.device_get(r), None
        t5 = time.perf_counter()
        if pending is not None:
            m._pending_ba = None
            m._apply_ba(pending, prefetched=ba_vals)
        if newly is not None:
            m._pending_ba = newly
        rr = unpack_register(*packed)
        t6 = time.perf_counter()
        ok = m._register_gates(i, last, rr, opts)
        if ok:
            ok = m._register_commit(i, last, rr, opts, prev_p2d, has_tri, tri_nt)
        t7 = time.perf_counter()
        if ok:
            last = i
            reg = sorted(m.image_idx_to_id.keys())
            window = reg[-8:]
            if len(window) > 2:
                m.adjust_bundle(window[2:], window[:2], ba_options=ba_opts,
                                async_=True, defer=True)
        t8 = time.perf_counter()
        if collect:
            for k, d in zip(
                ("state", "reg_dispatch", "copy_async", "ba_dispatch",
                 "pull", "apply_ba", "commit", "ba_build"),
                (t1-t0, t2-t1, t3-t2, t4-t3, t5-t4, t6-t5, t7-t6, t8-t7),
            ):
                T[k] += d
    m.flush_ba()
    return m


run(0, False)
t0 = time.perf_counter()
m = run(1, True)
total = time.perf_counter() - t0
n = NUM - 2
print(f"total {total:.3f}s  {total/n*1000:.1f} ms/frame  ({m.num_proc_images} reg)")
for k, v in T.items():
    print(f"  {k:12s} {v/n*1000:7.2f} ms/frame")
