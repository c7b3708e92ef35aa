"""Large-BA scaling measurement: I cameras, P points, O observations."""
import numpy as np, time, jax, jax.numpy as jnp, sys
from mavmap_tpu.ba import build_problem, BAOptions
from mavmap_tpu.ba.core import _lm_loop
from mavmap_tpu.models import camera as cam
from mavmap_tpu.ops.rotation import rotmat_from_rvec

def make(I, P, obs_per_img):
    rng = np.random.default_rng(0)
    K = np.zeros((1,9), np.float32); K[0,:4] = [700.,700.,400.,300.]
    X = rng.normal(size=(P,3))*np.array([40,40,5]) + np.array([0,0,30])
    poses = np.stack([np.concatenate([rng.normal(size=3)*0.05,
        [ (i%20)*2.0, (i//20)*3.0, 0 ]]) for i in range(I)]).astype(np.float32)
    oi = np.repeat(np.arange(I), obs_per_img)
    op = rng.integers(0, P, I*obs_per_img)
    Rm = np.asarray(rotmat_from_rvec(jnp.asarray(poses[:, :3])))
    Xc = np.einsum('nij,nj->ni', Rm[oi], X[op]) + poses[oi,3:]
    Xc[:,2] = np.abs(Xc[:,2]) + 5
    uv = Xc[:,:2]/Xc[:,2:3]*700 + np.array([400,300]) + rng.normal(size=(len(oi),2))*0.5
    states = [1,2]+[0]*(I-2)
    return build_problem(poses + rng.normal(size=poses.shape).astype(np.float32)*0.01,
                         X + rng.normal(size=X.shape)*0.1, K, [1], oi, op,
                         np.zeros_like(oi), uv.astype(np.float32), pose_states=states)

import sys
cases = {'s': [(50, 10000, 800)], 'm': [(100, 20000, 800)], 'l': [(200, 50000, 1000)]}
for I, P, OB in cases[sys.argv[1] if len(sys.argv)>1 else 's']:
    print(f'building I={I}...', flush=True)
    prob = make(I, P, OB)
    prob = jax.device_put(prob)
    args = (jnp.float32(1.0), 1e-4, 10.0, 0.5, 0.0)
    t0=time.time()
    r = _lm_loop(prob, *args, max_iters=5); jax.block_until_ready(r)
    compile_t = time.time()-t0
    t0=time.time()
    r = _lm_loop(prob, *args, max_iters=5); jax.block_until_ready(r)
    t = (time.time()-t0)/5
    print(f'I={I} P={P} O={I*OB} pairs={int(prob.pair_mask.sum())}: {t*1000:.0f} ms/LM-iter (compile {compile_t:.0f}s) cost {float(r[3]):.0f}->{float(r[2]):.0f}', flush=True)
