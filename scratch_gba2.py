"""Scratch: global-BA CG cost split — assembly vs CG matvecs."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from mavmap_tpu.ba import build_problem
from mavmap_tpu.ba.core import _assemble_blocks, _lm_step_cg, _obs_jacobians
from mavmap_tpu.models import camera as cam
from mavmap_tpu.ops.rotation import rotmat_from_rvec as rfr

rng = np.random.default_rng(0)
I, P, OPI = 200, 50000, 1000
K = np.zeros((1, 9), np.float32)
K[0, :4] = [700.0, 700.0, 400.0, 300.0]
X = (rng.normal(size=(P, 3)) * np.array([40, 40, 4]) + np.array([0, 0, 30])).astype(np.float32)
poses = np.stack([np.concatenate([rng.normal(size=3) * 0.05, [i * 0.4, (i % 7) * 0.5, 0]])
                  for i in range(I)]).astype(np.float32)
oi, op, uv = [], [], []
for i in range(I):
    R = np.asarray(rfr(jnp.asarray(poses[i, :3])))
    Xc = X @ R.T + poses[i, 3:]
    u = np.asarray(cam.world2image(jnp.asarray(Xc, jnp.float32), 1, jnp.asarray(K[0])))
    sel = rng.permutation(P)[:OPI]
    oi += [i] * OPI; op += list(sel); uv += list(u[sel])
prob = build_problem(poses, X, K, [1], np.array(oi), np.array(op),
                     np.zeros(len(oi), np.int32), np.array(uv, np.float32),
                     pose_states=[1, 2] + [0] * (I - 2), with_pairs=False)
prob = jax.device_put(prob)

@jax.jit
def assemble(prob, lam):
    return _assemble_blocks(prob, prob.poses, prob.points, lam, jnp.float32(1.0))

@jax.jit
def jac_only(prob):
    return _obs_jacobians(prob, prob.poses, prob.points)

@partial(jax.jit, static_argnames=("iters",))
def step(prob, lam, iters):
    return _lm_step_cg(prob, prob.poses, prob.points, lam, jnp.float32(1.0), iters, 1e-20)

def t(f, *a, reps=5):
    r = jax.block_until_ready(f(*a))
    t0 = time.time()
    for _ in range(reps):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.time() - t0) / reps * 1000

print(f"jacobians only:      {t(jac_only, prob):7.1f} ms")
print(f"assemble_blocks:     {t(assemble, prob, jnp.float32(1e-4)):7.1f} ms")
for it in (1, 10, 30):
    print(f"full step cg_iters={it:3d}: {t(step, prob, jnp.float32(1e-4), it):7.1f} ms")
