"""Scratch: 5-point solver accuracy tail over extreme pose/depth configs."""
import numpy as np
import jax

import os
if os.environ.get("FORCE_CPU"): jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from mavmap_tpu.ops.essential import solve_essential_5pt, sampson_residuals
from mavmap_tpu.ops.rotation import rotmat_from_rvec

rng = np.random.default_rng(0)
N = 2000

fails = 0
errs = []
batch_p1, batch_p2 = [], []
for t in range(N):
    # Extreme configs: large rotations, near-forward or sideways motion,
    # wide depth range.
    rv = rng.normal(size=3) * rng.uniform(0.1, 1.2)
    R = np.asarray(rotmat_from_rvec(jnp.asarray(rv, jnp.float32)))
    tv = rng.normal(size=3)
    tv /= np.linalg.norm(tv)
    depth = rng.uniform(0.5, 50.0, size=5)
    x1 = rng.uniform(-1.0, 1.0, size=(5, 2))
    X = np.concatenate([x1, np.ones((5, 1))], axis=1) * depth[:, None]
    Xc2 = X @ R.T + tv
    x2 = Xc2[:, :2] / Xc2[:, 2:3]
    batch_p1.append(x1)
    batch_p2.append(x2)

p1 = jnp.asarray(np.stack(batch_p1), jnp.float32)
p2 = jnp.asarray(np.stack(batch_p2), jnp.float32)

solve = jax.jit(jax.vmap(solve_essential_5pt))
E, ok = solve(p1, p2)


def best_residual(E, ok, a, b):
    r = jax.vmap(lambda e: jnp.abs(sampson_residuals(a, b, e)).max())(E)
    r = jnp.where(ok, r, jnp.inf)
    return r.min()


res = jax.jit(jax.vmap(best_residual))(E, ok, p1, p2)
res = np.asarray(res)
print(f"N={N}  median={np.median(res):.2e}  p90={np.percentile(res,90):.2e}  "
      f"p99={np.percentile(res,99):.2e}")
print(f"frac > 1e-3: {(res > 1e-3).mean()*100:.2f}%   "
      f"frac > 1e-2: {(res > 1e-2).mean()*100:.2f}%")
