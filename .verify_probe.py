"""Probes: degenerate/garbage inputs must fail gracefully (success flag), not crash."""
import sys
import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_default_device', jax.devices('cpu')[0])
from mavmap_tpu.ops import essential, p3p
from mavmap_tpu.ops.ransac import ransac

rng = np.random.default_rng(0)
# probe 1: pure-noise correspondences -> should not claim success w/ min_inliers
x1 = rng.uniform(-1, 1, size=(60, 2)); x2 = rng.uniform(-1, 1, size=(60, 2))
r = ransac(jax.random.PRNGKey(0), jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32),
           essential.solve_essential_5pt, essential.abs_sampson_residuals,
           sample_size=5, num_trials=128, threshold=2e-3, min_inliers=30)
print('noise-scene: success =', bool(r.success), 'inliers =', int(r.num_inliers), '(expect False / low)')
assert not bool(r.success)

# probe 2: collinear 3D points for P3P (degenerate sample) -> mask, no NaN
X = np.stack([np.linspace(0, 1, 4), np.zeros(4), np.full(4, 5.0)], axis=-1)
x = X[:, :2] / X[:, 2:3]
m, ok = p3p.solve_p3p(jnp.asarray(x, jnp.float32), jnp.asarray(X, jnp.float32))
print('collinear P3P: ok mask =', np.asarray(ok), 'finite =', bool(jnp.isfinite(m).all()))

# probe 3: identical points (zero-disparity) through 5-point solver -> no crash
p = jnp.asarray(rng.uniform(-1, 1, size=(5, 2)), jnp.float32)
E, ok = essential.solve_essential_5pt(p, p)
print('zero-disparity 5pt: nvalid =', int(ok.sum()), 'no-crash OK')

# probe 4: duplicate correspondence rows (degenerate minimal sample)
x1d = np.repeat(x1[:1], 5, axis=0); x2d = np.repeat(x2[:1], 5, axis=0)
E, ok = essential.solve_essential_5pt(jnp.asarray(x1d, jnp.float32), jnp.asarray(x2d, jnp.float32))
print('duplicate-sample 5pt: nvalid =', int(ok.sum()), 'finite-masked =', bool((~ok | jnp.isfinite(E).all(axis=(1,2))).all()))
print('PROBES OK')
