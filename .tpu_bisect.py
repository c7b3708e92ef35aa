import time, numpy as np, jax, jax.numpy as jnp
from mavmap_tpu.ops import essential as es
from mavmap_tpu.ops.ransac import ransac, sample_indices
t0=time.time()
rng = np.random.default_rng(9)
x1 = jnp.asarray(rng.normal(size=(120,2))*0.3, jnp.float32)
x2 = jnp.asarray(rng.normal(size=(120,2))*0.3, jnp.float32)
p1 = x1[:5]; p2 = x2[:5]
def t(label):
    print(f'{label} +{time.time()-t0:.1f}s', flush=True)
t('start')
E, ok = jax.jit(es.solve_essential_5pt)(p1, p2); E.block_until_ready()
t('single 5pt solve')
solve_v = jax.jit(jax.vmap(es.solve_essential_5pt))
Ev, okv = solve_v(jnp.broadcast_to(p1, (256,5,2)), jnp.broadcast_to(p2, (256,5,2)))
Ev.block_until_ready()
t('vmap 256 5pt solve')
res_fn = jax.jit(jax.vmap(lambda m: es.abs_sampson_residuals(x1, x2, m)))
r = res_fn(Ev.reshape(-1,3,3)); r.block_until_ready()
t('residuals 2560x120')
out = ransac(jax.random.PRNGKey(0), x1, x2, es.solve_essential_5pt,
             es.abs_sampson_residuals, sample_size=5, num_trials=256, threshold=2e-3)
out.model.block_until_ready()
t('full ransac')
