import numpy as np, jax, jax.numpy as jnp, time, sys
if 'cpu' in sys.argv:
    jax.config.update('jax_default_device', jax.devices('cpu')[0])
from mavmap_tpu.ops.matching import match_brute_force
from mavmap_tpu.ops.pallas.match import match_brute_force_pallas

rng = np.random.default_rng(0)
F, D = 8192, 128
d1 = rng.normal(size=(F, D)).astype(np.float32); d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
perm = rng.permutation(F)
d2 = d1[perm] + rng.normal(size=(F, D)).astype(np.float32)*0.02
d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
m1 = np.ones(F, bool); m1[F-100:] = False
m2 = np.ones(F, bool); m2[F-50:] = False

interp = 'cpu' in sys.argv
if interp:
    # pallas on CPU requires interpret mode
    import mavmap_tpu.ops.pallas.match as pm
    import jax.experimental.pallas as pl
    orig = pl.pallas_call
    def patched(*a, **k):
        k['interpret'] = True
        return orig(*a, **k)
    pl.pallas_call = patched
    pm.pl.pallas_call = patched

mt_ref, ok_ref = match_brute_force(jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(m1), jnp.asarray(m2))
mt_pal, ok_pal = match_brute_force_pallas(jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(m1), jnp.asarray(m2))
mt_ref, ok_ref, mt_pal, ok_pal = map(np.asarray, (mt_ref, ok_ref, mt_pal, ok_pal))
agree = (mt_ref == mt_pal).mean()
print(f'agreement: {agree*100:.2f}%  ref_matches={ok_ref.sum()} pal_matches={ok_pal.sum()}')

if not interp:
    # benchmark
    f_ref = jax.jit(lambda a,b,ma,mb: match_brute_force(a,b,ma,mb))
    f_pal = jax.jit(lambda a,b,ma,mb: match_brute_force_pallas(a,b,ma,mb))
    a, b = jnp.asarray(d1), jnp.asarray(d2)
    ma, mb = jnp.asarray(m1), jnp.asarray(m2)
    for name, f in [('xla', f_ref), ('pallas', f_pal)]:
        r = f(a,b,ma,mb)[0].block_until_ready()
        t0=time.time()
        for _ in range(50):
            r = f(a,b,ma,mb)[0]
        r.block_until_ready()
        dt = (time.time()-t0)/50
        print(f'{name}: {dt*1000:.2f} ms  ({2*F*F*D/dt/1e12:.2f} TFLOP/s)')
