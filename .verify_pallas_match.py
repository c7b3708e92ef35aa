"""TPU verification: fused pallas matcher vs XLA — correctness + timing."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from mavmap_tpu.ops.matching import match_brute_force
from mavmap_tpu.ops.pallas.match import match_brute_force_pallas

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)


def make(F):
    d1 = rng.normal(size=(F, 128)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    perm = rng.permutation(F)
    d2 = d1[perm] + rng.normal(size=(F, 128)).astype(np.float32) * 0.02
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    m1 = np.ones(F, bool); m1[-F // 8:] = False
    m2 = np.ones(F, bool); m2[-F // 16:] = False
    kp1 = rng.uniform(0, 4000, size=(F, 2)).astype(np.float32)
    kp2 = kp1[perm] + rng.normal(size=(F, 2)).astype(np.float32) * 5
    kp2[: F // 4] += 1500
    return [jnp.asarray(x) for x in (d1, d2, m1, m2, kp1, kp2)]


fx = jax.jit(lambda *a: match_brute_force(*a, max_distance=200.0))
fp = jax.jit(lambda *a: match_brute_force_pallas(*a, max_distance=200.0))

for F in (1024, 4096, 8192):
    args = make(F)
    mx, okx = jax.device_get(fx(*args))
    mp_, okp = jax.device_get(fp(*args))
    eq = np.array_equal(mx, mp_) and np.array_equal(okx, okp)
    print(f"F={F}: equal={eq} nmatch={int(okx.sum())}", flush=True)
    if not eq:
        bad = np.where(mx != mp_)[0]
        print("  mismatch rows:", bad[:10], mx[bad[:10]], mp_[bad[:10]])

    for name, f in (("xla", fx), ("pallas", fp)):
        r = f(*args); jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(20):
            r = f(*args)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / 20
        tf = 2 * F * F * 130 / dt / 1e12
        print(f"  {name:7s} {dt*1e3:7.3f} ms  {tf:5.2f} TFLOP/s", flush=True)

# vmapped (loop-closure batch path)
B, F = 8, 1024
batch = [jnp.stack([make(F)[i] for _ in range(B)]) for i in range(6)]
fxv = jax.jit(jax.vmap(lambda a, b, c, d, e, f: match_brute_force(
    a, b, c, d, e, f, max_distance=200.0)))
fpv = jax.jit(jax.vmap(lambda a, b, c, d, e, f: match_brute_force_pallas(
    a, b, c, d, e, f, max_distance=200.0)))
mx, okx = jax.device_get(fxv(*batch))
mp_, okp = jax.device_get(fpv(*batch))
print("vmap equal:", np.array_equal(mx, mp_) and np.array_equal(okx, okp),
      flush=True)
for name, f in (("xla-vmap", fxv), ("pallas-vmap", fpv)):
    r = f(*batch); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(20):
        r = f(*batch)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / 20
    print(f"  {name:11s} {dt*1e3:7.3f} ms", flush=True)
print("OK", flush=True)
