"""Scratch: seg_accum_* kernels vs XLA segment_sum on TPU, per shape."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from mavmap_tpu.ops.pallas.ba_accum import seg_accum_full, seg_accum_sorted


def timeit(fn, *args, reps=10):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.time() - t0) / reps * 1000


rng = np.random.default_rng(0)

print("== image-side (unsorted ids, S segments) ==")
for O, K, S in [(200_000, 42, 256), (200_000, 6, 256), (1_000_000, 42, 1024),
                (1_000_000, 6, 1024)]:
    c = jnp.asarray(rng.normal(size=(O, K)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, S, size=O).astype(np.int32))
    idss = jnp.sort(ids)
    f_pl = jax.jit(lambda c, i: seg_accum_full(c, i, S))
    f_xla = jax.jit(lambda c, i: jax.ops.segment_sum(c, i, num_segments=S))
    f_xla_s = jax.jit(lambda c, i: jax.ops.segment_sum(
        c, i, num_segments=S, indices_are_sorted=True))
    print(f" O={O} K={K} S={S}: pallas {timeit(f_pl, c, ids):7.2f}  "
          f"xla {timeit(f_xla, c, ids):7.2f}  "
          f"xla-sorted {timeit(f_xla_s, c, idss):7.2f} ms")

print("== point-side (sorted gapless ids, P segments) ==")
for O, K, P in [(200_000, 12, 50_000), (200_000, 3, 50_000),
                (1_000_000, 12, 200_000), (1_000_000, 3, 200_000)]:
    reps_per = O // P
    ids = jnp.asarray(np.repeat(np.arange(P), reps_per).astype(np.int32))
    c = jnp.asarray(rng.normal(size=(len(ids), K)).astype(np.float32))
    f_pl = jax.jit(lambda c, i: seg_accum_sorted(c, i, P))
    f_xla = jax.jit(lambda c, i: jax.ops.segment_sum(
        c, i, num_segments=P, indices_are_sorted=True))
    print(f" O={O} K={K} P={P}: pallas {timeit(f_pl, c, ids):7.2f}  "
          f"xla-sorted {timeit(f_xla, c, ids):7.2f} ms")
