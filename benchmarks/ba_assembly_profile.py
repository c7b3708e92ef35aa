"""Scratch: per-piece timing of BA block assembly + CG matvec on TPU.

Breaks _assemble_blocks / _lm_step_cg into stages to find where a Pallas
kernel pays (VERDICT round-1 item 1): jacfwd residual+Jacobian batch,
image-keyed segment sums, point-keyed segment sums, G/T couplings, the
CG matvec, and a full CG LM iteration.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from mavmap_tpu.ba import build_problem
from mavmap_tpu.ba.core import (
    _assemble_blocks, _obs_jacobians, _seg_by_image, _cauchy_weight, _inv3x3,
    _lm_loop,
)
from benchmarks.ba_scale import make


def timeit(fn, *args, reps=5):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.time() - t0) / reps * 1000


def profile(I, P, OPI, backends=("xla", "pallas")):
    O = I * OPI
    poses, X, K, oi, op, uv, states = make(I, P, OPI)
    prob = build_problem(poses, X, K, [1], oi, op, np.zeros_like(oi), uv,
                         pose_states=states, with_pairs=False)
    prob = jax.device_put(prob)
    lam = jnp.float32(1e-4)
    scale = jnp.float32(1.0)
    print(f"== I={I} P={P} O={O} ==")

    # Compiled-mode correctness + per-backend timing of assembly/step/loop.
    from mavmap_tpu.ba.core import _gather_dense_points, _lm_step_cg
    points_d = _gather_dense_points(prob, prob.points)
    ref = None
    for be in backends:
        asm = jax.jit(lambda pr, ps, pt: _assemble_blocks(
            pr, ps, pt, lam, scale, backend=be), static_argnames=())
        out = asm(prob, prob.poses, points_d)
        if ref is None:
            ref = out
        else:
            for n, a, b in zip("U Vinv bp G T g_red".split(), ref, out):
                err = float(jnp.max(jnp.abs(a - b)))
                rel = err / (float(jnp.max(jnp.abs(a))) + 1e-30)
                if n == "g_red":
                    # bc - g_local cancels two large reductions; summation-
                    # order noise dominates the residual at O=1M. Scale by
                    # the pre-cancellation magnitude instead.
                    rel = err / (float(jnp.max(jnp.abs(ref[0]))) + 1e-30)
                assert rel < 1e-2, (n, err, rel)
            print("  [pallas == xla on-device: OK]")
        ms = timeit(asm, prob, prob.poses, points_d)
        print(f"  assembly[{be}]:           {ms:8.2f} ms")
        step = jax.jit(lambda pr, ps, pt: _lm_step_cg(
            pr, ps, pt, lam, scale, 30, 1e-6, backend=be))
        ms = timeit(step, prob, prob.poses, points_d)
        print(f"  cg step (30 it) [{be}]:   {ms:8.2f} ms")
        lmf = jax.jit(lambda pr: _lm_loop(pr, scale, 1e-4, 10.0, 0.5, 0.0,
                                          max_iters=10, solver="cg",
                                          cg_max_iters=30, backend=be))
        ms = timeit(lmf, prob, reps=2) / 10
        print(f"  full LM iter (30 CG)[{be}]:{ms:8.2f} ms")

    jac = jax.jit(lambda pr, ps, pt: _obs_jacobians(pr, ps, pt))
    ms = timeit(jac, prob, prob.poses, points_d)
    print(f"  jacobians (r,Jc,Jp):      {ms:8.2f} ms")

    r, Jc, Jp = jac(prob, prob.poses, points_d)
    w = jnp.where(prob.obs_mask, _cauchy_weight(jnp.sum(r * r, -1), scale), 0.0)
    wJc = w[:, None, None] * Jc

    GT = jax.jit(lambda a, b: jnp.einsum("oki,okj->oij", a, b))
    print(f"  G coupling einsum:        {timeit(GT, wJc, Jp):8.2f} ms")


if __name__ == "__main__":
    print("devices:", jax.devices(), file=sys.stderr)
    profile(200, 50_000, 1000)
    profile(1000, 200_000, 1000)
