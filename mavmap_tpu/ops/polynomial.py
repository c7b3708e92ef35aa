"""Batched polynomial evaluation and root finding.

TPU-native counterpart of reference src/util/math.{h,cc} (`poly_eval`,
`poly_solve` — a Durand-Kerner complex root solver, math.cc:52-87). The
rebuild keeps the Durand-Kerner scheme because it is branch-free, has a
fixed iteration count, and batches perfectly on the VPU — unlike
companion-matrix eigendecomposition, which XLA:TPU does not support for
nonsymmetric matrices.

Complex arithmetic is implemented explicitly on (re, im) float pairs: the
TPU backend in this environment does not implement complex dtypes, and the
hand-rolled form also keeps everything in vectorizable f32 lanes.

Coefficient convention: **ascending** — ``p(z) = sum_k coeffs[..., k] z^k``.
"""

import jax
import jax.numpy as jnp


def poly_eval(coeffs, x):
    """Evaluate p(x) by Horner. coeffs: (..., D+1) ascending; x: (...)."""
    D = coeffs.shape[-1] - 1
    acc = coeffs[..., D]
    for k in range(D - 1, -1, -1):
        acc = acc * x + coeffs[..., k]
    return acc


# --- explicit complex arithmetic on (re, im) pairs --------------------------


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _cdiv(ar, ai, br, bi, eps=1e-30):
    d = br * br + bi * bi
    d = jnp.maximum(d, eps)
    return (ar * br + ai * bi) / d, (ai * br - ar * bi) / d


def roots_durand_kerner(coeffs, num_iters=60):
    """All complex roots of a batch of degree-D polynomials.

    coeffs: (..., D+1) ascending real coefficients; the leading coefficient
    must be nonzero (callers normalize — RANSAC hypothesis batches guarantee
    this via masking). Returns (roots_re, roots_im), each (..., D).

    The Weierstrass/Durand-Kerner iteration:
        z_i <- z_i - p(z_i) / prod_{j != i} (z_i - z_j)
    with initial guesses on a spiral scaled by the Cauchy root bound.
    Fixed `num_iters` iterations — no convergence test, so the whole solve
    is a static fori_loop (reference math.cc:52-87 iterates to a tolerance
    instead).
    """
    dtype = coeffs.dtype
    D = coeffs.shape[-1] - 1
    lead = coeffs[..., -1:]
    lead = jnp.where(jnp.abs(lead) < 1e-30, 1e-30, lead)
    monic = coeffs / lead  # ascending, monic

    # Fujiwara root bound: 2 * max_k |c_{D-k}|^{1/k} (much tighter than the
    # Cauchy bound when the leading coefficient is small). Substitute
    # u = z / radius so every root of the u-polynomial lies in |u| <= 1 —
    # this keeps all intermediate magnitudes O(1), which both makes the
    # iteration float32-safe (naive DK overflows f32 when a loose bound
    # pushes |z|^D and squared denominators past 3e38) and keeps the roots
    # well separated relative to the initial-guess ring.
    kk = jnp.arange(1, D + 1).astype(dtype)
    mags = jnp.abs(monic[..., :-1][..., ::-1])  # |c_{D-1}|, ..., |c_0|
    radius = 2.0 * jnp.max(jnp.maximum(mags, 1e-30) ** (1.0 / kk), axis=-1)
    radius = jnp.maximum(radius, 1e-6)
    powers = radius[..., None] ** jnp.arange(-D, 1).astype(dtype)  # r^(k-D)
    monic = monic * powers  # coefficients of the monic u-polynomial

    k = jnp.arange(D, dtype=dtype)
    # Spiral of initial guesses: distinct moduli & phases avoid symmetric
    # stalls; arg(0.4 + 0.9i) phase progression, graded moduli in (0.5, 1].
    ang0 = jnp.arctan2(0.9, 0.4)
    ang = ang0 * (k + 1.0)
    mod = 0.5 + 0.5 * (k + 1.0) / D
    zr0 = jnp.broadcast_to(mod * jnp.cos(ang), radius.shape + (D,))
    zi0 = jnp.broadcast_to(mod * jnp.sin(ang), radius.shape + (D,))

    def p_of(zr, zi):
        # Horner on monic ascending coeffs, batched over the roots axis.
        ar = jnp.zeros_like(zr)
        ai = jnp.zeros_like(zi)
        for i in range(D, -1, -1):
            ar, ai = _cmul(ar, ai, zr, zi)
            ar = ar + monic[..., i][..., None]
        return ar, ai

    eye = jnp.eye(D, dtype=dtype)

    def body(_, z):
        zr, zi = z
        pr, pi = p_of(zr, zi)
        dr = zr[..., :, None] - zr[..., None, :] + eye  # (..., D, D)
        di = zi[..., :, None] - zi[..., None, :]
        # prod over last axis of complex (dr, di)
        def prod_body(carry, x):
            cr, ci = carry
            xr, xi = x
            return _cmul(cr, ci, xr, xi), None

        # scan over the last axis: move it to front
        drm = jnp.moveaxis(dr, -1, 0)
        dim = jnp.moveaxis(di, -1, 0)
        init = (jnp.ones_like(zr), jnp.zeros_like(zi))
        (qr, qi), _ = jax.lax.scan(prod_body, init, (drm, dim))
        sr, si = _cdiv(pr, pi, qr, qi)
        # Clamp absurd steps (rare stalls with coincident guesses). All
        # magnitudes are O(1) in the scaled variable.
        smag = jnp.sqrt(sr * sr + si * si)
        max_step = 4.0
        scale = jnp.where(smag > max_step, max_step / jnp.maximum(smag, 1e-30), 1.0)
        return (zr - sr * scale, zi - si * scale)

    zr, zi = jax.lax.fori_loop(0, num_iters, body, (zr0, zi0))
    r = radius[..., None]
    return zr * r, zi * r


def real_roots_mask(roots_re, roots_im, imag_tol=1e-4):
    """Mask of roots that are (numerically) real, relative to their magnitude."""
    mag = jnp.sqrt(roots_re * roots_re + roots_im * roots_im)
    return jnp.abs(roots_im) <= imag_tol * jnp.maximum(mag, 1.0)
