"""Closed-form quartic solver vs numpy.roots."""

import numpy as np
import jax.numpy as jnp

from mavmap_tpu.ops.polynomial import solve_quartic_real


def _check(coeffs_desc, rtol=2e-3, atol=2e-3):
    """coeffs_desc: descending numpy coeffs (c4..c0)."""
    ref = np.roots(coeffs_desc)
    ref_real = np.sort(ref[np.abs(ref.imag) < 1e-9 * np.maximum(
        np.abs(ref), 1.0)].real)
    asc = np.asarray(coeffs_desc[::-1], np.float64)
    roots, mask = solve_quartic_real(jnp.asarray(asc, jnp.float32))
    got = np.sort(np.asarray(roots)[np.asarray(mask)])
    assert len(got) == len(ref_real), (coeffs_desc, ref_real, got)
    if len(ref_real):
        scale = np.maximum(np.abs(ref_real), 1.0)
        np.testing.assert_allclose(got, ref_real, rtol=rtol,
                                   atol=atol * scale.max())


def test_quartic_four_real_roots(rng):
    for _ in range(200):
        r = np.sort(rng.uniform(-3, 3, size=4))
        if np.min(np.diff(r)) < 0.1:
            continue  # well-separated roots for the f32 tolerance
        c = np.poly(r) * rng.uniform(0.5, 2.0)
        _check(c)


def test_quartic_two_real_two_complex(rng):
    for _ in range(200):
        r1, r2 = rng.uniform(-3, 3, size=2)
        if abs(r1 - r2) < 0.1:
            continue
        a, b = rng.uniform(-2, 2), rng.uniform(0.3, 2)  # a +- bi
        c = np.poly([r1, r2, complex(a, b), complex(a, -b)]).real
        _check(c)


def test_quartic_all_complex(rng):
    for _ in range(50):
        a1, b1 = rng.uniform(-2, 2), rng.uniform(0.3, 2)
        a2, b2 = rng.uniform(-2, 2), rng.uniform(0.3, 2)
        c = np.poly([complex(a1, b1), complex(a1, -b1),
                     complex(a2, b2), complex(a2, -b2)]).real
        _check(c)


def test_quartic_biquadratic():
    # x^4 - 5x^2 + 4 = (x^2-1)(x^2-4): roots +-1, +-2; q = 0 path.
    _check(np.array([1.0, 0.0, -5.0, 0.0, 4.0]))
    # x^4 + 5x^2 + 4: no real roots.
    _check(np.array([1.0, 0.0, 5.0, 0.0, 4.0]))


def test_quartic_wild_scaling(rng):
    for _ in range(100):
        r = np.sort(rng.uniform(-3, 3, size=4))
        if np.min(np.diff(r)) < 0.15:
            continue
        s = 10.0 ** rng.uniform(-3, 3)
        c = np.poly(r * s) * 10.0 ** rng.uniform(-3, 3)
        ref = np.sort(r * s)
        asc = np.asarray(c[::-1], np.float64)
        roots, mask = solve_quartic_real(jnp.asarray(asc, jnp.float32))
        got = np.sort(np.asarray(roots)[np.asarray(mask)])
        assert len(got) == 4
        np.testing.assert_allclose(got, ref, rtol=5e-3,
                                   atol=5e-3 * max(abs(ref).max(), 1.0))


def test_quartic_batched(rng):
    rs = np.sort(rng.uniform(-3, 3, size=(32, 4)), axis=1)
    rs = rs[np.min(np.diff(rs, axis=1), axis=1) > 0.1]
    coeffs = np.stack([np.poly(r)[::-1] for r in rs])
    roots, mask = solve_quartic_real(jnp.asarray(coeffs, jnp.float32))
    roots, mask = np.asarray(roots), np.asarray(mask)
    assert mask.all()
    np.testing.assert_allclose(np.sort(roots, axis=1), rs, rtol=2e-3,
                               atol=1e-2)
