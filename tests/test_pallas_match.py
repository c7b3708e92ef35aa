"""Pallas fused matcher vs the XLA reference implementation.

Runs in Pallas interpret mode on CPU (compiled mode is exercised on TPU by
bench/verification runs); results must agree exactly in match indices.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mavmap_tpu.ops.matching import match_brute_force


@pytest.fixture
def interpret_pallas(monkeypatch):
    import jax.experimental.pallas as pl
    import mavmap_tpu.ops.pallas.match as pm

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pm.pl, "pallas_call", patched)
    return pm


def test_pallas_match_agrees_with_xla(rng, interpret_pallas):
    pm = interpret_pallas
    F, D = 256, 128
    d1 = rng.normal(size=(F, D)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    perm = rng.permutation(F)
    d2 = d1[perm] + rng.normal(size=(F, D)).astype(np.float32) * 0.02
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    m1 = np.ones(F, bool)
    m1[-30:] = False
    m2 = np.ones(F, bool)
    m2[-10:] = False

    mt_ref, ok_ref = match_brute_force(
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(m1), jnp.asarray(m2)
    )
    mt_pal, ok_pal = pm.match_brute_force_pallas(
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(m1), jnp.asarray(m2)
    )
    np.testing.assert_array_equal(np.asarray(mt_ref), np.asarray(mt_pal))
    np.testing.assert_array_equal(np.asarray(ok_ref), np.asarray(ok_pal))
    assert np.asarray(ok_pal).sum() > 150


def test_pallas_nn2_distances(rng, interpret_pallas):
    pm = interpret_pallas
    F, D = 128, 128
    d1 = rng.normal(size=(F, D)).astype(np.float32)
    d2 = rng.normal(size=(F, D)).astype(np.float32)
    arg, best, second = pm.nn2_pallas(jnp.asarray(d1), jnp.asarray(d2))
    # Reference: full distance matrix.
    dist = ((d1[:, None, :] - d2[None, :, :]) ** 2).sum(-1)
    n1sq = (d1**2).sum(1)
    np.testing.assert_array_equal(np.asarray(arg), dist.argmin(1))
    np.testing.assert_allclose(
        np.asarray(best) + n1sq, dist.min(1), rtol=1e-4, atol=1e-3
    )
