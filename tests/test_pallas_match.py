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


def _make_pair(rng, F=256, D=128, noise=0.02):
    d1 = rng.normal(size=(F, D)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    perm = rng.permutation(F)
    d2 = d1[perm] + rng.normal(size=(F, D)).astype(np.float32) * noise
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    m1 = np.ones(F, bool)
    m1[-30:] = False
    m2 = np.ones(F, bool)
    m2[-10:] = False
    return d1, d2, m1, m2, perm


def test_pallas_match_agrees_with_xla(rng, interpret_pallas):
    pm = interpret_pallas
    d1, d2, m1, m2, _ = _make_pair(rng)

    mt_ref, ok_ref = match_brute_force(
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(m1), jnp.asarray(m2)
    )
    mt_pal, ok_pal = pm.match_brute_force_pallas(
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(m1), jnp.asarray(m2)
    )
    np.testing.assert_array_equal(np.asarray(mt_ref), np.asarray(mt_pal))
    np.testing.assert_array_equal(np.asarray(ok_ref), np.asarray(ok_pal))
    assert np.asarray(ok_pal).sum() > 150


def test_pallas_match_pixel_prefilter(rng, interpret_pallas):
    """The fused kernel's in-VMEM pixel-distance prefilter must agree with
    the XLA path (reference max_distance_mask_, feature.cc:23-49)."""
    pm = interpret_pallas
    F = 256
    d1, d2, m1, m2, perm = _make_pair(rng, F=F)
    kp1 = rng.uniform(0, 800, size=(F, 2)).astype(np.float32)
    # True correspondences land near their partner (d2[j] ~ d1[perm[j]]);
    # push a quarter far outside the radius.
    kp2 = kp1[perm] + rng.normal(size=(F, 2)).astype(np.float32) * 5.0
    kp2[: F // 4] += 300.0
    maxd = 60.0

    mt_ref, ok_ref = match_brute_force(
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(m1), jnp.asarray(m2),
        jnp.asarray(kp1), jnp.asarray(kp2), max_distance=maxd,
    )
    mt_pal, ok_pal = pm.match_brute_force_pallas(
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(m1), jnp.asarray(m2),
        jnp.asarray(kp1), jnp.asarray(kp2), max_distance=maxd,
    )
    np.testing.assert_array_equal(np.asarray(mt_ref), np.asarray(mt_pal))
    np.testing.assert_array_equal(np.asarray(ok_ref), np.asarray(ok_pal))
    # The prefilter must actually reject some would-be matches.
    mt_nofilter, _ = match_brute_force(
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(m1), jnp.asarray(m2)
    )
    assert (np.asarray(mt_nofilter) >= 0).sum() > np.asarray(ok_pal).sum()
    assert np.asarray(ok_pal).sum() > 100


def test_pallas_match_multi_tile_column_carry(rng, interpret_pallas):
    """N1 > TILE_M exercises the cross-tile running column top-2."""
    pm = interpret_pallas
    d1, d2, m1, m2, _ = _make_pair(rng, F=384)
    mt_ref, ok_ref = match_brute_force(
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(m1), jnp.asarray(m2)
    )
    mt_pal, ok_pal = pm.match_brute_force_pallas(
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(m1), jnp.asarray(m2)
    )
    np.testing.assert_array_equal(np.asarray(mt_ref), np.asarray(mt_pal))
    np.testing.assert_array_equal(np.asarray(ok_ref), np.asarray(ok_pal))


def test_pallas_match_in_register_kernel(rng, interpret_pallas):
    """two_view_init with matcher='pallas' must equal matcher='xla'."""
    from mavmap_tpu.sfm.kernels import two_view_init

    F = 128
    d1, d2, m1, m2, _ = _make_pair(rng, F=F)
    kp1 = rng.uniform(0, 800, size=(F, 2)).astype(np.float32)
    kp2 = kp1 + rng.normal(size=(F, 2)).astype(np.float32) * 8.0
    n1 = (kp1 - 400.0) / 700.0
    n2 = (kp2 - 400.0) / 700.0
    key = jax.random.PRNGKey(3)

    args = (
        jnp.asarray(kp1), jnp.asarray(d1), jnp.asarray(m1), jnp.asarray(n1),
        jnp.asarray(kp2), jnp.asarray(d2), jnp.asarray(m2), jnp.asarray(n2),
        jnp.float32(0.9), jnp.float32(1e9), jnp.float32(4.0 / 700.0),
    )
    rows_x, sc_x = two_view_init(key, *args, essential_trials=64,
                                 hom_trials=32, matcher="xla")
    rows_p, sc_p = two_view_init(key, *args, essential_trials=64,
                                 hom_trials=32, matcher="pallas")
    # Matches (col 0) and validity (col 1) identical => identical geometry.
    np.testing.assert_array_equal(np.asarray(rows_x[:, :2]),
                                  np.asarray(rows_p[:, :2]))
    np.testing.assert_allclose(np.asarray(sc_x), np.asarray(sc_p),
                               rtol=1e-5, atol=1e-5)


def test_pallas_match_vmap(rng, interpret_pallas):
    """Batched (vmapped) matching — the loop-closure/back-fill paths."""
    pm = interpret_pallas
    B, F = 3, 128
    d1s, d2s, m1s, m2s = [], [], [], []
    for _ in range(B):
        d1, d2, m1, m2, _ = _make_pair(rng, F=F)
        d1s.append(d1); d2s.append(d2); m1s.append(m1); m2s.append(m2)
    d1s, d2s = np.stack(d1s), np.stack(d2s)
    m1s, m2s = np.stack(m1s), np.stack(m2s)

    def one_pal(a, b, ma, mb):
        return pm.match_brute_force_pallas(a, b, ma, mb)

    def one_xla(a, b, ma, mb):
        return match_brute_force(a, b, ma, mb)

    mt_p, ok_p = jax.vmap(one_pal)(jnp.asarray(d1s), jnp.asarray(d2s),
                                   jnp.asarray(m1s), jnp.asarray(m2s))
    mt_x, ok_x = jax.vmap(one_xla)(jnp.asarray(d1s), jnp.asarray(d2s),
                                   jnp.asarray(m1s), jnp.asarray(m2s))
    np.testing.assert_array_equal(np.asarray(mt_x), np.asarray(mt_p))
    np.testing.assert_array_equal(np.asarray(ok_x), np.asarray(ok_p))


def test_pallas_match_ragged_capacity(rng, interpret_pallas):
    """Ragged (non-128-aligned) capacities are tile-padded inside the
    wrapper: any N1/N2 takes the Pallas path and agrees with XLA exactly
    (the fallback blind spot: capacities off the 128 grid used to silently
    degrade to XLA)."""
    pm = interpret_pallas
    for F1, F2 in [(200, 200), (130, 70), (96, 257)]:
        d1 = rng.normal(size=(F1, 128)).astype(np.float32)
        d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
        take = min(F1, F2)
        d2 = np.concatenate([
            d1[rng.permutation(F1)[:take]]
            + rng.normal(size=(take, 128)).astype(np.float32) * 0.02,
            rng.normal(size=(max(F2 - take, 0), 128)).astype(np.float32),
        ])[:F2]
        d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
        m1 = rng.random(F1) > 0.1
        m2 = rng.random(F2) > 0.1

        mt_ref, ok_ref = match_brute_force(
            jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(m1), jnp.asarray(m2)
        )
        mt_pal, ok_pal = pm.match_brute_force_pallas(
            jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(m1), jnp.asarray(m2)
        )
        assert mt_pal.shape == (F1,)
        np.testing.assert_array_equal(np.asarray(mt_ref), np.asarray(mt_pal))
        np.testing.assert_array_equal(np.asarray(ok_ref), np.asarray(ok_pal))


def test_matcher_backend_resolves_pallas_on_tpu(rng, monkeypatch):
    """'auto' resolves to pallas for ANY capacity on TPU, and the mapper
    records the resolved backend for bench assertions."""
    from mavmap_tpu.features import ArrayFeatureProvider
    from mavmap_tpu.sfm import SequentialMapper, SequentialMapperOptions
    import mavmap_tpu.ba.core as ba_core

    feats = [(np.zeros((70, 2), np.float32),
              np.zeros((70, 128), np.float32)) for _ in range(2)]
    prov = ArrayFeatureProvider(feats, capacity=70)  # NOT 128-aligned
    m = SequentialMapper(np.zeros(2, np.int32), np.array([1], np.int32),
                         np.zeros((1, 9), np.float32), prov)
    opts = SequentialMapperOptions()
    monkeypatch.setattr(ba_core, "default_platform", lambda: "tpu")
    assert m._matcher_backend(opts) == "pallas"
    assert m.matcher_backend_resolved == "pallas"
    monkeypatch.setattr(ba_core, "default_platform", lambda: "cpu")
    assert m._matcher_backend(opts) == "xla"
