"""Objective functions against numpy oracles, including the tiled
(non-materializing) path."""

import numpy as np
import jax.numpy as jnp

import nmf_tpu as M
from nmf_tpu.ops import objectives


def test_sqL2dist():
    rng = np.random.default_rng(71)
    a = rng.random((6, 7))
    b = rng.random((6, 7))
    assert np.isclose(float(M.sqL2dist(jnp.asarray(a), jnp.asarray(b))), ((a - b) ** 2).sum())


def test_gkldiv_with_zeros():
    rng = np.random.default_rng(72)
    a = rng.random((6, 7))
    a[0, :] = 0.0  # zero entries contribute just b (StatsBase semantics)
    b = rng.random((6, 7)) + 0.1
    expect = np.where(a > 0, a * np.log(np.where(a > 0, a, 1) / b) - a + b, b).sum()
    assert np.isclose(float(M.gkldiv(jnp.asarray(a), jnp.asarray(b))), expect)


def test_blockwise_matches_direct():
    rng = np.random.default_rng(73)
    p, n, k = 64, 5000, 4
    X = rng.random((p, n))
    W = rng.random((p, k))
    H = rng.random((k, n))
    direct_mse = 0.5 * ((X - W @ H) ** 2).sum()
    old_small = objectives._SMALL
    try:
        objectives._SMALL = 0  # force the tiled path
        got = float(objectives.mse_objective(jnp.asarray(X), jnp.asarray(W), jnp.asarray(H)))
        assert np.isclose(got, direct_mse)
        WH = W @ H
        direct_kl = (X * np.log(X / WH) - X + WH).sum()
        gotkl = float(objectives.kl_objective(jnp.asarray(X), jnp.asarray(W), jnp.asarray(H)))
        assert np.isclose(gotkl, direct_kl)
    finally:
        objectives._SMALL = old_small
