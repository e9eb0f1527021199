"""Mirrors /root/reference/test/spa.jl: near-separable and exactly separable
recovery."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import nmf_tpu as M


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_spa_near_separable(dtype):
    p, n, k = 15, 8, 2
    rng = np.random.default_rng(41)
    eps4 = np.finfo(dtype).eps ** 0.25
    Wg = np.maximum(rng.random((p, k)) - 0.3, eps4).astype(dtype)
    Hg = np.maximum(rng.random((k, n)) - 0.3, eps4).astype(dtype)
    X = (Wg @ Hg).astype(dtype)
    w, h = M.spa(jnp.asarray(X), k)
    w, h = np.asarray(w), np.asarray(h)
    assert (w >= 0).all() and (h >= 0).all()
    assert np.allclose(w @ h, X, atol=10.0 * eps4)


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_spa_exactly_separable(dtype):
    p, n, k = 15, 8, 2
    Wg, Hg = M.separable_data(p, n, k, key=jax.random.PRNGKey(5))
    Wg = np.asarray(Wg, dtype)
    Hg = np.asarray(Hg, dtype)
    X = (Wg @ Hg).astype(dtype)
    w, h = M.spa(jnp.asarray(X), k)
    w, h = np.asarray(w), np.asarray(h)
    assert (w >= 0).all() and (h >= 0).all()
    assert float(M.sqL2dist(jnp.asarray(X), jnp.asarray(w @ h))) < np.finfo(dtype).eps


def test_separable_data_structure():
    p, n, k = 10, 7, 3
    W, H = M.separable_data(p, n, k, key=jax.random.PRNGKey(1))
    H = np.asarray(H)
    assert H.shape == (k, n)
    # contains a permuted identity block
    cols = {tuple(np.round(H[:, j], 12)) for j in range(n)}
    for r in range(k):
        e = tuple(1.0 if i == r else 0.0 for i in range(k))
        assert e in cols
    assert (np.sum(H, axis=0) <= 1 + 1e-12).all()


def test_spa_solver_statistics():
    p, n, k = 12, 9, 3
    rng = np.random.default_rng(43)
    W = rng.random((p, k))
    H = rng.random((k, n))
    X = W @ H
    res = M.solve(M.SPA(obj="mse"), jnp.asarray(X), jnp.asarray(W), jnp.asarray(H))
    assert res.niters == 0
    assert res.converged
    assert np.isclose(res.objvalue, 0.0, atol=1e-20)
    res_div = M.solve(M.SPA(obj="div"), jnp.asarray(X), jnp.asarray(W), jnp.asarray(H))
    assert res_div.converged
