"""Mirrors /root/reference/test/coorddesc.jl."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import nmf_tpu as M
from testproblems import laurberg6x3


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_cd_recovery_unregularized(dtype):
    rng = np.random.default_rng(11)
    X, Wg, Hg = laurberg6x3(dtype(0.3), dtype)
    W = (Wg + rng.random(Wg.shape) * 0.1).astype(dtype)
    res = M.solve(
        M.CoordinateDescent(alpha=0.0, maxiter=1000, tol=1e-9),
        jnp.asarray(X),
        jnp.asarray(W),
        jnp.asarray(Hg),
    )
    assert np.allclose(X, np.asarray(res.W) @ np.asarray(res.H), atol=1e-4)


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_cd_recovery_regularized_shuffle(dtype):
    rng = np.random.default_rng(12)
    X, Wg, Hg = laurberg6x3(dtype(0.3), dtype)
    W = (Wg + rng.random(Wg.shape) * 0.1).astype(dtype)
    res = M.solve(
        M.CoordinateDescent(
            alpha=1e-4,
            l1ratio=0.5,
            shuffle=True,
            maxiter=1000,
            tol=1e-9,
            key=jax.random.PRNGKey(3),
        ),
        jnp.asarray(X),
        jnp.asarray(W),
        jnp.asarray(Hg),
    )
    assert np.allclose(X, np.asarray(res.W) @ np.asarray(res.H), atol=1e-2)


def test_cd_regularization_modes():
    """All four regularization targets run and stay non-negative."""
    rng = np.random.default_rng(13)
    X, Wg, Hg = laurberg6x3(0.3)
    W = Wg + rng.random(Wg.shape) * 0.1
    for reg in ("both", "components", "transformation", "none"):
        res = M.solve(
            M.CoordinateDescent(alpha=1e-3, l1ratio=0.5, regularization=reg, maxiter=20),
            jnp.asarray(X),
            jnp.asarray(W),
            jnp.asarray(Hg),
        )
        assert (np.asarray(res.W) >= 0).all()
        assert (np.asarray(res.H) >= 0).all()
    with pytest.raises(ValueError):
        M.CoordinateDescent(regularization="bogus")


def test_cd_matches_reference_loop():
    """One sweep of the vectorized HALS equals a literal scalar-loop oracle
    implementing src/coorddesc.jl:109-159 semantics."""
    rng = np.random.default_rng(14)
    p, n, k = 7, 9, 4
    X = rng.random((p, n))
    W = rng.random((p, k))
    H = rng.random((k, n))
    l1, l2 = 0.01, 0.02

    def oracle_halfstep(X, W, H, l1, l2):
        W = W.copy()
        HHt = H @ H.T + l2 * np.eye(k)
        XHt = X @ H.T - l1
        for t in range(k):
            for i in range(p):
                grad = -XHt[i, t]
                for r in range(k):
                    grad += HHt[t, r] * W[i, r]
                hess = HHt[t, t]
                if hess != 0:
                    W[i, t] = max(W[i, t] - grad / hess, 0.0)
        return W

    expect = oracle_halfstep(X, W, H, l1, l2)
    from nmf_tpu.models.coorddesc import _halfstep

    got = np.asarray(
        _halfstep(jnp.asarray(X), jnp.asarray(W), jnp.asarray(H), l1, l2, jnp.arange(k))
    )
    assert np.allclose(got, expect, atol=1e-12)
