"""FNNLS against scipy.optimize.nnls."""

import numpy as np
import jax.numpy as jnp
from scipy.optimize import nnls as scipy_nnls

import nmf_tpu as M


def test_fnnls_matches_scipy():
    rng = np.random.default_rng(81)
    m, k, n = 20, 6, 15
    A = rng.random((m, k))
    B = rng.random((m, n))
    X = np.asarray(M.fnnls(jnp.asarray(A), jnp.asarray(B)))
    for j in range(n):
        expect, _ = scipy_nnls(A, B[:, j])
        assert np.allclose(X[:, j], expect, atol=1e-8), j


def test_fnnls_exact_when_interior():
    rng = np.random.default_rng(82)
    m, k = 30, 5
    A = rng.random((m, k))
    x_true = rng.random(k) + 0.5  # strictly positive -> unconstrained optimum
    b = A @ x_true
    x = np.asarray(M.fnnls(jnp.asarray(A), jnp.asarray(b[:, None])))[:, 0]
    assert np.allclose(x, x_true, atol=1e-10)


def test_fnnls_active_constraints():
    A = np.array([[1.0, 1.0], [0.0, 1.0]])
    b = np.array([-1.0, -2.0])  # optimum is x = 0
    x = np.asarray(M.fnnls(jnp.asarray(A), jnp.asarray(b[:, None])))[:, 0]
    expect, _ = scipy_nnls(A, b)
    assert np.allclose(x, expect, atol=1e-12)
