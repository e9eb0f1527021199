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


def test_fnnls_cascade_matches_plain():
    """The compaction-cascade driver (lockstep fix, config.fnnls_cascade)
    must reproduce the plain masked vmapped loop exactly: finished columns
    are fixed points of the masked step, so compacting them away changes
    nothing.  Mixed workload: interior columns (1 outer iter), zero columns,
    and random ones with active constraints."""
    from nmf_tpu.ops.fnnls import nnls_gram

    rng = np.random.default_rng(83)
    m, k, n = 40, 8, 600
    A = rng.random((m, k))
    B = rng.random((m, n)) - 0.4
    B[:, :50] = A @ (rng.random((k, 50)) + 0.5)  # easy interior columns
    B[:, 50:80] = -np.abs(B[:, 50:80])  # x = 0 columns
    AtA = jnp.asarray(A.T @ A)
    AtB = jnp.asarray(A.T @ B)
    import nmf_tpu.config as config

    old = dict(config.fnnls_cascade)
    try:
        config.fnnls_cascade.update(shrink=3, min=16, off_cols=1)
        fast = np.asarray(nnls_gram(AtA, AtB, cascade=True))
    finally:
        config.fnnls_cascade.update(old)
    plain = np.asarray(nnls_gram(AtA, AtB, cascade=False))
    np.testing.assert_array_equal(fast, plain)
    for j in (0, 55, 120, 599):
        expect, _ = scipy_nnls(A, B[:, j])
        assert np.allclose(plain[:, j], expect, atol=1e-8), j
