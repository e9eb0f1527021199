"""Randomized SVD quality against numpy's exact SVD."""

import numpy as np
import jax
import jax.numpy as jnp

import nmf_tpu as M


def test_rsvd_low_rank_exact():
    rng = np.random.default_rng(91)
    p, n, r = 60, 40, 5
    A = rng.random((p, r)) @ rng.random((r, n))
    U, s, V = M.rsvd(jnp.asarray(A), r, key=jax.random.PRNGKey(0))
    approx = np.asarray(U) @ np.diag(np.asarray(s)) @ np.asarray(V).T
    assert np.allclose(approx, A, atol=1e-8)
    s_exact = np.linalg.svd(A, compute_uv=False)[:r]
    assert np.allclose(np.asarray(s), s_exact, atol=1e-8)


def test_rsvd_shapes_and_orthonormality():
    rng = np.random.default_rng(92)
    A = rng.random((30, 50))
    k = 7
    U, s, V = M.rsvd(jnp.asarray(A), k, key=jax.random.PRNGKey(1))
    assert U.shape == (30, k) and s.shape == (k,) and V.shape == (50, k)
    assert np.allclose(np.asarray(U).T @ np.asarray(U), np.eye(k), atol=1e-10)
    assert np.allclose(np.asarray(V).T @ np.asarray(V), np.eye(k), atol=1e-10)
    assert (np.diff(np.asarray(s)) <= 1e-12).all()  # non-increasing


def test_rsvd_noisy_close_to_truth():
    rng = np.random.default_rng(93)
    p, n, r = 100, 80, 4
    A = rng.random((p, r)) @ rng.random((r, n)) + 0.01 * rng.standard_normal((p, n))
    k = 4
    U, s, V = M.rsvd(jnp.asarray(A), k, key=jax.random.PRNGKey(2))
    s_exact = np.linalg.svd(A, compute_uv=False)[:k]
    assert np.allclose(np.asarray(s), s_exact, rtol=1e-2)
