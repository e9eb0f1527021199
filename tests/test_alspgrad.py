"""Mirrors /root/reference/test/alspgrad.jl: per-factor recovery with the
true other factor held fixed, then a full solve smoke."""

import numpy as np
import jax.numpy as jnp
import pytest

import nmf_tpu as M
from testproblems import laurberg6x3


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_alspgrad_updateh_recovery(dtype):
    rng = np.random.default_rng(31)
    X, Wg, Hg = laurberg6x3(dtype(0.3), dtype)
    eps = np.finfo(dtype).eps
    H0 = rng.random(Hg.shape).astype(dtype)
    H, t = M.alspgrad_updateh(
        jnp.asarray(X), jnp.asarray(Wg), jnp.asarray(H0), maxiter=1000, tolg=float(eps)
    )
    H = np.asarray(H)
    assert (H >= 0).all()
    assert np.allclose(H, Hg, atol=eps ** 0.25)
    assert t >= 1


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_alspgrad_updatew_recovery(dtype):
    rng = np.random.default_rng(32)
    X, Wg, Hg = laurberg6x3(dtype(0.3), dtype)
    eps = np.finfo(dtype).eps
    W0 = rng.random(Wg.shape).astype(dtype)
    W, t = M.alspgrad_updatew(
        jnp.asarray(X), jnp.asarray(W0), jnp.asarray(Hg), maxiter=1000, tolg=float(eps)
    )
    W = np.asarray(W)
    assert (W >= 0).all()
    assert np.allclose(W, Wg, atol=eps ** 0.25)


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_flat_subsolve_matches_nested(dtype, seed):
    """The flattened single-while_loop subsolver must match a step-at-a-time
    driver built on _pg_step (the nested-form reference, also the verbose
    path's engine): identical trip counts and accept decisions, values equal
    up to compiler fusion's reduction-order rounding (~1 ulp)."""
    from nmf_tpu.models.alspgrad import _pg_step, _pg_subsolve

    rng = np.random.default_rng(seed)
    k, m = 5, 17
    A = rng.random((12, k)).astype(dtype)
    AtA = jnp.asarray(A.T @ A)
    AtB = jnp.asarray((A.T @ rng.random((12, m))).astype(dtype))
    Y0 = jnp.asarray(rng.random((k, m)).astype(dtype))
    maxiter, traceiter = 50, 20
    tolg, beta, sigma = dtype(1e-8), dtype(0.2), dtype(0.01)

    Y_flat, t_flat = _pg_subsolve(AtA, AtB, Y0, maxiter, traceiter, tolg, beta, sigma)

    Y, alpha = Y0, jnp.ones((), dtype)
    t, converged = 0, False
    while not converged and t < maxiter:
        Y, alpha, _, _, conv = _pg_step(AtA, AtB, Y, alpha, traceiter, tolg, beta, sigma)
        converged = bool(conv)
        t += 1

    assert int(t_flat) == t
    assert t > 1  # exercise more than the trivial first check
    rtol = 1e-12 if dtype == np.float64 else 1e-5
    np.testing.assert_allclose(np.asarray(Y_flat), np.asarray(Y), rtol=rtol, atol=0)


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_alspgrad_solve(dtype):
    rng = np.random.default_rng(33)
    X, Wg, Hg = laurberg6x3(dtype(0.3), dtype)
    W0 = rng.random(Wg.shape).astype(dtype)
    H0 = rng.random(Hg.shape).astype(dtype)
    res = M.solve(M.ALSPGrad(), jnp.asarray(X), jnp.asarray(W0), jnp.asarray(H0))
    assert (np.asarray(res.W) >= 0).all()
    assert (np.asarray(res.H) >= 0).all()
    assert np.isfinite(res.objvalue)
