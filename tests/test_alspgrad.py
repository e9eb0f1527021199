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
def test_alspgrad_solve(dtype):
    rng = np.random.default_rng(33)
    X, Wg, Hg = laurberg6x3(dtype(0.3), dtype)
    W0 = rng.random(Wg.shape).astype(dtype)
    H0 = rng.random(Hg.shape).astype(dtype)
    res = M.solve(M.ALSPGrad(), jnp.asarray(X), jnp.asarray(W0), jnp.asarray(H0))
    assert (np.asarray(res.W) >= 0).all()
    assert (np.asarray(res.H) >= 0).all()
    assert np.isfinite(res.objvalue)
