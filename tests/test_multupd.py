"""Mirrors /root/reference/test/multupd.jl: laurberg recovery for both
objectives, both dtypes, with and without L1 regularization."""

import numpy as np
import jax.numpy as jnp
import pytest

import nmf_tpu as M
from testproblems import laurberg6x3


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
@pytest.mark.parametrize("obj", ["mse", "div"])
@pytest.mark.parametrize("lambda_w", [0.0, 1e-4])
@pytest.mark.parametrize("lambda_h", [0.0, 1e-4])
def test_multupd_recovery(dtype, obj, lambda_w, lambda_h):
    rng = np.random.default_rng(42)
    X, Wg, Hg = laurberg6x3(dtype(0.3), dtype)
    W = (Wg + rng.random(Wg.shape) * 0.1).astype(dtype)

    res = M.solve(
        M.MultUpdate(
            obj=obj, maxiter=5000, tol=1e-9, lambda_w=lambda_w, lambda_h=lambda_h
        ),
        jnp.asarray(X),
        jnp.asarray(W),
        jnp.asarray(Hg),
    )
    Wr = np.asarray(res.W)
    Hr = np.asarray(res.H)
    assert (Wr >= 0).all()
    assert (Hr >= 0).all()
    assert not np.isnan(Wr).any()
    assert not np.isnan(Hr).any()
    assert np.allclose(X, Wr @ Hr, atol=1e-2)


def test_multupd_validation():
    with pytest.raises(ValueError):
        M.MultUpdate(obj="bogus")
    with pytest.raises(ValueError):
        M.MultUpdate(maxiter=1)
    with pytest.raises(ValueError):
        M.MultUpdate(tol=0.0)
    with pytest.raises(ValueError):
        M.MultUpdate(lambda_w=-1.0)
    with pytest.raises(ValueError):
        M.MultUpdate(lambda_h=-1.0)


def test_multupd_update_H_false():
    rng = np.random.default_rng(7)
    X, Wg, Hg = laurberg6x3(0.3)
    W = Wg + rng.random(Wg.shape) * 0.1
    res = M.solve(
        M.MultUpdate(obj="mse", maxiter=50, update_H=False),
        jnp.asarray(X),
        jnp.asarray(W),
        jnp.asarray(Hg),
    )
    assert np.array_equal(np.asarray(res.H), Hg)
    assert not np.array_equal(np.asarray(res.W), W)
