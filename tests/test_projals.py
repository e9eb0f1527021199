"""ProjectedALS recovery (the reference has no dedicated projals test file —
it is covered by the interface grid; we add a recovery test in the same style
as the other solvers)."""

import numpy as np
import jax.numpy as jnp
import pytest

import nmf_tpu as M
from testproblems import laurberg6x3


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_projals_recovery(dtype):
    rng = np.random.default_rng(61)
    X, Wg, Hg = laurberg6x3(dtype(0.3), dtype)
    W = (Wg + rng.random(Wg.shape) * 0.1).astype(dtype)
    H = np.zeros_like(Hg)
    res = M.solve(
        M.ProjectedALS(maxiter=1000, tol=1e-9),
        jnp.asarray(X),
        jnp.asarray(W),
        jnp.asarray(H),
    )
    Wr, Hr = np.asarray(res.W), np.asarray(res.H)
    assert (Wr >= 0).all() and (Hr >= 0).all()
    assert np.allclose(X, Wr @ Hr, atol=1e-2)


def test_projals_objective_includes_regularization():
    rng = np.random.default_rng(62)
    X, Wg, Hg = laurberg6x3(0.3)
    res0 = M.solve(
        M.ProjectedALS(maxiter=10, lambda_w=0.0, lambda_h=0.0),
        jnp.asarray(X), jnp.asarray(Wg), jnp.asarray(Hg),
    )
    res1 = M.solve(
        M.ProjectedALS(maxiter=10, lambda_w=1.0, lambda_h=1.0),
        jnp.asarray(X), jnp.asarray(Wg), jnp.asarray(Hg),
    )
    # with large lambda the reported objective includes the penalty terms
    assert res1.objvalue > res0.objvalue
