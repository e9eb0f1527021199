"""Sparse-X (BCOO) support: every solver must agree with its dense run on
the same data, and the sparse paths must never materialize p x n buffers
(structurally guaranteed; here we check numerics)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import sparse as jsparse

import nmf_tpu as M
from nmf_tpu.ops import matops


def make_sparse_problem(seed=7, p=30, n=40, k=4, density=0.3):
    rng = np.random.default_rng(seed)
    X = rng.random((p, n)) * (rng.random((p, n)) < density)
    # avoid empty rows/cols so colsums/objectives stay benign
    X[np.arange(p), rng.integers(0, n, p)] += 0.5
    X[rng.integers(0, p, n), np.arange(n)] += 0.5
    W0 = rng.random((p, k))
    H0 = rng.random((k, n))
    return X, W0, H0


def test_matops_roundtrip():
    X, _, _ = make_sparse_problem()
    Xs = jsparse.BCOO.fromdense(jnp.asarray(X))
    D = np.random.default_rng(0).random((X.shape[1], 5))
    assert np.allclose(np.asarray(matops.mm(Xs, jnp.asarray(D))), X @ D)
    Dt = np.random.default_rng(1).random((6, X.shape[0]))
    assert np.allclose(np.asarray(matops.mtm(jnp.asarray(Dt), Xs)), Dt @ X)
    assert np.isclose(float(matops.sq_norm(Xs)), (X**2).sum())
    assert np.isclose(float(matops.total_sum(Xs)), X.sum())
    assert np.allclose(np.asarray(matops.colsums(Xs)), X.sum(0))
    assert np.allclose(np.asarray(matops.rowsums(Xs)), X.sum(1))
    assert bool(matops.all_nonneg(Xs))


def test_sddmm():
    X, W, H = make_sparse_problem()
    Xs = jsparse.BCOO.fromdense(jnp.asarray(X))
    vals = np.asarray(matops.sddmm(jnp.asarray(W), jnp.asarray(H), Xs))
    WH = W @ H
    idx = np.asarray(Xs.indices)
    assert np.allclose(vals, WH[idx[:, 0], idx[:, 1]])


def test_sparse_objectives():
    X, W, H = make_sparse_problem()
    Xs = jsparse.BCOO.fromdense(jnp.asarray(X))
    Wj, Hj = jnp.asarray(W), jnp.asarray(H)
    assert np.isclose(
        float(M.mse_objective(Xs, Wj, Hj)), float(M.mse_objective(jnp.asarray(X), Wj, Hj))
    )
    assert np.isclose(
        float(M.kl_objective(Xs, Wj, Hj)), float(M.kl_objective(jnp.asarray(X), Wj, Hj)),
        rtol=1e-10,
    )


SOLVERS = [
    M.MultUpdate(obj="mse", maxiter=25),
    M.MultUpdate(obj="div", maxiter=25),
    M.ProjectedALS(maxiter=25),
    M.CoordinateDescent(maxiter=25),
    M.GreedyCD(maxiter=25),
    M.ALSPGrad(maxiter=5),
]


@pytest.mark.parametrize("alg", SOLVERS, ids=lambda a: type(a).__name__ + getattr(a, "obj", ""))
def test_sparse_matches_dense(alg):
    X, W0, H0 = make_sparse_problem()
    Xs = jsparse.BCOO.fromdense(jnp.asarray(X))
    dense = M.solve(alg, jnp.asarray(X), jnp.asarray(W0), jnp.asarray(H0))
    sp = M.solve(alg, Xs, jnp.asarray(W0), jnp.asarray(H0))
    assert sp.niters == dense.niters
    np.testing.assert_allclose(np.asarray(sp.W), np.asarray(dense.W), rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(sp.H), np.asarray(dense.H), rtol=1e-7, atol=1e-9)
    assert np.isclose(sp.objvalue, dense.objvalue, rtol=1e-7)


def test_sparse_spa_matches_dense():
    rng = np.random.default_rng(9)
    p, n, k = 25, 18, 3
    W, H = M.separable_data(p, n, k, key=jax.random.PRNGKey(2))
    X = np.asarray(W @ H)
    X = X * (X > 0.02)  # sparsify a bit, keep separability approximately
    Xs = jsparse.BCOO.fromdense(jnp.asarray(X))
    wd, hd = M.spa(jnp.asarray(X), k)
    ws, hs = M.spa(Xs, k)
    # anchor choice must agree -> identical W
    np.testing.assert_allclose(np.asarray(ws), np.asarray(wd), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(hd), rtol=1e-6, atol=1e-9)


def test_sparse_nndsvd_and_rsvd():
    X, _, _ = make_sparse_problem(p=40, n=30)
    Xs = jsparse.BCOO.fromdense(jnp.asarray(X))
    U, s, V = M.rsvd(Xs, 5, key=jax.random.PRNGKey(3))
    Ud, sd, Vd = M.rsvd(jnp.asarray(X), 5, key=jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(s), np.asarray(sd), rtol=1e-8)
    Wd, Hd = M.nndsvd(jnp.asarray(X), 5, key=jax.random.PRNGKey(4))
    Ws, Hs = M.nndsvd(Xs, 5, key=jax.random.PRNGKey(4))
    np.testing.assert_allclose(np.asarray(Ws), np.asarray(Wd), rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(Hs), np.asarray(Hd), rtol=1e-6, atol=1e-9)


def test_sparse_nnmf_end_to_end():
    X, _, _ = make_sparse_problem(p=40, n=30)
    Xs = jsparse.BCOO.fromdense(jnp.asarray(X))
    for alg in ("multmse", "multdiv", "projals", "cd", "greedycd", "alspgrad"):
        ret = M.nnmf(Xs, 4, alg=alg, init="nndsvdar", maxiter=10)
        assert np.isfinite(ret.objvalue), alg
    ret = M.nnmf(Xs, 4, alg="spa", init="spa")
    assert ret.converged


def test_sparse_negative_validation():
    X, _, _ = make_sparse_problem()
    X[0, np.nonzero(X[0])[0][0]] *= -1
    Xs = jsparse.BCOO.fromdense(jnp.asarray(X))
    with pytest.raises(ValueError):
        M.nnmf(Xs, 3)
