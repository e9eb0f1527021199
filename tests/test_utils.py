"""Mirrors /root/reference/test/utils.jl."""

import numpy as np
import jax.numpy as jnp
import pytest

import nmf_tpu as M
from testproblems import laurberg6x3


def make_pdmat(rng, n):
    g = rng.standard_normal((n, n))
    return np.asarray(M.adddiag(jnp.asarray(g.T @ g), 0.1))


def test_adddiag():
    rng = np.random.default_rng(0)
    a0 = rng.random((3, 3))
    assert np.array_equal(np.asarray(M.adddiag(jnp.asarray(a0), 0.0)), a0)
    out = np.asarray(M.adddiag(jnp.asarray(a0), 2.5))
    assert np.allclose(out, a0 + 2.5 * np.eye(3))
    with pytest.raises(ValueError):
        M.adddiag(jnp.zeros((2, 3)), 1.0)


def test_normalize1():
    rng = np.random.default_rng(1)
    a = rng.random(5)
    assert np.isclose(float(jnp.sum(M.normalize1(jnp.asarray(a)))), 1.0)


def test_normalize1_cols():
    rng = np.random.default_rng(2)
    a = rng.random((5, 6))
    out = M.normalize1_cols(jnp.asarray(a))
    assert np.allclose(np.asarray(jnp.sum(out, axis=0)), np.ones(6))


def test_projectnn():
    rng = np.random.default_rng(3)
    a0 = rng.standard_normal((5, 5))
    out = np.asarray(M.projectnn(jnp.asarray(a0)))
    assert np.array_equal(out, np.maximum(a0, 0.0))


def test_posneg():
    rng = np.random.default_rng(4)
    a = rng.standard_normal((5, 5))
    ap, an = M.posneg(jnp.asarray(a))
    assert np.array_equal(np.asarray(ap), np.maximum(a, 0.0))
    assert np.array_equal(np.asarray(an), np.maximum(-a, 0.0))
    assert np.allclose(np.asarray(ap) - np.asarray(an), a)


def test_pdsolve():
    rng = np.random.default_rng(5)
    A = make_pdmat(rng, 5)
    X = rng.random((5, 3))
    Y = A @ X
    out = np.asarray(M.pdsolve(jnp.asarray(A), jnp.asarray(Y)))
    assert np.allclose(out, X)


def test_pdrsolve():
    rng = np.random.default_rng(6)
    B = make_pdmat(rng, 5)
    X = rng.random((4, 5))
    Y = X @ B
    out = np.asarray(M.pdrsolve(jnp.asarray(Y), jnp.asarray(B)))
    assert np.allclose(out, X)


def test_result_eq_hash():
    X, Wg, Hg = laurberg6x3(0.3)
    res = M.solve(
        M.CoordinateDescent(alpha=0.0, maxiter=1000, tol=1e-9),
        jnp.asarray(X),
        jnp.asarray(Wg),
        jnp.asarray(Hg),
    )
    res2 = M.Result(res.W, res.H, res.niters, res.converged, res.objvalue)
    assert res == res2
    assert hash(res) == hash(res2)
    res3 = M.Result(res.W, res.H, res.niters + 1, res.converged, res.objvalue)
    assert res != res3


def test_result_shape_check():
    with pytest.raises(ValueError):
        M.Result(jnp.zeros((3, 2)), jnp.zeros((3, 4)), 0, True, 0.0)


def test_printf_mat(capsys):
    M.printf_mat(np.ones((2, 2)))
    out = capsys.readouterr().out
    assert "1.0000" in out


def test_stop_condition():
    W = jnp.ones((4, 2))
    H = jnp.ones((2, 5))
    conv, dev = M.stop_condition(W, W, H, H, 1e-6)
    assert bool(conv)
    assert float(dev) == 0.0
    W2 = W.at[0, 0].add(1.0)
    conv, dev = M.stop_condition(W2, W, H, H, 1e-6)
    assert not bool(conv)
    assert float(dev) > 0
