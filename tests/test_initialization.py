"""Mirrors /root/reference/test/initialization.jl."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import nmf_tpu as M


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_randinit(dtype):
    rng = np.random.default_rng(51)
    X = jnp.asarray(rng.random((8, 12)).astype(dtype))

    W, H = M.randinit(X, 5, key=jax.random.PRNGKey(0))
    assert W.shape == (8, 5) and H.shape == (5, 12)
    assert W.dtype == X.dtype and H.dtype == X.dtype
    assert (np.asarray(W) >= 0).all() and (np.asarray(H) >= 0).all()

    W, H = M.randinit(X, 5, zeroh=True, key=jax.random.PRNGKey(0))
    assert (np.asarray(H) == 0).all()

    W, H = M.randinit(X, 5, normalize=True, key=jax.random.PRNGKey(0))
    assert np.allclose(np.asarray(jnp.sum(W, axis=0)), np.ones(5))


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_nndsvd(dtype):
    rng = np.random.default_rng(52)
    X = jnp.asarray(rng.random((8, 12)).astype(dtype))

    W, H = M.nndsvd(X, 5, key=jax.random.PRNGKey(5678))
    assert W.shape == (8, 5) and H.shape == (5, 12)
    assert (np.asarray(W) >= 0).all() and (np.asarray(H) >= 0).all()

    # determinism under the same key; zeroh shares W
    W2, H2 = M.nndsvd(X, 5, zeroh=True, key=jax.random.PRNGKey(5678))
    assert np.array_equal(np.asarray(W2), np.asarray(W))
    assert (np.asarray(H2) == 0).all()


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_nndsvd_scale_equivariance(dtype):
    """nndsvd(2X) == sqrt(2)*nndsvd(X) given exact SVDs as initdata
    (reference test/initialization.jl:45-49)."""
    rng = np.random.default_rng(53)
    X = rng.random((8, 12)).astype(dtype)

    U, s, Vt = np.linalg.svd(X, full_matrices=False)
    W1, H1 = M.nndsvd(jnp.asarray(X), 5, initdata=(U, s, Vt.T))
    U2, s2, Vt2 = np.linalg.svd(2 * X, full_matrices=False)
    W2, H2 = M.nndsvd(jnp.asarray(2 * X), 5, initdata=(U2, s2, Vt2.T))
    rt2 = np.sqrt(dtype(2))
    assert np.allclose(np.asarray(W2), rt2 * np.asarray(W1), atol=1e-5)
    assert np.allclose(np.asarray(H2), rt2 * np.asarray(H1), atol=1e-5)


def test_nndsvd_ar_strictly_positive():
    rng = np.random.default_rng(54)
    X = jnp.asarray(rng.random((8, 12)))
    W, H = M.nndsvd(X, 5, variant="ar", key=jax.random.PRNGKey(9))
    assert (np.asarray(W) > 0).all()


def test_nndsvd_a_fills_mean():
    rng = np.random.default_rng(55)
    X = rng.random((8, 12))
    U, s, Vt = np.linalg.svd(X, full_matrices=False)
    W, H = M.nndsvd(jnp.asarray(X), 5, variant="a", initdata=(U, s, Vt.T))
    W = np.asarray(W)
    # components beyond the first have sign changes -> some entries == mean(X)
    assert np.isclose(W[W > 0].min(), min(W[W > 0].min(), X.mean()))
    assert (W >= 0).all()


def test_nndsvd_invalid_variant():
    X = jnp.asarray(np.random.default_rng(0).random((4, 4)))
    with pytest.raises(ValueError):
        M.nndsvd(X, 2, variant="bogus")


def test_nndsvd_object_initdata():
    """Accepts a Julia-SVD-style object with U/S/V attributes."""

    class F:
        pass

    rng = np.random.default_rng(56)
    X = rng.random((8, 12))
    U, s, Vt = np.linalg.svd(X, full_matrices=False)
    f = F()
    f.U, f.S, f.V = U, s, Vt.T
    W1, H1 = M.nndsvd(jnp.asarray(X), 5, initdata=f)
    W2, H2 = M.nndsvd(jnp.asarray(X), 5, initdata=(U, s, Vt.T))
    assert np.allclose(np.asarray(W1), np.asarray(W2))
