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


def test_cholesky_qr_orthonormal_and_rank_deficient():
    """Distributed TSQR building block: orthonormal Q with the input's
    column space, including an exactly rank-deficient panel (an NNDSVD
    sketch of a low-rank X has l > rank)."""
    from nmf_tpu.ops.tsqr import cholesky_qr

    rng = np.random.default_rng(5)
    Y = jnp.asarray(rng.random((200, 12)))
    Q = np.asarray(cholesky_qr(Y))
    assert np.allclose(Q.T @ Q, np.eye(12), atol=1e-12)
    # col(Q) == col(Y): projecting Y onto Q loses nothing
    assert np.allclose(Q @ (Q.T @ np.asarray(Y)), np.asarray(Y), atol=1e-10)

    # rank-6 panel stored in 12 columns
    Yd = np.asarray(Y)[:, :6] @ rng.random((6, 12))
    Qd = np.asarray(cholesky_qr(jnp.asarray(Yd)))
    assert np.allclose(Qd.T @ Qd, np.eye(12), atol=1e-8)
    assert np.allclose(Qd @ (Qd.T @ Yd), Yd, atol=1e-8)


def test_rsvd_sharded_matches_replicated():
    """rsvd on a row/col-sharded X over the 8-device mesh == single-device
    rsvd (same key): the CholeskyQR3 path never needs the unsharded panel."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from nmf_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(94)
    p, n, r = 96, 80, 5
    A = (rng.random((p, r)) @ rng.random((r, n))) + 0.01 * rng.random((p, n))
    k = 5
    U0, s0, V0 = M.rsvd(jnp.asarray(A), k, key=jax.random.PRNGKey(3))

    mesh = make_mesh((2, 4))
    Ash = jax.device_put(jnp.asarray(A), NamedSharding(mesh, P("rows", "cols")))
    U1, s1, V1 = M.rsvd(Ash, k, key=jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(U1), np.asarray(U0), atol=1e-8)
    np.testing.assert_allclose(np.asarray(V1), np.asarray(V0), atol=1e-8)


def test_nndsvd_sharded_matches_replicated():
    """The default init end-to-end on sharded X agrees with single-device."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from nmf_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(95)
    p, n, r = 96, 80, 4
    A = np.abs(rng.random((p, r)) @ rng.random((r, n)))
    W0, H0 = M.nndsvd(jnp.asarray(A), r, variant="a", key=jax.random.PRNGKey(4))

    mesh = make_mesh((2, 4))
    Ash = jax.device_put(jnp.asarray(A), NamedSharding(mesh, P("rows", "cols")))
    W1, H1 = M.nndsvd(Ash, r, variant="a", key=jax.random.PRNGKey(4))
    np.testing.assert_allclose(np.asarray(W1), np.asarray(W0), atol=1e-8)
    np.testing.assert_allclose(np.asarray(H1), np.asarray(H0), atol=1e-8)
