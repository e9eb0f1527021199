"""Mirrors /root/reference/test/greedycd.jl, plus an exact oracle check of
the vmapped greedy inner loop against a literal port of the reference's
per-row schedule."""

import numpy as np
import jax.numpy as jnp
import pytest

import nmf_tpu as M
from testproblems import laurberg6x3


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
@pytest.mark.parametrize("lambda_w", [0.0, 1e-5])
@pytest.mark.parametrize("lambda_h", [0.0, 1e-5])
def test_greedycd_recovery(dtype, lambda_w, lambda_h):
    rng = np.random.default_rng(21)
    X, Wg, Hg = laurberg6x3(dtype(0.3), dtype)
    W = (Wg + rng.random(Wg.shape) * 0.1).astype(dtype)
    res = M.solve(
        M.GreedyCD(maxiter=1000, tol=1e-9, lambda_w=lambda_w, lambda_h=lambda_h),
        jnp.asarray(X),
        jnp.asarray(W),
        jnp.asarray(Hg),
    )
    Wr, Hr = np.asarray(res.W), np.asarray(res.H)
    assert (Wr >= 0).all() and (Hr >= 0).all()
    assert not np.isnan(Wr).any() and not np.isnan(Hr).any()
    assert np.allclose(X, Wr @ Hr, atol=1e-3)


def test_greedycd_halfstep_oracle():
    """One W half-step equals a literal numpy port of
    src/greedycd.jl:94-166 (greedy per-row coordinate schedule)."""
    rng = np.random.default_rng(22)
    p, n, k = 6, 8, 3
    X = rng.random((p, n))
    W = rng.random((p, k))
    H = rng.random((k, n))
    lam = 1e-3
    epsT = np.finfo(np.float64).eps

    def oracle(X, W, Ht, lam):
        m, k = W.shape
        P = Ht.T @ Ht
        Z = X @ Ht
        G = W @ P - Z + lam
        S = np.maximum(0.0, W - G / (epsT + np.diag(P))) - W
        D = -G * S - 0.5 * np.diag(P) * S**2
        q = D.argmax(axis=1)
        p_init = max(-1.0, D.max()) if D.size else -1.0
        Wnew = np.zeros_like(W)
        nu = 0.001
        for i in range(m):
            qi = q[i]
            for _ in range(k * k):
                if D[i, qi] < nu * p_init:
                    break
                Wnew[i, qi] += S[i, qi]
                G[i, :] += S[i, qi] * P[qi, :]
                S[i, :] = np.maximum(0.0, W[i, :] - G[i, :] / (epsT + np.diag(P))) - W[i, :]
                D[i, :] = -G[i, :] * S[i, :] - 0.5 * np.diag(P) * S[i, :] ** 2
                qi = D[i, :].argmax()
        return np.maximum(W + Wnew, 0.0)

    expect = oracle(X, W, H.T, lam)
    from nmf_tpu.models.greedycd import _halfstep

    got = np.asarray(_halfstep(jnp.asarray(X), jnp.asarray(W), jnp.asarray(H.T), lam))
    assert np.allclose(got, expect, atol=1e-12)


def test_greedycd_validation():
    with pytest.raises(ValueError):
        M.GreedyCD(maxiter=1)
    with pytest.raises(ValueError):
        M.GreedyCD(tol=0.0)
    with pytest.raises(ValueError):
        M.GreedyCD(lambda_w=-1.0)


def test_compaction_cascade_matches_plain(monkeypatch):
    """The adaptive compaction-cascade execution (masked steps + repeated
    shrink-by-4 gathers of the active rows) is bit-identical to the plain
    vmapped while_loop (same per-row arithmetic; inactive rows add exact
    zeros).  The cascade floor is shrunk so multiple levels actually run."""
    from nmf_tpu import config as cfg

    rng = np.random.default_rng(11)
    p, n, k = 600, 150, 5
    Xd = np.abs(rng.random((p, k)) @ rng.random((k, n))).astype(np.float32)
    X = jnp.asarray(Xd)
    W0 = jnp.asarray(rng.random((p, k), dtype=np.float32))
    H0 = jnp.asarray(rng.random((k, n), dtype=np.float32))

    import jax

    # the knobs are baked in at trace time and do not enter the jit cache
    # key, so the cache must be dropped between the two variants
    monkeypatch.setitem(cfg.greedycd_cascade, "off_rows", 1 << 30)
    jax.clear_caches()
    plain = M.solve(M.GreedyCD(maxiter=6), X, W0, H0)
    monkeypatch.setitem(cfg.greedycd_cascade, "off_rows", 1)
    monkeypatch.setitem(cfg.greedycd_cascade, "min", 16)
    jax.clear_caches()
    fast = M.solve(M.GreedyCD(maxiter=6), X, W0, H0)
    monkeypatch.setitem(cfg.greedycd_cascade, "shrink", 2)
    jax.clear_caches()
    fast2 = M.solve(M.GreedyCD(maxiter=6), X, W0, H0)
    jax.clear_caches()  # do not leak knob-baked traces to other tests

    for got in (fast, fast2):
        assert got.niters == plain.niters
        np.testing.assert_array_equal(np.asarray(got.W), np.asarray(plain.W))
        np.testing.assert_array_equal(np.asarray(got.H), np.asarray(plain.H))
        assert got.objvalue == plain.objvalue


def test_slab_path_bit_identical():
    """The row-slab driver (slab_rows knob; the config6-scale HBM fix) must
    reproduce the full-width update exactly: rows are independent given the
    Grams, and the global p_init is agreed by a masked max first."""
    import jax.numpy as jnp

    import nmf_tpu
    import nmf_tpu.config as config

    rng = np.random.default_rng(11)
    p, n, k = 900, 140, 7
    Xd = np.maximum(rng.random((p, k)) @ rng.random((k, n)), 0).astype(np.float32)
    W0 = jnp.asarray(rng.random((p, k)).astype(np.float32))
    H0 = jnp.asarray(rng.random((k, n)).astype(np.float32))
    alg = nmf_tpu.GreedyCD(maxiter=5, tol=1e-30)
    old = dict(config.greedycd_cascade)
    try:
        config.set_greedycd_cascade(slab_rows=1 << 30)
        a = nmf_tpu.solve(alg, jnp.asarray(Xd), W0, H0)
        # slab = 256 rows -> 4 slabs, off_rows forces the cascade inside
        config.set_greedycd_cascade(slab_rows=256, off_rows=128, min=32)
        b = nmf_tpu.solve(alg, jnp.asarray(Xd), W0, H0)
        # and the plain vmapped path inside each slab
        config.set_greedycd_cascade(slab_rows=256, off_rows=1 << 30)
        c = nmf_tpu.solve(alg, jnp.asarray(Xd), W0, H0)
    finally:
        config.greedycd_cascade.update(old)
        import jax

        jax.clear_caches()
    np.testing.assert_array_equal(np.asarray(a.W), np.asarray(b.W))
    np.testing.assert_array_equal(np.asarray(a.H), np.asarray(b.H))
    np.testing.assert_array_equal(np.asarray(a.W), np.asarray(c.W))
    assert a.objvalue == b.objvalue == c.objvalue
